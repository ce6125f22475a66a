import sys, time, threading
sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
import importlib.util
spec = importlib.util.spec_from_file_location("__ray_entry__", "/root/repo/__ray_entry__.py")
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
qs = m.queries()

TOTAL_OS = ray.cluster_resources().get("object_store_memory", 0)

class Peak:
    def __init__(self):
        self.peak = 0.0
        self.stop = False
        self.t = threading.Thread(target=self.run, daemon=True)
        self.t.start()
    def run(self):
        while not self.stop:
            avail = ray.available_resources().get("object_store_memory", TOTAL_OS)
            self.peak = max(self.peak, TOTAL_OS - avail)
            time.sleep(0.25)

NAMES = sys.argv[1:] or ["dedup_exact", "dedup_minhash", "dedup_simhash",
                         "customer_order_counts", "orders_by_segment",
                         "daily_view_purchase", "training_pipeline",
                         "session_durations"]
for name in NAMES:
    p = Peak()
    t0 = time.time()
    try:
        r = qs[name]("/tmp/sf1")
        import pandas as _pd
        import pyarrow as _pa
        n = len(r) if isinstance(r, (_pd.DataFrame, _pa.Table)) else r.count()
        status = "ok"
    except Exception as ex:
        n, status = -1, f"{type(ex).__name__}: {str(ex)[:150]}"
    wall = time.time() - t0
    p.stop = True
    print(f"SF1 {name}: {wall:.1f}s rows={n} peak_objstore={p.peak/2**30:.2f}GiB {status}", flush=True)
ray.shutdown()
