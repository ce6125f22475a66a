"""Deterministic 10x scale-up of /root/testdata/sf0.1 into /tmp/sf1.
Keys shift by r*10M per replica (join fan-out preserved exactly);
document texts get a per-replica deterministic word permutation so
replicas are not near-duplicates of each other (replica 0 = original,
so the planted dup/near-dup structure survives in every replica)."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC, DST, R, SHIFT = "/root/testdata/sf0.1", "/tmp/sf1", 10, 10_000_000

def perm_text(t, r):
    if r == 0:
        return t
    words = t.split()
    rng = np.random.RandomState(r)
    return " ".join([words[i] for i in rng.permutation(len(words))])

# documents
t = pq.read_table(f"{SRC}/documents.parquet")
parts = []
for r in range(R):
    ids = pa.array(np.asarray(t.column("doc_id")) + r * SHIFT)
    texts = pa.array([perm_text(x, r) for x in t.column("text").to_pylist()],
                     pa.string())
    parts.append(pa.table({"doc_id": ids, "text": texts,
                           "lang": t.column("lang"),
                           "source": t.column("source"),
                           "n_chars": t.column("n_chars")}))
pq.write_table(pa.concat_tables(parts), f"{DST}/documents.parquet")

def shift_replicate(name, int_shift_cols):
    t = pq.read_table(f"{SRC}/{name}.parquet")
    parts = []
    for r in range(R):
        cols = {}
        for c in t.column_names:
            if c in int_shift_cols:
                col = t.column(c)
                cols[c] = pa.array(
                    np.asarray(col.combine_chunks().to_numpy(
                        zero_copy_only=False)) + r * SHIFT,
                    col.type)
            else:
                cols[c] = t.column(c)
        parts.append(pa.table(cols))
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/{name}.parquet")
    print(name, out.num_rows)

shift_replicate("orders", {"o_orderkey", "o_custkey"})
shift_replicate("customer", {"c_custkey"})
shift_replicate("events", {"event_id", "user_id"})
# only l_orderkey shifts: part/supplier dims are not replicated, and the
# order join is what the sf1 heavy family exercises
shift_replicate("lineitem", {"l_orderkey"})
print("documents", pq.ParquetFile(f"{DST}/documents.parquet").metadata.num_rows)
# embeddings: vec_id shifts; vectors repeat verbatim, so every vector
# gains 9 exact semantic duplicates across replicas — a deliberate
# hot-group stress for semantic_dedup / embedding_dedup at sf1
shift_replicate("embeddings", {"vec_id"})

# dimensions are NOT replicated (part/supplier keys stay unshifted in
# lineitem; c_nationkey values repeat across customer replicas) — copy
# them verbatim so dim-joining queries run at sf1 too
import shutil
for dim in ("part", "supplier", "nation", "region"):
    shutil.copyfile(f"{SRC}/{dim}.parquet", f"{DST}/{dim}.parquet")
    print(dim, "copied")
