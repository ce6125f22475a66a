"""Checkpointed, resumable execution with per-partition lineage.

Ray Data has task-level lineage re-execution but no job-level checkpoint
(SURVEY.md §4.2), so resumability is built at the output layout level — the
north rule's "resumable from checkpoint with per-partition lineage +
metrics":

- the input keyspace is split into ``num_partitions`` hash partitions of
  ``doc_id`` (deterministic, independent of block layout),
- each partition runs as its own streaming pipeline and writes to
  ``out_dir/part=<p>/`` atomically (temp dir + rename),
- a JSONL manifest records one lineage row per completed partition:
  partition id, doc/span/error counts, doc_id hash range, wall seconds,
- resume = skip manifest-complete partitions; a crashed partial write is
  invisible (temp dir never renamed) and is redone,
- exact dedup by doc_id (``dedup_exact``) is the idempotency backstop if an
  input shard is ever double-fed across runs.

At cluster scale each partition is itself many blocks, so per-partition
streaming keeps the executor busy; partition count trades resume granularity
against scheduling overhead.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow.compute as pc


def _stable_bucket(ids, num_partitions: int):
    """Vectorized stable hash bucket of a string array (FNV-1a over bytes,
    computed with numpy on the offsets/values buffers)."""
    import numpy as np
    import pyarrow as pa

    arr = ids.combine_chunks() if hasattr(ids, "combine_chunks") else ids
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # fall back to per-row zlib.crc32 (C speed, stable across processes)
    import zlib
    return np.fromiter(
        (zlib.crc32(v.encode()) % num_partitions for v in arr.to_pylist()),
        dtype="int64", count=len(arr))


def add_partition_column(batch, num_partitions: int):
    import pyarrow as pa

    buckets = _stable_bucket(batch.column("doc_id"), num_partitions)
    return batch.append_column("part_id", pa.array(buckets, pa.int64()))


def load_manifest(out_dir: str) -> dict[int, dict]:
    path = os.path.join(out_dir, "manifest.jsonl")
    done: dict[int, dict] = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    done[rec["partition_id"]] = rec
    return done


def append_manifest(out_dir: str, rec: dict) -> None:
    path = os.path.join(out_dir, "manifest.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")


def run_checkpointed(
    docs_ds_factory,
    out_dir: str,
    *,
    num_partitions: int = 8,
    pipeline_kwargs: dict | None = None,
) -> list[dict]:
    """Run the extract pipeline partition-by-partition with resume.

    ``docs_ds_factory()`` must return a fresh lazy docs Dataset (a factory,
    not a Dataset, so each partition's run re-reads only what it filters).
    Returns the lineage records of THIS run (skipped partitions excluded).
    """
    from ..pipelines.extract_pipeline import run_extract_pipeline

    os.makedirs(out_dir, exist_ok=True)
    done = load_manifest(out_dir)
    records = []
    for p in range(num_partitions):
        if p in done:
            continue
        t0 = time.time()
        ds = docs_ds_factory()
        part = ds.map_batches(
            add_partition_column, batch_format="pyarrow",
            fn_kwargs={"num_partitions": num_partitions},
        ).filter(expr=f"part_id == {p}").drop_columns(["part_id"])
        out = run_extract_pipeline(part, **(pipeline_kwargs or {}))

        tmp_dir = os.path.join(out_dir, f".tmp-part-{p}")
        final_dir = os.path.join(out_dir, f"part={p}")
        if os.path.exists(tmp_dir):
            import shutil
            shutil.rmtree(tmp_dir)
        # stream straight to disk (no mid-pipeline materialization); lineage
        # counts come from a cheap column-pruned read-back of the output
        os.makedirs(tmp_dir, exist_ok=True)
        # fewer, larger files per partition (resumable layout stays per-dir)
        out.write_parquet(tmp_dir, min_rows_per_file=100_000)

        import ray.data as rd
        has_files = any(f.endswith(".parquet") for f in os.listdir(tmp_dir))
        if has_files:
            stats_ds = rd.read_parquet(
                tmp_dir, columns=["span_count", "text_len", "error"]
            ).map_batches(with_error_flag, batch_format="pyarrow")
            n_docs = stats_ds.count()
            stats = stats_ds.aggregate(*_lineage_aggs()) if n_docs else {}
        else:
            n_docs, stats = 0, {}
        os.replace(tmp_dir, final_dir)

        rec = {
            "partition_id": p,
            "num_partitions": num_partitions,
            "num_docs": int(n_docs),
            "num_spans": int(stats.get("sum(span_count)") or 0),
            "num_errors": int(stats.get("sum(has_error)") or 0),
            "total_text_len": int(stats.get("sum(text_len)") or 0),
            "wall_s": round(time.time() - t0, 3),
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        append_manifest(out_dir, rec)
        records.append(rec)
    return records


def _lineage_aggs():
    from ray.data.aggregate import Sum

    return (Sum("span_count"), Sum("text_len"), Sum("has_error"))


def with_error_flag(batch):
    import pyarrow as pa
    import pyarrow.compute as pc

    flag = pc.cast(pc.not_equal(batch.column("error"), ""), pa.int64())
    return batch.append_column("has_error", flag)


def dedup_exact(ds):
    """Idempotency backstop: first row per doc_id
    (hash-partitioned groupby; SURVEY.md §2.8)."""
    return ds.groupby("doc_id").map_groups(
        lambda g: g.head(1), batch_format="pandas")
