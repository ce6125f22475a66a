"""Checkpointed, resumable execution with per-partition lineage.

Ray Data has task-level lineage re-execution but no job-level checkpoint
(SURVEY.md §4.2), so resumability is built at the output layout level — the
north rule's "resumable from checkpoint with per-partition lineage +
metrics":

- the input is split into ``num_partitions`` partitions of parquet
  FRAGMENTS (row groups, split by contiguous global row ranges) — each
  input byte is read by exactly one partition per run (a row group is
  shared only when a partition boundary falls inside it, i.e. at most
  ``P-1`` boundary row groups are read twice, vs the previous design's P
  full scans of the corpus),
- each partition runs as its own streaming pipeline and writes to
  ``out_dir/part=<p>/`` atomically (temp dir + rename),
- a JSONL manifest records one lineage row per completed partition:
  partition id, doc/span/error counts, wall seconds,
- resume = skip manifest-complete partitions; a crashed partial write is
  invisible (temp dir never renamed) and is redone; a completed rename
  that crashed BEFORE its manifest append is detected (final dir already
  present) and replaced, so the redo path cannot wedge on ENOTEMPTY,
- exact dedup by doc_id (``dedup_exact``) is the idempotency backstop if an
  input shard is ever double-fed across runs.

At cluster scale each partition is itself many row groups, so per-partition
streaming keeps the executor busy; partition count trades resume granularity
against scheduling overhead.
"""

from __future__ import annotations

import inspect
import json
import os
import time

import pyarrow.compute as pc


def _stable_bucket(ids, num_partitions: int):
    """Stable hash bucket of a string id array: per-row zlib.crc32 (C
    speed, process-stable). Used only by the LEGACY zero-arg-factory
    resume path (full scan + filter); the fragment-partitioned path
    (``parquet_fragment_plan``) never hashes ids."""
    import numpy as np
    import pyarrow as pa

    arr = ids.combine_chunks() if hasattr(ids, "combine_chunks") else ids
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    import zlib
    return np.fromiter(
        (zlib.crc32(v.encode()) % num_partitions for v in arr.to_pylist()),
        dtype="int64", count=len(arr))


def add_partition_column(batch, num_partitions: int):
    import pyarrow as pa

    buckets = _stable_bucket(batch.column("doc_id"), num_partitions)
    return batch.append_column("part_id", pa.array(buckets, pa.int64()))


def parquet_fragment_plan(paths, num_partitions: int) -> list[list[dict]]:
    """Assign parquet row groups to partitions by contiguous global row
    ranges. Returns per-partition lists of
    ``{path, row_group, start, end}`` (start/end are row offsets WITHIN the
    row group). A row group fully inside one partition's range is read
    whole; only boundary row groups are sliced (and re-read by the
    adjacent partition) — so a full checkpointed run reads each byte
    once, plus ≤ num_partitions-1 boundary row groups twice. The
    re-read bound is per ROW GROUP (≤ P × max_row_group_bytes total),
    independent of corpus size — the degenerate case is a corpus smaller
    than one row group, where P partitions each read that single group;
    at production scale row groups ≪ partition size and the plan is
    effectively one read per byte."""
    import pyarrow.parquet as pq

    if isinstance(paths, str):
        paths = [paths]
    rgs: list[tuple[str, int, int, int]] = []  # (path, rg, global_s, global_e)
    total = 0
    for p in paths:
        md = pq.ParquetFile(p).metadata
        for i in range(md.num_row_groups):
            n = md.row_group(i).num_rows
            rgs.append((p, i, total, total + n))
            total += n
    plan: list[list[dict]] = [[] for _ in range(num_partitions)]
    for part in range(num_partitions):
        lo = total * part // num_partitions
        hi = total * (part + 1) // num_partitions
        for (p, i, s, e) in rgs:
            a, b = max(s, lo), min(e, hi)
            if a < b:
                plan[part].append({"path": p, "row_group": i,
                                   "start": a - s, "end": b - s})
    return plan


def read_fragment_partition(frags: list[dict], columns: list[str]):
    """One partition's fragments → a Dataset; each fragment is its own
    read task (parallelism = fragments per partition)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    if not frags:
        return rd.from_items([])
    cols = list(columns)

    def load(batch: pa.Table) -> pa.Table:
        tables = []
        for path, rg, s, e in zip(batch.column("path").to_pylist(),
                                  batch.column("row_group").to_pylist(),
                                  batch.column("start").to_pylist(),
                                  batch.column("end").to_pylist()):
            t = pq.ParquetFile(path).read_row_group(rg, columns=cols)
            tables.append(t.slice(s, e - s).replace_schema_metadata(None))
        return pa.concat_tables(tables)

    return rd.from_items(frags, override_num_blocks=len(frags)).map_batches(
        load, batch_format="pyarrow", batch_size=1)


def make_fragment_table_factory(path: str, columns: list[str] | None = None,
                                transform=None):
    """Generic fragment-partitioned factory over one parquet file: reads
    only partition ``p``'s row-group fragments (all columns unless
    pruned), optionally applying ``transform(ds)``."""
    import pyarrow.parquet as pq

    if columns is None:
        columns = pq.read_schema(path).names
    plans: dict[int, list[list[dict]]] = {}

    def factory(p: int, num_partitions: int):
        if num_partitions not in plans:
            plans[num_partitions] = parquet_fragment_plan(path, num_partitions)
        ds = read_fragment_partition(plans[num_partitions][p], columns)
        return transform(ds) if transform else ds

    return factory


def make_fragment_docs_factory(sf_dir: str):
    """Partition factory for ``run_checkpointed``: reads ONLY partition
    ``p``'s row-group fragments of documents.parquet, then expands them to
    interleaved-span docs (corpus.attach_spans_batch)."""
    from ..corpus import attach_spans_batch

    path = f"{sf_dir}/documents.parquet"
    plans: dict[int, list[list[dict]]] = {}

    def factory(p: int, num_partitions: int):
        if num_partitions not in plans:
            plans[num_partitions] = parquet_fragment_plan(path, num_partitions)
        ds = read_fragment_partition(plans[num_partitions][p],
                                     ["doc_id", "text"])
        return ds.map_batches(attach_spans_batch, batch_format="pyarrow",
                              batch_size=64)

    return factory


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

    ``docs_ds_factory(p, num_partitions)`` must return partition ``p``'s
    docs Dataset (see ``make_fragment_docs_factory`` — fragment-partitioned
    input, each byte read once per run). A legacy zero-argument factory
    (full scan + doc_id-hash filter per partition — P scans; kept for
    non-parquet sources) is detected by arity and wrapped.
    Returns the lineage records of THIS run (skipped partitions excluded).
    """
    from ..pipelines.extract_pipeline import run_extract_pipeline

    takes_partition = len(
        inspect.signature(docs_ds_factory).parameters) >= 2

    def partition_ds(p: int):
        if takes_partition:
            return docs_ds_factory(p, num_partitions)
        return docs_ds_factory().map_batches(
            add_partition_column, batch_format="pyarrow",
            fn_kwargs={"num_partitions": num_partitions},
        ).filter(expr=f"part_id == {p}").drop_columns(["part_id"])

    os.makedirs(out_dir, exist_ok=True)
    done = load_manifest(out_dir)
    records = []
    for p in range(num_partitions):
        if p in done:
            continue
        t0 = time.time()
        out = run_extract_pipeline(partition_ds(p),
                                   **(pipeline_kwargs or {}))

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
        # crash-window repair: if a previous run renamed final_dir but died
        # before appending its manifest row, os.replace onto the non-empty
        # dir would raise ENOTEMPTY forever — redoing the partition is the
        # declared semantics, so drop the orphaned output first
        if os.path.exists(final_dir):
            import shutil
            shutil.rmtree(final_dir)
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


def run_incremental(
    input_paths,
    out_dir: str,
    *,
    pipeline_kwargs: dict | None = None,
    transform=None,
) -> list[dict]:
    """Incremental ingest: each input FILE is the unit of work. New files
    appearing between runs are processed; completed files (manifest-keyed
    by path) are skipped — the standard shape for a continuously-fed
    landing directory. Same atomic temp-dir + rename + JSONL-manifest
    protocol as ``run_checkpointed``; within one file the streaming
    executor parallelizes over its row groups.

    ``input_paths``: list of parquet files or a directory (scanned for
    ``*.parquet``, sorted). ``transform(ds) -> ds`` runs before the
    extract pipeline (e.g. corpus span attachment).
    Returns this run's lineage records.
    """
    import glob as _glob

    from ..pipelines.extract_pipeline import run_extract_pipeline
    from ..sources.io import read_parquet_clean

    if isinstance(input_paths, str):
        if os.path.isdir(input_paths):
            input_paths = sorted(
                _glob.glob(os.path.join(input_paths, "*.parquet")))
        else:
            input_paths = [input_paths]

    os.makedirs(out_dir, exist_ok=True)
    done = {rec.get("input_path") for rec in load_manifest(out_dir).values()
            if rec.get("input_path")}
    # the done-set, partition id AND output-dir slug are all keyed by the
    # FULL path: two inputs sharing a basename (list input from different
    # directories) must not overwrite each other's file=<slug> directory,
    # and a 32-bit hash collision must not shadow a completed file in
    # load_manifest — sha1(path) makes both effectively impossible
    import hashlib

    def _path_key(p: str) -> str:
        return hashlib.sha1(p.encode()).hexdigest()

    slugs_seen: dict[str, str] = {}
    for path in input_paths:
        slug = (os.path.splitext(os.path.basename(path))[0]
                + "-" + _path_key(path)[:8])
        if slug in slugs_seen and slugs_seen[slug] != path:
            raise ValueError(
                f"duplicate output slug {slug!r} for {path!r} and "
                f"{slugs_seen[slug]!r}")
        slugs_seen[slug] = path

    records = []
    for path in input_paths:
        if path in done:
            continue
        t0 = time.time()
        pid = int(_path_key(path)[:15], 16)
        ds = read_parquet_clean(path)
        if transform:
            ds = transform(ds)
        out = run_extract_pipeline(ds, **(pipeline_kwargs or {}))

        slug = (os.path.splitext(os.path.basename(path))[0]
                + "-" + _path_key(path)[:8])
        tmp_dir = os.path.join(out_dir, f".tmp-file-{slug}")
        final_dir = os.path.join(out_dir, f"file={slug}")
        import shutil

        if os.path.exists(tmp_dir):
            shutil.rmtree(tmp_dir)
        os.makedirs(tmp_dir, exist_ok=True)
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
        if os.path.exists(final_dir):
            shutil.rmtree(final_dir)
        os.replace(tmp_dir, final_dir)

        rec = {
            "partition_id": pid,
            "input_path": path,
            "num_docs": int(n_docs),
            "num_spans": int(stats.get("sum(span_count)") or 0),
            "num_errors": int(stats.get("sum(has_error)") or 0),
            "total_text_len": int(stats.get("sum(text_len)") or 0),
            "wall_s": round(time.time() - t0, 3),
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                          time.gmtime()),
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
