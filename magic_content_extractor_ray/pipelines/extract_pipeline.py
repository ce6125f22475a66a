"""The flagship pipeline: interleaved docs → extracted spans table.

Ray-Data-first layout (SURVEY.md §3.4):

    read (parquet/lance, pruned columns)
      → size-aware re-blocking (generator UDF: byte-budgeted sub-batches,
        giant docs isolated into their own blocks — the north rule's
        explicit skew handling; a 10 MB forum thread must not straggle a
        block of 2 KB stubs)
      → ExtractorActor pool (stateful map_batches, zero-copy Arrow)
      → optional formatter stage (text/markdown columns)
      → write partitioned parquet / consume

Nothing here materializes the full dataset; the streaming executor pipelines
blocks through every stage with backpressure.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.extract import ExtractorActor
from ..functions.format import spans_to_text, spans_to_markdown


def add_doc_bytes(batch: pa.Table) -> pa.Table:
    """Vectorized: doc_bytes = Σ len(span.text) + len(span.media_ref)."""
    spans = batch.column("spans")
    if spans.num_chunks == 0:
        return batch.append_column("doc_bytes", pa.array([], pa.int64()))
    def _lens(arr) -> np.ndarray:
        # all-null blocks surface as null-typed arrays; treat as length 0
        if pa.types.is_null(arr.type):
            return np.zeros(len(arr))
        return pc.utf8_length(arr).to_numpy(zero_copy_only=False)

    sizes = []
    for chunk in spans.chunks:
        value_type = chunk.type.value_type if \
            pa.types.is_list(chunk.type) else None
        if value_type is None or not pa.types.is_struct(value_type):
            sizes.append(np.zeros(len(chunk)))
            continue
        flat = pc.list_flatten(chunk)
        tl = _lens(pc.struct_field(flat, "text"))
        ml = _lens(pc.struct_field(flat, "media_ref"))
        cs = np.concatenate([[0], np.cumsum(
            np.nan_to_num(tl) + np.nan_to_num(ml))])
        offs = chunk.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]
        sizes.append(cs[offs[1:]] - cs[offs[:-1]])
    return batch.append_column(
        "doc_bytes", pa.array(np.concatenate(sizes).astype("int64")))


def make_size_rebatcher(max_bytes: int = 2_000_000, max_rows: int = 64):
    """Size-bucketed re-blocking as a generator UDF: rows accumulate into a
    sub-batch until the byte budget is hit; a giant doc gets a block of its
    own. Each yielded table becomes its OWN block downstream, so extract
    tasks have bounded work regardless of document skew — the explicit skew
    handling the north rule calls for, without a branch/union double-pass
    (measured 3× slower) or an all-to-all repartition."""

    def rebatch(batch: pa.Table):
        batch = add_doc_bytes(batch)
        sizes = batch.column("doc_bytes").to_numpy(zero_copy_only=False)
        batch = batch.drop_columns(["doc_bytes"])
        start, acc = 0, 0
        for i, sz in enumerate(sizes):
            rows = i - start
            if rows > 0 and (acc + sz > max_bytes or rows >= max_rows):
                yield batch.slice(start, rows)
                start, acc = i, 0
            acc += sz
        if start < len(sizes):
            yield batch.slice(start, len(sizes) - start)

    return rebatch


def format_spans_batch(batch: pa.Table,
                       formats: tuple[str, ...] = ("text",)) -> pa.Table:
    """Standalone formatter over an extracted spans table (route.ts format
    switch) — for formatting PERSISTED extraction output. The flagship
    pipeline formats inside ExtractorActor instead (the spans' parsed
    nodes are still in memory there; re-parsing here costs ~2×)."""
    spans = batch.column("spans").to_pylist()
    if "text" in formats:
        batch = batch.append_column(
            "text_out", pa.array([spans_to_text(s) for s in spans],
                                 pa.string()))
    if "markdown" in formats:
        batch = batch.append_column(
            "markdown", pa.array([spans_to_markdown(s) for s in spans],
                                 pa.string()))
    return batch


def run_extract_pipeline(
    docs_ds,
    *,
    batch_size: int = 64,
    concurrency=None,
    num_cpus: float = 1,
    size_bucket: bool = True,
    large_threshold_bytes: int = 200_000,
    large_batch_size: int = 4,
    formats: tuple[str, ...] = (),
    strategy_override: str | None = None,
):
    """docs Dataset → extracted Dataset (lazy; caller consumes).

    Pool sizing: an autoscaling ``(1, k)`` pool with k = cluster CPUs − 1 so
    the pool can never reserve every CPU — a pool whose minimum equals the
    cluster size starves the upstream read/generate tasks and the pipeline
    stalls (observed at num_cpus=4 with two min-2 pools).
    """
    import ray

    total_cpus = int(ray.cluster_resources().get("CPU", 8)) if \
        ray.is_initialized() else 8
    if concurrency is None:
        slots = max(2, int(total_cpus / max(1, num_cpus)) - 1)
        concurrency = (1, slots)

    extract_kwargs = dict(
        batch_format="pyarrow",
        num_cpus=num_cpus,
        fn_constructor_kwargs={"strategy_override": strategy_override,
                               "formats": tuple(formats)},
        zero_copy_batch=True,
    )

    if size_bucket:
        # byte budget dominates: ~large_threshold×4 of payload per block
        # (≈200-500 ms of extract work), row cap only guards metadata-light
        # corpora. Fewer, byte-bounded blocks beat many tiny ones — per-task
        # dispatch costs ~10 ms.
        rebatched = docs_ds.map_batches(
            make_size_rebatcher(max_bytes=large_threshold_bytes * 4,
                                max_rows=max(256, batch_size * 4)),
            batch_format="pyarrow")
        out = rebatched.map_batches(
            ExtractorActor, batch_size=batch_size, concurrency=concurrency,
            **extract_kwargs)
    else:
        out = docs_ds.map_batches(
            ExtractorActor, batch_size=batch_size, concurrency=concurrency,
            **extract_kwargs)

    return out
