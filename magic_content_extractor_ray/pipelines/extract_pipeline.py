"""The flagship pipeline: interleaved docs → extracted spans table.

Ray-Data-first layout (SURVEY.md §3.4):

    read (parquet/lance, pruned columns)
      → size-aware re-blocking (generator UDF: dense byte-budgeted
        sub-batches — a dispatch-density win, see make_size_rebatcher)
      → SkewAwareExtractor pool (stateful map_batches, zero-copy Arrow;
        giant docs offloaded to dedicated raw Ray tasks — the north
        rule's explicit skew handling; a 10-20 MB forum thread must not
        straggle a bundle of 2 KB stubs)
      → optional formatter stage (text/markdown columns)
      → write partitioned parquet / consume

Nothing here materializes the full dataset; the streaming executor pipelines
blocks through every stage with backpressure.

Skew mechanics (round-4 measurements, Ray 2.49): every granularity Ray
Data offers is ROW-count based — parquet read splitting assigns ~equal
ROWS per block regardless of bytes, map generator yields are re-coalesced
into ~target_max_block_size output blocks, and actor-pool bundling
concatenates input blocks to ``batch_size`` ROWS. So N adjacent giant
documents (one crawl shard of a heavy site) always end up in ONE actor
task no matter how the upstream re-blocks — measured 80-93 s straggler
walls on 6×10-20 MB threads in every block-level configuration. The only
byte-aware boundary we can create is inside the UDF itself: the
SkewAwareExtractor offloads each over-threshold row as its OWN raw Ray
task (the documented escape hatch for semantics the Dataset API can't
express) while the small rows stream through the pool inline.
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
    """Byte-budgeted re-batching as a generator UDF: rows accumulate into
    a sub-batch until the byte budget or row cap is hit.

    HONESTY NOTE (round 4): this does NOT create task/block boundaries —
    Ray's map output buffer re-coalesces yielded tables into
    ~target_max_block_size blocks (measured: 6 one-row yields → 1 block),
    and actor bundling re-concatenates to ``batch_size`` rows anyway. Its
    measured 2.5× win (BASELINE.md) is dispatch DENSITY: sparse 64-row
    read blocks coalesce into dense byte-bounded batches, fewer per-task
    fixed costs. Giant-document isolation is done elsewhere — see
    SkewAwareExtractor's per-row offload."""

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


_GIANT_EXTRACTORS: dict = {}


def _extract_giant(table: pa.Table, strategy_override, formats) -> pa.Table:
    """Raw-task body for one offloaded giant document. The extractor is
    cached per (override, formats) per WORKER PROCESS, so repeat giants
    on a reused worker skip the ~0.25 s strategy build."""
    key = (strategy_override, tuple(formats))
    ex = _GIANT_EXTRACTORS.get(key)
    if ex is None:
        ex = _GIANT_EXTRACTORS[key] = ExtractorActor(
            strategy_override=strategy_override, formats=tuple(formats))
    return ex(table)


class SkewAwareExtractor:
    """ExtractorActor wrapper with byte-aware giant-document offload.

    Rows whose span payload exceeds ``offload_bytes`` are shipped to
    DEDICATED raw Ray tasks (one per giant — they run concurrently on
    any free slot while this actor extracts the small rows inline, then
    their outputs are collected into the same batch). Rationale: all of
    Ray Data's work-splitting is row-count based, so N adjacent giants
    otherwise serialize inside one bundle task (module docstring). The
    offload tasks request ``num_cpus=0.5`` so they can always make
    progress on the read-headroom CPUs even when the actor pool has the
    rest reserved (a full-cpu request could starve behind the pool's
    reservations while every actor blocks on its own giants).

    Deterministic: output row order is small-rows-then-giants by input
    position — a pure function of the batch, independent of scheduling.
    """

    def __init__(self, strategy_override: str | None = None,
                 formats: tuple[str, ...] = (),
                 offload_bytes: int = 800_000):
        import ray

        self.inner = ExtractorActor(strategy_override=strategy_override,
                                    formats=tuple(formats))
        self.offload_bytes = offload_bytes
        self.strategy_override = strategy_override
        self.formats = tuple(formats)
        self._remote = ray.remote(num_cpus=0.5)(_extract_giant)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        sizes = add_doc_bytes(batch).column("doc_bytes").to_numpy(
            zero_copy_only=False)
        big = sizes >= self.offload_bytes
        if not big.any():
            return self.inner(batch)
        futs = [self._remote.remote(batch.slice(int(i), 1),
                                    self.strategy_override, self.formats)
                for i in np.nonzero(big)[0]]
        outs = []
        small = batch.filter(pa.array(~big))
        if len(small):
            outs.append(self.inner(small))
        outs.extend(ray.get(futs))
        return pa.concat_tables(outs).combine_chunks()


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
                               "formats": tuple(formats),
                               "offload_bytes": large_threshold_bytes * 4},
        zero_copy_batch=True,
    )

    if size_bucket:
        # byte budget dominates: ~large_threshold×4 of payload per block
        # (≈200-500 ms of extract work), row cap only guards metadata-light
        # corpora. Fewer, byte-bounded blocks beat many tiny ones — per-task
        # dispatch costs ~10 ms. (Density only — giant isolation is the
        # SkewAwareExtractor's offload; see module docstring.)
        rebatched = docs_ds.map_batches(
            make_size_rebatcher(max_bytes=large_threshold_bytes * 4,
                                max_rows=max(256, batch_size * 4)),
            batch_format="pyarrow")
        out = rebatched.map_batches(
            SkewAwareExtractor, batch_size=batch_size,
            concurrency=concurrency, **extract_kwargs)
    else:
        # control path: no skew handling at all (A/B in BASELINE.md)
        plain_kwargs = dict(extract_kwargs)
        plain_kwargs["fn_constructor_kwargs"] = {
            "strategy_override": strategy_override,
            "formats": tuple(formats)}
        out = docs_ds.map_batches(
            ExtractorActor, batch_size=batch_size, concurrency=concurrency,
            **plain_kwargs)

    return out
