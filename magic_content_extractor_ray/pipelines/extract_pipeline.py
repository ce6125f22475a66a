"""The flagship pipeline: interleaved docs → extracted spans table.

Ray-Data-first layout (SURVEY.md §3.4):

    read (parquet/lance, pruned columns)
      → doc_bytes sizing (stateless, vectorized pyarrow)
      → size-bucketed split: small docs in large batches, giant docs in
        tiny batches (the north rule's explicit skew handling; a 10 MB
        forum thread must not straggle a batch of 2 KB stubs)
      → ExtractorActor pool (stateful map_batches, zero-copy Arrow)
      → union → optional formatter stage (text/markdown columns)
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
    sizes = []
    for chunk in spans.chunks:
        flat = pc.list_flatten(chunk)
        tl = pc.utf8_length(pc.struct_field(flat, "text")).to_numpy(
            zero_copy_only=False)
        ml = pc.utf8_length(pc.struct_field(flat, "media_ref")).to_numpy(
            zero_copy_only=False)
        cs = np.concatenate([[0], np.cumsum(
            np.nan_to_num(tl) + np.nan_to_num(ml))])
        offs = chunk.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]
        sizes.append(cs[offs[1:]] - cs[offs[:-1]])
    return batch.append_column(
        "doc_bytes", pa.array(np.concatenate(sizes).astype("int64")))


class _Formatter:
    """Stateless formatter stage (route.ts format switch)."""

    def __init__(self, formats: tuple[str, ...]):
        self.formats = formats

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans = batch.column("spans").to_pylist()
        if "text" in self.formats:
            batch = batch.append_column(
                "text_out", pa.array([spans_to_text(s) for s in spans],
                                     pa.string()))
        if "markdown" in self.formats:
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

    Pool sizing: autoscaling ``(1, k)`` pools sized off the cluster CPU count
    so the pools' MIN footprint never reserves every CPU — a pool whose
    minimum equals the cluster size starves the upstream read/generate tasks
    and the pipeline stalls (observed at num_cpus=4 with two min-2 pools).
    The large-doc bucket gets a small dedicated pool with tiny batches so one
    10 MB doc cannot straggle a 64-doc batch.
    """
    import ray

    total_cpus = int(ray.cluster_resources().get("CPU", 8)) if \
        ray.is_initialized() else 8
    if concurrency is None:
        concurrency = (1, max(2, int(total_cpus / max(1, num_cpus)) - 1))
    large_concurrency = (1, max(1, min(4, total_cpus // 4)))

    extract_kwargs = dict(
        batch_format="pyarrow",
        num_cpus=num_cpus,
        fn_constructor_kwargs={"strategy_override": strategy_override},
        zero_copy_batch=True,
    )

    if size_bucket:
        sized = docs_ds.map_batches(add_doc_bytes, batch_format="pyarrow")
        small = sized.filter(
            expr=f"doc_bytes <= {large_threshold_bytes}").drop_columns(
                ["doc_bytes"])
        large = sized.filter(
            expr=f"doc_bytes > {large_threshold_bytes}").drop_columns(
                ["doc_bytes"])
        out_small = small.map_batches(
            ExtractorActor, batch_size=batch_size, concurrency=concurrency,
            **extract_kwargs)
        out_large = large.map_batches(
            ExtractorActor, batch_size=large_batch_size,
            concurrency=large_concurrency, **extract_kwargs)
        out = out_small.union(out_large)
    else:
        out = docs_ds.map_batches(
            ExtractorActor, batch_size=batch_size, concurrency=concurrency,
            **extract_kwargs)

    if formats:
        out = out.map_batches(
            _Formatter, batch_format="pyarrow",
            fn_constructor_kwargs={"formats": tuple(formats)},
            concurrency=(1, 4))
    return out
