"""Multimodal columns: opaque binary payloads + typed metadata.

Images / audio / video ride through the pipeline as ``binary`` columns with
typed metadata columns; decode / resize / feature-extract are actor-pool
``map_batches`` stages. The decode libraries (PIL/ffmpeg/etc.) are NOT in
this container, so decoding is a clearly-marked stub with a deterministic
fake behind a flag — the Ray-side plumbing (schema, batch sizing, actor
signature, output layout) is real and tested.

Batch-size guidance: binary payloads are fat — keep ``batch_size`` small
(e.g. 16) and let block splitting handle the rest; metadata-only stages can
run at thousands of rows per batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),       # opaque encoded bytes
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def fetch_media_stub(batch: pa.Table) -> pa.Table:
    """Deterministic fake 'fetch': payload = seeded bytes from media_ref.

    Stands in for an object-store read at the same pipeline position.
    """
    refs = batch.column("media_ref").to_pylist()
    kinds = batch.column("kind").to_pylist() if "kind" in batch.column_names \
        else ["image"] * len(refs)
    payloads, widths, heights, durs = [], [], [], []
    for ref, kind in zip(refs, kinds):
        seed = hashlib.md5((ref or "").encode()).digest()
        payloads.append(seed * 64)  # 1 KiB deterministic fake payload
        widths.append(64 + seed[0] % 192 if kind == "image" else 0)
        heights.append(64 + seed[1] % 192 if kind == "image" else 0)
        durs.append(1000 + seed[2] * 37 if kind != "image" else 0)
    return pa.Table.from_arrays(
        [pa.array(refs), pa.array(kinds), pa.array(payloads, pa.binary()),
         pa.array(widths, pa.int32()), pa.array(heights, pa.int32()),
         pa.array(durs, pa.int32())],
        schema=MEDIA_SCHEMA)


class ImageDecoder:
    """Actor-pool decode stage with an INJECTABLE codec.

    ``decoder`` is any callable ``bytes -> HxWx3 uint8 array`` (PIL's
    ``np.asarray(Image.open(...))``, turbojpeg, or a test codec); the
    decoded image is nearest-resized to a fixed thumbnail so the output
    schema is constant. Only the codec itself is environment-gated:
    without one, ``fake=True`` produces a deterministic pseudo-decode so
    the plumbing (actor pool, batch shapes, output schema) still runs
    end-to-end, and ``fake=False`` raises NotImplementedError at the exact
    point the library call belongs."""

    def __init__(self, fake: bool = True, thumb: int = 8, decoder=None):
        self.fake = fake
        self.thumb = thumb
        self.decoder = decoder

    def _thumbnail(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        yi = np.linspace(0, h - 1, self.thumb).astype(int)
        xi = np.linspace(0, w - 1, self.thumb).astype(int)
        return img[yi][:, xi]

    def _decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if self.decoder is not None:
            return self._thumbnail(
                np.asarray(self.decoder(payload), dtype=np.uint8))
        if not self.fake:
            raise NotImplementedError(
                "image decode requires an image library (PIL/libjpeg); "
                "not available in this offline container — pass decoder=")
        rng = np.random.RandomState(
            int.from_bytes(hashlib.md5(payload[:16]).digest()[:4], "big"))
        return rng.randint(0, 256, size=(self.thumb, self.thumb, 3),
                           dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()
        feats, means = [], []
        for p, w, h in zip(payloads, widths, heights):
            img = self._decode(p or b"", w, h)
            feats.append(img.astype(np.float32).ravel() / 255.0)
            means.append(float(img.mean()))
        dim = self.thumb * self.thumb * 3
        feat_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(feats) if feats else
                     np.zeros(0, np.float32), pa.float32()), dim)
        out = batch.drop_columns(["payload"])
        out = out.append_column("feature", feat_arr)
        return out.append_column("pixel_mean", pa.array(means, pa.float64()))


class AudioFrameSampler:
    """Frame-sample stub for audio/video payloads (same actor-pool shape)."""

    def __init__(self, fake: bool = True, n_frames: int = 4):
        self.fake = fake
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "audio/video decode requires ffmpeg; not available offline")
        durs = batch.column("duration_ms").to_pylist()
        offsets = [
            [int(d * i / self.n_frames) for i in range(self.n_frames)]
            for d in durs]
        return batch.append_column(
            "frame_offsets_ms", pa.array(offsets, pa.list_(pa.int32())))


def media_pipeline(docs_extracted_ds, *, fake: bool = True,
                   batch_size: int = 16):
    """Extracted docs → media table → fetch → decode/features.

    Flatten media spans to one row per media_ref, then run the stub decode
    stages; demonstrates the image/audio actor-pool layout end-to-end.
    """
    def flatten_media(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        kind = pc.struct_field(flat, "kind")
        ref = pc.struct_field(flat, "media_ref")
        keep = pc.and_(pc.not_equal(kind, "text"), pc.not_equal(ref, ""))
        kind = kind.filter(keep)
        ref = ref.filter(keep)
        return pa.table({
            "media_ref": ref,
            "kind": pc.if_else(pc.equal(kind, "image"),
                               pa.scalar("image"), pa.scalar("video")),
        })

    from ..util import actor_pool as _pool

    media = docs_extracted_ds.select_columns(["spans"]).map_batches(
        flatten_media, batch_format="pyarrow")
    fetched = media.map_batches(fetch_media_stub, batch_format="pyarrow",
                                batch_size=batch_size)
    images = fetched.filter(expr="kind == 'image'")
    decoded = images.map_batches(
        ImageDecoder, batch_format="pyarrow", batch_size=batch_size,
        concurrency=_pool(), fn_constructor_kwargs={"fake": fake})
    return decoded
