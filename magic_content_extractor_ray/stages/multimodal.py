"""Multimodal columns: opaque binary payloads + typed metadata.

Images / audio / video ride through the pipeline as ``binary`` columns with
typed metadata columns; decode / resize / feature-extract are actor-pool
``map_batches`` stages.

Decode is REAL where the stdlib allows it: PNG images decode through the
pure-zlib codec in ``functions/png.py`` and 16-bit PCM WAV audio through
``functions/audio.py`` — actual bytes→pixels/samples, no image/audio
library needed. Formats that genuinely need native libraries (JPEG, mp4,
mp3…) raise ``NotImplementedError`` at the exact point the library call
belongs, with an injection seam (``decoder=``) so PIL/ffmpeg drop in
where available; a deterministic ``fake=True`` pseudo-decode keeps the
plumbing runnable for such payloads offline.

Batch-size guidance: binary payloads are fat — keep ``batch_size`` small
(e.g. 16) and let block splitting handle the rest; metadata-only stages can
run at thousands of rows per batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.png import png_encode, png_decode, is_png
from ..functions.audio import wav_decode, is_wav, frame_rms

MEDIA_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),       # opaque encoded bytes
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def _synth_image(seed: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic compressible test image (gradient + per-channel
    phase) — vectorized, stands in for a stored original."""
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.empty((h, w, 3), dtype=np.uint8)
    for c in range(3):
        img[:, :, c] = ((xx * (1 + seed[3 + c] % 5)
                         + yy * (1 + seed[6 + c] % 7)
                         + seed[9 + c]) % 256).astype(np.uint8)
    return img


def fetch_media_stub(batch: pa.Table) -> pa.Table:
    """Deterministic 'fetch': stands in for an object-store read at the
    same pipeline position. Image payloads are REAL PNG bytes (encoded
    with the stdlib codec, dims seeded from the ref) so the downstream
    decode stage exercises an actual decode; audio payloads are real
    16-bit PCM WAV; video payloads stay opaque seeded bytes (no
    pure-stdlib video codec exists — that decode is the honest stub).
    """
    from ..functions.audio import wav_encode

    refs = batch.column("media_ref").to_pylist()
    kinds = batch.column("kind").to_pylist() if "kind" in batch.column_names \
        else ["image"] * len(refs)
    payloads, widths, heights, durs = [], [], [], []
    for ref, kind in zip(refs, kinds):
        seed = hashlib.md5((ref or "").encode()).digest()
        if kind == "image":
            w, h = 64 + seed[0] % 192, 64 + seed[1] % 192
            payloads.append(png_encode(_synth_image(seed, w, h)))
            widths.append(w)
            heights.append(h)
            durs.append(0)
        elif kind == "audio":
            dur_ms = 200 + seed[2] * 7
            rate = 8000
            n = int(rate * dur_ms / 1000)
            t = np.arange(n, dtype=np.float64)
            freq = 100.0 + seed[4] * 8
            samples = (np.sin(2 * np.pi * freq * t / rate)
                       * (8000 + seed[5] * 30)).astype(np.int16)
            payloads.append(wav_encode(samples, rate))
            widths.append(0)
            heights.append(0)
            durs.append(dur_ms)
        else:  # video: opaque bytes — no stdlib codec
            payloads.append(seed * 64)
            widths.append(0)
            heights.append(0)
            durs.append(1000 + seed[2] * 37)
    return pa.Table.from_arrays(
        [pa.array(refs), pa.array(kinds), pa.array(payloads, pa.binary()),
         pa.array(widths, pa.int32()), pa.array(heights, pa.int32()),
         pa.array(durs, pa.int32())],
        schema=MEDIA_SCHEMA)


class ImageDecoder:
    """Actor-pool decode stage: REAL PNG decode by default, with an
    INJECTABLE codec for other formats.

    Decode order per payload: an injected ``decoder`` (any callable
    ``bytes -> HxWx[C] uint8 array`` — PIL's ``np.asarray(Image.open)``,
    turbojpeg, a test codec) wins if given; else PNG payloads decode
    through the stdlib codec (functions/png.py); else ``fake=True``
    produces a deterministic pseudo-decode (keeps the plumbing runnable
    for JPEG-etc. payloads offline) and ``fake=False`` raises
    NotImplementedError at the exact point the library call belongs.
    The decoded image is nearest-resized to a fixed thumbnail so the
    output schema is constant."""

    def __init__(self, fake: bool = True, thumb: int = 8, decoder=None):
        self.fake = fake
        self.thumb = thumb
        self.decoder = decoder

    def _thumbnail(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        yi = np.linspace(0, h - 1, self.thumb).astype(int)
        xi = np.linspace(0, w - 1, self.thumb).astype(int)
        return img[yi][:, xi]

    @staticmethod
    def _to_rgb(img: np.ndarray) -> np.ndarray:
        if img.ndim == 2:
            return np.repeat(img[:, :, None], 3, axis=2)
        return img[:, :, :3]

    def _decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if self.decoder is not None:
            return self._thumbnail(self._to_rgb(
                np.asarray(self.decoder(payload), dtype=np.uint8)))
        if is_png(payload):
            return self._thumbnail(self._to_rgb(png_decode(payload)))
        if not self.fake:
            raise NotImplementedError(
                "non-PNG image decode requires an image library "
                "(PIL/libjpeg); not available in this offline container — "
                "pass decoder=")
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


class ThumbnailEncoder(ImageDecoder):
    """Actor-pool THUMBNAIL stage: real decode -> nearest-neighbor
    resize -> real PNG RE-ENCODE, both directions through the stdlib
    codec (functions/png.py) — the write path of an image-derivatives
    pipeline, not just feature extraction. Emits the re-encoded bytes'
    md5 (compact, proves byte-exact encode) plus size metadata; the
    raw thumb bytes stay out of the shuffle."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: D102
        import hashlib as _hl

        from ..functions.png import png_encode

        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()
        lens, digests, means = [], [], []
        for p, w, h in zip(payloads, widths, heights):
            img = self._decode(p or b"", w, h)
            data = png_encode(img)
            lens.append(len(data))
            digests.append(_hl.md5(data).hexdigest())
            means.append(float(img.mean()))
        out = batch.drop_columns(["payload"])
        out = out.append_column("thumb_px", pa.array(
            [self.thumb] * len(batch), pa.int64()))
        out = out.append_column("thumb_bytes", pa.array(lens, pa.int64()))
        out = out.append_column("thumb_md5", pa.array(digests,
                                                      pa.string()))
        return out.append_column("thumb_mean",
                                 pa.array(means, pa.float64()))


class ImagePHash(ImageDecoder):
    """Actor-pool PERCEPTUAL HASH stage (difference hash): real decode
    → grayscale → nearest 9×8 resize → 64-bit dHash (horizontal
    gradient sign bits). Identical images hash identically; small
    re-encodes/resizes land within a few Hamming bits — the image
    modality's analog of simhash for near-dup dedup. Emits the hash as
    hex (shuffle-friendly) plus the thumbnail mean."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: D102
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()
        hashes, means = [], []
        for p, w, h in zip(payloads, widths, heights):
            if self.decoder is not None:
                img = self._to_rgb(np.asarray(self.decoder(p or b""),
                                              dtype=np.uint8))
            elif is_png(p or b""):
                img = self._to_rgb(png_decode(p))
            elif not self.fake:
                raise NotImplementedError(
                    "non-PNG image decode requires an image library — "
                    "pass decoder=")
            else:
                rng = np.random.RandomState(int.from_bytes(
                    hashlib.md5((p or b"")[:16]).digest()[:4], "big"))
                img = rng.randint(0, 256, (16, 16, 3), np.uint8)
            gray = img.astype(np.float64).mean(axis=2)
            hh, ww = gray.shape
            yi = np.linspace(0, hh - 1, 8).astype(int)
            xi = np.linspace(0, ww - 1, 9).astype(int)
            g = gray[yi][:, xi]
            bits = (g[:, 1:] > g[:, :-1]).ravel()
            val = 0
            for b in bits:
                val = (val << 1) | int(b)
            hashes.append(f"{val:016x}")
            means.append(float(g.mean()))
        out = batch.drop_columns(["payload"])
        out = out.append_column("phash", pa.array(hashes, pa.string()))
        return out.append_column("thumb_mean",
                                 pa.array(means, pa.float64()))


class AudioFeatures:
    """Actor-pool audio feature stage: REAL WAV/PCM decode (stdlib
    ``wave``) → per-frame RMS energy features. Mirrors ImageDecoder's
    seam: an injected ``decoder`` (``bytes -> (samples, rate)``) handles
    compressed codecs; without one, non-WAV payloads raise
    NotImplementedError (``fake=False``) or produce a deterministic
    pseudo-feature (``fake=True``)."""

    def __init__(self, fake: bool = False, frame_ms: int = 25,
                 decoder=None):
        self.fake = fake
        self.frame_ms = frame_ms
        self.decoder = decoder

    def _features(self, payload: bytes) -> np.ndarray:
        if self.decoder is not None:
            samples, rate = self.decoder(payload)
            return frame_rms(np.asarray(samples), rate, self.frame_ms)
        if is_wav(payload):
            samples, rate = wav_decode(payload)
            return frame_rms(samples, rate, self.frame_ms)
        if not self.fake:
            raise NotImplementedError(
                "compressed audio decode requires ffmpeg/libsndfile; not "
                "available in this offline container — pass decoder=")
        rng = np.random.RandomState(
            int.from_bytes(hashlib.md5(payload[:16]).digest()[:4], "big"))
        return rng.rand(8).astype(np.float32) * 1000

    def __call__(self, batch: pa.Table) -> pa.Table:
        rms_all, means, peaks, counts = [], [], [], []
        for p in batch.column("payload").to_pylist():
            rms = self._features(p or b"")
            rms_all.append(rms)
            means.append(float(rms.mean()) if len(rms) else 0.0)
            peaks.append(float(rms.max()) if len(rms) else 0.0)
            counts.append(len(rms))
        out = batch.drop_columns(["payload"])
        out = out.append_column(
            "frame_rms", pa.array([r.tolist() for r in rms_all],
                                  pa.list_(pa.float32())))
        out = out.append_column("rms_mean", pa.array(means, pa.float64()))
        out = out.append_column("rms_peak", pa.array(peaks, pa.float64()))
        return out.append_column("n_frames",
                                 pa.array(counts, pa.int32()))


class AudioSpectral:
    """Actor-pool SPECTRAL feature stage: real WAV decode → numpy-rFFT
    spectral centroid / 85% rolloff / bandwidth per payload
    (functions/audio.spectral_features — no external DSP library).
    Same decoder-injection seam as AudioFeatures."""

    def __init__(self, fake: bool = False, frame: int = 1024,
                 decoder=None):
        self.fake = fake
        self.frame = frame
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.audio import spectral_features

        cents, rolls, bws, peaks, nfs = [], [], [], [], []
        for p in batch.column("payload").to_pylist():
            p = p or b""
            if self.decoder is not None:
                samples, rate = self.decoder(p)
            elif is_wav(p):
                samples, rate = wav_decode(p)
            elif not self.fake:
                raise NotImplementedError(
                    "compressed audio decode requires ffmpeg/libsndfile "
                    "— pass decoder=")
            else:
                rng = np.random.RandomState(int.from_bytes(
                    hashlib.md5(p[:16]).digest()[:4], "big"))
                samples, rate = (rng.randint(
                    -2 ** 14, 2 ** 14, 4096).astype(np.int16), 16000)
            f = spectral_features(np.asarray(samples), rate,
                                  frame=self.frame)
            cents.append(f["centroid_hz"])
            rolls.append(f["rolloff85_hz"])
            bws.append(f["bandwidth_hz"])
            peaks.append(f["peak_hz"])
            nfs.append(f["n_frames"])
        out = batch.drop_columns(["payload"])
        out = out.append_column("centroid_hz",
                                pa.array(cents, pa.float64()))
        out = out.append_column("rolloff85_hz",
                                pa.array(rolls, pa.float64()))
        out = out.append_column("bandwidth_hz",
                                pa.array(bws, pa.float64()))
        out = out.append_column("peak_hz",
                                pa.array(peaks, pa.float64()))
        return out.append_column("n_frames", pa.array(nfs, pa.int32()))


class AudioFrameSampler:
    """Frame-sample stub for VIDEO payloads (same actor-pool shape; no
    pure-stdlib video codec exists, so this one stays a declared stub)."""

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


class VideoFrameSampler:
    """Actor-pool VIDEO frame-sampling stage: every ``every``-th frame
    of a ``fps`` stream, with the decode behind an injection seam —
    ``decoder(payload) -> (n_frames, h, w, 3) uint8`` when a real codec
    is available (none exists offline: without one and with
    ``fake=False`` this raises, the honest stub), ``fake=True``
    synthesizes deterministic frames seeded from the payload so the
    Ray-side plumbing (schema, batching, actor signature, output
    layout) is real and tested. The SAMPLING SCHEDULE — n_frames =
    duration·fps//1000, indices 0, every, 2·every, … — is pure
    arithmetic on the md5-derived duration, so the driver query checks
    it against an independent SQL restatement (the audio_metadata
    idiom); frame content features stay pytest-only."""

    def __init__(self, decoder=None, fake: bool = False,
                 fps: int = 25, every: int = 5):
        self.decoder = decoder
        self.fake = fake
        self.fps = fps
        self.every = every

    def _frames(self, payload: bytes, dur_ms: int) -> np.ndarray:
        if self.decoder is not None:
            return np.asarray(self.decoder(payload), dtype=np.uint8)
        if not self.fake:
            raise NotImplementedError(
                "video decode requires ffmpeg/pyav; not available "
                "offline — pass decoder= or fake=True")
        n = dur_ms * self.fps // 1000
        rng = np.random.RandomState(int.from_bytes(
            hashlib.md5((payload or b"")[:16]).digest()[:4], "big"))
        return rng.randint(0, 256, (max(n, 0), 4, 4, 3), np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        durs = batch.column("duration_ms").to_pylist()
        nf, ns, fi, li, fm = [], [], [], [], []
        for p, d in zip(payloads, durs):
            frames = self._frames(p or b"", int(d))
            n = len(frames)
            idx = list(range(0, n, self.every))
            nf.append(n)
            ns.append(len(idx))
            fi.append(idx[0] if idx else -1)
            li.append(idx[-1] if idx else -1)
            fm.append(float(frames[idx].mean()) if idx else 0.0)
        out = batch.drop_columns(["payload"])
        out = out.append_column("n_frames", pa.array(nf, pa.int64()))
        out = out.append_column("n_sampled", pa.array(ns, pa.int64()))
        out = out.append_column("first_idx", pa.array(fi, pa.int64()))
        out = out.append_column("last_idx", pa.array(li, pa.int64()))
        return out.append_column("frame_mean",
                                 pa.array(fm, pa.float64()))


def media_pipeline(docs_extracted_ds, *, fake: bool = True,
                   batch_size: int = 16):
    """Extracted docs → media table → fetch → decode/features.

    Flatten media spans to one row per media_ref, then fetch + decode:
    image payloads are real PNGs and go through the REAL stdlib decode
    (``fake`` only governs payload formats with no stdlib codec).
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


def thumbnail_pipeline(docs_extracted_ds, *, fake: bool = True,
                       thumb: int = 16, batch_size: int = 16):
    """Extracted docs → media table → fetch → decode → resize →
    PNG re-encode (ThumbnailEncoder actor pool): the full round-trip
    image-derivative path on real codecs."""
    from ..util import actor_pool as _pool

    def flatten_media(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        kind = pc.struct_field(flat, "kind")
        ref = pc.struct_field(flat, "media_ref")
        keep = pc.and_(pc.equal(kind, "image"), pc.not_equal(ref, ""))
        return pa.table({
            "media_ref": ref.filter(keep),
            "kind": pa.array(["image"] * int(pc.sum(
                pc.cast(keep, pa.int64())).as_py() or 0), pa.string()),
        })

    media = docs_extracted_ds.select_columns(["spans"]).map_batches(
        flatten_media, batch_format="pyarrow")
    fetched = media.map_batches(fetch_media_stub, batch_format="pyarrow",
                                batch_size=batch_size)
    return fetched.map_batches(
        ThumbnailEncoder, batch_format="pyarrow", batch_size=batch_size,
        concurrency=_pool(),
        fn_constructor_kwargs={"fake": fake, "thumb": thumb})
