"""Pure-stdlib WAV/PCM codec (``wave`` + numpy) — real audio decode.

No ffmpeg in the container, but 16-bit PCM WAV needs only the stdlib
``wave`` module: enough for a REAL bytes→samples decode path so the
audio feature stage computes actual signal features (per-frame RMS)
instead of stub offsets. Compressed codecs (mp3/aac/opus) are out of
scope and raise ``ValueError`` so callers can fall back to an injected
decoder where one exists.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def is_wav(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def wav_encode(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode int16 mono/stereo samples → WAV bytes.

    ``samples``: shape (n,) mono or (n, ch).
    """
    samples = np.asarray(samples, dtype=np.int16)
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(ch)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(np.ascontiguousarray(samples).tobytes())
    return buf.getvalue()


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode WAV bytes → (int16 samples of shape (n,) or (n, ch), rate)."""
    if not is_wav(payload):
        raise ValueError("not a RIFF/WAVE payload")
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError(
                f"only 16-bit PCM supported, got width {wf.getsampwidth()}")
        ch = wf.getnchannels()
        rate = wf.getframerate()
        data = wf.readframes(wf.getnframes())
    samples = np.frombuffer(data, dtype=np.int16)
    if ch > 1:
        samples = samples.reshape(-1, ch)
    return samples, rate


def frame_rms(samples: np.ndarray, rate: int,
              frame_ms: int = 25) -> np.ndarray:
    """Per-frame RMS energy (float32), the standard VAD/quality feature.

    Vectorized: trailing partial frame is dropped.
    """
    mono = samples.astype(np.float64)
    if mono.ndim > 1:
        mono = mono.mean(axis=1)
    step = max(1, int(rate * frame_ms / 1000))
    n = (len(mono) // step) * step
    if n == 0:
        return np.zeros(0, dtype=np.float32)
    frames = mono[:n].reshape(-1, step)
    return np.sqrt((frames ** 2).mean(axis=1)).astype(np.float32)
