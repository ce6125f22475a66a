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


def spectral_features(samples: np.ndarray, rate: int,
                      frame: int = 1024) -> dict:
    """REAL spectral features via numpy rFFT (no external DSP library):
    per non-overlapping ``frame``-sample window compute the magnitude
    spectrum, then average over frames —
    - ``centroid_hz``: Σf·|X| / Σ|X| (brightness),
    - ``rolloff85_hz``: the frequency below which 85% of magnitude sits,
    - ``bandwidth_hz``: magnitude-weighted std around the centroid.
    Deterministic for fixed numpy; mono-mixes multi-channel first."""
    if samples.ndim > 1:
        samples = samples.mean(axis=1)
    x = samples.astype(np.float64)
    n = (len(x) // frame) * frame
    if n == 0:
        return {"centroid_hz": 0.0, "rolloff85_hz": 0.0,
                "bandwidth_hz": 0.0, "peak_hz": 0.0, "n_frames": 0}
    frames = x[:n].reshape(-1, frame)
    # Hann window: rectangular-window leakage (~1/df sidelobes) biases
    # the magnitude-weighted centroid up by hundreds of Hz on pure
    # low-frequency tones; Hann's -31 dB sidelobes keep the centroid
    # within a few bins of the true peak
    frames = frames * np.hanning(frame)
    mag = np.abs(np.fft.rfft(frames, axis=1))
    freqs = np.fft.rfftfreq(frame, d=1.0 / rate)
    tot = mag.sum(axis=1)
    ok = tot > 0
    cent = np.zeros(len(frames))
    cent[ok] = (mag[ok] * freqs).sum(axis=1) / tot[ok]
    cum = np.cumsum(mag, axis=1)
    roll_idx = np.argmax(cum >= 0.85 * tot[:, None], axis=1)
    roll = freqs[roll_idx]
    bw = np.zeros(len(frames))
    bw[ok] = np.sqrt((mag[ok] * (freqs[None, :]
                                 - cent[ok, None]) ** 2).sum(axis=1)
                     / tot[ok])
    peak = freqs[np.argmax(mag, axis=1)]
    return {"centroid_hz": float(cent.mean()),
            "rolloff85_hz": float(roll.mean()),
            "bandwidth_hz": float(bw.mean()),
            "peak_hz": float(peak.mean()),
            "n_frames": int(len(frames))}
