"""Pure-numpy WAV (RIFF PCM) codec + analytic audio features.

The reference treats media as opaque downloaded bytes (``Download.save_as``
download.py:596-616; MEDIA_EXTENSIONS common.py:45 lists .mp3/.wav among the
extensions excluded from link-crawling). The engine's training-data ambition
needs the audio column to be *decodable*, not just carried — and while no
audio codec LIBRARY ships in this container, the WAV container itself is a
public, trivially-parseable format (RIFF chunks + raw PCM), so the decode
path is implemented for real here: 16-bit and 8-bit PCM, mono or multi-
channel, chunk-walking decode (a real WAV may carry LIST/fact chunks before
``data``). Compressed codecs (mp3/ogg/flac) remain honestly stubbed at the
library call in ``operators.multimodal``.

Feature kernels are the standard public definitions:
  - RMS level of the [-1, 1] float signal (a full-period sine of amplitude
    a has RMS a/sqrt(2) — the analytic oracle used by the tests)
  - zero-crossing rate (sign changes / sample count; a tone of frequency f
    crosses 2f times per second)
  - spectral centroid via numpy rfft (magnitude-weighted mean frequency; a
    pure tone's centroid is its frequency)

All functions operate on (n_samples, n_channels) int16 arrays.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """Encode (n,) or (n, ch) int16 samples as a RIFF/WAVE PCM blob."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if bits == 16:
        payload = samples.astype("<i2").tobytes()
    elif bits == 8:
        # 8-bit WAV is unsigned, biased at 128
        payload = ((samples.astype(np.int32) >> 8) + 128).astype(np.uint8).tobytes()
    else:
        raise ValueError("only 8/16-bit PCM supported")
    block_align = ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE PCM blob -> ((n, ch) int16 array, sample_rate).

    Walks the chunk list (fmt may be followed by fact/LIST chunks before
    data); 8-bit unsigned PCM is re-biased and widened to int16.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        kind = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if kind == b"fmt ":
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif kind == b"data":
            payload = chunk
            break
    if fmt is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    codec, ch, rate, _, _, bits = fmt
    if codec != 1:
        raise ValueError(f"only PCM (format 1) supported, got {codec}")
    if bits == 16:
        arr = np.frombuffer(payload, dtype="<i2")
    elif bits == 8:
        arr = (np.frombuffer(payload, dtype=np.uint8).astype(np.int16) - 128) << 8
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    n = len(arr) // ch
    return arr[: n * ch].reshape(n, ch).astype(np.int16), rate


def synth_tone(
    freq_hz: float,
    amp: float,
    n_samples: int,
    sample_rate: int = 8000,
    n_channels: int = 1,
) -> np.ndarray:
    """Deterministic sine tone as (n, ch) int16 (no dither — bit-exact)."""
    t = np.arange(n_samples, dtype=np.float64) / sample_rate
    wave = amp * np.sin(2.0 * np.pi * freq_hz * t)
    pcm = np.round(wave * 32767.0).astype(np.int16)
    return np.repeat(pcm[:, None], n_channels, axis=1)


def rms_level(samples: np.ndarray) -> float:
    """RMS of the channel-averaged [-1, 1] float signal."""
    x = samples.astype(np.float64).mean(axis=1) / 32767.0
    return float(np.sqrt(np.mean(x * x))) if len(x) else 0.0


def zero_crossing_rate(samples: np.ndarray) -> float:
    """Sign changes per sample of the channel-averaged signal."""
    x = samples.astype(np.float64).mean(axis=1)
    if len(x) < 2:
        return 0.0
    return float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))


def spectral_centroid_hz(samples: np.ndarray, sample_rate: int) -> float:
    """Magnitude-weighted mean frequency of the rfft (pure tone -> f)."""
    x = samples.astype(np.float64).mean(axis=1)
    if len(x) == 0:
        return 0.0
    mag = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(len(x), d=1.0 / sample_rate)
    total = mag.sum()
    return float((freqs * mag).sum() / total) if total > 0 else 0.0
