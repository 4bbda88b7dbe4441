"""Pure-numpy YUV4MPEG2 (.y4m) codec + deterministic synthetic video.

Same rationale as ``sources.audio``: the reference carries media as opaque
bytes (download.py:596-616; MEDIA_EXTENSIONS common.py:45 includes .avi/
.mpg), and while no video codec LIBRARY ships in this container, YUV4MPEG2
is a public uncompressed container (the format mjpegtools/ffmpeg use for
raw pipes) that is trivially parseable: an ASCII header line
``YUV4MPEG2 W<w> H<h> F<num>:<den> ... [C<fmt>]`` followed by frames of
``FRAME\\n`` + raw planar YUV. Decode/encode are implemented for real for
C444 (full-resolution planes) and C420 (2x2-subsampled chroma, the y4m
default when no C tag is present); compressed codecs (h264/vp9) remain
honestly stubbed at the library call in ``operators.multimodal``.

Color transform is BT.601 full-range (the public JPEG/JFIF matrix), uint8
with round-to-nearest — a constant-color frame round-trips within +/-1 per
channel, which is what the analytic oracles test against.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def rgb_to_yuv(rgb: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 RGB -> uint8 YUV (BT.601 full range)."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(np.rint(np.stack([y, u, v], axis=-1)), 0, 255).astype(np.uint8)


def yuv_to_rgb(yuv: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 YUV -> uint8 RGB (inverse BT.601 full range)."""
    y = yuv[..., 0].astype(np.float64)
    u = yuv[..., 1].astype(np.float64) - 128.0
    v = yuv[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1), chroma: str = "444") -> bytes:
    """Encode (n, h, w, 3) uint8 RGB frames as a YUV4MPEG2 stream."""
    n, h, w, _ = frames.shape
    if chroma not in ("444", "420"):
        raise ValueError("only C444/C420 supported")
    if chroma == "420" and (h % 2 or w % 2):
        raise ValueError("C420 needs even dimensions")
    header = b"%s W%d H%d F%d:%d Ip A1:1 C%s\n" % (
        _MAGIC, w, h, fps[0], fps[1], chroma.encode()
    )
    parts = [header]
    for i in range(n):
        yuv = rgb_to_yuv(frames[i])
        parts.append(b"FRAME\n")
        parts.append(yuv[..., 0].tobytes())
        if chroma == "444":
            parts.append(yuv[..., 1].tobytes())
            parts.append(yuv[..., 2].tobytes())
        else:
            # 2x2 box-mean subsample, round-to-nearest
            for c in (1, 2):
                p = yuv[..., c].astype(np.uint16)
                sub = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2] + 2) >> 2
                parts.append(sub.astype(np.uint8).tobytes())
    return b"".join(parts)


def decode_y4m(data: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """Decode a YUV4MPEG2 stream -> ((n, h, w, 3) uint8 RGB, (fps_num, fps_den))."""
    nl = data.index(b"\n")
    fields = data[:nl].split(b" ")
    if fields[0] != _MAGIC:
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps = (25, 1)
    chroma = "420"  # the y4m default when no C tag is present
    for f in fields[1:]:
        if f.startswith(b"W"):
            w = int(f[1:])
        elif f.startswith(b"H"):
            h = int(f[1:])
        elif f.startswith(b"F"):
            num, den = f[1:].split(b":")
            fps = (int(num), int(den))
        elif f.startswith(b"C"):
            chroma = f[1:].decode().rstrip()
    if w is None or h is None:
        raise ValueError("missing W/H in y4m header")
    if chroma.startswith("444"):
        plane_sizes = (h * w, h * w, h * w)
    elif chroma.startswith("420"):
        plane_sizes = (h * w, (h // 2) * (w // 2), (h // 2) * (w // 2))
    else:
        raise ValueError(f"unsupported chroma {chroma}")
    frames = []
    pos = nl + 1
    while pos < len(data):
        fr_nl = data.index(b"\n", pos)
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed frame header")
        pos = fr_nl + 1
        planes = []
        for size in plane_sizes:
            planes.append(np.frombuffer(data[pos : pos + size], dtype=np.uint8))
            pos += size
        y = planes[0].reshape(h, w)
        if chroma.startswith("444"):
            u = planes[1].reshape(h, w)
            v = planes[2].reshape(h, w)
        else:
            u = planes[1].reshape(h // 2, w // 2).repeat(2, 0).repeat(2, 1)
            v = planes[2].reshape(h // 2, w // 2).repeat(2, 0).repeat(2, 1)
        frames.append(yuv_to_rgb(np.stack([y, u, v], axis=-1)))
    return np.stack(frames) if frames else np.zeros((0, h, w, 3), np.uint8), fps


def synth_flat_frames(video_id: int, n_frames: int, w: int = 32, h: int = 24) -> np.ndarray:
    """Deterministic constant-color frames whose RGB is plain arithmetic in
    (video_id, frame_idx) — so a SQL oracle can re-derive each frame's
    expected color (and hence mean luma) without decoding anything:
        r = (video_id * 37 + idx * 11) % 256
        g = (video_id * 59 + idx * 23) % 256
        b = (video_id * 83 + idx * 41) % 256
    """
    frames = np.empty((n_frames, h, w, 3), dtype=np.uint8)
    for i in range(n_frames):
        frames[i, :, :, 0] = (video_id * 37 + i * 11) % 256
        frames[i, :, :, 1] = (video_id * 59 + i * 23) % 256
        frames[i, :, :, 2] = (video_id * 83 + i * 41) % 256
    return frames
