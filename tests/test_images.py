"""Image codec invariants: lossless round-trip allclose, lossy PSNR >= 40 dB
(BASELINE.json input_hint per-row invariants)."""

import numpy as np
import pytest

from webscraping_spark.sources import images


@pytest.fixture(scope="module")
def pixels():
    return images.synth_pixels("img-0001", w=64, h=48)


@pytest.mark.parametrize("fmt", sorted(images.LOSSLESS_FORMATS))
def test_lossless_roundtrip(pixels, fmt):
    if fmt == "gif":
        # gif is lossless only within a <=256-color palette (the encoder
        # refuses to quantize, images.py LOSSLESS_FORMATS note) — palettize
        # the fixture to 6 levels/channel (<=216 distinct colors).
        pixels = (pixels // 43) * 43
    data = images.encode_image(pixels, fmt)
    decoded = images.decode_image(data, fmt)
    assert decoded.shape == pixels.shape
    assert np.array_equal(decoded, pixels)  # exact allclose for lossless


def test_lossy_psnr_gate(pixels):
    data = images.encode_image(pixels, "qnt")
    decoded = images.decode_image(data, "qnt")
    assert decoded.shape == pixels.shape
    assert images.psnr(pixels, decoded) >= 40.0
    assert not np.array_equal(decoded, pixels)  # actually lossy


def test_png_all_filter_types_decode():
    """Our decoder must handle filters 1-4 (foreign encoders use them)."""
    import struct, zlib

    pix = images.synth_pixels("filters", 16, 5)
    h, w, _ = pix.shape
    stride = w * 3
    flat = pix.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        line = flat[y]
        enc = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = line[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (line[x] - pred) & 0xFF
        raw.append(ftype)
        raw.extend(enc.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(kind, payload):
        d = kind + payload
        return struct.pack(">I", len(payload)) + d + struct.pack(">I", zlib.crc32(d))

    png = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    assert np.array_equal(images.decode_png(png), pix)


def test_average_hash_stability(pixels):
    h1 = images.average_hash(pixels)
    # lossless round trip: identical hash
    rt = images.decode_image(images.encode_image(pixels, "png"), "png")
    assert images.average_hash(rt) == h1
    # lossy round trip: small Hamming distance
    lossy = images.decode_image(images.encode_image(pixels, "qnt"), "qnt")
    h2 = images.average_hash(lossy)
    assert bin((h1 ^ h2) & (2**64 - 1)).count("1") <= 4
    # signed-64 range (Spark LongType)
    assert -(2**63) <= h1 < 2**63


def test_synth_determinism():
    a = images.synth_pixels("x", 32, 32)
    b = images.synth_pixels("x", 32, 32)
    c = images.synth_pixels("y", 32, 32)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
