"""Baseline JPEG codec invariants (sources/jpeg.py, ITU-T T.81).

The lossy-format contract is BASELINE.json input_hint's per-row
invariant: decoded pixels within PSNR >= 40 dB of the source. White-noise
imagery (synth_pixels) is the adversarial case for a DCT codec — its
spectrum is flat, so every quantization bin contributes error — which is
exactly why the gate is tested on it and not only on the photo-like
low-frequency generator.
"""

import numpy as np
import pytest

from webscraping_spark.sources import images, jpeg


@pytest.mark.parametrize("w,h", [(16, 16), (17, 23), (64, 48), (128, 64), (33, 1), (1, 9)])
@pytest.mark.parametrize("gen", ["noise", "smooth"])
def test_roundtrip_psnr_gate(gen, w, h):
    """Default-quality 4:4:4 round trips clear 40 dB on every shape,
    including non-multiple-of-8 dims (edge-replicated padding)."""
    make = images.synth_pixels if gen == "noise" else images.synth_smooth_pixels
    px = make(f"jpg-{gen}-{w}x{h}", w, h)
    data = jpeg.encode_jpeg(px)
    decoded = jpeg.decode_jpeg(data)
    assert decoded.shape == (h, w, 3)
    assert images.psnr(px, decoded) >= 40.0


def test_registered_as_lossy_format():
    """The images.py dispatch treats "jpeg" as a first-class lossy codec."""
    px = images.synth_pixels("jpg-disp", 32, 24)
    data = images.encode_image(px, "jpeg")
    decoded = images.decode_image(data, "jpeg")
    assert "jpeg" in images.LOSSY_FORMATS
    assert images.psnr(px, decoded) >= 40.0
    assert not np.array_equal(decoded, px)  # actually lossy


def test_stream_structure():
    """SOI first, EOI last, and the mandatory baseline markers present in
    order (APP0-JFIF, DQT, SOF0, DHT, SOS)."""
    data = jpeg.encode_jpeg(images.synth_pixels("jpg-markers", 24, 24))
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    for marker in (b"\xff\xe0JFIF\x00"[:2], b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in data
    assert data[2:4] == b"\xff\xe0" and data[6:11] == b"JFIF\x00"


def test_quality_tradeoff():
    """Higher quality -> larger stream and higher PSNR, monotonically."""
    px = images.synth_smooth_pixels("jpg-q", 64, 64)
    sizes, psnrs = [], []
    for q in (20, 50, 80, 98):
        data = jpeg.encode_jpeg(px, quality=q)
        sizes.append(len(data))
        psnrs.append(images.psnr(px, jpeg.decode_jpeg(data)))
    assert sizes == sorted(sizes)
    assert psnrs == sorted(psnrs)


def test_420_subsampling_roundtrip():
    """4:2:0 streams (the common web layout) decode to the right shape;
    chroma is quartered so fidelity drops but luma structure survives."""
    px = images.synth_smooth_pixels("jpg-420", 80, 72)
    data = jpeg.encode_jpeg(px, subsample=True)
    decoded = jpeg.decode_jpeg(data)
    assert decoded.shape == (72, 80, 3)
    assert images.psnr(px, decoded) >= 28.0
    # subsampling must actually shrink the stream vs 4:4:4 at equal quality
    assert len(data) < len(jpeg.encode_jpeg(px))
    # odd (non-multiple-of-16) dims take the padded-MCU path
    px_odd = images.synth_smooth_pixels("jpg-420-odd", 37, 29)
    dec_odd = jpeg.decode_jpeg(jpeg.encode_jpeg(px_odd, subsample=True))
    assert dec_odd.shape == (29, 37, 3)


def test_grayscale_stream():
    """1-component streams decode to replicated channels matching luma."""
    px = images.synth_smooth_pixels("jpg-gray", 48, 40)
    decoded = jpeg.decode_jpeg(jpeg.encode_jpeg(px, grayscale=True))
    assert decoded.shape == (40, 48, 3)
    assert np.array_equal(decoded[:, :, 0], decoded[:, :, 1])
    assert np.array_equal(decoded[:, :, 0], decoded[:, :, 2])
    gray = np.clip(
        np.round(px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])), 0, 255
    )
    assert np.abs(decoded[:, :, 0].astype(np.float64) - gray).max() <= 16.0


@pytest.mark.parametrize("subsample", [False, True])
def test_restart_markers_roundtrip(subsample):
    """DRI/RSTn streams decode bit-identically to the same image without
    restarts (restart points only resynchronize; they change no math)."""
    px = images.synth_pixels("jpg-rst", 56, 48)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(px, subsample=subsample))
    for interval in (1, 3):
        data = jpeg.encode_jpeg(px, subsample=subsample, restart_interval=interval)
        assert b"\xff\xdd" in data  # DRI present
        assert np.array_equal(jpeg.decode_jpeg(data), base)


def test_byte_stuffing_roundtrip():
    """Entropy segments containing 0xFF bytes must be stuffed/unstuffed
    transparently; near-black imagery makes long runs that hit the case."""
    px = np.zeros((32, 32, 3), dtype=np.uint8)
    px[::2, ::2] = 255  # checkerboard: high-frequency energy, many FF-prone codes
    data = jpeg.encode_jpeg(px, quality=90)
    decoded = jpeg.decode_jpeg(data)
    assert decoded.shape == (32, 32, 3)
    assert images.psnr(px, decoded) >= 25.0


def test_average_hash_survives_jpeg():
    """The verify_images lossy contract: re-derived phash within a small
    Hamming band of the source-pixel hash."""
    px = images.synth_pixels("jpg-hash", 64, 64)
    decoded = images.decode_image(images.encode_image(px, "jpeg"), "jpeg")
    ham = bin(
        (images.average_hash(px) ^ images.average_hash(decoded)) & (2**64 - 1)
    ).count("1")
    assert ham <= 4


def test_rejects_non_baseline():
    """Progressive (SOF2) and non-JPEG payloads raise, not mis-decode."""
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"\x89PNG\r\n\x1a\nnot a jpeg")
    data = bytearray(jpeg.encode_jpeg(images.synth_pixels("jpg-sof2", 16, 16)))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(bytes(data))


def test_decoder_accepts_unknown_app_segments():
    """Real-world files carry APPn/COM segments (EXIF, XMP, comments);
    the decoder must skip them."""
    px = images.synth_pixels("jpg-app", 24, 16)
    data = jpeg.encode_jpeg(px)
    exif = b"\xff\xe1" + (len(b"Exif\x00\x00fake") + 2).to_bytes(2, "big") + b"Exif\x00\x00fake"
    com = b"\xff\xfe" + (9 + 2).to_bytes(2, "big") + b"a comment"
    spliced = data[:2] + exif + com + data[2:]
    assert np.array_equal(jpeg.decode_jpeg(spliced), jpeg.decode_jpeg(data))


def test_dc_differential_across_blocks():
    """A smooth horizontal gradient exercises DC prediction chains: every
    block's DC differs slightly from its predecessor."""
    grad = np.tile(np.linspace(0, 255, 128, dtype=np.uint8)[None, :, None], (16, 1, 3))
    decoded = jpeg.decode_jpeg(jpeg.encode_jpeg(grad))
    assert images.psnr(grad, decoded) >= 40.0
    # gradient direction preserved
    means = decoded.astype(np.float64).mean(axis=(0, 2))
    assert means[-1] - means[0] > 200.0


# ------------------------------------------------------------------- EXIF


_EXIF_FULL = {
    "make": "AcmeCam",
    "model": "X100 Mark II",
    "software": "ws-engine",
    "description": "a planted test image",
    "datetime": "2024:03:15 12:34:56",
    "orientation": 6,
    "exif_w": 24,
    "exif_h": 16,
}


@pytest.mark.parametrize("little_endian", [False, True])
def test_exif_roundtrip_both_byte_orders(little_endian):
    """APP1/TIFF metadata survives encode -> parse in II and MM order,
    and the segment does not disturb pixel decode."""
    px = images.synth_pixels("jpg-exif", 24, 16)
    data = jpeg.encode_jpeg(px, exif=_EXIF_FULL, exif_little_endian=little_endian)
    assert jpeg.parse_exif(data) == _EXIF_FULL
    assert images.psnr(px, jpeg.decode_jpeg(data)) >= 40.0


def test_exif_inline_ascii_and_partial_dicts():
    """Strings <= 4 bytes (incl. NUL) take TIFF's inline-value layout;
    omitted keys simply don't appear."""
    px = images.synth_pixels("jpg-exif2", 16, 16)
    meta = {"make": "abc", "orientation": 1}
    assert jpeg.parse_exif(jpeg.encode_jpeg(px, exif=meta)) == meta


def test_exif_absent_and_invalid():
    px = images.synth_pixels("jpg-exif3", 16, 16)
    assert jpeg.parse_exif(jpeg.encode_jpeg(px)) == {}
    with pytest.raises(ValueError):
        jpeg.parse_exif(b"GIF89a not a jpeg")
    # corrupt TIFF body inside an otherwise well-formed APP1 -> {} not crash
    data = bytearray(jpeg.encode_jpeg(px, exif={"make": "x"}))
    at = bytes(data).index(b"Exif\x00\x00") + 6
    data[at : at + 2] = b"ZZ"  # neither II nor MM
    assert jpeg.parse_exif(bytes(data)) == {}


def test_extract_exif_operator(spark):
    """mapInPandas EXIF extraction: stable 1:1 row set with NULL rows for
    EXIF-less JPEGs and non-JPEG payloads."""
    from webscraping_spark.operators.multimodal import extract_exif

    px = images.synth_pixels("jpg-exif-op", 16, 16)
    rows = [
        ("with", bytearray(jpeg.encode_jpeg(px, exif=_EXIF_FULL))),
        ("without", bytearray(jpeg.encode_jpeg(px))),
        ("notjpeg", bytearray(images.encode_png(px))),
    ]
    out = {
        r["image_id"]: r
        for r in extract_exif(
            spark.createDataFrame(rows, "image_id string, bytes binary")
        ).collect()
    }
    assert set(out) == {"with", "without", "notjpeg"}
    assert out["with"]["has_exif"] and out["with"]["make"] == "AcmeCam"
    assert out["with"]["orientation"] == 6 and out["with"]["exif_w"] == 24
    for k in ("without", "notjpeg"):
        assert not out[k]["has_exif"]
        assert out[k]["make"] is None and out[k]["orientation"] is None


class TestStripMetadata:
    EXIF = {
        "make": "Maker", "model": "M-1", "software": "eng 4.1",
        "description": "pii desc", "datetime": "2024:01:02 03:04:05",
        "orientation": 6, "exif_w": 20, "exif_h": 12,
    }

    def _jpg(self, with_exif=True, **kw):
        from webscraping_spark.sources import images, jpeg

        px = images.synth_pixels("strip", 20, 12)
        return px, jpeg.encode_jpeg(px, exif=self.EXIF if with_exif else None, **kw)

    def test_exif_removed_pixels_identical(self):
        from webscraping_spark.sources import jpeg

        px, data = self._jpg()
        clean = jpeg.strip_metadata(data)
        assert jpeg.parse_exif(clean) == {}
        assert jpeg.parse_exif(data) != {}
        assert len(clean) < len(data)
        import numpy as np

        assert np.array_equal(jpeg.decode_jpeg(clean), jpeg.decode_jpeg(data))

    def test_idempotent_and_noop_without_exif(self):
        from webscraping_spark.sources import jpeg

        _, data = self._jpg(with_exif=False)
        assert jpeg.strip_metadata(data) == data  # only JFIF APP0 present
        _, data2 = self._jpg()
        once = jpeg.strip_metadata(data2)
        assert jpeg.strip_metadata(once) == once

    def test_app0_policy_and_restart_stream(self):
        from webscraping_spark.sources import jpeg

        _, data = self._jpg(restart_interval=2)
        clean = jpeg.strip_metadata(data, keep_app0=False)
        assert b"JFIF" not in clean[:40]
        import numpy as np

        assert np.array_equal(jpeg.decode_jpeg(clean), jpeg.decode_jpeg(data))

    def test_non_jpeg_raises(self):
        import pytest as _pt

        from webscraping_spark.sources import jpeg

        with _pt.raises(ValueError):
            jpeg.strip_metadata(b"GIF89a123")
