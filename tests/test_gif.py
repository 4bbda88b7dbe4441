"""GIF87a/89a codec invariants (sources/gif.py).

GIF is lossless within its palette, so the contract is EXACT roundtrip
for <= 256-color imagery — including through the interlaced four-pass
raster and LZW table resets — plus correct first-frame decode of
animated and transparent streams built by hand.
"""

import struct

import numpy as np
import pytest

from webscraping_spark.sources import gif, images


def _palette_image(seed: int, w: int, h: int, ncol: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    pal = np.unique(rng.integers(0, 256, (ncol, 3), dtype=np.uint8), axis=0)
    return pal[rng.integers(0, len(pal), (h, w))]


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize(
    "ncol,w,h", [(2, 64, 64), (5, 37, 29), (256, 128, 96), (17, 255, 3), (3, 1, 1)]
)
def test_exact_roundtrip(ncol, w, h, interlace):
    px = _palette_image(ncol * 1000 + w, w, h, ncol)
    data = gif.encode_gif(px, interlace=interlace)
    assert data[:6] == b"GIF89a" and data[-1:] == b"\x3b"
    assert np.array_equal(gif.decode_gif(data), px)


def test_lzw_table_reset():
    """An image with enough distinct phrases overflows the 4096-entry LZW
    table; the encoder must emit a clear code and both sides must resync."""
    px = _palette_image(99, 300, 200, 120)
    data = gif.encode_gif(px)
    assert np.array_equal(gif.decode_gif(data), px)


def test_registered_as_lossless_format():
    px = _palette_image(7, 40, 30, 12)
    assert "gif" in images.LOSSLESS_FORMATS
    assert np.array_equal(
        images.decode_image(images.encode_image(px, "gif"), "gif"), px
    )


def test_encoder_refuses_rich_palettes():
    """> 256 colors raises — this encoder is not a quantizer."""
    with pytest.raises(ValueError):
        gif.encode_gif(images.synth_pixels("gif-rich", 64, 64))


def test_gif87a_signature_accepted():
    px = _palette_image(3, 16, 16, 4)
    data = bytearray(gif.encode_gif(px))
    data[:6] = b"GIF87a"
    assert np.array_equal(gif.decode_gif(bytes(data)), px)


def test_transparency_composites_over_background():
    """A GCE-flagged transparent index must show the background color."""
    pal = np.array([[10, 20, 30], [200, 0, 0]], dtype=np.uint8)
    px = pal[np.array([[0, 1], [1, 0]])]
    base = bytearray(gif.encode_gif(px))
    # splice a Graphic Control Extension before the image descriptor
    # marking palette index 1 transparent
    img_at = base.index(0x2C, 13)
    gce = bytes([0x21, 0xF9, 0x04, 0x01, 0x00, 0x00, 0x01, 0x00])
    data = bytes(base[:img_at]) + gce + bytes(base[img_at:])
    decoded = gif.decode_gif(data)
    # background color is palette[0] (bg index 0): transparent cells
    # (index 1) composite to it, so the whole image is palette[0]
    assert np.array_equal(decoded, np.tile(pal[0], (2, 2, 1)))


def test_animated_first_frame_and_count():
    """Two spliced image blocks: decode returns frame 1; the counter sees 2."""
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    f1 = pal[np.array([[0, 1], [1, 0]])]
    f2 = pal[np.array([[1, 1], [0, 0]])]
    d1 = gif.encode_gif(f1)
    d2 = gif.encode_gif(f2)
    img2_at = d2.index(0x2C, 13)
    spliced = d1[:-1] + d2[img2_at:]  # drop trailer, append 2nd image block
    assert gif.gif_frame_count(spliced) == 2
    assert np.array_equal(gif.decode_gif(spliced), f1)


def test_skips_application_and_comment_extensions():
    """NETSCAPE looping blocks and comments are skipped, not mis-parsed."""
    px = _palette_image(5, 8, 8, 3)
    base = bytearray(gif.encode_gif(px))
    img_at = base.index(0x2C, 13)
    app = bytes([0x21, 0xFF, 0x0B]) + b"NETSCAPE2.0" + bytes([0x03, 0x01, 0x00, 0x00, 0x00])
    com = bytes([0x21, 0xFE, 0x05]) + b"hello" + bytes([0x00])
    data = bytes(base[:img_at]) + app + com + bytes(base[img_at:])
    assert np.array_equal(gif.decode_gif(data), px)


def test_local_color_table_overrides_global():
    """An image block carrying its own palette decodes through it."""
    pal_g = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    px = pal_g[np.array([[0, 1], [1, 0]])]
    base = bytearray(gif.encode_gif(px))
    img_at = base.index(0x2C, 13)
    # set the local-color-table flag + size 1 (2 entries) and splice in a
    # swapped palette right after the 9-byte descriptor
    desc = bytearray(base[img_at : img_at + 10])
    desc[9] |= 0x80  # LCT flag, size bits already 0 -> 2 entries
    lct = np.array([[0, 255, 0], [255, 0, 255]], dtype=np.uint8).tobytes()
    data = bytes(base[:img_at]) + bytes(desc) + lct + bytes(base[img_at + 10 :])
    decoded = gif.decode_gif(data)
    expected = np.array(
        [[[0, 255, 0], [255, 0, 255]], [[255, 0, 255], [0, 255, 0]]], dtype=np.uint8
    )
    assert np.array_equal(decoded, expected)


def test_rejects_non_gif():
    with pytest.raises(ValueError):
        gif.decode_gif(b"\xff\xd8\xff\xe0 not a gif")


def test_truncated_stream_raises():
    px = _palette_image(11, 32, 32, 8)
    data = gif.encode_gif(px)
    with pytest.raises(ValueError):
        gif.decode_gif(data[: len(data) // 2])


def test_width_boundary_sweep():
    """Hammer LZW code-width growth boundaries across shapes and palette
    sizes (the classic encoder/decoder off-by-one lives exactly here)."""
    rng = np.random.default_rng(123)
    for s in range(30):
        w, h = int(rng.integers(1, 90)), int(rng.integers(1, 90))
        ncol = int(rng.integers(2, 257))
        px = _palette_image(s, w, h, ncol)
        data = gif.encode_gif(px, interlace=bool(s % 2))
        assert np.array_equal(gif.decode_gif(data), px), (s, w, h, ncol)
