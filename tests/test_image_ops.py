"""Format sniffing + orientation-aware thumbnailing
(operators/multimodal.sniff_formats / thumbnail_images).

Crawled payloads routinely contradict their declared format, and JPEG
cameras store rotation as metadata instead of rotating pixels — these
two operators are where a curation pipeline reconciles bytes with
claims. Thumbnail output dims follow a pure integer contract
(max(1, dim*max_side // longest) after orientation) so they are exactly
re-derivable by the driver's SQL oracle.
"""

import numpy as np
import pytest

from webscraping_spark.sources import images, jpeg


def test_sniff_format_magic_bytes():
    px = images.synth_pixels("sniff", 16, 12)
    for fmt in ("png", "bmp", "ppm", "qnt", "jpeg"):
        assert images.sniff_format(images.encode_image(px, fmt)) == fmt
    pal = np.zeros((4, 4, 3), dtype=np.uint8)
    assert images.sniff_format(images.encode_image(pal, "gif")) == "gif"
    assert images.sniff_format(b"\x00\x01\x02 junk") is None
    # decode_auto ignores the claimed format entirely
    assert np.array_equal(images.decode_auto(images.encode_image(px, "png")), px)
    with pytest.raises(ValueError):
        images.decode_auto(b"mystery bytes")


def test_sniff_formats_operator(spark):
    from webscraping_spark.operators.multimodal import sniff_formats

    px = images.synth_pixels("sniff-op", 16, 12)
    rows = [
        ("honest", bytearray(images.encode_image(px, "png")), "png"),
        ("liar", bytearray(images.encode_image(px, "jpeg")), "png"),
        ("junk", bytearray(b"\x00\x01\x02"), "bmp"),
    ]
    out = {
        r["image_id"]: r
        for r in sniff_formats(
            spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
        ).collect()
    }
    assert out["honest"]["fmt_ok"] and out["honest"]["sniffed_fmt"] == "png"
    assert not out["liar"]["fmt_ok"] and out["liar"]["sniffed_fmt"] == "jpeg"
    assert not out["junk"]["fmt_ok"] and out["junk"]["sniffed_fmt"] is None


@pytest.mark.parametrize("orient", sorted(range(1, 9)))
def test_orientation_transforms_match_reference(orient):
    """Each EXIF orientation renders upright: validate against the
    canonical rot/flip compositions on an asymmetric image."""
    from webscraping_spark.operators.multimodal import _ORIENT

    px = images.synth_pixels("orient", 6, 4)  # w=6, h=4: asymmetric
    ref = {
        1: px,
        2: np.fliplr(px),
        3: np.rot90(px, 2),
        4: np.flipud(px),
        5: np.rot90(np.fliplr(px), 1),
        6: np.rot90(px, 3),
        7: np.rot90(np.fliplr(px), 3),
        8: np.rot90(px, 1),
    }[orient]
    assert np.array_equal(_ORIENT[orient](px), ref)
    # rotations (5-8) swap dims; flips (1-4) keep them
    expect_swap = orient >= 5
    assert (_ORIENT[orient](px).shape[:2] == px.shape[1::-1]) == expect_swap


def test_thumbnail_dims_and_orientation(spark):
    from webscraping_spark.operators.multimodal import thumbnail_images

    big = images.synth_smooth_pixels("thumb-big", 100, 60)
    small = images.synth_smooth_pixels("thumb-small", 20, 10)
    rot = images.synth_smooth_pixels("thumb-rot", 10, 20)  # w=10, h=20
    rows = [
        ("big", bytearray(images.encode_image(big, "png"))),
        ("small", bytearray(images.encode_image(small, "jpeg"))),
        # orientation 6 (rotate 90 CW): effective dims swap to w=20, h=10
        ("rot", bytearray(jpeg.encode_jpeg(rot, exif={"orientation": 6}))),
        ("junk", bytearray(b"not an image")),
    ]
    out = {
        r["image_id"]: r
        for r in thumbnail_images(
            spark.createDataFrame(rows, "image_id string, bytes binary"),
            max_side=32,
        ).collect()
    }
    assert set(out) == {"big", "small", "rot"}  # junk drops
    # 100x60 -> (100*32)//100=32, (60*32)//100=19
    assert (out["big"]["w"], out["big"]["h"]) == (32, 19)
    # already within max_side: dims pass through
    assert (out["small"]["w"], out["small"]["h"]) == (20, 10)
    # rotated 10x20 -> effective 20x10, within max_side
    assert (out["rot"]["w"], out["rot"]["h"]) == (20, 10)
    # payloads are decodable JPEGs at the declared dims
    for key in ("big", "small", "rot"):
        decoded = images.decode_auto(bytes(out[key]["bytes"]))
        assert decoded.shape == (out[key]["h"], out[key]["w"], 3)
        assert out[key]["fmt"] == "jpeg"
    # orientation actually applied: the upright thumb matches the
    # reference rotation within two JPEG generations
    ref = np.rot90(rot, 3)
    got = images.decode_auto(bytes(out["rot"]["bytes"]))
    assert images.psnr(ref, got) >= 35.0


def test_thumbnail_downscale_fidelity(spark):
    """Downscaling a smooth image preserves structure: PSNR of the thumb
    vs an independently computed bilinear reference stays high."""
    from webscraping_spark.operators.multimodal import thumbnail_images

    px = images.synth_smooth_pixels("thumb-fid", 96, 64)
    out = thumbnail_images(
        spark.createDataFrame(
            [("x", bytearray(images.encode_image(px, "png")))],
            "image_id string, bytes binary",
        ),
        max_side=24,
    ).collect()[0]
    assert (out["w"], out["h"]) == (24, 16)
    ref = np.empty((16, 24, 3), dtype=np.uint8)
    for c in range(3):
        ref[:, :, c] = np.clip(
            np.round(images.bilinear_resize(px[:, :, c].astype(np.float64), 16, 24)),
            0,
            255,
        )
    assert images.psnr(ref, images.decode_auto(bytes(out["bytes"]))) >= 40.0


class TestStripImageMetadata:
    def test_operator(self, spark):
        from webscraping_spark.operators.multimodal import (
            extract_exif,
            strip_image_metadata,
        )
        from webscraping_spark.sources import images, jpeg

        px = images.synth_pixels("s1", 24, 16)
        with_exif = jpeg.encode_jpeg(px, exif={"make": "M", "orientation": 3})
        without = jpeg.encode_jpeg(px)
        png = images.encode_image(px, "png")
        df = spark.createDataFrame(
            [("a", bytearray(with_exif)), ("b", bytearray(without)), ("c", bytearray(png))],
            "image_id string, bytes binary",
        )
        out = {r["image_id"]: r for r in strip_image_metadata(df).collect()}
        assert out["a"]["was_jpeg"] and out["a"]["bytes_removed"] > 0
        assert out["b"]["was_jpeg"] and out["b"]["bytes_removed"] == 0
        assert not out["c"]["was_jpeg"] and bytes(out["c"]["bytes"]) == png
        # re-extract: EXIF gone, row set stable
        stripped = spark.createDataFrame(
            [(k, bytearray(v["bytes"])) for k, v in out.items()],
            "image_id string, bytes binary",
        )
        ex = {r["image_id"]: r for r in extract_exif(stripped).collect()}
        assert not any(r["has_exif"] for r in ex.values()) and len(ex) == 3
