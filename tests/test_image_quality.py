"""No-reference image quality scoring (operators/multimodal.image_quality)
and the relational gate on top of it.

The metric definitions are pinned against tiny hand-computable arrays and
against exact zero contracts (flat image -> sharpness = contrast =
entropy = 0; grayscale content -> colorfulness = 0), and the blur
monotonicity that the driver's violation-set oracle relies on is asserted
on the same deterministic synth imagery the entry query plants.
"""

import numpy as np
import pytest

from webscraping_spark.sources import images


def _pages(spark, rows):
    return spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")


def _score_one(spark, px):
    from webscraping_spark.operators.multimodal import image_quality

    rows = [("x", bytearray(images.encode_image(px, "png")), "png")]
    return image_quality(_pages(spark, rows)).collect()[0]


def test_flat_image_zeros(spark):
    px = np.full((8, 10, 3), 77, dtype=np.uint8)
    r = _score_one(spark, px)
    assert r["sharpness"] == 0.0
    assert r["contrast"] == 0.0
    assert r["entropy"] == 0.0
    assert r["colorfulness"] == 0.0
    assert r["brightness"] == pytest.approx(77.0)
    assert (r["w"], r["h"]) == (10, 8)


def test_grayscale_has_zero_colorfulness_but_contrast(spark):
    # R == G == B everywhere -> rg and yb vanish identically; the ramp
    # still has contrast and entropy.
    ramp = np.tile(np.arange(0, 160, 10, dtype=np.uint8), (8, 1))
    px = np.stack([ramp] * 3, axis=2)
    r = _score_one(spark, px)
    assert r["colorfulness"] == 0.0
    assert r["contrast"] > 0
    assert r["entropy"] > 0


def test_two_value_image_entropy_is_one_bit(spark):
    g = np.zeros((8, 8), dtype=np.uint8)
    g[:, 4:] = 255
    px = np.stack([g] * 3, axis=2)
    r = _score_one(spark, px)
    assert r["entropy"] == pytest.approx(1.0)


def test_sharpness_matches_hand_laplacian(spark):
    # 4x4 single-channel-equal image: the interior Laplacian and its
    # population variance are recomputed by hand in numpy.
    g = np.array(
        [[0, 10, 20, 30], [5, 50, 10, 0], [0, 0, 40, 10], [7, 3, 9, 1]],
        dtype=np.uint8,
    )
    px = np.stack([g] * 3, axis=2)
    gray = g.astype(np.float64)  # equal channels: weights sum to 1
    c = gray[1:-1, 1:-1]
    lap = 4 * c - gray[:-2, 1:-1] - gray[2:, 1:-1] - gray[1:-1, :-2] - gray[1:-1, 2:]
    r = _score_one(spark, px)
    assert r["sharpness"] == pytest.approx(lap.var(), rel=1e-9)
    assert r["contrast"] == pytest.approx(gray.std(), rel=1e-9)
    assert r["brightness"] == pytest.approx(gray.mean(), rel=1e-9)


def test_tiny_image_sharpness_zero(spark):
    px = images.synth_pixels("tiny", 2, 2)
    r = _score_one(spark, px)
    assert r["sharpness"] == 0.0  # no 3x3 interior


def test_blur_strictly_reduces_sharpness(spark):
    # The planted-pair contract of the driver's violation-set oracle,
    # on both fixture families the entry query uses.
    from webscraping_spark.operators.multimodal import image_quality

    rows = []
    for maker, name in (
        (images.synth_pixels, "noise"),
        (images.synth_smooth_pixels, "smooth"),
    ):
        px = maker(name, 48, 40)
        rows.append((name, bytearray(images.encode_image(px, "png")), "png"))
        rows.append(
            (
                name + "_blur",
                bytearray(images.encode_image(images.box_blur(px, 5), "png")),
                "png",
            )
        )
    scores = {
        r["image_id"]: r["sharpness"]
        for r in image_quality(_pages(spark, rows)).collect()
    }
    assert scores["noise_blur"] < scores["noise"]
    assert scores["smooth_blur"] < scores["smooth"]


def test_box_blur_contract():
    px = np.full((6, 6, 3), 200, dtype=np.uint8)
    assert np.array_equal(images.box_blur(px, 3), px)  # constant invariant
    with pytest.raises(ValueError):
        images.box_blur(px, 4)
    # hand check: 3x3 mean at an interior pixel of a ramp
    g = np.tile(np.arange(6, dtype=np.uint8) * 10, (6, 1))
    px = np.stack([g] * 3, axis=2)
    out = images.box_blur(px, 3)
    assert out[3, 3, 0] == 30  # mean of cols 20,30,40
    assert out[3, 0, 0] == round((0 * 2 + 10) / 3 + 0.001)  # edge-clamped


def test_undecodable_rows_skipped(spark):
    from webscraping_spark.operators.multimodal import image_quality

    px = images.synth_pixels("ok", 16, 12)
    rows = [
        ("ok", bytearray(images.encode_image(px, "png")), "png"),
        ("bad", bytearray(b"\x00\x01garbage"), "png"),
    ]
    got = image_quality(_pages(spark, rows)).collect()
    assert [r["image_id"] for r in got] == ["ok"]


def test_gate_keep_flags(spark):
    from webscraping_spark.operators.multimodal import gate_image_quality

    sharp = images.synth_pixels("keepme", 32, 32)
    flat = np.full((32, 32, 3), 128, dtype=np.uint8)
    dark = (images.synth_pixels("dark", 32, 32) // 32).astype(np.uint8)
    rows = [
        (n, bytearray(images.encode_image(p, "png")), "png")
        for n, p in (("keepme", sharp), ("flat", flat), ("dark", dark))
    ]
    got = {
        r["image_id"]: r["keep"]
        for r in gate_image_quality(
            _pages(spark, rows), brightness_range=(16.0, 240.0)
        ).collect()
    }
    assert got == {"keepme": True, "flat": False, "dark": False}


def test_dedup_images_keep_sharpest(spark):
    """Composition: phash clusters + quality -> the sharp source survives,
    its blurred copies drop, distinct images are untouched."""
    from webscraping_spark.operators.multimodal import dedup_images_keep_sharpest

    rows = []
    for i in range(6):
        # smooth (low-frequency) imagery: a mild blur barely moves the
        # perceptual hash (measured <= 1 avg-hash bit on these fixtures,
        # inside the pigeonhole-exact radius) but strictly lowers
        # Laplacian sharpness — white noise would flip ~10 hash bits and
        # never band-match, which is correct phash behavior, not a bug
        px = images.synth_smooth_pixels(f"base{i}", 48, 40)
        rows.append((f"base{i}", bytearray(images.encode_image(px, "png")), "png"))
        if i < 3:
            soft = images.box_blur(px, 3)
            rows.append(
                (f"base{i}_soft", bytearray(images.encode_image(soft, "png")), "png")
            )
    pages = _pages(spark, rows)
    got = sorted(
        r["image_id"] for r in dedup_images_keep_sharpest(pages).collect()
    )
    assert got == [f"base{i}" for i in range(6)]
