"""LAION/DataComp-style image-caption pair curation
(multimodal.image_caption_filter): per-rule signal parity with an
independent Python re-derivation, both keep branches per rule, threshold
kwargs, the optional fmt/CLIP seams, and the zero-shuffle/zero-Python
plan shape."""

import pytest
from pyspark.sql import functions as F

from webscraping_spark.operators.multimodal import image_caption_filter

SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, clip double"
)


def rows():
    big = bytearray(b"x" * 200)
    return [
        # keeper: everything passes
        ("ok", big, 128, 96, "png", "a red bike on grass", 1, 0.5),
        # caption too short in chars (and 1 word)
        ("shortcap", big, 128, 128, "png", "cat", 2, 0.5),
        # one word but >= 5 chars
        ("oneword", big, 128, 128, "png", "skateboard", 3, 0.5),
        # empty + NULL captions -> 0 chars, 0 words
        ("emptycap", big, 128, 128, "png", "   ", 4, 0.5),
        ("nullcap", big, 128, 128, "png", None, 5, 0.5),
        # thumbnail
        ("tiny", big, 32, 128, "png", "a tiny thumbnail image", 6, 0.5),
        # banner: 4:1 aspect
        ("banner", big, 512, 128, "png", "a very wide banner ad", 7, 0.5),
        # exactly 3:1 aspect passes (<=)
        ("aspect3", big, 384, 128, "png", "three to one exactly", 8, 0.5),
        # tracking pixel payload
        ("tinybytes", bytearray(b"x" * 10), 128, 128, "png", "a tracking pixel file", 9, 0.5),
        # disallowed format (only when allowlist passed)
        ("gif", big, 128, 128, "gif", "an animated gif image", 10, 0.5),
        # low clip score (only when clip_col passed)
        ("lowclip", big, 128, 128, "png", "mismatched caption text", 11, 0.1),
    ]


@pytest.fixture(scope="module")
def pairs(spark):
    return spark.createDataFrame(rows(), SCHEMA)


def by_id(df):
    return {r["image_id"]: r for r in df.collect()}


class TestImageCaptionFilter:
    def test_signals_match_python(self, pairs):
        got = by_id(image_caption_filter(pairs))
        for (iid, b, w, h, fmt, cap, _, _c) in rows():
            r = got[iid]
            t = (cap or "").strip()
            assert r["caption_chars"] == len(t)
            assert r["caption_words"] == (len(t.split()) if t else 0)
            assert r["min_dim"] == min(w, h)
            assert r["aspect_ok"] == (max(w, h) <= 3.0 * min(w, h))
            assert r["bytes_len"] == len(b)

    def test_default_keep_branches(self, pairs):
        got = by_id(image_caption_filter(pairs))
        kept = {i for i, r in got.items() if r["keep"]}
        # fmt/clip seams are OFF by default: gif and lowclip survive
        assert kept == {"ok", "aspect3", "gif", "lowclip"}

    def test_fmt_allowlist_seam(self, pairs):
        got = by_id(image_caption_filter(pairs, allowed_formats=("png", "bmp", "ppm")))
        assert not got["gif"]["keep"] and not got["gif"]["fmt_ok"]
        assert got["ok"]["keep"]

    def test_clip_seam(self, pairs):
        got = by_id(image_caption_filter(pairs, clip_col="clip"))
        assert not got["lowclip"]["keep"]
        assert got["ok"]["keep"]
        assert "clip_score_ok" not in got["ok"].asDict()  # gate, not a column

    def test_thresholds_are_kwargs(self, pairs):
        got = by_id(
            image_caption_filter(
                pairs, min_side=16, max_aspect=8.0, min_chars=1,
                min_words=1, min_bytes=1,
            )
        )
        dropped = {i for i, r in got.items() if not r["keep"]}
        assert dropped == {"emptycap", "nullcap"}  # only degenerate captions

    def test_pure_projection(self, pairs):
        plan = (
            image_caption_filter(pairs)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
            assert node not in plan
