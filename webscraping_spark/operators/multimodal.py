"""Multimodal column operators: images/audio/video as opaque BINARY plus
typed metadata, processed in Arrow batches.

The image path is fully real (pure-numpy codecs in sources/images.py):
decode, verify (allclose / PSNR >= 40 dB per BASELINE.json input_hint),
perceptual-hash, resize, and grid feature extraction. Audio and video are
real for the UNCOMPRESSED public container formats this sandbox can parse
without codec libraries — WAV/RIFF PCM (sources/audio.py: duration, RMS,
zero-crossing rate, spectral centroid) and YUV4MPEG2 (sources/video.py:
frame sampling + PNG re-encode). Compressed codecs (mp3/ogg, h264/vp9)
remain honestly stubbed: the stub raises NotImplementedError exactly at
the decode call so swapping in soundfile/pyav is a one-line change, and
``on_missing="skip"`` keeps the pipeline shape-correct with metadata-only
fallbacks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webscraping_spark.sources import images


def verify_images(pages: DataFrame, psnr_floor: float = 40.0) -> DataFrame:
    """Per-row payload verification over (image_id, bytes, fmt, w, h, phash):
    decode -> shape check -> allclose (lossless) / PSNR (lossy) vs the
    deterministic source pattern -> phash re-derivation.

    mapInPandas: each Arrow batch decodes in numpy; no per-row Python at
    the Spark boundary.
    """

    out_schema = (
        "image_id string, fmt string, decode_ok boolean, shape_ok boolean, "
        "pixels_ok boolean, psnr double, phash_ok boolean, caption_ok boolean"
    )

    def verify(batches):
        from webscraping_spark.sources.synth import caption_for

        for pdf in batches:
            n = len(pdf)
            has_caption = "caption" in pdf.columns and "url" in pdf.columns
            if has_caption:
                # per-row caption invariant (BASELINE input_hint): the
                # caption column must EXACTLY equal the deterministic
                # generator's output for the row's url
                caption_ok = np.array(
                    [
                        pdf["caption"].iloc[i] == caption_for(pdf["url"].iloc[i])
                        for i in range(n)
                    ],
                    dtype=bool,
                )
            else:
                caption_ok = np.zeros(n, dtype=bool)
            rows = {
                "image_id": pdf["image_id"].to_numpy(),
                "fmt": pdf["fmt"].to_numpy(),
                "decode_ok": np.zeros(n, dtype=bool),
                "shape_ok": np.zeros(n, dtype=bool),
                "pixels_ok": np.zeros(n, dtype=bool),
                "psnr": np.full(n, -1.0),
                "phash_ok": np.zeros(n, dtype=bool),
                "caption_ok": caption_ok,
            }
            for i in range(n):
                fmt = pdf["fmt"].iloc[i]
                try:
                    decoded = images.decode_image(bytes(pdf["bytes"].iloc[i]), fmt)
                except Exception:
                    continue
                rows["decode_ok"][i] = True
                w, h = int(pdf["w"].iloc[i]), int(pdf["h"].iloc[i])
                rows["shape_ok"][i] = decoded.shape == (h, w, 3)
                reference = images.synth_pixels(pdf["image_id"].iloc[i], w, h)
                p = images.psnr(reference, decoded)
                rows["psnr"][i] = p if np.isfinite(p) else 99.0
                if fmt in images.LOSSLESS_FORMATS:
                    rows["pixels_ok"][i] = bool(np.array_equal(decoded, reference))
                else:
                    rows["pixels_ok"][i] = bool(p >= psnr_floor)
                rows["phash_ok"][i] = (
                    images.average_hash(decoded) == int(pdf["phash"].iloc[i])
                    if fmt in images.LOSSLESS_FORMATS
                    else bin(
                        (images.average_hash(decoded) ^ int(pdf["phash"].iloc[i]))
                        & (2**64 - 1)
                    ).count("1")
                    <= 6
                )
            yield pd.DataFrame(rows)

    cols = ["image_id", "bytes", "fmt", "w", "h", "phash"]
    if "caption" in pages.columns and "url" in pages.columns:
        cols += ["caption", "url"]
    return pages.select(*cols).mapInPandas(verify, out_schema)


def phash_images(pages: DataFrame, method: str = "avg") -> DataFrame:
    """Decode each image payload and derive its 64-bit perceptual hash:
    (image_id, phash LONG). mapInPandas over (image_id, bytes, fmt) only —
    the hash is re-derived from pixels, NOT read from metadata, so the
    operator works on any binary image column (undecodable rows drop).

    method="avg": 8x8 block-mean threshold (images.average_hash) — exact
    under lossless round-trips, tight under lossy re-encode, but NOT under
    resize. method="dct": pHash-family DCT hash (images.dct_hash) — also
    survives resizes and brightness shifts on imagery with low-frequency
    content (see its docstring for the measured margins)."""
    hash_fn = images.dct_hash if method == "dct" else images.average_hash

    def hash_batch(batches):
        for pdf in batches:
            ids, hashes = [], []
            for i in range(len(pdf)):
                try:
                    px = images.decode_image(bytes(pdf["bytes"].iloc[i]), pdf["fmt"].iloc[i])
                except Exception:
                    continue
                ids.append(pdf["image_id"].iloc[i])
                hashes.append(hash_fn(px))
            yield pd.DataFrame({"image_id": ids, "phash": pd.array(hashes, dtype="int64")})

    return pages.select("image_id", "bytes", "fmt").mapInPandas(
        hash_batch, "image_id string, phash long"
    )


def image_near_dupes(
    pages: DataFrame,
    max_hamming: int = 3,
    method: str = "avg",
    n_bands: int | None = None,
) -> DataFrame:
    """Near-duplicate images by perceptual hash: decode -> 64-bit phash ->
    banded Hamming self-join (equal-width chunks, shared with text SimHash
    — operators/dedup.banded_hamming_pairs). The candidate join is an
    equi-join on (chunk_idx, chunk) — no all-pairs product, the same
    shuffle shape at 10^10 images. Returns (id_a, id_b, hamming).

    method="avg" (default, 4 x 16-bit bands): radius <= 3 has exact recall
    by pigeonhole; it comfortably covers lossy re-encodes of the same
    pixels (the qnt codec's quantization error flips <= a few block-mean
    bits) while distinct images differ by ~32 bits.

    method="dct" (8 x 8-bit bands by default): resize/brightness-robust
    hash; transforms measured at <= 10 bits vs >= 20 for distinct images,
    so call with max_hamming~10. Recall is pigeonhole-EXACT to radius 7;
    for 8 <= d <= 10 a pair is missed only if its flipped bits cover all 8
    bands (< 3% of uniformly-spread worst-case patterns, and none of the
    planted-transform fixtures). The narrower 8-bit chunks cost more
    candidate collisions — the price of the larger exact radius."""
    from webscraping_spark.operators.dedup import banded_hamming_pairs

    if n_bands is None:
        n_bands = 8 if method == "dct" else 4
    return banded_hamming_pairs(
        phash_images(pages, method=method),
        "phash",
        max_hamming,
        id_col="image_id",
        n_bands=n_bands,
    )


def image_features(pages: DataFrame, grid: int = 4) -> DataFrame:
    """Decode + grid x grid mean-pooled grayscale features (a stand-in for
    an embedding tower's preprocessing): (image_id, features ARRAY<DOUBLE>)."""

    def featurize(batches):
        for pdf in batches:
            ids, feats = [], []
            for i in range(len(pdf)):
                try:
                    px = images.decode_image(bytes(pdf["bytes"].iloc[i]), pdf["fmt"].iloc[i])
                except Exception:
                    continue
                gray = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                h, w = gray.shape
                ys = (np.arange(grid + 1) * h) // grid
                xs = (np.arange(grid + 1) * w) // grid
                f = [
                    gray[ys[r] : ys[r + 1], xs[c] : xs[c + 1]].mean()
                    for r in range(grid)
                    for c in range(grid)
                ]
                ids.append(pdf["image_id"].iloc[i])
                feats.append(f)
            yield pd.DataFrame({"image_id": ids, "features": feats})

    return pages.select("image_id", "bytes", "fmt").mapInPandas(
        featurize, "image_id string, features array<double>"
    )


def resize_images(pages: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-encode PNG. Returns
    (image_id, bytes, w, h, fmt) with the resized payload."""

    def resize(batches):
        for pdf in batches:
            ids, blobs = [], []
            for i in range(len(pdf)):
                try:
                    px = images.decode_image(bytes(pdf["bytes"].iloc[i]), pdf["fmt"].iloc[i])
                except Exception:
                    continue
                h, w = px.shape[:2]
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                resized = px[yi][:, xi]
                ids.append(pdf["image_id"].iloc[i])
                blobs.append(bytearray(images.encode_png(resized)))
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "bytes": blobs,
                    "w": [out_w] * len(ids),
                    "h": [out_h] * len(ids),
                    "fmt": ["png"] * len(ids),
                }
            )

    return pages.select("image_id", "bytes", "fmt").mapInPandas(
        resize, "image_id string, bytes binary, w int, h int, fmt string"
    )


def sniff_formats(pages: DataFrame) -> DataFrame:
    """Magic-byte format identification: (image_id, claimed_fmt,
    sniffed_fmt, fmt_ok). Crawled payloads routinely contradict their
    Content-Type / extension — curation pipelines (LAION et al.) drop or
    re-route rows whose bytes disagree with their metadata, and this is
    the operator that finds them. sniffed_fmt is NULL for unrecognizable
    bytes; fmt_ok means the claim matches the bytes. mapInPandas over
    (image_id, bytes, fmt); the sniff itself reads <= 8 bytes per row."""

    out_schema = (
        "image_id string, claimed_fmt string, sniffed_fmt string, fmt_ok boolean"
    )

    def sniff(batches):
        for pdf in batches:
            n = len(pdf)
            sniffed = np.full(n, None, dtype=object)
            for i in range(n):
                sniffed[i] = images.sniff_format(bytes(pdf["bytes"].iloc[i]))
            claimed = pdf["fmt"].to_numpy()
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(),
                    "claimed_fmt": claimed,
                    "sniffed_fmt": sniffed,
                    "fmt_ok": np.array(
                        [claimed[i] == sniffed[i] for i in range(n)], dtype=bool
                    ),
                }
            )

    return pages.select("image_id", "bytes", "fmt").mapInPandas(sniff, out_schema)


# EXIF Orientation tag -> numpy transform that renders the image upright
# (TIFF 6.0 / EXIF 2.3 semantics)
_ORIENT = {
    1: lambda px: px,
    2: lambda px: px[:, ::-1],
    3: lambda px: px[::-1, ::-1],
    4: lambda px: px[::-1, :],
    5: lambda px: px.transpose(1, 0, 2),
    6: lambda px: np.rot90(px, k=3),
    7: lambda px: px[::-1, ::-1].transpose(1, 0, 2),
    8: lambda px: np.rot90(px, k=1),
}


def thumbnail_images(pages: DataFrame, max_side: int = 32) -> DataFrame:
    """Orientation-aware thumbnailing: sniff the real format, decode,
    apply the EXIF Orientation transform (JPEGs; rotations swap w/h),
    downscale so max(w, h) == max_side, re-encode as JPEG. Returns
    (image_id, bytes, w, h, fmt).

    Output dims use pure integer arithmetic — after orientation, if
    max(W, H) > max_side then out = max(1, (dim * max_side) // max(W, H))
    — so they are re-derivable exactly by any engine (the driver oracle
    recomputes them in SQL). Resampling is the half-pixel-centered
    bilinear kernel shared with the DCT hash (images.bilinear_resize),
    vectorized per channel. mapInPandas; undecodable rows drop."""
    if max_side < 1:
        raise ValueError("max_side must be >= 1")

    out_schema = "image_id string, bytes binary, w int, h int, fmt string"

    def thumb(batches):
        from webscraping_spark.sources.jpeg import parse_exif

        for pdf in batches:
            ids, blobs, ws, hs = [], [], [], []
            for i in range(len(pdf)):
                raw = bytes(pdf["bytes"].iloc[i])
                try:
                    px = images.decode_auto(raw)
                except (ValueError, KeyError, IndexError):
                    continue
                if images.sniff_format(raw) == "jpeg":
                    try:
                        orient = int(parse_exif(raw).get("orientation", 1))
                    except ValueError:
                        orient = 1
                    px = _ORIENT.get(orient, _ORIENT[1])(px)
                h, w = px.shape[:2]
                longest = max(w, h)
                if longest > max_side:
                    ow = max(1, (w * max_side) // longest)
                    oh = max(1, (h * max_side) // longest)
                    out = np.empty((oh, ow, 3), dtype=np.uint8)
                    fpx = px.astype(np.float64)
                    for c in range(3):
                        out[:, :, c] = np.clip(
                            np.round(images.bilinear_resize(fpx[:, :, c], oh, ow)),
                            0,
                            255,
                        ).astype(np.uint8)
                    px = out
                    w, h = ow, oh
                ids.append(pdf["image_id"].iloc[i])
                blobs.append(bytearray(images.encode_image(np.ascontiguousarray(px), "jpeg")))
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "bytes": blobs,
                    "w": np.array(ws, dtype=np.int32),
                    "h": np.array(hs, dtype=np.int32),
                    "fmt": ["jpeg"] * len(ids),
                }
            )

    return pages.select("image_id", "bytes").mapInPandas(thumb, out_schema)


def extract_exif(pages: DataFrame) -> DataFrame:
    """Extract the EXIF metadata subset from JPEG payloads: (image_id,
    has_exif, make, model, software, description, datetime, orientation,
    exif_w, exif_h). Non-JPEG payloads and EXIF-less JPEGs yield a row
    with has_exif=false and NULL fields — the row set is stable so the
    output joins 1:1 back to the pages table.

    Real crawls use this for orientation-aware thumbnailing, camera-model
    analytics and PII triage (EXIF can embed author/GPS data; the parse
    step is where a redaction policy hooks in). mapInPandas over
    (image_id, bytes) only; the parser (sources/jpeg.py:parse_exif) walks
    the APP1 TIFF block in either byte order.
    """

    out_schema = (
        "image_id string, has_exif boolean, make string, model string, "
        "software string, description string, datetime string, "
        "orientation int, exif_w long, exif_h long"
    )
    str_keys = ("make", "model", "software", "description", "datetime")

    def extract(batches):
        from webscraping_spark.sources.jpeg import parse_exif

        for pdf in batches:
            n = len(pdf)
            rows = {
                "image_id": pdf["image_id"].to_numpy(),
                "has_exif": np.zeros(n, dtype=bool),
                **{k: np.full(n, None, dtype=object) for k in str_keys},
                "orientation": np.full(n, None, dtype=object),
                "exif_w": np.full(n, None, dtype=object),
                "exif_h": np.full(n, None, dtype=object),
            }
            for i in range(n):
                try:
                    meta = parse_exif(bytes(pdf["bytes"].iloc[i]))
                except (ValueError, IndexError):
                    continue  # not a JPEG: stable all-NULL row
                if not meta:
                    continue
                rows["has_exif"][i] = True
                for k in str_keys:
                    if k in meta:
                        rows[k][i] = meta[k]
                for k in ("orientation", "exif_w", "exif_h"):
                    if k in meta:
                        rows[k][i] = int(meta[k])
            yield pd.DataFrame(rows)

    return pages.select("image_id", "bytes").mapInPandas(extract, out_schema)


def strip_image_metadata(pages: DataFrame, keep_app0: bool = True) -> DataFrame:
    """Privacy pass for harvested JPEGs: drop APP1-APP15 + COM segments
    (EXIF GPS/author PII, XMP, vendor notes) WITHOUT re-encoding —
    entropy data passes through byte-for-byte, so pixels are untouched
    (the lossless counterpart of thumbnail-and-reencode redaction).
    Output: (image_id, bytes, was_jpeg, bytes_removed); non-JPEG
    payloads pass through unchanged with was_jpeg=false. mapInPandas
    byte surgery (a per-row segment walk — I/O-shaped like the codec
    layer, bounded by payload size); idempotent."""

    out_schema = "image_id string, bytes binary, was_jpeg boolean, bytes_removed int"

    def strip(batches):
        from webscraping_spark.sources.jpeg import strip_metadata

        for pdf in batches:
            n = len(pdf)
            ids = pdf["image_id"].to_numpy()
            outs = np.empty(n, dtype=object)
            was = np.zeros(n, dtype=bool)
            removed = np.zeros(n, dtype=np.int32)
            for i in range(n):
                raw = bytes(pdf["bytes"].iloc[i])
                try:
                    clean = strip_metadata(raw, keep_app0=keep_app0)
                except Exception:  # non-JPEG / truncated: passthrough
                    outs[i] = raw
                    continue
                outs[i] = clean
                was[i] = True
                removed[i] = len(raw) - len(clean)
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "bytes": outs,
                    "was_jpeg": was,
                    "bytes_removed": removed,
                }
            )

    return pages.select("image_id", "bytes").mapInPandas(strip, out_schema)


# --- audio / video (real for uncompressed containers, stub for codecs) ------


def decode_audio(payload: bytes, codec: str) -> tuple[np.ndarray, int]:
    """Decode one audio blob -> ((n, ch) int16, rate). WAV/RIFF PCM decodes
    for real (sources/audio.py); compressed codecs raise NotImplementedError
    exactly here — swap in soundfile.read when the library is available."""
    from webscraping_spark.sources import audio

    if codec == "wav":
        return audio.decode_wav(payload)
    raise NotImplementedError(f"audio codec {codec!r} not available in this environment")


def audio_features(tracks: DataFrame, on_missing: str = "skip") -> DataFrame:
    """Per-track features over (track_id, bytes, codec, sample_rate):
    (track_id, duration_sec, rms, zcr, centroid_hz, decoded).

    WAV rows decode for real and get the standard analytic features
    (sources/audio.py); rows whose codec is unavailable either raise
    (on_missing="error") or fall back to a metadata-only duration hint
    (byte length / (rate * 2)) with NULL features and decoded=false, so a
    mixed-codec corpus at scale still flows through one schema.
    """

    def featurize(batches):
        from webscraping_spark.sources import audio

        for pdf in batches:
            ids, durs, rmss, zcrs, cents, dec = [], [], [], [], [], []
            for i in range(len(pdf)):
                blob = bytes(pdf["bytes"].iloc[i])
                try:
                    samples, rate = decode_audio(blob, pdf["codec"].iloc[i])
                except NotImplementedError:
                    if on_missing != "skip":
                        raise
                    ids.append(pdf["track_id"].iloc[i])
                    durs.append(len(blob) / (float(pdf["sample_rate"].iloc[i]) * 2.0))
                    rmss.append(None)
                    zcrs.append(None)
                    cents.append(None)
                    dec.append(False)
                    continue
                ids.append(pdf["track_id"].iloc[i])
                durs.append(samples.shape[0] / float(rate))
                rmss.append(audio.rms_level(samples))
                zcrs.append(audio.zero_crossing_rate(samples))
                cents.append(audio.spectral_centroid_hz(samples, rate))
                dec.append(True)
            yield pd.DataFrame(
                {
                    "track_id": ids,
                    "duration_sec": pd.Series(durs, dtype="float64"),
                    "rms": pd.Series(rmss, dtype="float64"),
                    "zcr": pd.Series(zcrs, dtype="float64"),
                    "centroid_hz": pd.Series(cents, dtype="float64"),
                    "decoded": pd.Series(dec, dtype="bool"),
                }
            )

    return tracks.select("track_id", "bytes", "codec", "sample_rate").mapInPandas(
        featurize,
        "track_id string, duration_sec double, rms double, zcr double, "
        "centroid_hz double, decoded boolean",
    )


def sample_video_frames(
    videos: DataFrame, every_n: int = 30, codec_col: str = "codec"
) -> DataFrame:
    """Frame sampling over (video_id, bytes[, codec]): every ``every_n``-th
    frame, decoded and re-encoded as PNG -> (video_id, frame_idx, frame_png,
    mean_luma). YUV4MPEG2 ("y4m") decodes for real (sources/video.py);
    compressed codecs raise NotImplementedError exactly at the decode call.
    Rows fan OUT (one per sampled frame), so mapInPandas yields one output
    frame-batch per input video to bound Arrow batch memory by the video,
    not the batch."""

    has_codec = codec_col in videos.columns
    cols = ["video_id", "bytes"] + ([codec_col] if has_codec else [])

    def sample(batches):
        from webscraping_spark.sources import images, video

        for pdf in batches:
            for i in range(len(pdf)):
                codec = pdf[codec_col].iloc[i] if has_codec else "y4m"
                if codec != "y4m":
                    raise NotImplementedError(
                        f"video codec {codec!r} not available in this environment"
                    )
                frames, _ = video.decode_y4m(bytes(pdf["bytes"].iloc[i]))
                idxs = list(range(0, frames.shape[0], every_n))
                lum = np.array([0.299, 0.587, 0.114])
                yield pd.DataFrame(
                    {
                        "video_id": [pdf["video_id"].iloc[i]] * len(idxs),
                        "frame_idx": pd.Series(idxs, dtype="int64"),
                        "frame_png": [
                            bytearray(images.encode_png(frames[j])) for j in idxs
                        ],
                        "mean_luma": pd.Series(
                            [float((frames[j] @ lum).mean()) for j in idxs],
                            dtype="float64",
                        ),
                    }
                )
            yield pd.DataFrame(
                {
                    "video_id": pd.Series([], dtype="object"),
                    "frame_idx": pd.Series([], dtype="int64"),
                    "frame_png": pd.Series([], dtype="object"),
                    "mean_luma": pd.Series([], dtype="float64"),
                }
            )

    return videos.select(*cols).mapInPandas(
        sample,
        "video_id string, frame_idx long, frame_png binary, mean_luma double",
    )


def image_quality(pages: DataFrame) -> DataFrame:
    """No-reference image quality signals — the pixel-level curation stage
    LAION-style pipelines run AFTER the metadata gate (image_caption_filter
    decides without decoding; this op is the decode-and-look pass for the
    survivors): ``(image_id, w, h, sharpness, contrast, brightness,
    colorfulness, entropy)``.

    - ``sharpness``: variance of the 3x3 Laplacian over the image interior
      (the classic blur detector — Pech-Pacheco et al. 2000); a blurred or
      out-of-focus image scores near 0, and 0 exactly when under 3x3 or
      constant.
    - ``contrast``: RMS contrast (population std of the BT.601 gray plane).
    - ``brightness``: mean gray — the over/under-exposure signal.
    - ``colorfulness``: Hasler-Suesstrunk (2003) opponent-axis metric
      ``sqrt(std_rg^2 + std_yb^2) + 0.3 * sqrt(mean_rg^2 + mean_yb^2)``;
      exactly 0 for grayscale content (rg and yb vanish identically).
    - ``entropy``: Shannon bits over the 256-bin floor-quantized gray
      histogram; 0 exactly for flat images, <= 8 always.

    All per-image math is vectorized numpy inside one ``mapInPandas`` pass
    (decode cannot stay JVM-side); undecodable rows are skipped, matching
    every other decode op here. At 10^10 images this is an embarrassingly
    parallel map — no shuffle, state bounded by one Arrow batch. Gate the
    scores relationally with :func:`gate_image_quality` so the thresholds
    stay in codegen and compose with the caption gate's ``keep``."""

    def score(batches):
        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in (
                    "image_id",
                    "w",
                    "h",
                    "sharpness",
                    "contrast",
                    "brightness",
                    "colorfulness",
                    "entropy",
                )
            }
            for i in range(len(pdf)):
                try:
                    px = images.decode_image(
                        bytes(pdf["bytes"].iloc[i]), pdf["fmt"].iloc[i]
                    )
                except Exception:
                    continue
                rgb = px.astype(np.float64)
                gray = rgb @ np.array([0.299, 0.587, 0.114])
                h, w = gray.shape
                if h >= 3 and w >= 3:
                    c = gray[1:-1, 1:-1]
                    lap = (
                        4.0 * c
                        - gray[:-2, 1:-1]
                        - gray[2:, 1:-1]
                        - gray[1:-1, :-2]
                        - gray[1:-1, 2:]
                    )
                    sharp = float(lap.var())
                else:
                    sharp = 0.0
                rg = rgb[:, :, 0] - rgb[:, :, 1]
                yb = 0.5 * (rgb[:, :, 0] + rgb[:, :, 1]) - rgb[:, :, 2]
                colorful = float(
                    np.sqrt(rg.std() ** 2 + yb.std() ** 2)
                    + 0.3 * np.sqrt(rg.mean() ** 2 + yb.mean() ** 2)
                )
                hist = np.bincount(
                    np.clip(gray, 0.0, 255.0).astype(np.int64).ravel(),
                    minlength=256,
                )
                p = hist[hist > 0] / gray.size
                out["image_id"].append(pdf["image_id"].iloc[i])
                out["w"].append(w)
                out["h"].append(h)
                out["sharpness"].append(sharp)
                out["contrast"].append(float(gray.std()))
                out["brightness"].append(float(gray.mean()))
                out["colorfulness"].append(colorful)
                out["entropy"].append(float(-(p * np.log2(p)).sum()))
            yield pd.DataFrame(out)

    return pages.select("image_id", "bytes", "fmt").mapInPandas(
        score,
        "image_id string, w int, h int, sharpness double, contrast double, "
        "brightness double, colorfulness double, entropy double",
    )


def gate_image_quality(
    pages: DataFrame,
    min_sharpness: float = 10.0,
    min_contrast: float = 4.0,
    min_entropy: float = 2.0,
    brightness_range: tuple[float, float] = (16.0, 240.0),
) -> DataFrame:
    """:func:`image_quality` plus the ANDed ``keep`` flag: drop blurry
    (sharpness), flat/low-dynamic-range (contrast, entropy) and over/
    under-exposed (brightness window) images. The thresholds live in one
    codegen projection OVER the scored frame, so the flag composes with
    ``image_caption_filter``'s metadata ``keep`` by a plain AND — the
    decode pass stays the only Python."""
    q = image_quality(pages)
    lo, hi = brightness_range
    keep = (
        (F.col("sharpness") >= float(min_sharpness))
        & (F.col("contrast") >= float(min_contrast))
        & (F.col("entropy") >= float(min_entropy))
        & F.col("brightness").between(float(lo), float(hi))
    )
    return q.withColumn("keep", keep)


def image_caption_filter(
    pairs: DataFrame,
    caption_col: str = "caption",
    w_col: str = "w",
    h_col: str = "h",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    clip_col: str | None = None,
    min_side: int = 64,
    max_aspect: float = 3.0,
    min_chars: int = 5,
    min_words: int = 2,
    min_bytes: int = 100,
    allowed_formats: tuple[str, ...] | None = None,
    min_clip: float = 0.28,
) -> DataFrame:
    """LAION/DataComp-style image-caption pair curation (Schuhmann et al.
    2021 §2.2; Gadre et al. 2023) over the input_hint table shape
    ``(image_id, bytes, w, h, fmt, caption, phash)``: the metadata gates
    that decide a pair's fate WITHOUT decoding pixels — at 10^10 pairs the
    cheapest image is the one never decoded, the same economics as the URL
    quality gate one stage earlier.

    Appends one signal column per rule plus the ANDed ``keep`` flag, all
    one whole-stage-codegen projection — zero shuffle, zero Python, fuses
    into whatever stage already scans the metadata (the payload column is
    touched only by ``octet_length`` — its length, never a decode):

    - ``caption_chars`` / ``caption_words`` — LAION drops captions under
      5 characters; DataComp under 2 words (whitespace tokens).
    - ``min_dim`` — smallest image side; thumbnails train nothing.
    - ``aspect_ok`` — ``greatest(w,h) <= max_aspect * least(w,h)``: one
      exactly-rounded IEEE multiply, no division, so the decision is
      bit-reproducible across engines (banners/sliders fail it).
    - ``bytes_len`` — tracking pixels and truncated fetches are tiny.
    - ``fmt_ok`` — optional decodable-format allowlist.
    - CLIP-score gate: the production seam. Computing CLIP needs a model
      forward pass (out of scope here); pass ``clip_col`` naming a
      precomputed score column and the ``>= min_clip`` gate joins the AND
      — omitted entirely when ``clip_col`` is None rather than faked.

    Every threshold is a kwarg. NULL caption counts as 0 chars / 0 words
    (dropped), matching the curation convention that missing alt-text is
    an empty caption.
    """
    cap = F.col(caption_col)
    trimmed = F.trim(cap)
    w, h = F.col(w_col), F.col(h_col)
    sig = {
        "caption_chars": F.coalesce(F.length(trimmed), F.lit(0)).cast("int"),
        "caption_words": F.when(
            F.coalesce(trimmed, F.lit("")) == "", F.lit(0)
        )
        .otherwise(F.size(F.split(trimmed, r"\s+")))
        .cast("int"),
        "min_dim": F.least(w, h).cast("int"),
        "aspect_ok": F.greatest(w, h).cast("double")
        <= F.lit(float(max_aspect)) * F.least(w, h).cast("double"),
        "bytes_len": F.octet_length(F.col(bytes_col)).cast("int"),
    }
    if allowed_formats is not None:
        sig["fmt_ok"] = F.col(fmt_col).isin(*allowed_formats)
    keep = (
        (sig["caption_chars"] >= min_chars)
        & (sig["caption_words"] >= min_words)
        & (sig["min_dim"] >= min_side)
        & sig["aspect_ok"]
        & (sig["bytes_len"] >= min_bytes)
    )
    if allowed_formats is not None:
        keep = keep & sig["fmt_ok"]
    if clip_col is not None:
        keep = keep & (F.col(clip_col) >= min_clip)
    return pairs.select(
        "*", *(c.alias(n) for n, c in sig.items()), keep.alias("keep")
    )


def dedup_images_keep_sharpest(
    pages: DataFrame, max_hamming: int = 3, method: str = "avg"
) -> DataFrame:
    """Image dedup that keeps the BEST copy, not an arbitrary one — the
    LAION keep-best-rendition move: near-dup clusters come from the
    perceptual-hash banded join (:func:`image_near_dupes` ->
    ``dedup.connected_components``), and the survivor per cluster is the
    member with the highest Laplacian-variance sharpness
    (:func:`image_quality`; min id on ties, NULL-safe fallback —
    ``dedup.keep_best_representatives``'s contract). A blurry re-encode
    or downscale loses to its source instead of winning by id order.

    Composition of three already-hard-oracled operators; the only new
    code is the wiring, so the shuffle story is theirs: banded equi-join
    candidates (no all-pairs), O(log n)-round components, winner groupBy
    over clustered rows only. Returns the surviving pages rows (original
    columns) plus their ``sharpness``."""
    from webscraping_spark.operators.dedup import (
        connected_components,
        keep_best_representatives,
    )

    pairs = image_near_dupes(pages, max_hamming=max_hamming, method=method)
    comps = connected_components(pairs.select("id_a", "id_b"))
    scored = pages.join(
        image_quality(pages).select("image_id", "sharpness"), "image_id"
    )
    return keep_best_representatives(
        scored, comps, "sharpness", id_col="image_id"
    )
