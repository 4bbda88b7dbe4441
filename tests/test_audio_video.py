"""Pure-codec tests for the WAV (sources/audio.py) and YUV4MPEG2
(sources/video.py) containers — the real decode paths behind the
multimodal audio/video operators (the Spark-side tests live in
test_dedup_similarity.TestMultimodal)."""

import struct

import numpy as np
import pytest

from webscraping_spark.sources import audio, video


class TestWav:
    def test_roundtrip_16bit_mono(self):
        pcm = audio.synth_tone(440.0, 0.8, 1000, 8000)
        blob = audio.encode_wav(pcm, 8000)
        got, rate = audio.decode_wav(blob)
        assert rate == 8000
        assert got.shape == (1000, 1)
        assert np.array_equal(got, pcm)

    def test_roundtrip_stereo(self):
        pcm = audio.synth_tone(100.0, 0.3, 500, 44100, n_channels=2)
        got, rate = audio.decode_wav(audio.encode_wav(pcm, 44100))
        assert rate == 44100
        assert got.shape == (500, 2)
        assert np.array_equal(got, pcm)

    def test_8bit_rebias(self):
        pcm = audio.synth_tone(200.0, 0.9, 256, 8000)
        got, _ = audio.decode_wav(audio.encode_wav(pcm, 8000, bits=8))
        # 8-bit keeps only the high byte; reconstruction within one LSB<<8
        assert np.abs(got.astype(int) - pcm.astype(int)).max() <= 256

    def test_chunk_walking_skips_extra_chunks(self):
        """A real-world WAV may carry LIST/fact chunks before data."""
        pcm = audio.synth_tone(50.0, 0.5, 64, 8000)
        blob = audio.encode_wav(pcm, 8000)
        # splice a LIST chunk between fmt and data
        fmt_end = blob.index(b"data")
        extra = b"LIST" + struct.pack("<I", 6) + b"INFOxx"
        spliced = blob[:fmt_end] + extra + blob[fmt_end:]
        spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
        got, rate = audio.decode_wav(spliced)
        assert rate == 8000 and np.array_equal(got, pcm)

    def test_rejects_non_wav(self):
        with pytest.raises(ValueError):
            audio.decode_wav(b"\x89PNG not audio at all...")

    def test_analytic_features(self):
        rate = 8000
        pcm = audio.synth_tone(1000.0, 0.25, rate, rate)  # exactly 1 s
        assert audio.rms_level(pcm) == pytest.approx(0.25 / 2**0.5, rel=1e-3)
        assert audio.zero_crossing_rate(pcm) == pytest.approx(0.25, rel=0.01)
        assert audio.spectral_centroid_hz(pcm, rate) == pytest.approx(1000.0, rel=0.01)


class TestY4m:
    def test_roundtrip_c444(self):
        frames = video.synth_flat_frames(3, n_frames=4, w=16, h=12)
        got, fps = video.decode_y4m(video.encode_y4m(frames, fps=(30, 1)))
        assert fps == (30, 1)
        assert got.shape == frames.shape
        assert np.abs(got.astype(int) - frames.astype(int)).max() <= 1

    def test_roundtrip_c420_subsampled(self):
        frames = video.synth_flat_frames(5, n_frames=2, w=16, h=12)
        got, _ = video.decode_y4m(video.encode_y4m(frames, chroma="420"))
        # constant-color frames survive 2x2 chroma subsampling within +/-2
        assert np.abs(got.astype(int) - frames.astype(int)).max() <= 2

    def test_default_chroma_is_420(self):
        frames = video.synth_flat_frames(1, n_frames=1, w=4, h=4)
        blob = video.encode_y4m(frames, chroma="420")
        stripped = blob.replace(b" C420", b"", 1)  # header with no C tag
        got, _ = video.decode_y4m(stripped)
        assert got.shape == (1, 4, 4, 3)

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            video.decode_y4m(b"MPEG4 nope\nFRAME\n")

    def test_yuv_matrix_inverts(self):
        rng = np.random.default_rng(3)
        rgb = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
        back = video.yuv_to_rgb(video.rgb_to_yuv(rgb))
        assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 2
