"""Baseline JPEG codec (`pipeline/jpeg.py`) — round-trips through our
own encoder (both directions implemented from the public T.81 spec),
plus the full Spark `decode_images` path over a JPEG fixture (reference
consumes JPEG data URLs in `vision.py:24-55`; VERDICT r3 item 6)."""

from __future__ import annotations

import numpy as np
import pytest

from grafeo_memory_spark.pipeline.jpeg import decode_jpeg, encode_jpeg
from grafeo_memory_spark.pipeline.multimodal import (
    decode_images,
    real_image_decode,
    real_resize,
)


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 // max(1, w - 1),
            yy * 255 // max(1, h - 1),
            (xx + yy) * 255 // max(1, w + h - 2),
        ],
        axis=2,
    ).astype(np.uint8)


class TestRoundTrip:
    def test_smooth_rgb_small_error(self):
        img = _gradient(40, 56)
        dec = decode_jpeg(encode_jpeg(img, quality=95))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= 8 and err.mean() < 2.0

    def test_flat_color_exact_enough(self):
        img = np.full((16, 16, 3), (200, 60, 10), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quality=90))
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3

    def test_grayscale_single_component(self):
        g = (np.arange(24 * 24).reshape(24, 24) % 256).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(g, quality=92))
        assert dec.shape == (24, 24, 3)
        # all three channels identical (gray broadcast)
        assert np.array_equal(dec[:, :, 0], dec[:, :, 1])

    def test_non_multiple_of_8_dimensions(self):
        img = _gradient(13, 21)
        dec = decode_jpeg(encode_jpeg(img, quality=95))
        assert dec.shape == (13, 21, 3)
        assert np.abs(dec.astype(int) - img.astype(int)).mean() < 3.0

    def test_quality_monotone(self):
        img = _gradient(32, 32)
        errs = [
            np.abs(
                decode_jpeg(encode_jpeg(img, quality=q)).astype(int)
                - img.astype(int)
            ).mean()
            for q in (30, 70, 95)
        ]
        assert errs[0] >= errs[1] >= errs[2]

    def test_high_frequency_content_survives(self):
        rng = np.random.default_rng(11)
        noise = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(noise, quality=75))
        # lossy, but decode must stay in range and roughly correlated
        assert dec.dtype == np.uint8 and dec.shape == noise.shape
        corr = np.corrcoef(
            dec.astype(float).ravel(), noise.astype(float).ravel()
        )[0, 1]
        assert corr > 0.5


class TestValidation:
    def test_rejects_non_jpeg(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"BMnotajpeg")

    def test_baseline_scan_in_progressive_frame_rejected(self):
        # flipping SOF0 -> SOF2 leaves a full-spectrum interleaved scan,
        # which progressive forbids (DC scans must have Se=0)
        img = _gradient(8, 8)
        enc = bytearray(encode_jpeg(img))
        i = enc.find(b"\xff\xc0")
        enc[i + 1] = 0xC2
        with pytest.raises(ValueError, match="Se=0"):
            decode_jpeg(bytes(enc))

    def test_arithmetic_coding_raises_not_implemented(self):
        img = _gradient(8, 8)
        enc = bytearray(encode_jpeg(img))
        i = enc.find(b"\xff\xc0")
        enc[i + 1] = 0xC9  # SOF9: arithmetic sequential
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(enc))


class TestSparkPath:
    def test_jpeg_through_decode_images(self, spark):
        solid = np.full((6, 9, 3), 100, dtype=np.uint8)
        assets = spark.createDataFrame(
            [(1, "image", bytearray(encode_jpeg(solid, quality=95)), None)],
            "asset_id long, kind string, payload binary, meta string",
        )
        rows = decode_images(assets, dims=4, decode=real_image_decode).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["width"], r["height"]) == (9, 6)
        # value 100 ± small quantization error lands in bin 1 of [0,256)/4
        assert r["features"][1] == pytest.approx(1.0)

    def test_jpeg_resize_kernel(self):
        img = np.zeros((8, 8, 3), dtype=np.uint8)
        img[:, 4:] = 255
        out = real_resize(encode_jpeg(img, quality=95), 4, 4)
        from grafeo_memory_spark.pipeline.multimodal import decode_bmp

        dec = decode_bmp(out)
        assert dec.shape == (4, 4, 3)
        assert dec[:, :2].mean() < 40 and dec[:, 2:].mean() > 215


class TestProgressive:
    """Progressive (SOF2) support: the progressive encoder quantizes
    identically to the baseline one, so decodes of both encodings of
    the same image must be EXACTLY equal — a self-validating pin over
    every Annex-G scan path (DC first/refine, AC first with EOB runs,
    AC refinement with correction bits, two spectral bands)."""

    def _img(self, h, w, seed=3):
        import numpy as np

        y, x = np.mgrid[0:h, 0:w]
        r = ((x * 7 + y * 3 + seed) % 256).astype(np.uint8)
        g = ((x * 2 + y * 11 + 2 * seed) % 256).astype(np.uint8)
        b = ((x * 13 + y * 5) % 256).astype(np.uint8)
        return np.stack([r, g, b], axis=2)

    def test_color_round_trip_equals_baseline(self):
        import numpy as np

        from grafeo_memory_spark.pipeline.jpeg import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        img = self._img(40, 56)
        for q in (50, 90):
            base = decode_jpeg(encode_jpeg(img, quality=q))
            prog = decode_jpeg(encode_jpeg_progressive(img, quality=q))
            assert np.array_equal(base, prog), f"quality={q}"

    def test_gray_and_non_multiple_of_8(self):
        import numpy as np

        from grafeo_memory_spark.pipeline.jpeg import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        gray = (np.add.outer(np.arange(37), np.arange(51)) % 256).astype(
            np.uint8
        )
        base = decode_jpeg(encode_jpeg(gray, quality=75))
        prog = decode_jpeg(encode_jpeg_progressive(gray, quality=75))
        assert np.array_equal(base, prog)

    def test_flat_image_exercises_eob_runs(self):
        import numpy as np

        from grafeo_memory_spark.pipeline.jpeg import (
            decode_jpeg,
            encode_jpeg_progressive,
        )

        # large flat regions → every AC block is an EOB → long EOB runs
        img = np.full((64, 64, 3), 200, dtype=np.uint8)
        img[:8, :8] = 10  # one busy corner so scans aren't degenerate
        out = decode_jpeg(encode_jpeg_progressive(img, quality=90))
        assert out.shape == (64, 64, 3)
        assert abs(int(out[32, 32, 0]) - 200) <= 2

    def test_marker_says_sof2(self):
        from grafeo_memory_spark.pipeline.jpeg import (
            encode_jpeg_progressive,
        )

        payload = encode_jpeg_progressive(self._img(16, 16))
        assert b"\xff\xc2" in payload  # SOF2 marker present
        assert b"\xff\xc0" not in payload
