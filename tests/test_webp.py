"""VP8L (lossless WebP) codec subset: bit-exact round trips over the
literal / LZ77-run / color-cache / subtract-green paths, Huffman
machinery invariants, container validation, and the multimodal
dispatch hook."""

from __future__ import annotations

import numpy as np
import pytest

from grafeo_memory_spark.pipeline.webp import (
    _canonical_codes,
    _huffman_lengths,
    _prefix_value_decode,
    _prefix_value_encode,
    decode_webp,
    encode_webp_lossless,
)


def _gradient(h, w, seed=0):
    y, x = np.mgrid[0:h, 0:w]
    r = ((x * 5 + y * 3 + seed) % 256).astype(np.uint8)
    g = ((x * 11 + y * 7) % 256).astype(np.uint8)
    b = ((x + y * 13 + 2 * seed) % 256).astype(np.uint8)
    return np.stack([r, g, b], axis=2)


class TestHuffmanMachinery:
    def test_package_merge_is_kraft_complete(self):
        freqs = [0] * 300
        for i, f in enumerate([90, 40, 30, 10, 5, 5, 3, 2, 1, 1]):
            freqs[i * 7] = f
        lengths = _huffman_lengths(freqs)
        kraft = sum(2 ** -ln for ln in lengths if ln > 0)
        assert kraft == 1.0  # complete code — required by VP8L
        assert max(lengths) <= 15

    def test_canonical_codes_are_prefix_free(self):
        lengths = [3, 3, 3, 3, 3, 2, 4, 4]
        codes = _canonical_codes(lengths)
        seen = set()
        for sym, (code, ln) in codes.items():
            bits = format(code, f"0{ln}b")
            for other in seen:
                assert not bits.startswith(other) and not other.startswith(
                    bits
                )
            seen.add(bits)

    def test_prefix_value_round_trip(self):
        class R:
            def __init__(self, bits):
                self.bits = bits
                self.i = 0

            def read_bits(self, n):
                v = self.bits
                self.bits = 0
                return v

        for v in [1, 2, 3, 4, 5, 7, 8, 20, 121, 1000, 50_000]:
            c, extra, nbits = _prefix_value_encode(v)
            assert _prefix_value_decode(R(extra), c) == v


class TestRoundTrip:
    def test_gradient_rgb(self):
        img = _gradient(23, 37)
        out = decode_webp(encode_webp_lossless(img))
        assert out.shape == (23, 37, 4)
        assert np.array_equal(out[:, :, :3], img)
        assert (out[:, :, 3] == 255).all()

    def test_flat_runs_exercise_lz77(self):
        img = np.full((32, 48, 3), 77, dtype=np.uint8)
        img[10:14, :] = (1, 2, 3)
        out = decode_webp(encode_webp_lossless(img))
        assert np.array_equal(out[:, :, :3], img)

    def test_repeated_palette_exercises_color_cache(self):
        rng = [(10, 20, 30), (200, 100, 50), (0, 0, 0), (255, 255, 255)]
        img = np.array(
            [[rng[(x * 7 + y) % 4] for x in range(31)] for y in range(17)],
            dtype=np.uint8,
        )
        out = decode_webp(encode_webp_lossless(img, cache_bits=4))
        assert np.array_equal(out[:, :, :3], img)

    def test_rgba_alpha_survives(self):
        img = np.zeros((9, 11, 4), dtype=np.uint8)
        img[:, :, 0] = 120
        img[:, :, 3] = np.arange(11, dtype=np.uint8) * 20 % 256
        out = decode_webp(encode_webp_lossless(img))
        assert np.array_equal(out, img)

    def test_gray_input(self):
        gray = (np.add.outer(np.arange(13), np.arange(29)) % 256).astype(
            np.uint8
        )
        out = decode_webp(encode_webp_lossless(gray))
        assert np.array_equal(out[:, :, 0], gray)
        assert np.array_equal(out[:, :, 1], gray)

    def test_without_subtract_green(self):
        img = _gradient(12, 12, seed=5)
        out = decode_webp(
            encode_webp_lossless(img, use_subtract_green=False)
        )
        assert np.array_equal(out[:, :, :3], img)

    def test_single_pixel_and_1xN(self):
        one = np.array([[[9, 8, 7]]], dtype=np.uint8)
        assert np.array_equal(
            decode_webp(encode_webp_lossless(one))[:, :, :3], one
        )
        row = _gradient(1, 64)
        assert np.array_equal(
            decode_webp(encode_webp_lossless(row))[:, :, :3], row
        )


class TestValidation:
    def test_not_riff_rejected(self):
        with pytest.raises(ValueError, match="not a WebP"):
            decode_webp(b"JUNKJUNKJUNKJUNK")

    def test_lossy_vp8_raises_not_implemented(self):
        payload = bytearray(encode_webp_lossless(_gradient(8, 8)))
        payload[12:16] = b"VP8 "
        with pytest.raises(NotImplementedError, match="lossy"):
            decode_webp(bytes(payload))

    def test_dispatch_through_decode_image(self):
        from grafeo_memory_spark.pipeline.multimodal import decode_image

        img = _gradient(10, 14)
        out = decode_image(encode_webp_lossless(img))
        assert np.array_equal(out[:, :, :3], img)


class TestSolidColorSimpleCode:
    """ADVICE r5 (high): the VP8L simple prefix-code form stores symbols
    in 8 bits, so wide green-channel symbols (LZ77 copy codes 256+c,
    color-cache codes 280+slot) must take the CL-coded path — a solid
    color image (one literal + one copy token) used to emit a corrupt
    bitstream."""

    @pytest.mark.parametrize(
        "color", [[255, 0, 0], [0, 0, 0], [7, 200, 13], [255, 255, 255]]
    )
    def test_solid_color_round_trips(self, color):
        img = np.full((4, 4, 3), color, dtype=np.uint8)
        out = decode_webp(encode_webp_lossless(img))
        assert np.array_equal(out[:, :, :3], img)

    def test_two_tone_rows_round_trip(self):
        # long runs -> copy-code-dominated green alphabet
        img = np.zeros((8, 32, 3), dtype=np.uint8)
        img[4:] = [200, 100, 50]
        out = decode_webp(encode_webp_lossless(img))
        assert np.array_equal(out[:, :, :3], img)
