"""Property tests for the round-7 codecs: random inputs through the
encode/decode pairs. The lossless formats (WebP/VP8L, GIF, FLAC, PNG)
must roundtrip BIT-EXACTLY for every input; JPEG's progressive and
baseline encodings of the same image must decode identically. These
sweep the edges the fixed tests can't enumerate — extreme values,
tiny dimensions, degenerate palettes, constant runs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

dims = st.tuples(st.integers(1, 40), st.integers(1, 40))
seeds = st.integers(0, 2**31 - 1)


def _rand_img(h, w, seed, ch=3, levels=256):
    rng = np.random.default_rng(seed)
    return rng.integers(0, levels, (h, w, ch)).astype(np.uint8) * (256 // levels)


class TestWebpProperties:
    @settings(max_examples=25, deadline=None)
    @given(dims, seeds, st.booleans())
    def test_vp8l_roundtrip_exact(self, hw, seed, subtract_green):
        from heavykeeper_rs_spark.operators.webp import (
            decode_webp,
            encode_webp_lossless,
        )

        h, w = hw
        img = _rand_img(h, w, seed)
        out = decode_webp(encode_webp_lossless(img, subtract_green=subtract_green))
        assert (out == img).all()

    @settings(max_examples=15, deadline=None)
    @given(dims, seeds, st.integers(0, 13))
    def test_vp8l_predictor_roundtrip_exact(self, hw, seed, mode):
        from heavykeeper_rs_spark.operators.webp import (
            decode_webp,
            encode_webp_lossless,
        )

        h, w = hw
        img = _rand_img(h, w, seed)
        assert (decode_webp(encode_webp_lossless(img, predictor=mode)) == img).all()

    @settings(max_examples=15, deadline=None)
    @given(dims, seeds)
    def test_vp8l_rgba_roundtrip_exact(self, hw, seed):
        from heavykeeper_rs_spark.operators.webp import (
            decode_webp,
            encode_webp_lossless,
        )

        h, w = hw
        img = _rand_img(h, w, seed, ch=4)
        out = decode_webp(encode_webp_lossless(img))
        if (img[:, :, 3] == 255).all():
            assert (out == img[:, :, :3]).all()
        else:
            assert (out == img).all()


class TestGifProperties:
    @settings(max_examples=25, deadline=None)
    @given(dims, seeds, st.booleans(), st.sampled_from([2, 5, 17, 64, 256]))
    def test_gif_roundtrip_exact(self, hw, seed, interlace, n_colors):
        from heavykeeper_rs_spark.operators.gif import decode_gif, encode_gif

        h, w = hw
        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, (n_colors, 3)).astype(np.uint8)
        img = pal[rng.integers(0, n_colors, (h, w))]
        assert (decode_gif(encode_gif(img, interlace=interlace)) == img).all()

    @settings(max_examples=10, deadline=None)
    @given(st.integers(1, 12), st.integers(1, 12), seeds, st.integers(2, 4))
    def test_gif_animation_roundtrip_exact(self, h, w, seed, n_frames):
        from heavykeeper_rs_spark.operators.gif import decode_gif, encode_gif

        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
        frames = pal[rng.integers(0, 16, (n_frames, h, w))]
        out = decode_gif(encode_gif(frames), all_frames=True)
        assert (out == frames).all()


class TestFlacProperties:
    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(1, 5000),
        seeds,
        st.integers(1, 2),
        st.sampled_from([None, "ls", "rs", "ms"]),
        st.sampled_from([256, 1024]),
    )
    def test_flac_roundtrip_exact(self, n, seed, ch, mode, block):
        from heavykeeper_rs_spark.operators.flac import decode_flac, encode_flac

        if mode is not None and ch != 2:
            ch = 2
        rng = np.random.default_rng(seed)
        # full int16 range including the extremes
        pcm = rng.integers(-(1 << 15), 1 << 15, (n, ch)).astype(np.int16)
        s, rate, bps = decode_flac(
            encode_flac(pcm, rate=16000, block_size=block, stereo_mode=mode)
        )
        assert bps == 16 and rate == 16000
        assert (s == pcm).all()


class TestJpegProperties:
    @settings(max_examples=15, deadline=None)
    @given(dims, seeds, st.booleans(), st.sampled_from([55, 80, 95]))
    def test_progressive_equals_baseline(self, hw, seed, subsample, quality):
        from heavykeeper_rs_spark.operators.jpeg import decode_jpeg, encode_jpeg

        h, w = hw
        img = _rand_img(h, w, seed)
        base = decode_jpeg(encode_jpeg(img, quality=quality, subsample=subsample))
        prog = decode_jpeg(
            encode_jpeg(img, quality=quality, subsample=subsample,
                        progressive=True)
        )
        assert (base == prog).all()

    @settings(max_examples=10, deadline=None)
    @given(dims, seeds)
    def test_restart_markers_are_transparent(self, hw, seed):
        from heavykeeper_rs_spark.operators.jpeg import decode_jpeg, encode_jpeg

        h, w = hw
        img = _rand_img(h, w, seed)
        a = decode_jpeg(encode_jpeg(img, quality=90))
        b = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=3))
        assert (a == b).all()


class TestTiffProperties:
    @settings(max_examples=25, deadline=None)
    @given(
        dims,
        seeds,
        st.sampled_from(["none", "packbits", "lzw"]),
        st.booleans(),
        st.integers(1, 9),
    )
    def test_tiff_roundtrip_exact(self, hw, seed, comp, pred, rps):
        from heavykeeper_rs_spark.operators.tiff import decode_tiff, encode_tiff

        h, w = hw
        img = _rand_img(h, w, seed)
        out = decode_tiff(
            encode_tiff(img, compression=comp, predictor=pred,
                        rows_per_strip=rps)
        )
        assert (out == img).all()

    @settings(max_examples=10, deadline=None)
    @given(dims, seeds)
    def test_tiff_gray_and_rgba_exact(self, hw, seed):
        from heavykeeper_rs_spark.operators.tiff import decode_tiff, encode_tiff

        h, w = hw
        g = _rand_img(h, w, seed, ch=1)[:, :, 0]
        assert (decode_tiff(encode_tiff(g, compression="packbits")) == g).all()
        rgba = _rand_img(h, w, seed, ch=4)
        assert (decode_tiff(encode_tiff(rgba, compression="lzw",
                                        predictor=True)) == rgba).all()
