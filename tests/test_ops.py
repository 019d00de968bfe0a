"""Tests for the core op layer: shuffles, DCT, color, SSIM, quantization, manipulations."""
import functools
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.fft

from neural_imaging_tpu.ops import color, dct, kernels, manipulations, ops, quantization

jax.config.update('jax_enable_x64', False)


class TestShuffles:
    def test_depth_to_space_tf_semantics(self, rng):
        x = rng.random((2, 3, 4, 12)).astype(np.float32)
        out = np.asarray(ops.depth_to_space(jnp.array(x), 2))
        # manual TF reference: out[n, h*2+i, w*2+j, c] = x[n, h, w, (i*2+j)*3 + c]
        expected = np.zeros((2, 6, 8, 3), dtype=np.float32)
        for n in range(2):
            for h in range(3):
                for w in range(4):
                    for i in range(2):
                        for j in range(2):
                            for c in range(3):
                                expected[n, h * 2 + i, w * 2 + j, c] = x[n, h, w, (i * 2 + j) * 3 + c]
        assert np.allclose(out, expected)

    def test_space_to_depth_inverse(self, rng):
        x = jnp.array(rng.random((2, 8, 8, 3)).astype(np.float32))
        assert np.allclose(ops.depth_to_space(ops.space_to_depth(x, 2), 2), x)

    def test_upsampling_kernel_routing(self, rng):
        """upsampling kernel + depth_to_space must scatter the RGGB stack back to
        the correct mosaic positions for every CFA pattern."""
        from neural_imaging_tpu.data import bayer
        img = rng.random((6, 6, 3)).astype(np.float32)
        for cfa in ['GBRG', 'RGGB', 'BGGR']:
            stack = bayer.stack_bayer(img, cfa)[None]
            upk = kernels.upsampling_kernel(cfa).reshape(1, 1, 4, 12)
            h12 = ops.conv2d(jnp.array(stack), upk)
            mosaic_rgb = np.asarray(ops.depth_to_space(h12, 2))[0]
            assert np.allclose(mosaic_rgb, bayer.simulate_bayer(img, cfa), atol=1e-6), cfa


class TestDCT:
    def test_matches_scipy_orthonormal(self, rng):
        blocks = rng.standard_normal((5, 8, 8)).astype(np.float32)
        out = np.asarray(dct.dct2d(jnp.array(blocks)))
        expected = scipy.fft.dctn(blocks, axes=(1, 2), norm='ortho', type=2)
        assert np.allclose(out, expected, atol=1e-4)

    def test_roundtrip(self, rng):
        blocks = rng.standard_normal((5, 8, 8)).astype(np.float32)
        rec = np.asarray(dct.idct2d(dct.dct2d(jnp.array(blocks))))
        assert np.allclose(rec, blocks, atol=1e-4)

    def test_blockify_roundtrip(self, rng):
        x = jnp.array(rng.random((2, 16, 24, 3)).astype(np.float32))
        blocks = dct.blockify(x, 8)
        assert blocks.shape == (2, 3, 2, 3, 8, 8)
        assert np.allclose(dct.deblockify(blocks), x)
        # block (0,0) of channel 0 is the top-left 8x8 tile
        assert np.allclose(blocks[0, 0, 0, 0], x[0, :8, :8, 0])


class TestColor:
    def test_ycbcr_roundtrip(self, rng):
        x = jnp.array(rng.random((2, 8, 8, 3)).astype(np.float32) * 255)
        rec = color.ycbcr_to_rgb(color.rgb_to_ycbcr(x))
        # the JFIF inverse constants are themselves rounded to 6 decimals, so the
        # round-trip is only approximate (~0.03 on the 255 scale)
        assert np.abs(np.asarray(rec) - np.asarray(x)).max() < 0.06

    def test_ycbcr_known_values(self):
        white = jnp.array([[[[255.0, 255.0, 255.0]]]])
        ycc = np.asarray(color.rgb_to_ycbcr(white))[0, 0, 0]
        assert np.allclose(ycc, [255, 128, 128], atol=0.1)

    def test_hsv_matches_matplotlib(self, rng):
        import matplotlib.colors as mcolors
        x = rng.random((32, 32, 3)).astype(np.float32)
        ours = np.asarray(color.rgb_to_hsv(jnp.array(x[None])))[0]
        ref = mcolors.rgb_to_hsv(x)
        assert np.abs(ours - ref).max() < 1e-5

    def test_hsv_roundtrip(self, rng):
        x = jnp.array(rng.random((2, 16, 16, 3)).astype(np.float32))
        rec = color.hsv_to_rgb(color.rgb_to_hsv(x))
        assert np.abs(np.asarray(rec) - np.asarray(x)).max() < 1e-5


class TestSSIM:
    def test_identity(self, rng):
        from neural_imaging_tpu.ops import ssim
        a = jnp.array(rng.random((2, 32, 32, 3)).astype(np.float32))
        val = np.asarray(ssim.ssim(a, a))
        assert np.allclose(val, 1.0, atol=1e-5)

    def test_monotone(self, rng):
        from neural_imaging_tpu.ops import ssim
        a = jnp.array(rng.random((1, 64, 64, 3)).astype(np.float32))
        n1 = jnp.clip(a + 0.02 * jnp.array(rng.standard_normal(a.shape).astype(np.float32)), 0, 1)
        n2 = jnp.clip(a + 0.2 * jnp.array(rng.standard_normal(a.shape).astype(np.float32)), 0, 1)
        s1, s2 = float(ssim.ssim(a, n1)[0]), float(ssim.ssim(a, n2)[0])
        assert 0 < s2 < s1 < 1

    def test_ms_ssim_runs(self, rng):
        from neural_imaging_tpu.ops import ssim
        a = jnp.array(rng.random((1, 180, 180, 3)).astype(np.float32))
        b = jnp.clip(a + 0.05, 0, 1)
        val = float(ssim.ms_ssim(a, b)[0])
        assert 0 < val <= 1.02  # weighted power product can slightly exceed 1

    def test_grad_flows(self, rng):
        from neural_imaging_tpu.ops import ssim
        a = jnp.array(rng.random((1, 32, 32, 3)).astype(np.float32))
        b = jnp.clip(a + 0.1, 0, 1)
        g = jax.grad(lambda y: jnp.mean(ssim.ssim(a, y)))(b)
        assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


class TestSTE:
    def test_st_clip(self):
        f = lambda x: jnp.sum(ops.st_clip(x))
        x = jnp.array([-0.5, 0.5, 1.5])
        y = ops.st_clip(x)
        assert np.allclose(y, [0, 0.5, 1])
        assert np.allclose(jax.grad(f)(x), [1, 1, 1])

    def test_soft_round_forward_and_grad(self):
        x = jnp.array([0.2, 0.5, 1.7, -0.4])
        assert np.allclose(ops.soft_round(x), np.round(np.asarray(x)))
        g = jax.grad(lambda v: jnp.sum(ops.soft_round(v)))(x)
        expected = 1 - np.cos(2 * np.pi * np.asarray(x))
        assert np.allclose(g, expected, atol=1e-5)

    def test_soft_quantization(self, rng):
        x = jnp.array(rng.random((8, 8)).astype(np.float32))
        q = np.asarray(ops.soft_quantization(x))
        assert np.allclose(q, np.round(np.asarray(x) * 255) / 255, atol=1e-6)


class TestQuantization:
    def test_modes_forward(self):
        x = jnp.array([0.2, 1.6, -2.3])
        assert np.allclose(quantization.quantize(x, 'round'), [0, 2, -2])
        assert np.allclose(quantization.quantize(x, 'identity'), x)
        assert np.allclose(quantization.quantize(x, 'soft'), [0, 2, -2])

    def test_default_codebook(self):
        cb = quantization.default_codebook(3)
        assert np.allclose(cb, [-3, -2, -1, 0, 1, 2, 3, 4])

    def test_soft_codebook_matches_float64_oracle(self, rng):
        """Log-space float32 weights must agree with the reference float64 direct form."""
        cb = quantization.default_codebook(5).astype(np.float64)
        x = rng.uniform(-18, 18, 4096)
        v, gamma_, eps = 50.0, 25.0, 1e-72
        d = gamma_ * (x[:, None] - cb[None, :])
        w64 = (1 + d ** 2 / v) ** (-(v + 1) / 2)
        w64 = (w64 + eps) / (w64 + eps).sum(axis=1, keepdims=True)
        soft64 = w64 @ cb
        hard64 = cb[np.argmax(w64, axis=1)]

        q = np.asarray(quantization.quantize(jnp.array(x, dtype=jnp.float32),
                                             'soft-codebook', cb.astype(np.float32)))
        assert np.allclose(q, hard64, atol=1e-4)  # forward = hard assignment

        w32 = np.asarray(quantization.codebook_weights(
            jnp.array(x, dtype=jnp.float32), jnp.array(cb, dtype=jnp.float32)))
        # tails differ where the reference's eps floor dominates; heads agree
        assert np.abs(w32 - w64).max() < 1e-4
        soft32 = w32 @ cb
        assert np.abs(soft32 - soft64).max() < 5e-4

    def test_soft_codebook_out_of_range_stable(self):
        cb = quantization.default_codebook(5)
        x = jnp.array([1000.0, -1000.0])
        q = np.asarray(quantization.quantize(x, 'soft-codebook', cb))
        assert np.isfinite(q).all()
        assert q[0] == cb.max() and q[1] == cb.min()

    def test_entropy_uniform_and_degenerate(self, rng):
        cb = quantization.default_codebook(4)
        samples = jnp.array(np.repeat(cb, 64).astype(np.float32))
        h, hist = quantization.entropy(samples, cb)
        assert abs(float(h) - 4.0) < 0.05
        h0, _ = quantization.entropy(jnp.zeros(1024), cb)
        assert float(h0) < 0.2

    def test_entropy_gradient_finite(self, rng):
        cb = quantization.default_codebook(4)
        x = jnp.array(rng.standard_normal(256).astype(np.float32) * 3)
        g = jax.grad(lambda v: quantization.entropy(v, cb)[0])(x)
        assert np.isfinite(np.asarray(g)).all()

    def test_quantize_with_entropy_consistent(self, rng):
        cb = quantization.default_codebook(5)
        x = jnp.array(rng.standard_normal((4, 8, 8, 2)).astype(np.float32) * 5)
        q, h, hist = quantization.quantize_with_entropy(x, cb)
        assert q.shape == x.shape
        assert 0 < float(h) <= 5.0
        assert np.allclose(np.asarray(hist).sum(), 1, atol=1e-5)


class TestManipulations:
    def setup_method(self):
        self.rng = np.random.default_rng(7)
        self.x = jnp.array(self.rng.random((2, 32, 32, 3)).astype(np.float32))

    @pytest.mark.slow
    def test_shapes_preserved(self):
        key = jax.random.PRNGKey(0)
        for name, fn in manipulations.MANIPULATIONS.items():
            if name == 'jpeg':
                continue  # tested with the JPEG model
            out = fn(self.x, manipulations.DEFAULT_STRENGTHS[name], key)
            assert out.shape == self.x.shape, name
            assert np.isfinite(np.asarray(out)).all(), name

    def test_median_known(self):
        x = jnp.zeros((1, 8, 8, 3)).at[0, 4, 4, :].set(1.0)  # single hot pixel
        out = manipulations.median(x, 3)
        assert float(out[0, 4, 4, 0]) == 0.0  # median removes the outlier

    def test_gaussian_smooths(self):
        out = manipulations.gaussian(self.x, 5, 2.0)
        assert float(jnp.var(out)) < float(jnp.var(self.x))

    def test_sharpen_boosts_highfreq(self):
        blurred = manipulations.gaussian(self.x, 5, 1.0)
        sharpened = manipulations.sharpen(blurred, 1.0)
        lap = lambda im: float(jnp.var(im[:, 1:] - im[:, :-1]))
        assert lap(sharpened) > lap(blurred)

    def test_resample_lowpasses(self):
        out = manipulations.resample(self.x, 50)
        assert out.shape == self.x.shape
        assert float(jnp.var(out)) < float(jnp.var(self.x))

    def test_resize_bilinear_flat_matches_jax_image(self):
        """The dense flat-layout resize must reproduce jax.image.resize
        ('bilinear', incl. antialiased downsampling) to f32 roundoff — the
        operators are probed from jax.image.resize itself, so this pins the
        probing AND the grouped kron application."""
        import numpy as np
        for (h, w, ho, wo) in [(24, 32, 12, 16), (12, 16, 24, 32), (20, 20, 13, 27)]:
            x = jnp.asarray(np.random.default_rng(7).random((2, h, w, 3)), jnp.float32)
            ref = jax.image.resize(x, (2, ho, wo, 3), method='bilinear')
            got = manipulations.resize_bilinear_flat(x, ho, wo)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-6, rtol=1e-5)

    def test_resample_nonbilinear_fallback(self):
        out = manipulations.resample(self.x, 50, method='nearest')
        assert out.shape == self.x.shape

    def test_avg_pool_flat_matches_window(self):
        import numpy as np
        from neural_imaging_tpu.ops import ops as O
        x = jnp.asarray(np.random.default_rng(3).random((2, 16, 12, 3)), jnp.float32)
        np.testing.assert_allclose(np.asarray(O.avg_pool_flat(x, 2)),
                                   np.asarray(O.avg_pool(x, 2)), atol=1e-6)
        # non-divisible shapes fall back to the window form
        x2 = jnp.asarray(np.random.default_rng(3).random((2, 15, 12, 3)), jnp.float32)
        np.testing.assert_allclose(np.asarray(O.avg_pool_flat(x2, 2)),
                                   np.asarray(O.avg_pool(x2, 2)), atol=1e-6)

    def test_awgn_determinism_with_key(self):
        key = jax.random.PRNGKey(3)
        a = manipulations.awgn(self.x, 0.02, key)
        b = manipulations.awgn(self.x, 0.02, key)
        assert np.allclose(a, b)

    def test_jit_compatibility(self):
        f = jax.jit(lambda x: manipulations.sharpen(manipulations.gaussian(x, 5, 1.0), 0.5))
        out = f(self.x)
        assert out.shape == self.x.shape


class TestTracedManipulations:
    """Traced-strength variants must match the static-filter implementations."""

    def setup_method(self):
        rng = np.random.default_rng(5)
        self.x = jnp.array(rng.random((2, 32, 32, 3)).astype(np.float32))

    def test_sharpen_traced_matches_static(self):
        for s in [0.5, 1.0, 1.4]:
            a = manipulations.sharpen(self.x, s)
            b = manipulations.sharpen_traced(self.x, jnp.float32(s))
            assert np.abs(np.asarray(a - b)).max() < 1e-5, s

    def test_gaussian_traced_matches_static(self):
        for s in [0.83, 2.0]:
            a = manipulations.gaussian(self.x, 5, s)
            b = manipulations.gaussian_traced(self.x, jnp.float32(s), 5)
            assert np.abs(np.asarray(a - b)).max() < 1e-5, s

    def test_jpeg_traced_matches_static_qtable(self):
        from neural_imaging_tpu.compression.jpeg_helpers import jpeg_qtable
        from neural_imaging_tpu.models.jpeg import jpeg_forward, jpeg_qtable_traced
        for q in [30.0, 80.0]:
            qt = np.asarray(jpeg_qtable_traced(jnp.float32(q), 0))
            assert np.allclose(qt, jpeg_qtable(q, 0)), q

    def test_switch_variants(self):
        a = manipulations.resample_switch(self.x, jnp.int32(1), [40, 60, 80])
        b = manipulations.resample(self.x, 60)
        assert np.abs(np.asarray(a - b)).max() < 1e-6
        m1 = manipulations.median_switch(self.x, jnp.int32(0), [3, 5])
        m2 = manipulations.median(self.x, 3)
        assert np.abs(np.asarray(m1 - m2)).max() < 1e-6

    def test_traced_jit_no_recompile(self):
        import functools
        calls = jax.jit(lambda x, s: manipulations.sharpen_traced(x, s))
        calls(self.x, jnp.float32(0.5))
        n = calls._cache_size()
        calls(self.x, jnp.float32(1.2))
        assert calls._cache_size() == n


class TestSmallConv2D:
    """Exact-f32 VPU conv for tiny channel counts (ops.small_conv2d) must match
    the MXU HIGHEST path bit-for-bit up to f32 accumulation order."""

    @pytest.mark.parametrize('kshape,padding', [
        ((1, 1, 4, 12), 'SAME'),
        ((3, 3, 3, 3), 'SAME'),
        ((5, 5, 3, 3), 'VALID'),
        ((2, 4, 2, 5), 'SAME'),    # even/rectangular kernel
        ((3, 3, 12, 3), 'VALID'),
    ])
    def test_matches_lax_conv(self, kshape, padding):
        rng = np.random.default_rng(7)
        x = rng.normal(size=(2, 17, 13, kshape[2])).astype(np.float32)
        k = rng.normal(size=kshape).astype(np.float32)
        got = np.asarray(ops.small_conv2d(x, k, padding=padding))
        want = np.asarray(ops.conv2d(x, k, padding=padding,
                                     precision=jax.lax.Precision.HIGHEST))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_explicit_padding_pairs(self):
        """The explicit ((top,bottom),(left,right)) padding branch must match
        conv2d with the same explicit padding."""
        rng = np.random.default_rng(11)
        x = rng.normal(size=(2, 9, 11, 3)).astype(np.float32)
        k = rng.normal(size=(3, 3, 3, 2)).astype(np.float32)
        padding = ((1, 2), (0, 1))
        got = np.asarray(ops.small_conv2d(x, k, padding=padding))
        want = np.asarray(ops.conv2d(x, k, padding=padding,
                                     precision=jax.lax.Precision.HIGHEST))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_bfloat16_input_accumulates_in_f32(self):
        """bf16 inputs (the workflow's channel dtype) must still accumulate the
        k²·Cin taps in f32 — the bf16 result must match the f32 computation
        rounded once at the end, not a bf16 running sum."""
        rng = np.random.default_rng(12)
        x32 = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
        k = rng.normal(size=(5, 5, 3, 3)).astype(np.float32)
        got = np.asarray(ops.small_conv2d(jnp.asarray(x32, jnp.bfloat16), k),
                         dtype=np.float32)
        want = np.asarray(
            ops.small_conv2d(jnp.asarray(x32, jnp.bfloat16).astype(jnp.float32), k))
        # one terminal rounding to bf16 (relative error <= 2^-8)
        np.testing.assert_allclose(got, want, rtol=2 ** -7, atol=2 ** -7)
        assert ops.small_conv2d(jnp.asarray(x32, jnp.bfloat16), k).dtype == jnp.bfloat16

    def test_gradients_match_lax_conv(self):
        rng = np.random.default_rng(8)
        x = rng.normal(size=(1, 12, 12, 3)).astype(np.float32)
        k = rng.normal(size=(3, 3, 3, 3)).astype(np.float32)

        def loss(fn, x, k):
            return jnp.sum(fn(x, k) ** 2)

        gx_a, gk_a = jax.grad(lambda x, k: loss(ops.small_conv2d, x, k), (0, 1))(x, k)
        gx_b, gk_b = jax.grad(
            lambda x, k: loss(functools.partial(
                ops.conv2d, precision=jax.lax.Precision.HIGHEST), x, k), (0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_b), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gk_a), np.asarray(gk_b), rtol=1e-4, atol=1e-4)
