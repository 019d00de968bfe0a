"""Parity tests for the fused Pallas kernels (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_imaging_tpu.compression.jpeg_helpers import jpeg_qtable
from neural_imaging_tpu.models import jpeg as jpeg_models
from neural_imaging_tpu.ops import quantization as quant
from neural_imaging_tpu.ops.pallas import codebook as cbk
from neural_imaging_tpu.ops.pallas import jpeg8x8


class TestCodebookKernel:
    @pytest.fixture(scope='class')
    def data(self):
        rng = np.random.default_rng(0)
        cb = quant.default_codebook(5)
        z = jnp.asarray(rng.standard_normal((4, 8, 8, 3)).astype(np.float32) * 6)
        return z, cb

    def test_forward_parity(self, data):
        z, cb = data
        q_p, h_p, hist_p = cbk.quantize_with_entropy_pallas(z, cb)
        q_r, h_r, hist_r = quant.quantize_with_entropy(z, cb)
        assert np.abs(np.asarray(q_p - q_r)).max() == 0
        assert abs(float(h_p) - float(h_r)) < 1e-5
        assert np.abs(np.asarray(hist_p - hist_r)).max() < 1e-6

    def test_gradient_parity(self, data):
        z, cb = data

        def loss(fn):
            def inner(v):
                q, h, _ = fn(v, cb)
                return 0.001 * jnp.sum(q ** 2) + 10.0 * h
            return inner

        g_p = jax.grad(loss(cbk.quantize_with_entropy_pallas))(z)
        g_r = jax.grad(loss(quant.quantize_with_entropy))(z)
        assert np.abs(np.asarray(g_p - g_r)).max() < 1e-4

    def test_unpadded_sizes(self):
        """Non-tile-aligned inputs must not corrupt counts via padding."""
        rng = np.random.default_rng(3)
        cb = quant.default_codebook(4)
        z = jnp.asarray(rng.standard_normal(777).astype(np.float32) * 4)
        _, h_p, hist_p = cbk.quantize_with_entropy_pallas(z, cb)
        _, h_r, hist_r = quant.quantize_with_entropy(z, cb)
        assert abs(float(h_p) - float(h_r)) < 1e-5
        assert np.abs(np.asarray(hist_p - hist_r)).max() < 1e-6

    def test_gaussian_kernel_variant(self, data):
        z, cb = data
        q_p, h_p, _ = cbk.quantize_with_entropy_pallas(z, cb, 0.0, 5.0)
        q_r, h_r, _ = quant.quantize_with_entropy(z, cb, 'soft-codebook', 0.0, 5.0)
        assert np.abs(np.asarray(q_p - q_r)).max() == 0
        assert abs(float(h_p) - float(h_r)) < 1e-5

    @pytest.mark.parametrize('v,gamma', [(50.0, 25.0), (0.0, 5.0)])
    def test_gradient_parity_unaligned(self, v, gamma):
        """The fused streaming backward (fixed codebook): both kernel variants,
        at a non-tile-aligned size so the zero-padded gradient slots are
        exercised."""
        rng = np.random.default_rng(7)
        cb = quant.default_codebook(4)
        z = jnp.asarray(rng.standard_normal(777).astype(np.float32) * 4)

        def loss(fn):
            return lambda x: (lambda q, h, _: 0.01 * jnp.sum(q ** 3) + 5.0 * h)(
                *fn(x, cb, v, gamma))

        g_p = jax.grad(loss(cbk.quantize_with_entropy_pallas))(z)
        g_r = jax.grad(lambda x: loss(
            lambda xx, cc, vv, gg: quant.quantize_with_entropy(
                xx, cc, 'soft-codebook', vv, gg))(x))(z)
        assert np.abs(np.asarray(g_p - g_r)).max() < 1e-4

    @pytest.mark.parametrize('v,gamma', [(50.0, 25.0), (0.0, 5.0)])
    def test_trainable_codebook_parity(self, data, v, gamma):
        """Trainable-codebook variant: forward parity and analytic-VJP gradient
        parity (both z and codebook — the fused streaming backward + W_cc
        epilogue) with the XLA path (ref models/layers.py:113-116)."""
        z, cb0 = data
        cb = jnp.asarray(cb0) + 0.05  # off-integer so codebook gradients are nontrivial

        q_p, h_p, hist_p = cbk.quantize_with_entropy_pallas(z, cb, v, gamma,
                                                            trainable=True)
        q_r, h_r, hist_r = quant.quantize_with_entropy(z, cb, 'soft-codebook', v, gamma)
        assert np.abs(np.asarray(q_p - q_r)).max() < 1e-6
        assert abs(float(h_p) - float(h_r)) < 1e-5
        assert np.abs(np.asarray(hist_p - hist_r)).max() < 1e-6

        def loss(fn):
            def inner(zz, cc):
                q, h, _ = fn(zz, cc)
                return 0.001 * jnp.sum(q ** 2) + 10.0 * h
            return inner

        gz_p, gc_p = jax.grad(loss(
            lambda zz, cc: cbk.quantize_with_entropy_pallas(zz, cc, v, gamma,
                                                            trainable=True)),
            argnums=(0, 1))(z, cb)
        gz_r, gc_r = jax.grad(loss(
            lambda zz, cc: quant.quantize_with_entropy(zz, cc, 'soft-codebook',
                                                       v, gamma)),
            argnums=(0, 1))(z, cb)
        assert np.abs(np.asarray(gz_p - gz_r)).max() < 1e-5
        assert np.abs(np.asarray(gc_p - gc_r)).max() < 1e-5

    def test_trainable_autodetect_under_grad(self, data):
        """Differentiating w.r.t. the codebook without the explicit flag routes to
        the trainable variant (tracer auto-detection)."""
        z, cb0 = data
        g = jax.grad(lambda cc: cbk.quantize_with_entropy_pallas(z, cc)[1])(
            jnp.asarray(cb0) + 0.05)
        assert np.isfinite(np.asarray(g)).all()

    @pytest.mark.slow
    def test_dcn_pallas_trainable_codebook_step(self):
        """A DCN with use_pallas_quantization + train_codebook trains end-to-end
        and actually moves the codebook."""
        from neural_imaging_tpu.models.compression import TwitterDCN
        rng = np.random.default_rng(5)
        dcn = TwitterDCN(patch_size=32, n_features=8, train_codebook=True,
                         use_pallas_quantization=True, entropy_weight=50.0)
        assert dcn.use_pallas_quantization
        cb_before = dcn.get_codebook().copy()
        x = rng.random((2, 32, 32, 3)).astype(np.float32)
        for _ in range(3):
            out = dcn.training_step(x, learning_rate=1e-3)
        assert np.isfinite(out['loss'])
        assert not np.allclose(dcn.get_codebook(), cb_before)


class TestJPEGKernel:
    @pytest.fixture(scope='class')
    def data(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
        return x, jnp.asarray(jpeg_qtable(50, 0)), jnp.asarray(jpeg_qtable(50, 1))

    def test_forward_parity(self, data):
        x, ql, qc = data
        y_p, X_p = jpeg8x8.jpeg_forward_pallas(x, ql, qc)
        y_r, X_r = jpeg_models.jpeg_forward(x, ql, qc, rounding='soft')
        assert np.abs(np.asarray(y_p - y_r)).max() < 1e-5
        assert np.abs(np.asarray(X_p - X_r)).max() < 1e-4

    def test_gradient_parity(self, data):
        x, ql, qc = data
        g_p = jax.grad(lambda v: jnp.mean((jpeg8x8.jpeg_forward_pallas(v, ql, qc)[0] - v) ** 2))(x)
        g_r = jax.grad(lambda v: jnp.mean((jpeg_models.jpeg_forward(v, ql, qc)[0] - v) ** 2))(x)
        assert np.abs(np.asarray(g_p - g_r)).max() < 1e-7

    def test_qtable_gradients(self, data):
        """Trainable-qtable path: gradients flow to the tables through the kernel."""
        x, ql, qc = data
        g = jax.grad(lambda q: jnp.mean(jpeg8x8.jpeg_forward_pallas(x, q, qc)[0]))(ql)
        assert np.isfinite(np.asarray(g)).all()


class TestInferenceAutoSelection:
    """The 'auto' policy (default): Pallas on the forward-only compress() path
    only — and the non-trainable codebook must enter as a static value so the
    kernel works INSIDE the jitted encoder (regression: a jnp-constant codebook
    is a tracer under jit and broke np.asarray at trace time)."""

    @pytest.mark.parametrize('train_codebook', [False, True])
    def test_compress_pallas_path_under_jit(self, train_codebook, monkeypatch):
        from neural_imaging_tpu.models import compression

        dcn = compression.TwitterDCN(patch_size=32, n_features=4,
                                     train_codebook=train_codebook)
        rng = np.random.default_rng(3)
        x = rng.random((2, 32, 32, 3)).astype(np.float32)
        z_xla = np.asarray(dcn.compress(x))

        dcn2 = compression.TwitterDCN(patch_size=32, n_features=4,
                                      train_codebook=train_codebook)
        dcn2.params = dcn.params
        monkeypatch.setattr(compression.DCN, '_use_pallas',
                            lambda self, inference, n_latent=None: inference)
        z_pl = np.asarray(dcn2.compress(x))
        np.testing.assert_allclose(z_pl, z_xla, atol=1e-5)

    def test_auto_policy(self, monkeypatch):
        """'auto' (measured, docs/benchmarks.md): on TPU, Pallas everywhere for
        fixed codebooks; for trainable codebooks on inference always and in
        training only below the latent-size crossover; on CPU always XLA."""
        from neural_imaging_tpu.models import compression
        dcn = compression.TwitterDCN(patch_size=32, n_features=4)
        assert dcn.use_pallas_quantization == 'auto'
        assert not dcn._use_pallas(inference=False)  # CPU -> XLA

        class FakeTPU:
            platform = 'tpu'
        monkeypatch.setattr(jax, 'devices', lambda: [FakeTPU()])
        assert dcn._use_pallas(inference=False)
        assert dcn._use_pallas(inference=True)
        dcn_t = compression.TwitterDCN(patch_size=32, n_features=4,
                                       train_codebook=True)
        assert dcn_t._use_pallas(inference=True)
        # training: fused backward wins up to the largest measured size
        assert not dcn_t._use_pallas(inference=False)  # no size -> conservative
        assert dcn_t._use_pallas(inference=False, n_latent=64 * 64 * 32)
        assert not dcn_t._use_pallas(inference=False, n_latent=128 * 128 * 32)
