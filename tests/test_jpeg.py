"""Tests for the differentiable JPEG codec and host libjpeg bridge."""
import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_imaging_tpu.compression import jpeg_helpers
from neural_imaging_tpu.data import fixtures
from neural_imaging_tpu.models import jpeg as jpeg_models
from neural_imaging_tpu.utils import metrics


@pytest.fixture(scope='module')
def images():
    return fixtures.kodak_like_batch(n=2, height=128, width=128, seed=3)


class TestQTables:
    def test_q50_is_base_table(self):
        assert np.allclose(jpeg_helpers.jpeg_qtable(50, 0), jpeg_helpers.K1_LUMA)

    def test_q100_all_ones(self):
        assert (jpeg_helpers.jpeg_qtable(100, 0) == 1).all()

    def test_monotone_in_quality(self):
        q10 = jpeg_helpers.jpeg_qtable(10, 0)
        q90 = jpeg_helpers.jpeg_qtable(90, 0)
        assert (q10 >= q90).all() and q10.sum() > q90.sum()

    def test_qf_estimation_inverts_qtable(self):
        for qf in [10, 35, 50, 75, 90]:
            assert jpeg_helpers.jpeg_qf_estimation(jpeg_helpers.jpeg_qtable(qf, 0), 0) == qf

    def test_zigzag(self):
        zz = jpeg_helpers.zigzag(8)
        assert zz[0, 0] == 0 and zz[0, 1] == 1 and zz[1, 0] == 2 and zz[7, 7] == 63


class TestLibjpegBridge:
    def test_roundtrip_quality(self, images):
        out, sizes = jpeg_helpers.compress_batch(images, 90)
        assert out.shape == images.shape
        assert metrics.psnr(images[0], out[0]) > 30
        out_low, sizes_low = jpeg_helpers.compress_batch(images, 10)
        assert np.mean(sizes_low) < np.mean(sizes)

    def test_marker_stats(self, images):
        from PIL import Image
        buf = io.BytesIO()
        Image.fromarray((images[0] * 255).astype(np.uint8)).save(buf, format='JPEG', quality=80)
        st = jpeg_helpers.JPEGMarkerStats(buf.getvalue())
        assert st.get_bytes() == len(buf.getvalue())
        assert 0 < st.get_effective_bytes() < st.get_bytes()
        assert 0 in st.quantization_tables
        # extracted luma table should match the IJG table at QF 80 (PIL uses IJG scaling)
        est = jpeg_helpers.jpeg_qf_estimation(st.quantization_tables[0], 0)
        assert abs(est - 80) <= 2

    def test_match_quality_ssim(self, images):
        q = jpeg_helpers.match_quality(images[0], target=0.95, match='ssim')
        out, _ = jpeg_helpers.compress_batch(images[0], q)
        assert abs(metrics.ssim(images[0], out) - 0.95) < 0.05


class TestDifferentiableJPEG:
    def test_tracks_libjpeg_psnr(self, images):
        """dJPEG quality must track libjpeg across the QF sweep (the reference's
        test_jpeg.py scatter, docs/jpeg.md) — within ~2 dB at 4:4:4."""
        codec = jpeg_models.JPEG(50, 'soft')
        for qf in [30, 50, 80]:
            soft = np.asarray(codec.process(images, qf))
            hard, _ = jpeg_helpers.compress_batch(images, qf)
            psnr_soft = float(np.mean(metrics.psnr(images, soft)))
            psnr_hard = float(np.mean(metrics.psnr(images, hard)))
            assert abs(psnr_soft - psnr_hard) < 2.0, (qf, psnr_soft, psnr_hard)

    def test_quality_ordering(self, images):
        codec = jpeg_models.JPEG(50, 'soft')
        psnrs = [float(np.mean(metrics.psnr(images, np.asarray(codec.process(images, qf)))))
                 for qf in [10, 50, 90]]
        assert psnrs[0] < psnrs[1] < psnrs[2]

    def test_coefficients_are_quantized(self, images):
        codec = jpeg_models.DifferentiableJPEG(50, 'soft')
        _, X = codec(images[:1])
        q = np.asarray(codec.q_mtx_luma)
        ratio = np.asarray(X)[0, 0] / q[None, None]
        assert np.allclose(ratio, np.round(ratio), atol=1e-3)

    def test_gradients_flow(self, images):
        codec = jpeg_models.DifferentiableJPEG(50, 'soft')
        x = jnp.asarray(images[:1])

        def loss(v):
            y, _ = codec(v)
            return jnp.mean((y - x) ** 2)
        g = jax.grad(loss)(x)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    def test_trainable_qtables_gradients(self, images):
        codec = jpeg_models.DifferentiableJPEG(50, 'soft', trainable=True)
        x = jnp.asarray(images[:1])

        def loss(params):
            y, _ = codec(x, params=params)
            return jnp.mean((y - x) ** 2)
        g = jax.grad(loss)(codec.params)
        assert np.abs(np.asarray(g['q_mtx_luma'])).max() > 0

    def test_quality_randomization(self, images):
        codec = jpeg_models.JPEG([40, 80], 'soft', rng=np.random.default_rng(0))
        qs = {codec._resolve_quality(None) for _ in range(50)}
        assert all(40 <= q < 80 for q in qs) and len(qs) > 10
        codec2 = jpeg_models.JPEG([10, 50, 90], 'soft', rng=np.random.default_rng(0))
        qs2 = {codec2._resolve_quality(None) for _ in range(50)}
        assert qs2 == {10, 50, 90}

    def test_invalid_quality(self):
        with pytest.raises(ValueError):
            jpeg_models.JPEG(0, 'soft').process(np.zeros((1, 8, 8, 3)))
        with pytest.raises(ValueError):
            jpeg_models.DifferentiableJPEG(quality=101)

    def test_entropy_return(self, images):
        codec = jpeg_models.JPEG(50, 'soft')
        y, h = codec.process(images[:1], return_entropy=True)
        assert np.isfinite(h) and h > 0

    def test_no_recompile_across_qualities(self, images):
        """Quality changes flow through traced tables — a single compiled graph."""
        codec = jpeg_models.JPEG(50, 'soft')
        codec.process(images, 50)
        compiles_before = jpeg_models.jpeg_forward._cache_size()
        codec.process(images, 70)
        codec.process(images, 30)
        assert jpeg_models.jpeg_forward._cache_size() == compiles_before

    def test_lazy_singleton(self, images):
        out = jpeg_models.differentiable_jpeg(images[:1], 60)
        assert np.asarray(out).shape == images[:1].shape


class TestSubsampling:
    def test_chroma_subsampling_modes(self, images):
        sizes = {}
        for mode in ['4:4:4', '4:2:2', '4:2:0']:
            _, nbytes = jpeg_helpers.compress_batch(images[0], 75, subsampling=mode)
            sizes[mode] = nbytes
        assert sizes['4:2:0'] < sizes['4:4:4']

    def test_rounding_mode_quality_order(self, images):
        """'sin' keeps values off-grid (lower fidelity vs hard-round forward)."""
        from neural_imaging_tpu.models.jpeg import JPEG
        psnrs = {}
        for mode in ['soft', 'sin', 'harmonic']:
            codec = JPEG(50, mode)
            out = np.asarray(codec.process(images[:1], 50))
            psnrs[mode] = float(np.mean(metrics.psnr(images[:1], out)))
        assert all(20 < v < 60 for v in psnrs.values()), psnrs


class TestImplDispatch:
    def test_pallas_impl_matches_xla(self):
        """jpeg_forward's measured auto-dispatch: the 'pallas' impl (interpret
        mode off-TPU) must match 'xla' for rounding='soft' — same hard-round
        forward, same coefficients."""
        import jax.numpy as jnp
        import numpy as np
        from neural_imaging_tpu.compression.jpeg_helpers import jpeg_qtable
        from neural_imaging_tpu.models.jpeg import jpeg_forward

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
        ql, qc = jnp.asarray(jpeg_qtable(50, 0)), jnp.asarray(jpeg_qtable(50, 1))
        y_x, c_x = jpeg_forward(x, ql, qc, rounding='soft', impl='xla')
        y_p, c_p = jpeg_forward(x, ql, qc, rounding='soft', impl='pallas')
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), atol=2e-5)
        np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_x), atol=2e-3)

    def test_auto_is_xla_off_tpu(self):
        from neural_imaging_tpu.models.jpeg import _pallas_jpeg_wins
        assert not _pallas_jpeg_wins((1, 512, 512, 3))  # CPU test backend

    def test_planes_impl_matches_xla(self):
        """The dense plane-form path (block-diagonal DCT operators) must match
        the blockified path bit-closely at f32: the kron operators perform the
        identical per-8-block transforms, only the summation layout differs."""
        from neural_imaging_tpu.compression.jpeg_helpers import jpeg_qtable
        from neural_imaging_tpu.models.jpeg import jpeg_forward

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.random((2, 24, 32, 3)), jnp.float32)
        ql, qc = jnp.asarray(jpeg_qtable(50, 0)), jnp.asarray(jpeg_qtable(50, 1))
        prec = jax.lax.Precision.DEFAULT
        y_x, c_x = jpeg_forward(x, ql, qc, rounding='soft', impl='xla',
                                precision=prec)
        y_p, c_p = jpeg_forward(x, ql, qc, rounding='soft', impl='planes',
                                precision=prec)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), atol=2e-5)
        np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_x), atol=2e-3)

    def test_planes_impl_gradients_match_xla(self):
        """AD through the plane form must agree with the blockified form —
        both input and quantization-table gradients (trainable-qtable path)."""
        from neural_imaging_tpu.compression.jpeg_helpers import jpeg_qtable
        from neural_imaging_tpu.models.jpeg import jpeg_forward

        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
        ql, qc = jnp.asarray(jpeg_qtable(50, 0)), jnp.asarray(jpeg_qtable(50, 1))
        prec = jax.lax.Precision.DEFAULT

        def loss(impl, x, ql, qc):
            y, _ = jpeg_forward(x, ql, qc, rounding='soft', impl=impl,
                                precision=prec)
            return jnp.sum(y ** 2)

        for argnum in (0, 1, 2):
            g_x = jax.grad(lambda *a: loss('xla', *a), argnums=argnum)(x, ql, qc)
            g_p = jax.grad(lambda *a: loss('planes', *a), argnums=argnum)(x, ql, qc)
            np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                                       rtol=1e-4, atol=1e-4)

    def test_planes_impl_bf16_tracks_f32(self):
        """The bf16 plane path (the throughput knob's actual configuration)
        stays within bf16 tolerance of the f32 result."""
        from neural_imaging_tpu.compression.jpeg_helpers import jpeg_qtable
        from neural_imaging_tpu.models.jpeg import jpeg_forward

        rng = np.random.default_rng(13)
        x32 = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
        ql, qc = jnp.asarray(jpeg_qtable(50, 0)), jnp.asarray(jpeg_qtable(50, 1))
        prec = jax.lax.Precision.DEFAULT
        y32, _ = jpeg_forward(x32, ql, qc, rounding='soft', impl='planes',
                              precision=prec)
        y16, _ = jpeg_forward(x32.astype(jnp.bfloat16), ql, qc, rounding='soft',
                              impl='planes', precision=prec)
        # elementwise comparison is ill-posed (bf16 noise near a hard-rounding
        # boundary flips a full quantization step); compare the fidelity of the
        # two codecs instead
        p32 = float(metrics.psnr(np.asarray(x32), np.clip(np.asarray(y32), 0, 1)))
        p16 = float(metrics.psnr(np.asarray(x32),
                                 np.clip(np.asarray(y16, np.float32), 0, 1)))
        assert abs(p32 - p16) < 1.5, (p32, p16)
