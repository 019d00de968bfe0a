"""Tests for the ISP model zoo (models/pipelines.py)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from neural_imaging_tpu.models import base, pipelines

# compile-heavy: excluded from the sub-5-minute smoke profile
# (`pytest -m 'not slow'`); the full default suite still runs these
pytestmark = pytest.mark.slow


@pytest.fixture(scope='module')
def batch():
    rng = np.random.default_rng(42)
    x = rng.random((2, 16, 16, 4)).astype(np.float32)
    y = rng.random((2, 32, 32, 3)).astype(np.float32)
    return x, y


class TestShapes:
    @pytest.mark.parametrize('cls,kw', [
        (pipelines.INet, {}),
        (pipelines.UNet, {'n_steps': 2}),
        (pipelines.DNet, {'n_layers': 2, 'n_features': 8}),
        (pipelines.ClassicISP, {}),
    ])
    def test_forward_shape_and_range(self, cls, kw, batch):
        x, _ = batch
        m = cls(patch_size=16, **kw)
        out = np.asarray(m.process(x))
        assert out.shape == (2, 32, 32, 3)
        assert out.min() >= 0 and out.max() <= 1

    def test_onet_identity(self, batch):
        _, y = batch
        m = pipelines.ONet(patch_size=16)
        assert np.allclose(np.asarray(m.process(y)), y)

    def test_single_image_expansion(self, batch):
        x, _ = batch
        m = pipelines.INet(patch_size=16)
        assert np.asarray(m.process(x[0])).shape == (1, 32, 32, 3)


class TestINetInitialization:
    def test_inet_init_is_classic_pipeline(self):
        """With default (non-random) init, INet must reproduce the scratch pipeline:
        bilinear demosaic → its example sRGB matrix → gamma."""
        from neural_imaging_tpu.data import bayer, fixtures, raw
        from neural_imaging_tpu.utils import metrics
        stack_u16, _ = fixtures.make_raw_rgb_pair(64, 64, seed=5)
        m = pipelines.INet(patch_size=32, kernel=5, cfa_pattern='gbrg')
        out = np.asarray(m.process(stack_u16[None].astype(np.float32) / 65535.0))[0]

        # develop the same mosaic with the scratch pipeline + INet's example sRGB init
        srgb = np.array([[1.82691061, -0.65497452, -0.17193617],
                         [-0.00683982, 1.33216381, -0.32532394],
                         [0.06269717, -0.40055895, 1.33786178]])
        mosaic = bayer.merge_bayer(stack_u16.astype(np.float64) / 65535.0, 'GBRG').sum(-1)
        target = raw.develop_mosaic(mosaic, 'GBRG', cam2srgb=srgb, brightness=None,
                                    use_gamma=True, demosaicing='bilinear')
        # ignore borders (different pad handling) and allow gamma-net approximation
        psnr = metrics.psnr(out[8:-8, 8:-8], target[8:-8, 8:-8].astype(np.float32))
        assert psnr > 30, f'INet init develops at only {psnr:.1f} dB'

    def test_trainable_upsampling_adds_params(self):
        m1 = pipelines.INet(patch_size=16, trainable_upsampling=False)
        m2 = pipelines.INet(patch_size=16, trainable_upsampling=True)
        assert m2.count_parameters() == m1.count_parameters() + 48

    def test_exact_chw_matches_exact(self):
        """conv_precision='exact_chw' (channels-first planes) is the same
        exact-f32 math as 'exact' — forward bit-equal, grads to f32 tolerance."""
        import jax
        import jax.numpy as jnp
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((2, 16, 16, 4)), jnp.float32)
        a = pipelines.INet(patch_size=16, conv_precision='exact')
        b = pipelines.INet(patch_size=16, conv_precision='exact_chw')
        np.testing.assert_array_equal(np.asarray(a.process(x)),
                                      np.asarray(b.process(x)))
        ga = jax.grad(lambda p: jnp.sum(a._apply(p, x) ** 2))(a.params)
        gb = jax.grad(lambda p: jnp.sum(b._apply(p, x) ** 2))(b.params)
        for k in ga:
            np.testing.assert_allclose(np.asarray(gb[k]), np.asarray(ga[k]),
                                       atol=5e-3, rtol=1e-4)


class TestTraining:
    def test_loss_decreases(self):
        """A tiny UNet must fit a fixed batch."""
        rng = np.random.default_rng(0)
        x = rng.random((4, 8, 8, 4)).astype(np.float32)
        y = rng.random((4, 16, 16, 3)).astype(np.float32) * 0.5 + 0.25
        m = pipelines.UNet(patch_size=8, n_steps=2)
        first = float(m.training_step(x, y, 1e-3))
        for _ in range(30):
            last = float(m.training_step(x, y, 1e-3))
        assert last < first * 0.9

    def test_loss_metrics(self, batch):
        x, y = batch
        for metric in ['L2', 'L1', 'SSIM']:
            m = pipelines.INet(patch_size=16, loss_metric=metric)
            loss = float(m.training_step(x, y, 1e-5))
            assert np.isfinite(loss)

    def test_invalid_loss(self):
        with pytest.raises(ValueError):
            pipelines.INet(patch_size=16, loss_metric='bogus')


class TestPersistence:
    def test_save_load_roundtrip(self, tmp_path, batch):
        x, y = batch
        m = pipelines.INet(patch_size=16)
        m.training_step(x, y, 1e-3)
        out_before = np.asarray(m.process(x))
        d = str(tmp_path / 'ckpt')
        m.save_model(d, save_args=True)
        m2 = pipelines.INet(patch_size=16)
        m2.load_model(d)
        assert np.allclose(np.asarray(m2.process(x)), out_before, atol=1e-6)

    def test_module_level_restore(self, tmp_path, batch):
        x, y = batch
        m = pipelines.UNet(patch_size=16, n_steps=2)
        m.training_step(x, y, 1e-3)
        d = str(tmp_path / 'unet_run')
        m.save_model(d, save_args=True)
        restored = base.restore(os.path.join(d, 'unet'), pipelines, patch_size=16)
        assert isinstance(restored, pipelines.UNet)
        assert np.allclose(np.asarray(restored.process(x)), np.asarray(m.process(x)), atol=1e-6)

    def test_classmethod_restore(self, tmp_path, batch):
        x, y = batch
        m = pipelines.DNet(patch_size=16, n_layers=2, n_features=8)
        d = str(tmp_path / 'dnet_run')
        m.save_model(d, save_args=True)
        restored = pipelines.DNet.restore(os.path.join(d, 'dnet'), patch_size=16)
        assert np.allclose(np.asarray(restored.process(x)), np.asarray(m.process(x)), atol=1e-6)


class TestClassicISP:
    def test_camera_switch_changes_output(self, batch, tmp_path):
        x, _ = batch
        m = pipelines.ClassicISP(patch_size=16)
        out1 = np.asarray(m.process(x))
        m.set_srgb_conversion(np.array([[1.5, -0.3, -0.2], [-0.1, 1.3, -0.2], [0.0, -0.4, 1.4]]))
        out2 = np.asarray(m.process(x))
        assert not np.allclose(out1, out2)
        m.set_cfa_pattern('rggb')
        out3 = np.asarray(m.process(x))
        assert out3.shape == out1.shape

    def test_set_camera_from_config(self, tmp_path, batch):
        x, _ = batch
        import json
        cfg = tmp_path / 'cameras.json'
        cfg.write_text(json.dumps({'TestCam': {'cfa': 'RGGB', 'srgb': np.eye(3).tolist()}}))
        m = pipelines.ClassicISP(patch_size=16)
        m.set_camera('TestCam', config_path=str(cfg))
        assert m._h.cfa_pattern == 'rggb'

    def test_demosaic_only(self, batch):
        x, _ = batch
        m = pipelines.ClassicISP(patch_size=16, c_filters=(4,))
        from neural_imaging_tpu.data import bayer
        mosaic = bayer.merge_bayer(np.asarray(x[0]), 'GBRG')
        out = np.asarray(m.demosaic_only(mosaic[None]))
        assert out.shape == (1, 32, 32, 3)


class TestRegistry:
    def test_supported_models(self):
        assert set(pipelines.supported_models) == {'INet', 'UNet', 'DNet', 'ONet', 'ClassicISP'}


class TestTensorISP:
    """The debug toy ISP (ref models/pipelines.py:365-412)."""

    def test_shapes_range_and_jit(self):
        import jax
        import jax.numpy as jnp
        rng = np.random.default_rng(3)
        x = rng.random((2, 8, 8, 4)).astype(np.float32)
        for brightness in ('percentile', 'shift', None):
            y = np.asarray(pipelines.tensor_isp(x, brightness=brightness))
            assert y.shape == (2, 16, 16, 3)
            assert np.isfinite(y).all() and y.min() >= 0 and y.max() <= 1
        jitted = jax.jit(lambda v: pipelines.tensor_isp(v, brightness='shift'))
        np.testing.assert_allclose(np.asarray(jitted(x)),
                                   np.asarray(pipelines.tensor_isp(x, brightness='shift')),
                                   atol=1e-6)
        # straight-through clip: gradients flow through the whole chain
        g = jax.grad(lambda v: jnp.sum(pipelines.tensor_isp(v, brightness=None)))(x)
        assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0

    def test_rejects_unknown_brightness(self):
        x = np.zeros((1, 4, 4, 4), np.float32)
        with pytest.raises(ValueError):
            pipelines.tensor_isp(x, brightness='nope')
