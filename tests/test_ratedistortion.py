"""Tests for the rate-distortion benchmarking suite and codec bridges."""
import os

import imageio.v2 as imageio
import numpy as np
import pytest

from neural_imaging_tpu.compression import bpg_helpers, ratedistortion as rd
from neural_imaging_tpu.data import fixtures


@pytest.fixture(scope='module')
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp('rd_images')
    for i in range(2):
        img = fixtures.procedural_image(96, 96, seed=40 + i)
        imageio.imwrite(str(d / f'img_{i}.png'), (img * 255).astype(np.uint8))
    return str(d)


class TestSweeps:
    def test_jpeg_sweep_and_cache(self, image_dir):
        df = rd.get_jpeg_df(image_dir, qualities=[20, 50, 80])
        assert set(df.columns) == set(rd.RD_COLUMNS)
        assert len(df) == 6
        # monotone: higher quality -> more bytes, better psnr (per image)
        one = df[df.image_id == 0].sort_values('quality')
        assert one['bytes'].is_monotonic_increasing
        assert one['psnr'].is_monotonic_increasing
        # cache file written and reused
        assert os.path.isfile(os.path.join(image_dir, 'jpeg.csv'))
        df2 = rd.get_jpeg_df(image_dir)
        assert len(df2) == len(df)

    def test_jpeg2000_sweep(self, image_dir):
        df = rd.get_jpeg2k_df(image_dir, rates=(8, 32))
        assert len(df) == 4
        assert (df['bpp'] > 0).all()
        one = df[df.image_id == 0].sort_values('quality')  # quality = compression ratio
        assert one.iloc[0]['psnr'] > one.iloc[1]['psnr']

    def test_bpg_gated(self, image_dir):
        df = rd.get_bpg_df(image_dir)
        if not bpg_helpers.bpg_available():
            assert df.empty
        else:
            assert len(df) > 0

    def test_dcn_sweep(self, image_dir, tmp_path):
        from neural_imaging_tpu.models.compression import TwitterDCN
        from neural_imaging_tpu.training.compression import save_progress

        class FakeData:
            def summary(self):
                return 'fake'
        dcn = TwitterDCN(patch_size=96, n_features=8)
        mdir = tmp_path / 'models' / 'dcn8' / 'twitterdcn'
        dcn.save_model(str(mdir.parent), save_args=True)
        save_progress(dcn, FakeData(), {}, str(mdir))
        df = rd.get_dcn_df(image_dir, str(tmp_path / 'models'), force_calc=True)
        assert len(df) == 2
        assert (df['bpp'] > 0).all() and df['codec'].iloc[0].startswith('TwitterDCN-8C')


class TestFits:
    def test_fit_and_plot(self, image_dir):
        df = rd.get_jpeg_df(image_dir, qualities=range(10, 96, 10), force_calc=True)
        grid, fitted = rd.fit_rd_curve(df, 'ssim')
        assert len(grid) == 50
        assert np.isfinite(fitted).all()
        # fitted SSIM must increase with bpp
        assert fitted[-1] > fitted[0]
        ax = rd.plot_curve([df], metric='ssim', title='test')
        assert ax is not None

    def test_plot_bulk(self, image_dir):
        df = rd.get_jpeg_df(image_dir)
        fig = rd.plot_bulk([df], metric='psnr')
        assert fig is not None


class TestBPGHeaderParser:
    def test_ue7(self):
        assert bpg_helpers._read_ue7(bytes([0x05]), 0) == (5, 1)
        assert bpg_helpers._read_ue7(bytes([0x81, 0x05]), 0) == (0x85, 2)

    def test_roundtrip_requires_binaries(self):
        if bpg_helpers.bpg_available():
            pytest.skip('binaries present; round trip covered elsewhere')
        with pytest.raises(RuntimeError):
            bpg_helpers.compress(np.zeros((16, 16, 3)))


class TestCodecCompare:
    def test_compare_lossless_entropy_path(self):
        from neural_imaging_tpu.compression import codec
        from neural_imaging_tpu.models.compression import TwitterDCN
        dcn = TwitterDCN(patch_size=32, n_features=8)
        batch = fixtures.kodak_like_batch(n=1, height=32, width=32)
        direct, via_bits = codec.compare(dcn, batch)
        assert np.allclose(direct, via_bits, atol=1e-6)
