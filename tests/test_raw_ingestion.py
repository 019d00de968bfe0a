"""
Camera RAW ingestion on real photographic content: DNG container round-trip,
native (rawpy-free) unpack/develop, Menon2007 demosaicing quality, and the full
camera-file -> training-pair path (ref helpers/raw.py:110-201,
train_prepare_training_set.py:19-90).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from neural_imaging_tpu.data import bayer, dng, fixtures, raw
from neural_imaging_tpu.data.menon import demosaic_menon

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def psnr(a, b):
    return 10 * np.log10(1.0 / np.mean((np.asarray(a, np.float64) -
                                        np.asarray(b, np.float64)) ** 2))


@pytest.fixture(scope='module')
def photo():
    im = fixtures.real_photo()
    assert im is not None, 'no photographic sample available in this environment'
    return im


class TestDNGContainer:
    def test_round_trip(self, tmp_path):
        rng = np.random.default_rng(3)
        mosaic = (rng.random((62, 80)) * 16000).astype(np.uint16)
        cam2srgb = np.array([[1.7, -0.5, -0.2], [-0.15, 1.45, -0.3], [0.0, -0.35, 1.35]])
        cam2srgb /= cam2srgb.sum(1, keepdims=True)
        path = str(tmp_path / 'x.dng')
        dng.write_dng(path, mosaic, 'GBRG', black=256, white=16383,
                      cam_mul=(1.9, 1.0, 1.4, 1.0), cam2srgb=cam2srgb, camera='RT')

        d = dng.read_dng(path)
        assert np.array_equal(d['mosaic'], mosaic)
        assert d['cfa_pattern'] == 'GBRG'
        assert d['black'] == 256 and d['white'] == 16383
        assert d['camera'] == 'RT'
        np.testing.assert_allclose(d['cam_mul'][:3], [1.9, 1.0, 1.4], rtol=1e-3)
        np.testing.assert_allclose(d['cam2srgb'], cam2srgb, atol=1e-3)

    def test_rejects_non_tiff(self, tmp_path):
        path = tmp_path / 'bogus.dng'
        path.write_bytes(b'NOTATIFF' * 4)
        with pytest.raises(dng.DNGError):
            dng.read_dng(str(path))

    def test_color_matrix_involution(self):
        cam2srgb = np.array([[1.8, -0.6, -0.2], [-0.1, 1.4, -0.3], [0.05, -0.4, 1.35]])
        cam2srgb /= cam2srgb.sum(1, keepdims=True)
        cm = dng.cam2srgb_to_color_matrix(cam2srgb)
        back = dng.color_matrix_to_cam2srgb(cm)
        np.testing.assert_allclose(back, cam2srgb, atol=1e-5)


class TestNativeUnpack:
    @pytest.mark.parametrize('cfa', ['RGGB', 'GBRG', 'BGGR'])
    def test_unpack_stack(self, tmp_path, photo, cfa):
        path = str(tmp_path / 'c.dng')
        fixtures.make_dng_capture(path, image_rgb=photo[:128, :128], cfa_pattern=cfa)
        stack, pattern, cam2srgb, cam_mul = raw.unpack(path)
        assert pattern == cfa
        assert stack.shape == (64, 64, 4)
        assert 0 <= stack.min() and stack.max() <= 1
        assert cam_mul[0] > 1.5  # AsShotNeutral made it through

    def test_develop_recovers_photo(self, tmp_path, photo):
        """Full develop of a simulated capture reconstructs the original real
        photograph to high fidelity — validates every stage jointly (black level,
        WB, demosaic, color matrix, gamma)."""
        crop = photo[:256, :256]
        path = str(tmp_path / 'd.dng')
        fixtures.make_dng_capture(path, image_rgb=crop, cfa_pattern='RGGB')
        developed = raw.process(path, brightness=None, demosaicing='menon')
        assert psnr(developed, crop) > 30.0

    def test_process_auto(self, tmp_path, photo):
        path = str(tmp_path / 'a.dng')
        fixtures.make_dng_capture(path, image_rgb=photo[:64, :64])
        rgb = raw.process_auto(path)
        assert rgb.dtype == np.uint8 and rgb.shape == (64, 64, 3)


class TestMenonDemosaicing:
    def test_menon_beats_malvar_on_real_content(self, photo):
        """The DDFAPD demosaicer must deliver Menon-class quality: clearly above
        the Malvar linear baseline on real photographic content."""
        im = photo[:384, :384]
        mosaic = bayer.mosaic_flat(im, 'RGGB')
        p_bilinear = psnr(im, np.clip(raw.demosaic_bilinear(mosaic, 'RGGB'), 0, 1))
        p_malvar = psnr(im, np.clip(raw.demosaic_malvar(mosaic, 'RGGB'), 0, 1))
        p_menon = psnr(im, np.clip(demosaic_menon(mosaic, 'RGGB'), 0, 1))
        assert p_malvar > p_bilinear + 2.0
        assert p_menon > p_malvar + 1.0, (
            f'menon {p_menon:.2f} dB vs malvar {p_malvar:.2f} dB')

    @pytest.mark.parametrize('cfa', ['RGGB', 'GBRG', 'BGGR'])
    def test_all_patterns(self, photo, cfa):
        im = photo[:128, :128]
        mosaic = bayer.mosaic_flat(im, cfa)
        assert psnr(im, np.clip(demosaic_menon(mosaic, cfa), 0, 1)) > 30.0

    def test_registered_in_develop(self, photo):
        im = photo[:64, :64]
        mosaic = bayer.mosaic_flat(im, 'RGGB')
        out = raw.develop_mosaic(mosaic, 'RGGB', brightness=None, use_gamma=False,
                                 demosaicing='menon')
        assert out.shape == (64, 64, 3)


class TestEndToEndIngestion:
    def test_prepare_training_set_from_dng(self, tmp_path, photo):
        """camera DNGs -> train_prepare_training_set.py -> RGGB .npy + .png pairs
        consumable by Dataset (the reference's full data story, on real content)."""
        raw_dir = tmp_path / 'camera'
        out_dir = tmp_path / 'training'
        fixtures.make_dng_dataset(str(raw_dir), n_images=3)

        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, 'train_prepare_training_set.py'),
             '--dir', str(raw_dir), '--out', str(out_dir), '--dev', 'manual'],
            capture_output=True, text=True, timeout=600)
        assert proc.returncode == 0, proc.stderr[-2000:]

        npys = sorted(p for p in os.listdir(out_dir) if p.endswith('.npy'))
        pngs = sorted(p for p in os.listdir(out_dir) if p.endswith('.png'))
        assert len(npys) == 3 and len(pngs) == 3

        stack = np.load(out_dir / npys[0])
        assert stack.dtype == np.uint16 and stack.ndim == 3 and stack.shape[-1] == 4

        from neural_imaging_tpu.data.dataset import Dataset
        data = Dataset(str(out_dir), n_images=2, v_images=1, load='xy',
                       val_rgb_patch_size=64, val_n_patches=1)
        bx, by = data.next_training_batch(0, 2, 32)
        assert bx.shape == (2, 16, 16, 4) and by.shape == (2, 32, 32, 3)
        assert np.isfinite(bx).all() and np.isfinite(by).all()
