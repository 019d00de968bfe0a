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
        # cache file written and reused for the SAME sweep...
        assert os.path.isfile(os.path.join(image_dir, 'jpeg.csv'))
        df2 = rd.get_jpeg_df(image_dir, qualities=[20, 50, 80])
        assert len(df2) == len(df)
        # ...but a different quality list must rebuild, not return stale rows
        df3 = rd.get_jpeg_df(image_dir, qualities=[30, 60])
        assert sorted(df3['quality'].unique()) == [30, 60]
        assert len(df3) == 4

    def test_jpeg2000_sweep(self, image_dir):
        df = rd.get_jpeg2k_df(image_dir, qualities=(28, 36))
        assert len(df) == 4
        assert (df['bpp'] > 0).all()
        # quality = PSNR target (dB): the achieved PSNR must track it
        for _, row in df.iterrows():
            assert abs(row['psnr'] - row['quality']) < 1.0, row
        one = df[df.image_id == 0].sort_values('quality')
        assert one.iloc[1]['psnr'] > one.iloc[0]['psnr']
        assert one.iloc[1]['bytes'] > one.iloc[0]['bytes']

    def test_jp2_effective_payload(self, image_dir):
        """Effective bytes (tile-part sum) must be measurably below the whole
        file and account for nearly all of it."""
        from neural_imaging_tpu.compression import jp2_helpers as j2
        img = fixtures.procedural_image(96, 96, seed=40)
        buf, _ = j2.encode_jp2((img * 255).astype(np.uint8), rate_bpp=2.0)
        payload = j2.jp2_payload_bytes(buf)
        assert 0 < payload < len(buf)
        assert payload > 0.7 * len(buf)

    def test_jp2_rate_control(self):
        from neural_imaging_tpu.compression import jp2_helpers as j2
        img = (fixtures.procedural_image(128, 128, seed=3) * 255).astype(np.uint8)
        buf, _ = j2.encode_jp2(img, rate_bpp=1.0)
        bpp = 8 * len(buf) / (128 * 128)
        assert 0.7 < bpp < 1.3

    def test_jp2_payload_raw_codestream_and_errors(self):
        from neural_imaging_tpu.compression import jp2_helpers as j2
        with pytest.raises(ValueError):
            j2.jp2_payload_bytes(b'not a jp2 file at all')

    def test_bpg_gated(self, image_dir):
        df = rd.get_bpg_df(image_dir)
        if not bpg_helpers.bpg_available():
            assert df.empty
        else:
            assert len(df) > 0

    @pytest.mark.parametrize('leg,codec,feature', [
        (rd.get_webp_df, 'webp', 'webp'), (rd.get_avif_df, 'avif', 'avif')])
    def test_modern_codec_sweeps(self, image_dir, leg, codec, feature):
        """Beyond-reference WebP/AVIF legs: Pillow-gated like the BPG leg, and
        R/D-sane (more bytes and better PSNR at higher quality) when present."""
        df = leg(image_dir, qualities=[30, 70])
        if not rd._pil_feature(feature):
            assert df.empty
            return
        assert set(df.columns) == set(rd.RD_COLUMNS)
        assert len(df) == 4
        assert (df['codec'] == codec).all()
        one = df[df.image_id == 0].sort_values('quality')
        assert one.iloc[1]['bytes'] > one.iloc[0]['bytes']
        assert one.iloc[1]['psnr'] > one.iloc[0]['psnr']
        assert os.path.isfile(os.path.join(image_dir, f'{codec}.csv'))

    @pytest.mark.slow
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

    def test_per_image_fit_then_average(self, image_dir):
        """Reference 'fit' mode (ratedistortion.py:414-562): per-image curves are
        fitted separately and averaged — on images with different R/D behavior the
        result differs from a pooled fit but stays between the per-image curves."""
        df = rd.get_jpeg_df(image_dir, qualities=range(10, 96, 10), force_calc=True)
        grid = np.geomspace(0.3, 3.0, 32)
        _, avg = rd.fit_rd_curve_per_image(df, 'ssim', grid=grid)
        assert np.isfinite(avg).all()
        per_image = [rd.fit_rd_curve(df[df.image_id == i], 'ssim', grid=grid)[1]
                     for i in df['image_id'].unique()]
        lo = np.minimum.reduce(per_image) - 1e-6
        hi = np.maximum.reduce(per_image) + 1e-6
        assert ((avg >= lo) & (avg <= hi)).all()

    def test_aggregate_mode(self, image_dir):
        df = rd.get_jpeg_df(image_dir, qualities=range(10, 96, 10), force_calc=True)
        bpp, quality = rd.aggregate_rd(df, 'psnr')
        assert len(bpp) == len(quality) == 9
        assert (np.diff(quality) > 0).all()
        ax = rd.plot_curve([df], metric='psnr', plot_type='aggregate')
        assert ax is not None

    def test_plot_bulk(self, image_dir):
        df = rd.get_jpeg_df(image_dir)
        fig = rd.plot_bulk([df], metric='psnr')
        assert fig is not None


class TestBPGHeaderParser:
    def test_ue7(self):
        assert bpg_helpers._read_ue7(bytes([0x05]), 0) == (5, 1)
        assert bpg_helpers._read_ue7(bytes([0x81, 0x05]), 0) == (0x85, 2)

    @staticmethod
    def _header(width, height, pdl, ext=None, payload=b''):
        """Assemble a spec-layout BPG header (BPG spec §header_syntax):
        magic, fmt byte, flags byte (ext flag = bit 3), ue7 dims + lengths."""
        def ue7(v):
            out = [v & 0x7F]
            v >>= 7
            while v:
                out.append((v & 0x7F) | 0x80)
                v >>= 7
            return bytes(reversed(out))
        flags = 0x08 if ext is not None else 0x00
        blob = (b'BPG\xfb' + bytes([0x10, flags])
                + ue7(width) + ue7(height) + ue7(pdl))
        if ext is not None:
            blob += ue7(len(ext)) + ext
        return blob + payload

    def test_header_fixture(self, tmp_path):
        """Synthetic-header fixtures for bpg_header_info — the parser the R/D
        sweep's byte accounting depends on (ref compression/bpg_helpers.py:44-61),
        testable without the bpgenc binary."""
        p = str(tmp_path / 'a.bpg')
        # multi-byte ue7 dims (768 = 0x86 0x00), explicit payload length
        open(p, 'wb').write(self._header(768, 512, 1000, payload=b'\0' * 1000))
        info = bpg_helpers.bpg_header_info(p)
        assert (info['width'], info['height']) == (768, 512)
        assert info['payload_bytes'] == 1000

    def test_header_zero_pdl_counts_remainder(self, tmp_path):
        p = str(tmp_path / 'b.bpg')
        open(p, 'wb').write(self._header(16, 16, 0, payload=b'x' * 77))
        assert bpg_helpers.bpg_header_info(p)['payload_bytes'] == 77

    def test_header_extension_block_skipped(self, tmp_path):
        """extension_present lives in bit 3 of the SECOND header byte; the
        extension block must not count as picture payload."""
        p = str(tmp_path / 'c.bpg')
        open(p, 'wb').write(self._header(16, 16, 0, ext=b'E' * 21,
                                         payload=b'x' * 50))
        assert bpg_helpers.bpg_header_info(p)['payload_bytes'] == 50

    def test_header_rejects_non_bpg(self, tmp_path):
        p = str(tmp_path / 'd.bpg')
        open(p, 'wb').write(b'JUNKJUNK')
        with pytest.raises(ValueError):
            bpg_helpers.bpg_header_info(p)

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
