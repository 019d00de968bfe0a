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

    @pytest.mark.parametrize('bits,shape', [
        (12, (30, 48)),   # rows byte-aligned (48*12 % 8 == 0)
        (14, (30, 48)),   # rows byte-aligned (48*14 % 8 == 0)
        (12, (22, 41)),   # odd width: every row padded to a byte boundary
        (14, (22, 41)),
    ])
    def test_round_trip_bitpacked(self, tmp_path, bits, shape):
        """Uncompressed 12/14-bit DNGs pack samples MSB-first, each row starting
        on a byte boundary — the reader must bit-unpack, not read bytes."""
        rng = np.random.default_rng(bits + shape[1])
        mosaic = (rng.random(shape) * ((1 << bits) - 1)).astype(np.uint16)
        path = str(tmp_path / f'p{bits}.dng')
        dng.write_dng(path, mosaic, 'RGGB', black=64, bits=bits)
        d = dng.read_dng(path)
        assert np.array_equal(d['mosaic'], mosaic)
        assert d['white'] == (1 << bits) - 1  # default white follows bit depth

    def test_round_trip_bitpacked_ljpeg(self, tmp_path):
        rng = np.random.default_rng(7)
        mosaic = (rng.random((40, 56)) * 4095).astype(np.uint16)
        path = str(tmp_path / 'p12c.dng')
        dng.write_dng(path, mosaic, 'GBRG', bits=12, compression='ljpeg')
        assert np.array_equal(dng.read_dng(path)['mosaic'], mosaic)

    def test_rejects_out_of_range_values(self, tmp_path):
        with pytest.raises(dng.DNGError):
            dng.write_dng(str(tmp_path / 'bad.dng'),
                          np.full((4, 4), 4096, np.uint16), bits=12)

    def test_rejects_truncated_strip(self, tmp_path):
        mosaic = np.zeros((16, 24), np.uint16)
        path = tmp_path / 't.dng'
        dng.write_dng(str(path), mosaic, bits=14)
        path.write_bytes(path.read_bytes()[:-24])  # chop the strip tail
        with pytest.raises(dng.DNGError):
            dng.read_dng(str(path))

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


class TestVendorContainers:
    """Native CR2/NEF/ARW ingestion (data/camera_raw.py) — no rawpy anywhere.

    Hermetic round trips: spec-layout writers produce the container structures
    (CR2 slice reassembly + MakerNote WB, NEF MSB-first bit packing, ARW plain
    words) the reader must invert, and the same simulated sensor written as a
    DNG must unpack identically (ref helpers/raw.py:110-181 covers these
    formats through libRAW)."""

    def test_cr2_round_trip(self, tmp_path):
        from neural_imaging_tpu.data import camera_raw
        rng = np.random.default_rng(11)
        mosaic = rng.integers(0, 1 << 14, size=(60, 100), dtype=np.uint16)
        path = str(tmp_path / 'x.cr2')
        camera_raw.write_cr2(path, mosaic, cfa_pattern='RGGB', precision=14,
                             cam_mul=(2.2, 1.0, 1.3, 1.0), n_slices=3,
                             black=512, white=16383, camera='RTCam')
        d = camera_raw.read_cr2(path)
        assert np.array_equal(d['mosaic'], mosaic)
        assert d['cfa_pattern'] == 'RGGB'
        assert d['black'] == 512 and d['white'] == 16383
        assert d['camera'] == 'RTCam'
        np.testing.assert_allclose(d['cam_mul'], [2.2, 1.0, 1.3, 1.0], atol=2e-3)

    @pytest.mark.parametrize('n_slices', [1, 2, 5])
    def test_cr2_slice_geometries(self, tmp_path, n_slices):
        from neural_imaging_tpu.data import camera_raw
        rng = np.random.default_rng(n_slices)
        mosaic = rng.integers(0, 1 << 12, size=(42, 54), dtype=np.uint16)
        path = str(tmp_path / 's.cr2')
        camera_raw.write_cr2(path, mosaic, precision=12, n_slices=n_slices)
        assert np.array_equal(camera_raw.read_cr2(path)['mosaic'], mosaic)

    @pytest.mark.parametrize('bits', [12, 14, 16])
    def test_nef_bit_depths(self, tmp_path, bits):
        from neural_imaging_tpu.data import camera_raw
        rng = np.random.default_rng(bits)
        mosaic = rng.integers(0, 1 << bits, size=(48, 64), dtype=np.uint16)
        path = str(tmp_path / 'x.nef')
        camera_raw.write_nef(path, mosaic, cfa_pattern='GBRG', bits=bits)
        d = camera_raw.read_nef(path)
        assert np.array_equal(d['mosaic'], mosaic)
        assert d['cfa_pattern'] == 'GBRG'
        assert d['white'] == (1 << bits) - 1

    def test_arw_round_trip(self, tmp_path):
        from neural_imaging_tpu.data import camera_raw
        rng = np.random.default_rng(5)
        mosaic = rng.integers(0, 1 << 16, size=(32, 48), dtype=np.uint16)
        path = str(tmp_path / 'x.arw')
        camera_raw.write_arw(path, mosaic, bits=16)
        assert np.array_equal(camera_raw.read_arw(path)['mosaic'], mosaic)

    @pytest.mark.parametrize('bits', [12, 14])
    def test_nef_lossless_compressed_round_trip(self, tmp_path, bits):
        """Nikon type-34713 lossless NEF: writer emits the entropy-coded payload
        + MakerNote tag 0x0096 metadata chain, the reader must invert it
        (libRAW coverage parity, ref helpers/raw.py:110-181)."""
        from neural_imaging_tpu.data import camera_raw
        rng = np.random.default_rng(bits + 100)
        # smooth-ish content (realistic diff statistics) + hard random corners
        base = np.cumsum(rng.integers(-40, 41, size=(50, 62)), axis=1)
        mosaic = np.clip(base + (1 << (bits - 1)), 0, (1 << bits) - 1).astype(np.uint16)
        mosaic[:4, :4] = rng.integers(0, 1 << bits, size=(4, 4))
        path = str(tmp_path / 'c.nef')
        camera_raw.write_nef(path, mosaic, bits=bits, black=5,
                             compression='nikon-lossless')
        d = camera_raw.read_nef(path)
        assert np.array_equal(d['mosaic'], mosaic)
        assert d['black'] == 5 and d['cfa_pattern'] == 'GBRG'

    def test_nef_lossless_python_native_agree(self):
        """The pure-Python decoder is the native kernel's differential oracle."""
        from neural_imaging_tpu.data import nikon
        rng = np.random.default_rng(77)
        mosaic = rng.integers(0, 1 << 14, size=(24, 30)).astype(np.uint16)
        payload, meta = nikon.encode(mosaic, 14)
        vpred = nikon.parse_meta(meta)['vpred']
        py = nikon._decode_python(payload, 24, 30, 14, vpred)
        assert np.array_equal(py, mosaic)
        native = nikon._decode_native(payload, 24, 30, 14, vpred)
        if native is not None:  # toolchain present
            assert np.array_equal(native, py)

    def test_nef_lossless_real_style_makernote(self, tmp_path):
        """Real NEFs wrap the MakerNote in a 'Nikon\\0' header with an embedded
        TIFF whose tag offsets are relative to that header — the reader must
        follow that base."""
        import struct
        from neural_imaging_tpu.data import camera_raw, nikon
        rng = np.random.default_rng(9)
        mosaic = rng.integers(0, 1 << 14, size=(20, 26)).astype(np.uint16)
        payload, meta = nikon.encode(mosaic, 14)
        # embedded TIFF: header(8) + IFD(2 + 12 + 4 = 18) then the meta blob
        inner = (struct.pack('<H', 1)
                 + struct.pack('<HHII', 0x0096, 7, len(meta), 8 + 18)
                 + struct.pack('<I', 0))
        emb = b'II' + struct.pack('<HI', 42, 8) + inner + meta
        mk_payload = b'Nikon\x00\x02\x10\x00\x00' + emb

        # write an uncompressed NEF, then splice: compression -> 34713,
        # strip payload -> entropy-coded bytes, MakerNote -> the blob above
        path = str(tmp_path / 'r.nef')
        camera_raw.write_nef(path, mosaic, bits=14, compression='nikon-lossless')
        blob = bytearray(open(path, 'rb').read())
        # replace the bare-IFD MakerNote area by rewriting the whole file with
        # the real-style blob appended and the EXIF MakerNote entry repointed
        mk_off = len(blob)
        blob += mk_payload
        # EXIF IFD is right after the bare MakerNote IFD at offset 8; find its
        # MakerNote entry (tag 37500) and repoint offset + count
        exif_pos = blob.find(struct.pack('<HH', 37500, 7))
        assert exif_pos > 0
        blob[exif_pos + 4:exif_pos + 12] = struct.pack('<II', len(mk_payload), mk_off)
        open(path, 'wb').write(bytes(blob))
        d = camera_raw.read_nef(path)
        assert np.array_equal(d['mosaic'], mosaic)

    @pytest.mark.parametrize('bits', [12, 14])
    def test_nef_lossy_no_split_round_trip(self, tmp_path, bits):
        """Lossy 34713, pre-split tree only: every SSSS category is present as
        a plain symbol, so the coding is exact (the loss enters only via the
        curve and the after-split trees)."""
        from neural_imaging_tpu.data import camera_raw
        rng = np.random.default_rng(bits)
        mosaic = rng.integers(0, 1 << bits, (18, 22)).astype(np.uint16)
        path = str(tmp_path / 'ly.nef')
        camera_raw.write_nef(path, mosaic, bits=bits, black=3,
                             compression='nikon-lossy')
        d = camera_raw.read_nef(path)
        assert np.array_equal(d['mosaic'], mosaic)
        assert d['black'] == 3

    def test_nef_lossy_split_and_curve(self, tmp_path):
        """Lossy type 2 (ver 0x44/0x20): interpolated linearization curve +
        after-split tree switch. The shifted symbols quantize differences by
        at most 2**shl in the index domain; the stream still decodes
        deterministically (encoder runs the decoder closed-loop)."""
        from neural_imaging_tpu.data import camera_raw, nikon
        bits, h, w, split = 14, 20, 26, 8
        rng = np.random.default_rng(42)
        idx = rng.integers(0, 1 << bits, (h, w)).astype(np.uint16)
        # gamma-ish curve sampled on the type-2 grid (strictly increasing)
        grid = np.arange(17) / 16.0
        samples = (grid ** 0.45 * 16000).astype(np.uint16)
        path = str(tmp_path / 'ls.nef')
        camera_raw.write_nef(path, idx, bits=bits, compression='nikon-lossy',
                             nikon_split=split, nikon_curve_samples=samples)
        d = camera_raw.read_nef(path)
        # expected: closed-loop reconstruction mapped through the same curve
        _, recon, vpred = nikon.encode_lossy(idx, bits, split=split)
        meta = nikon.parse_meta(nikon.build_meta_lossy(
            vpred, curve_samples=samples, split=split), bits=bits)
        assert meta['split'] == split and meta['curve'] is not None
        expect = meta['curve'][np.clip(recon, 0, len(meta['curve']) - 1)]
        assert np.array_equal(d['mosaic'], expect)
        # pre-split rows are exact; post-split quantization is bounded (the
        # largest shl in the 14-bit after-split tree is 5 → error < 2**5)
        assert np.array_equal(recon[:split], idx[:split].astype(np.int32))
        assert np.abs(recon[split:] - idx[split:].astype(np.int32)).max() < 32

    def test_nef_lossy_type1_verbatim_curve(self, tmp_path):
        """Lossy type 1 (other version bytes): the full curve is stored
        verbatim in the metadata block."""
        from neural_imaging_tpu.data import camera_raw, nikon
        bits = 12
        rng = np.random.default_rng(7)
        curve = np.cumsum(rng.integers(1, 5, 1 << bits)).astype(np.uint16)
        idx = rng.integers(0, 1 << bits, (10, 14)).astype(np.uint16)
        path = str(tmp_path / 'l1.nef')
        camera_raw.write_nef(path, idx, bits=bits, compression='nikon-lossy',
                             nikon_curve=curve,
                             white=int(curve.max()))
        d = camera_raw.read_nef(path)
        assert np.array_equal(d['mosaic'], curve[idx])
        assert d['white'] == int(curve.max())

    @pytest.mark.parametrize('tile_width', [0, 16, 32])
    def test_arw_ljpeg_round_trip(self, tmp_path, tile_width):
        """Compression=7 ARW (newest Sony bodies): SOF3 payload as one strip
        or full-height column-band tiles (incl. a ragged last band that the
        writer pads and the reader crops). Decoded by the same machinery as
        lossless-JPEG DNGs (data/dng.py + data/ljpeg.py)."""
        from neural_imaging_tpu.data import camera_raw
        rng = np.random.default_rng(tile_width)
        mosaic = rng.integers(0, 1 << 14, (40, 60)).astype(np.uint16)
        path = str(tmp_path / 'lj.arw')
        camera_raw.write_arw(path, mosaic, bits=14, compression='ljpeg',
                             tile_width=tile_width, black=512,
                             black_style='sony')
        d = camera_raw.read_arw(path)
        assert np.array_equal(d['mosaic'], mosaic)
        assert d['black'] == 512 and d['white'] == (1 << 14) - 1

    def test_nikon_trees_kraft_complete(self):
        """All six published Huffman BITS rows must be Kraft-complete and
        consistent with their value counts (guards the format constants)."""
        from neural_imaging_tpu.data import nikon
        for (variant, bits), (tree_bits, tree_vals) in nikon.TREES.items():
            assert sum(tree_bits) == len(tree_vals), (variant, bits)
            kraft = sum(n * 2.0 ** -(i + 1) for i, n in enumerate(tree_bits))
            assert kraft == 1.0, (variant, bits, kraft)

    def test_unpack_parity_across_containers(self, tmp_path, photo):
        """The same simulated capture written as DNG / CR2 / NEF / ARW unpacks
        to the identical normalized mosaic (WB off — NEF/ARW carry no WB)."""
        crop = photo[:128, :128]
        paths = {
            'dng': fixtures.make_dng_capture(str(tmp_path / 'c.dng'), image_rgb=crop),
            'cr2': fixtures.make_camera_capture(str(tmp_path / 'c.cr2'), image_rgb=crop),
            'nef': fixtures.make_camera_capture(str(tmp_path / 'c.nef'), image_rgb=crop),
            'arw': fixtures.make_camera_capture(str(tmp_path / 'c.arw'), image_rgb=crop),
        }
        stacks = {k: raw.unpack(p, use_wb=False)[0] for k, p in paths.items()}
        for k in ('cr2', 'nef', 'arw'):
            np.testing.assert_array_equal(stacks[k], stacks['dng'], err_msg=k)

    def test_cr2_wb_matches_dng(self, tmp_path, photo):
        """CR2's MakerNote WB drives the same white balance as DNG AsShotNeutral."""
        crop = photo[:64, :64]
        p_dng = fixtures.make_dng_capture(str(tmp_path / 'w.dng'), image_rgb=crop)
        p_cr2 = fixtures.make_camera_capture(str(tmp_path / 'w.cr2'), image_rgb=crop)
        s_dng, _, _, mul_dng = raw.unpack(p_dng)
        s_cr2, _, _, mul_cr2 = raw.unpack(p_cr2)
        np.testing.assert_allclose(mul_cr2, mul_dng, atol=2e-3)
        np.testing.assert_allclose(s_cr2, s_dng, atol=2e-3)

    def test_unsupported_vendor_compression(self, tmp_path):
        """Proprietary entropy codings raise UnsupportedRawError with a hint
        (falling through to rawpy when installed; a clear error here)."""
        from neural_imaging_tpu.data import camera_raw
        path = str(tmp_path / 'x.nef')
        camera_raw.write_nef(path, np.zeros((8, 8), np.uint16), bits=16)
        blob = bytearray(open(path, 'rb').read())
        # patch the raw IFD's Compression SHORT to Nikon's 34713
        comp = blob.find(struct_pack_compression(1))
        assert comp > 0
        blob[comp:comp + 12] = struct_pack_compression(34713)
        open(path, 'wb').write(bytes(blob))
        with pytest.raises(camera_raw.UnsupportedRawError, match='34713|Nikon'):
            camera_raw.read_nef(path)
        if not raw.HAS_RAWPY:
            with pytest.raises(camera_raw.UnsupportedRawError):
                raw.unpack(path)

    @pytest.mark.parametrize('bits,shape', [(12, (7, 9)), (14, (5, 13))])
    def test_bitpacked_odd_sample_counts(self, tmp_path, bits, shape):
        """Sample counts that do not fill a whole byte-aligned group still
        round-trip (tail handling in the chunked unpacker)."""
        from neural_imaging_tpu.data import camera_raw
        rng = np.random.default_rng(bits + shape[0])
        mosaic = rng.integers(0, 1 << bits, size=shape, dtype=np.uint16)
        packed = camera_raw._pack_bitpacked(mosaic, bits)
        out = camera_raw._unpack_bitpacked(packed, mosaic.size, bits)
        np.testing.assert_array_equal(out.reshape(shape), mosaic)

    def test_arw_sony_black_tag(self, tmp_path):
        """Sony-style black levels (tag 0x7310) are honored."""
        from neural_imaging_tpu.data import camera_raw
        mosaic = np.full((8, 8), 700, dtype=np.uint16)
        path = str(tmp_path / 'b.arw')
        camera_raw.write_arw(path, mosaic, bits=14, black=512, black_style='sony')
        d = camera_raw.read_arw(path)
        assert d['black'] == 512

    def test_vendor_black_defaults(self, tmp_path):
        """Files with no level metadata get the per-make default black, not 0
        (real vendor containers carry levels in opaque blocks the reader cannot
        parse; a silent black=0 would mis-normalize every real capture)."""
        from neural_imaging_tpu.data import camera_raw
        mosaic = np.full((8, 8), 3000, dtype=np.uint16)
        p_arw = str(tmp_path / 'd.arw')
        camera_raw.write_arw(p_arw, mosaic, bits=14, black_style='none')
        assert camera_raw.read_arw(p_arw)['black'] == 512
        p_nef = str(tmp_path / 'd.nef')
        camera_raw.write_nef(p_nef, mosaic, bits=14, black_style='none')
        assert camera_raw.read_nef(p_nef)['black'] == 0  # Nikon clamps on-chip

    def test_prepare_training_set_from_vendor_files(self, tmp_path, photo):
        """CR2 + NEF camera files -> train_prepare_training_set.py -> training
        pairs, through the same CLI path as DNGs."""
        raw_dir = tmp_path / 'camera'
        os.makedirs(raw_dir)
        crop = photo[:128, :128]
        fixtures.make_camera_capture(str(raw_dir / 'a.cr2'), image_rgb=crop)
        fixtures.make_camera_capture(str(raw_dir / 'b.nef'), image_rgb=crop)
        out_dir = tmp_path / 'training'
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, 'train_prepare_training_set.py'),
             '--dir', str(raw_dir), '--out', str(out_dir), '--dev', 'manual'],
            capture_output=True, text=True, timeout=600)
        assert proc.returncode == 0, proc.stderr[-2000:]
        npys = sorted(p for p in os.listdir(out_dir) if p.endswith('.npy'))
        assert len(npys) == 2
        stack = np.load(out_dir / npys[0])
        assert stack.dtype == np.uint16 and stack.shape[-1] == 4


class TestSonyCRaw:
    """Sony cRAW / ARW2 (Compression=32767): native block codec + SR2 crypto
    (libRAW coverage parity, ref helpers/raw.py:110-181, readme.md:34)."""

    @staticmethod
    def _smooth_codes(h, w, seed=0):
        # per-block (16 same-row pixels) spread < 128 → sh=0 → exact coding
        rng = np.random.default_rng(seed)
        base = np.linspace(200, 1500, h).astype(np.int32)[:, None]
        return np.clip(base + rng.integers(0, 60, (h, w)), 0, 2047).astype(np.uint16)

    def test_plain_craw_round_trip(self, tmp_path):
        """Without SR2 metadata the payload holds raw 11-bit codes; smooth
        content (block spread < 128) round-trips exactly."""
        from neural_imaging_tpu.data import camera_raw
        codes = self._smooth_codes(24, 64)
        path = str(tmp_path / 'c.arw')
        camera_raw.write_arw(path, codes, compression='sony-craw')
        d = camera_raw.read_arw(path)
        assert np.array_equal(d['mosaic'], codes)
        assert d['white'] == 2047  # 11-bit coded domain, no curve

    def test_craw_lossy_bound(self, tmp_path):
        """Worst-case content: the 7-bit deltas quantize by at most
        2**sh - 1 = 15 codes, and every block's max/min pixel is exact."""
        from neural_imaging_tpu.data import camera_raw, sony
        rng = np.random.default_rng(3)
        codes = rng.integers(0, 2048, (16, 96)).astype(np.uint16)
        out = sony.decode(sony.encode(codes), 16, 96)
        err = np.abs(out.astype(int) - codes.astype(int))
        assert err.max() <= 15
        blocks = codes.reshape(16, 3, 16, 2).transpose(0, 1, 3, 2).reshape(-1, 16)
        dblocks = out.reshape(16, 3, 16, 2).transpose(0, 1, 3, 2).reshape(-1, 16)
        assert np.array_equal(blocks.max(1), dblocks.max(1))
        assert np.array_equal(blocks.min(1), dblocks.min(1))

    def test_encrypted_sr2_chain(self, tmp_path):
        """Real-file topology: IFD0 0xC634 → SR2Private (0x7200/01/21) →
        encrypted sub-IFD with tone curve, black and WB. Values that are exact
        curve outputs survive the full decode exactly."""
        from neural_imaging_tpu.data import camera_raw, sony
        posts = [1000 << 2, 2500 << 2, 3200 << 2, 3900 << 2]
        curve = sony.build_curve(posts)
        codes = self._smooth_codes(20, 64, seed=7)
        linear = (curve[codes.astype(np.int32) << 1] >> 2).astype(np.uint16)
        path = str(tmp_path / 'e.arw')
        camera_raw.write_arw(path, linear, compression='sony-craw',
                             sr2_meta={'curve_posts': posts,
                                       'black': (512,) * 4,
                                       'wb': (2200, 1024, 1024, 1900),
                                       'key': 0xCAFEBABE})
        d = camera_raw.read_arw(path)
        assert np.array_equal(d['mosaic'], linear)
        assert d['black'] == 512
        assert d['white'] == sony.curve_white(curve)
        # WB file order (R, G1, G2, B) → framework order (R, G, B, G2)
        assert np.allclose(d['cam_mul'], [2200, 1024, 1900, 1024])
        # the encrypted bytes must not leak the plaintext tag structure
        blob = open(path, 'rb').read()
        assert struct_pack_tag(0x7310) not in blob
        assert struct_pack_tag(0x7010) not in blob

    def test_sr2_decrypt_symmetric(self):
        """The SR2 cipher is a self-inverse XOR keystream that actually
        scrambles (dcraw's sony_decrypt keystream)."""
        from neural_imaging_tpu.data import sony
        rng = np.random.default_rng(11)
        blob = rng.integers(0, 256, 257, dtype=np.uint8).tobytes()
        enc = sony.decrypt(blob, 0xDEADBEEF)
        assert enc != blob
        assert sony.decrypt(enc, 0xDEADBEEF) == blob
        assert sony.decrypt(enc, 0xDEADBEE0) != blob  # wrong key stays garbage

    def test_craw_unpack_normalization(self, tmp_path):
        """raw.unpack develops a cRAW like any other container: black/white
        normalization from the decrypted SR2 levels, WB applied."""
        from neural_imaging_tpu.data import camera_raw, sony
        posts = [1000 << 2, 2500 << 2, 3200 << 2, 3900 << 2]
        curve = sony.build_curve(posts)
        codes = self._smooth_codes(32, 64, seed=5)
        linear = (curve[codes.astype(np.int32) << 1] >> 2).astype(np.uint16)
        path = str(tmp_path / 'u.arw')
        camera_raw.write_arw(path, linear, compression='sony-craw',
                             sr2_meta={'curve_posts': posts, 'black': 512,
                                       'key': 1234})
        stack, cfa, _, _ = raw.unpack(path, use_wb=False)
        assert cfa == 'RGGB' and stack.shape == (16, 32, 4)
        white = sony.curve_white(curve)
        expect = np.clip((linear.astype(np.float32) - 512) / (white - 512), 0, 1)
        # spot-check the stacked CFA planes (RGGB: R at (0,0), B at (1,1))
        assert np.allclose(stack[..., 0], expect[0::2, 0::2], atol=1e-6)
        assert np.allclose(stack[..., 3], expect[1::2, 1::2], atol=1e-6)

    def test_curve_validation(self):
        from neural_imaging_tpu.data import sony
        with pytest.raises(sony.SonyFormatError, match='monotone'):
            sony.build_curve([3000 << 2, 1000 << 2, 3200 << 2, 3900 << 2])
        with pytest.raises(sony.SonyFormatError, match='width'):
            sony.encode(np.zeros((4, 20), np.uint16))

    def test_malformed_craw_degrades_cleanly(self, tmp_path):
        """Corruption never escapes as a raw struct/Sony error: truncated
        pixel data raises DNGError; a broken SR2 chain (wrong key, OOB offset)
        falls back to the no-metadata path like an absent chain."""
        import struct
        from neural_imaging_tpu.data import camera_raw
        codes = self._smooth_codes(24, 64, seed=2)
        path = str(tmp_path / 'f.arw')
        # no curve: the payload holds plain 11-bit codes, so the broken-chain
        # fallback must still return them bit-exactly
        camera_raw.write_arw(path, codes, compression='sony-craw',
                             sr2_meta={'black': 512, 'key': 99})
        good = open(path, 'rb').read()

        open(path, 'wb').write(good[:len(good) // 2])   # truncated payload
        with pytest.raises(camera_raw.DNGError):
            camera_raw.read_arw(path)

        blob = bytearray(good)                          # wrong SR2 key
        pos = blob.find(struct.pack('<HH', 0x7221, 4))
        blob[pos + 8:pos + 12] = struct.pack('<I', 98)
        open(path, 'wb').write(bytes(blob))
        d = camera_raw.read_arw(path)                   # codes, default levels
        assert d['white'] == 2047 and np.array_equal(d['mosaic'], codes)

        blob = bytearray(good)                          # OOB SR2 offset
        pos = blob.find(struct.pack('<HH', 0x7200, 4))
        blob[pos + 8:pos + 12] = struct.pack('<I', 2 ** 31)
        open(path, 'wb').write(bytes(blob))
        d = camera_raw.read_arw(path)
        assert np.array_equal(d['mosaic'], codes)


def struct_pack_tag(tag):
    import struct
    # TIFF entry prefix: tag id + type SHORT (enough to spot plaintext tags)
    return struct.pack('<HH', tag, 3)


def struct_pack_compression(value):
    import struct
    # TIFF entry: tag 259 (Compression), type SHORT, count 1, inline value
    return struct.pack('<HHI', 259, 3, 1) + struct.pack('<H', value) + b'\0\0'


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
