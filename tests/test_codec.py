"""Tests for the entropy coder and the real bitstream codec."""
import numpy as np
import pytest

from neural_imaging_tpu.compression import codec, entropy
from neural_imaging_tpu.models import compression


class TestEntropyCoder:
    def test_roundtrip_skewed(self, rng):
        data = rng.choice(np.arange(8, dtype=np.uint8), 4096,
                          p=[0.5, 0.2, 0.1, 0.08, 0.05, 0.04, 0.02, 0.01]).tobytes()
        coded = entropy.compress(data)
        assert len(coded) < len(data) // 2
        assert entropy.decompress(coded, len(data)) == data

    def test_near_entropy_rate(self, rng):
        p = np.array([0.7, 0.2, 0.06, 0.04])
        data = rng.choice(np.arange(4, dtype=np.uint8), 65536, p=p).tobytes()
        coded = entropy.compress(data)
        h_bits = -np.sum(p * np.log2(p))
        achieved = 8 * len(coded) / len(data)
        assert achieved < h_bits * 1.05 + 0.1  # within 5% of entropy + header

    def test_repetition_raises(self):
        with pytest.raises(entropy.ANSSymbolRepetitionError):
            entropy.compress(b'\x42' * 1000)

    def test_incompressible_raises(self, rng):
        with pytest.raises(entropy.ANSNotCompressibleError):
            entropy.compress(rng.integers(0, 256, 64, dtype=np.uint8).tobytes())

    def test_corrupt_raises(self, rng):
        data = rng.choice(np.arange(4, dtype=np.uint8), 1024).tobytes()
        coded = bytearray(entropy.compress(data))
        coded[6] ^= 0xFF  # corrupt the frequency table
        with pytest.raises(entropy.ANSException):
            entropy.decompress(bytes(coded), 1024)

    def test_native_and_numpy_identical(self, rng):
        if entropy.backend() != 'native':
            pytest.skip('native backend not built')
        data = rng.choice(np.arange(16, dtype=np.uint8), 2048).tobytes()
        native = entropy.compress(data)
        py = entropy._compress_py(data)
        assert native == py
        assert entropy._decompress_py(native) == data

    def test_pyfse_exception_aliases(self):
        assert entropy.FSESymbolRepetitionError is entropy.ANSSymbolRepetitionError
        assert issubclass(entropy.FSENotCompressibleError, entropy.FSEException)


class TestBitstreamCodec:
    @pytest.fixture(scope='class')
    def dcn(self):
        return compression.TwitterDCN(patch_size=64, n_features=8)

    @pytest.fixture(scope='class')
    def image(self):
        from neural_imaging_tpu.data import fixtures
        return fixtures.kodak_like_batch(n=1, height=64, width=64, seed=9)

    def test_bitstream_roundtrip_lossless_latent(self, dcn, image):
        """The bitstream must reproduce the decoder output of the direct path."""
        blob = codec.compress(image, dcn)
        recon = codec.decompress(blob, dcn)
        z = dcn.compress(image)
        direct = np.asarray(dcn.decompress(z))
        assert np.allclose(recon, direct, atol=1e-5)

    def test_bitstream_structure(self, dcn, image):
        blob = codec.compress(image, dcn)
        shape = np.frombuffer(blob[:3], np.uint8)
        assert tuple(shape) == (8, 8, 8)
        # must be far smaller than raw latent (8*8*8 bytes) * safety + header
        assert len(blob) < 8 * 8 * 8 + 100

    def test_simulate_compression(self, dcn, image):
        recon, nbytes = codec.simulate_compression(image, dcn)
        assert recon.shape == image.shape
        assert nbytes == len(codec.compress(image, dcn))

    def test_compress_n_stats(self, dcn, image):
        recon, st = codec.compress_n_stats(image, dcn)
        for k in ('ssim', 'psnr', 'entropy', 'bytes', 'bpp'):
            assert np.isfinite(st[k]), k
        assert st['bpp'] == 8 * st['bytes'] / (64 * 64)

    def test_global_compress(self, dcn, image):
        blob = codec.global_compress(dcn, image)
        assert 0 < len(blob) < 8 * 8 * 8

    def test_restore_via_preset(self, tmp_path, monkeypatch, dcn, image):
        d = tmp_path / 'models' / 'dcn8'
        dcn.save_model(str(d), save_args=True)
        # write a preset file mapping '8c' to the directory
        import json
        preset_dir = tmp_path / 'config' / 'presets'
        preset_dir.mkdir(parents=True)
        (preset_dir / 'compression.json').write_text(json.dumps({'8c': str(d / 'twitterdcn')}))
        monkeypatch.chdir(tmp_path)
        restored = codec.restore('8c')
        assert np.allclose(np.asarray(restored.process(image)),
                           np.asarray(dcn.process(image)), atol=1e-6)


class TestHostCallback:
    def test_coded_bytes_inside_jit(self):
        """Real coded sizes must be obtainable inside a jitted function."""
        import jax
        import jax.numpy as jnp
        from neural_imaging_tpu.models.compression import TwitterDCN
        from neural_imaging_tpu.data import fixtures

        dcn = TwitterDCN(patch_size=32, n_features=8)
        probe = codec.coded_bytes_callback(dcn.get_codebook())

        @jax.jit
        def validate(params, x):
            z, _ = dcn._apply_encoder(params, x)
            return probe(z), jnp.mean(z)

        image = fixtures.kodak_like_batch(n=1, height=32, width=32)
        nbytes, _ = validate(dcn.params, jnp.asarray(image))
        # compare against the eager bitstream (same coding, minus the header)
        blob = codec.compress(image, dcn)
        assert 0 < int(nbytes) <= len(blob)
        assert abs(int(nbytes) - len(blob)) < 64  # header + length table
