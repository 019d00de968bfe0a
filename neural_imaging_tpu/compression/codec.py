"""
Actual image codec: serialize DCN latents to a real compressed bitstream and back.

Capability parity with reference compression/codec.py (format documented at
codec.py:91-101), backed by the native C++ rANS coder instead of pyfse:

  - 3 x uint8           latent shape (H, W, N)
  - uint16              length of the coded layer-size block
  - coded layer sizes   entropy-coded uint16 array (or raw bytes)
  - per feature map     entropy-coded uint8 codebook indices, with RLE
                        (uint16 count + uint8 value) and raw fallbacks

Device/host choreography: the DCN encoder/decoder run jitted on TPU; vector
quantization against the codebook and entropy coding run on the host.
"""
import io

import numpy as np

from neural_imaging_tpu.compression import entropy
from neural_imaging_tpu.utils import metrics, stats


class L3ICError(Exception):
    pass


def _vq(values, code_book):
    """Nearest-centroid assignment (host): returns uint8 indices."""
    values = np.asarray(values, dtype=np.float64).reshape(-1)
    code_book = np.asarray(code_book, dtype=np.float64).reshape(-1)
    idx = np.argmin(np.abs(values[:, None] - code_book[None, :]), axis=1)
    return idx.astype(np.uint8)


def compress(batch_x, model, verbose=False):
    """Encode one image (through model.compress) into a self-contained bitstream."""
    batch_x = np.asarray(batch_x)
    if batch_x.ndim == 3:
        batch_x = batch_x[None]
    assert batch_x.ndim == 4 and batch_x.shape[0] == 1

    stream = io.BytesIO()
    batch_z = np.asarray(model.compress(batch_x))
    latent_shape = np.array(batch_z.shape[1:], dtype=np.uint8)
    stream.write(latent_shape.tobytes())

    code_book = model.get_codebook()
    if len(code_book) > 256:
        raise L3ICError('Code-books with more than 256 centers are not supported')

    coded_layers = []
    plane = int(latent_shape[0]) * int(latent_shape[1])
    if plane == 3:
        # a 3-byte raw layer would be indistinguishable from an RLE record
        raise L3ICError('1x3 / 3x1 latent planes are not representable in the bitstream')
    for n in range(latent_shape[-1]):
        indices = _vq(batch_z[0, :, :, n], code_book)
        try:
            coded = entropy.compress(indices.tobytes())
        except entropy.ANSSymbolRepetitionError:
            coded = np.uint16(len(indices)).tobytes() + np.uint8(indices[0]).tobytes()
        except entropy.ANSNotCompressibleError:
            coded = indices.tobytes()
        if len(coded) == 1:
            raise L3ICError(f'Layer {n} compresses to a single byte — something is wrong!')
        coded_layers.append(coded)

    layer_lengths = np.array([len(c) for c in coded_layers], dtype=np.uint16)
    try:
        coded_lengths = entropy.compress(layer_lengths.tobytes())
    except (entropy.ANSNotCompressibleError, entropy.ANSSymbolRepetitionError):
        coded_lengths = layer_lengths.tobytes()
    if len(coded_lengths) == 0:
        raise RuntimeError('Empty coded layer lengths!')

    stream.write(np.uint16(len(coded_lengths)).tobytes())
    stream.write(coded_lengths)
    for layer in coded_layers:
        stream.write(layer)
    return stream.getvalue()


def decompress(stream, model=None, verbose=False):
    """Decode a bitstream produced by :func:`compress` back to an RGB image."""
    if isinstance(stream, bytes):
        stream = io.BytesIO(stream)
    elif not hasattr(stream, 'read'):
        raise ValueError('Unsupported stream type!')

    latent_x, latent_y, n_latent = np.frombuffer(stream.read(3), np.uint8)
    layer_bytes = int(np.frombuffer(stream.read(2), np.uint16)[0])
    coded_layer_lengths = stream.read(layer_bytes)

    if layer_bytes != 2 * n_latent:
        layer_lengths = np.frombuffer(entropy.decompress(coded_layer_lengths, 2 * int(n_latent)),
                                      dtype=np.uint16)
    else:
        layer_lengths = np.frombuffer(coded_layer_lengths, dtype=np.uint16)

    if model is None:
        model = restore(f'{n_latent}c')
    if model.latent_shape[-1] != n_latent:
        from neural_imaging_tpu.utils.utils import logger
        logger.warning('decoder model (%dc) does not match the coded stream (%dc) '
                       '- switching', model.latent_shape[-1], n_latent)
        model = restore(f'{n_latent}c')

    code_book = model.get_codebook()
    batch_z = np.zeros((1, latent_x, latent_y, n_latent), dtype=np.float32)
    plane = int(latent_x) * int(latent_y)

    for n in range(n_latent):
        coded = stream.read(int(layer_lengths[n]))
        try:
            # A 3-byte layer can only be the RLE record (uint16 count + uint8
            # value): a real ANS stream is >= entropy.MIN_STREAM_BYTES (8) bytes,
            # and the encoder refuses the ambiguous plane == 3 raw case.
            if len(coded) == 3 and plane != 3:  # RLE
                count = int(np.frombuffer(coded[:2], dtype=np.uint16)[0])
                layer_data = coded[-1:] * count
            elif len(coded) == plane:  # raw
                layer_data = coded
            else:
                layer_data = entropy.decompress(coded, plane)
        except entropy.ANSException as e:
            raise L3ICError(f'Error while decoding layer {n} '
                            f'(stream of {len(coded)} bytes)') from e
        batch_z[0, :, :, n] = code_book[np.frombuffer(layer_data, np.uint8)] \
            .reshape(latent_x, latent_y)

    return np.asarray(model.decompress(batch_z))


def compare(dcn, batch_x):
    """
    Compare the direct (device-only) decode with the full bitstream round trip —
    asserts that entropy coding is lossless on the quantized latent.
    Returns (direct_decode, bitstream_decode).
    """
    batch_z = np.asarray(dcn.compress(batch_x))
    batch_y = np.asarray(dcn.decompress(batch_z))

    code_book = dcn.get_codebook()
    indices = _vq(batch_z, code_book)
    coded = entropy.compress(indices.tobytes())
    decoded = entropy.decompress(coded, indices.size)
    assert indices.tobytes() == decoded, 'Entropy decoding error'

    recovered = code_book[np.frombuffer(decoded, np.uint8)].reshape(batch_z.shape)
    image_y = np.asarray(dcn.decompress(recovered.astype(np.float32)))
    return batch_y, image_y


def simulate_compression(batch_x, dcn):
    """Full round-trip through the real bitstream; returns (image, n_bytes)."""
    blob = compress(batch_x, dcn)
    return decompress(blob, dcn), len(blob)


def compress_n_stats(batch_x, dcn):
    """Per-image round-trip quality/rate statistics (ssim/psnr/entropy/bytes/bpp)."""
    batch_x = np.asarray(batch_x)
    batch_y = np.zeros_like(batch_x)
    out = {k: np.zeros(batch_x.shape[0]) for k in ('ssim', 'psnr', 'entropy', 'bytes', 'bpp')}

    for i in range(batch_x.shape[0]):
        recon, nbytes = simulate_compression(batch_x[i:i + 1], dcn)
        batch_y[i] = recon[0]
        batch_z = np.asarray(dcn.compress(batch_x[i:i + 1]))
        out['bytes'][i] = nbytes
        out['entropy'][i] = stats.entropy(batch_z, dcn.get_codebook())
        out['ssim'][i] = metrics.ssim(batch_x[i], batch_y[i])
        out['psnr'][i] = metrics.psnr(batch_x[i], batch_y[i])
        out['bpp'][i] = 8 * nbytes / (batch_x.shape[1] * batch_x.shape[2])

    if batch_x.shape[0] == 1:
        out = {k: v[0] for k, v in out.items()}
    return batch_y, out


def global_compress(dcn, batch_x):
    """Naive single-stream coding of the whole latent tensor."""
    batch_z = np.asarray(dcn.compress(batch_x))
    indices = _vq(batch_z, dcn.get_codebook())
    return entropy.compress(indices.tobytes())


def coded_bytes_callback(code_book):
    """
    A jittable rate probe: returns fn(latent) → real coded size in bytes, computed
    on host (vq + rANS with the RLE/raw fallbacks) via ``jax.pure_callback`` —
    actual bitstream rates inside otherwise-jitted validation flows (the
    host/device choreography called out in SURVEY.md §7 hard-part 3).

    :param code_book: static numpy codebook (host side of the closure)
    """
    import jax
    import jax.numpy as jnp

    code_book = np.asarray(code_book, np.float64).reshape(-1)

    def host_count(batch_z):
        batch_z = np.asarray(batch_z)
        total = 0
        for n in range(batch_z.shape[-1]):
            indices = _vq(batch_z[..., n], code_book)
            try:
                total += len(entropy.compress(indices.tobytes()))
            except entropy.ANSSymbolRepetitionError:
                total += 3
            except entropy.ANSNotCompressibleError:
                total += len(indices)
        return np.int32(total)

    def coded_bytes(latent):
        return jax.pure_callback(host_count,
                                 jax.ShapeDtypeStruct((), jnp.int32), latent)
    return coded_bytes


def restore(dir_name, patch_size=None, fetch_stats=False):
    """Preset-aware DCN restore, e.g. ``codec.restore('16c')``
    (presets in config/presets/compression.json)."""
    from neural_imaging_tpu.models import base, compression
    return base.restore(dir_name, compression, key='codec', patch_size=patch_size,
                        fetch_stats=fetch_stats)
