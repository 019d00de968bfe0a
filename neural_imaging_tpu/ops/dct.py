"""
8x8 block DCT machinery for the differentiable JPEG codec.

The DCT is expressed as batched 8x8 matmuls (D @ X @ D^T) which XLA tiles directly
onto the TPU MXU — the FLOP-dense core of the dJPEG path. Blockification is pure
reshape/transpose (free at the XLA level), unlike the reference's
space_to_depth gymnastics (models/jpeg.py:102-114).
"""
import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache()
def dct_matrix(n=8):
    """Orthonormal DCT-II matrix: D[k, m] = c_k cos((2m+1)kπ/2n)."""
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    d = np.cos((2 * m + 1) * k * np.pi / (2 * n)) * np.sqrt(2.0 / n)
    d[0, :] = np.sqrt(1.0 / n)
    return d.astype(np.float32)


@functools.lru_cache()
def blockdiag_dct_matrices(size):
    """(size, size) block-diagonal DCT operators (I_{size/8} ⊗ D, I_{size/8} ⊗ Dᵀ).

    Left/right-multiplying a (…, H, W) plane by these applies independent 8-point
    DCTs to every aligned 8-row/8-column group — the whole-image 2-D block DCT as
    two DENSE matmuls, with no (…, 8, 8)-minor intermediate. On TPU this is the
    layout-critical form: blockified tensors tile-pad their 8-lane minor dim to
    128 (≈16× physical bytes), while the plane form keeps W in the lanes."""
    d = dct_matrix(8)
    eye = np.eye(size // 8, dtype=np.float32)
    return (np.kron(eye, d).astype(np.float32),
            np.kron(eye, d.T).astype(np.float32))


def blockify(x, block=8):
    """(N, H, W, C) → (N, C, H/b, W/b, b, b) array of non-overlapping blocks."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // block, block, w // block, block, c)
    return x.transpose(0, 5, 1, 3, 2, 4)


def deblockify(blocks):
    """(N, C, H/b, W/b, b, b) → (N, H, W, C)."""
    n, c, hb, wb, b, _ = blocks.shape
    x = blocks.transpose(0, 2, 4, 3, 5, 1)
    return x.reshape(n, hb * b, wb * b, c)


def dct2d(blocks, precision=None):
    """Forward 2-D DCT of trailing (8, 8) block axes: D X Dᵀ.

    Default precision is HIGHEST: the TPU MXU default (bf16 inputs) costs ~0.02
    absolute error per 8x8 matmul, which would break the ≤0.1 dB dJPEG parity
    target. Throughput-oriented callers (e.g. a bfloat16 distribution channel,
    where the codec only simulates an attack) may pass a lower precision.
    """
    import jax
    d = jnp.asarray(dct_matrix(blocks.shape[-1]), dtype=blocks.dtype)
    return jnp.einsum('ij,...jk,lk->...il', d, blocks, d,
                      precision=precision or jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32).astype(blocks.dtype)


def idct2d(coeffs, precision=None):
    """Inverse 2-D DCT of trailing (8, 8) block axes: Dᵀ X D (precision as
    :func:`dct2d`)."""
    import jax
    d = jnp.asarray(dct_matrix(coeffs.shape[-1]), dtype=coeffs.dtype)
    return jnp.einsum('ji,...jk,kl->...il', d, coeffs, d,
                      precision=precision or jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32).astype(coeffs.dtype)
