"""
Fused Pallas TPU kernel for the differentiable JPEG core: per-strip
DCT → quantize (soft rounding) → dequantize → IDCT without HBM round trips.

The XLA reference path (ops.dct + ops.quantization) materializes the intermediate
coefficient tensors between each stage; this kernel keeps an (8, W) strip of a YCbCr
plane in VMEM for the whole transform chain. 8x8 DCTs are expressed as one
(8,8)x(8,W) row matmul plus a per-block column contraction, both on the MXU at f32.

Forward-only kernel; the custom VJP rematerializes through the XLA path (the
backward of an orthonormal DCT is its transpose, so the chain is two matmul pairs +
the sin-approximation derivative).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_imaging_tpu.ops import dct as dct_ops

LANE = 128


def _is_tpu():
    try:
        return jax.devices()[0].platform == 'tpu'
    except (IndexError, RuntimeError):
        return False


def _strip_kernel(x_ref, q_ref, d_ref, bdt_ref, bd_ref, y_ref, c_ref):
    """Process one (8, W) strip: DCT→quant→dequant→IDCT without layout changes.

    The per-block column DCT is expressed as one (W, W) block-diagonal matmul
    (I_{W/8} ⊗ Dᵀ), which keeps every tensor in the (8, W) register layout Mosaic
    supports and puts the whole chain on the MXU."""
    d = d_ref[:]                                           # (8, 8) DCT matrix
    strip = x_ref[0]                                       # (8, W)
    q = q_ref[0]                                           # (8, W) tiled tables

    # row DCT: (8,8) @ (8,W); column DCT: @ (I ⊗ Dᵀ)
    t = jnp.dot(d, strip, preferred_element_type=jnp.float32)
    X = jnp.dot(t, bdt_ref[:], preferred_element_type=jnp.float32)

    # quantize with the hard-round forward of the 'soft' STE
    u = X / q
    Xq = jnp.round(u) * q

    # inverse column DCT: @ (I ⊗ D); inverse row DCT: Dᵀ @ ·
    t2 = jnp.dot(Xq, bd_ref[:], preferred_element_type=jnp.float32)
    y = jnp.dot(d.T, t2, preferred_element_type=jnp.float32)

    y_ref[0] = y
    c_ref[0] = Xq


def _block_diag_dct(width):
    """(W, W) block-diagonal I_{W/8} ⊗ Dᵀ and I_{W/8} ⊗ D matrices."""
    d = dct_ops.dct_matrix(8)
    eye = np.eye(width // 8, dtype=np.float32)
    bdt = np.kron(eye, d.T).astype(np.float32)
    bd = np.kron(eye, d).astype(np.float32)
    return bdt, bd


def _blockdiag_pair(size):
    """(I ⊗ D, I ⊗ Dᵀ) as HOST numpy constants for the plane-form VJP (host
    constants embed into HLO without a device round trip)."""
    return dct_ops.blockdiag_dct_matrices(size)


def _pallas_core(planes, q_tables, interpret):
    """planes: (P, H, W) float32, q_tables: (P, 8, 8). Returns (y, coeffs)."""
    p, h, w = planes.shape
    grid = (p, h // 8)
    bdt, bd = _block_diag_dct(w)
    q_tiled = jnp.tile(q_tables, (1, 1, w // 8))           # (P, 8, W)

    y, coeffs = pl.pallas_call(
        _strip_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, w), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p, h, w), jnp.float32),
            jax.ShapeDtypeStruct((p, h, w), jnp.float32),
        ],
        interpret=interpret,
    )(planes, q_tiled, jnp.asarray(dct_ops.dct_matrix(8)),
      jnp.asarray(bdt), jnp.asarray(bd))
    return y, coeffs


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def jpeg_core_pallas(ycc_planes, q_tables, interpret=None):
    """
    Fused JPEG transform core on centered YCbCr planes.

    :param ycc_planes: (P, H, W) float32 (P = N*3 planes, values ≈ [-127, 128])
    :param q_tables: (P, 8, 8) quantization tables per plane
    :return: (reconstructed planes, dequantized coefficients) — both (P, H, W)
    """
    return _forward(ycc_planes, q_tables, interpret)


def _forward(ycc_planes, q_tables, interpret):
    if interpret is None:
        interpret = not _is_tpu()
    return _pallas_core(ycc_planes.astype(jnp.float32),
                        q_tables.astype(jnp.float32), interpret)


def _fwd(ycc_planes, q_tables, interpret):
    y, coeffs = _forward(ycc_planes, q_tables, interpret)
    return (y, coeffs), (ycc_planes, q_tables)


def _bwd(interpret, residuals, cotangents):
    """Rematerializing VJP in PLANE form: the blockified (…, 8, 8)-minor
    tensors the previous formulation built tile-pad 8 → 128 lanes on TPU
    (round-5 trace: 2-3% roofline efficiency); here every transform is a
    dense W-minor matmul against the block-diagonal kron DCT operators, with
    intermediates kept transposed (P, W, H) between the two 1-D transforms.
    Equivalence with the blockified form is pinned in tests/test_pallas.py."""
    ycc_planes, q_tables = residuals
    g_y, g_c = cotangents

    p, h, w = ycc_planes.shape
    hi = jax.lax.Precision.HIGHEST

    bd_h, bdt_h = _blockdiag_pair(h)
    bd_w, bdt_w = _blockdiag_pair(w)

    def mm(a, b):
        return jnp.matmul(a, b, precision=hi)

    def dct_t(planes):
        # (P, H, W) → transposed coefficients (P, W, H): X = (I⊗D) p (I⊗Dᵀ)
        return mm(mm(planes, bdt_w).transpose(0, 2, 1), bdt_h)

    def idct_from_t(coeffs_t):
        # transposed coefficients (P, W, H) → planes (P, H, W): y = (I⊗Dᵀ) X (I⊗D)
        return mm(mm(coeffs_t, bd_h).transpose(0, 2, 1), bd_w)

    # per-plane tables tiled in the transposed layout
    q_t = jnp.tile(q_tables.transpose(0, 2, 1), (1, w // 8, h // 8))

    # rematerialize the pre-quantization coefficients
    u = dct_t(ycc_planes.astype(jnp.float32)) / q_t

    # soft-rounding STE backward: derivative of x - sin(2πx)/2π
    du = 1.0 - jnp.cos(2.0 * jnp.pi * u)

    # cotangent on the dequantized coefficients: from y (IDCT adjoint = DCT) + direct
    g_Xq = dct_t(g_y.astype(jnp.float32)) + g_c.astype(jnp.float32).transpose(0, 2, 1)
    g_planes = idct_from_t(g_Xq * du)

    # quantization-table gradient: Xq = q * r(X/q) → d/dq = r(u) - u r'(u)
    r_u = u - jnp.sin(2 * jnp.pi * u) / (2 * jnp.pi)
    dq_t = g_Xq * (r_u - u * du)
    g_q = jnp.sum(dq_t.reshape(p, w // 8, 8, h // 8, 8),
                  axis=(1, 3)).transpose(0, 2, 1)          # (P, 8, 8)

    return jnp.asarray(g_planes, ycc_planes.dtype), g_q


jpeg_core_pallas.defvjp(_fwd, _bwd)


def jpeg_forward_pallas(x, q_luma, q_chroma):
    """
    Drop-in fused variant of models.jpeg.jpeg_forward (rounding='soft').
    Returns (y, coeffs_blocks) with coeffs in the (N, 3, hb, wb, 8, 8) layout.
    """
    from neural_imaging_tpu.ops import color
    n, h, w, _ = x.shape
    ycc = color.rgb_to_ycbcr(255.0 * x) - 127.0
    planes = ycc.transpose(0, 3, 1, 2).reshape(n * 3, h, w)
    q = jnp.stack([q_luma, q_chroma, q_chroma]).astype(jnp.float32)
    q_tables = jnp.tile(q, (n, 1, 1))

    y_planes, coeff_planes = jpeg_core_pallas(planes, q_tables)

    y = y_planes.reshape(n, 3, h, w).transpose(0, 2, 3, 1)
    y = color.ycbcr_to_rgb(y + 127.0) / 255.0
    coeffs = (coeff_planes.reshape(n, 3, h // 8, 8, w // 8, 8)
              .transpose(0, 1, 2, 4, 3, 5))
    return jnp.clip(y, 0.0, 1.0), coeffs
