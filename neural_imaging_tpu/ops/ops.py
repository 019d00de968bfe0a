"""
Core differentiable ops shared across models: NHWC convolutions, depth/space
shuffles, straight-through estimators, pixel quantization and training losses.

These are the XLA-native building blocks of the TPU build; convs lower onto the MXU
and elementwise chains fuse in XLA.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from neural_imaging_tpu.ops import ssim as ssim_ops

_DIMENSION_NUMBERS = ('NHWC', 'HWIO', 'NHWC')


def conv2d(x, kernel, stride=1, padding='SAME', precision=jax.lax.Precision.HIGHEST):
    """NHWC conv with an HWIO kernel. padding: 'SAME', 'VALID' or explicit pairs.

    Defaults to HIGHEST precision: this wrapper carries the fidelity-critical fixed
    filters (CFA upsampling, demosaicing, color matrices, manipulation kernels) whose
    bf16 MXU error would dominate the PSNR budget; large learned CNN layers go
    through flax and keep the fast backend default.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel, dtype=x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=_DIMENSION_NUMBERS, precision=precision)


def small_conv2d(x, kernel, padding='SAME'):
    """Exact-f32 NHWC conv for kernels with tiny channel fan-in/out, computed on
    the VPU as shifted-slice broadcast multiply-sums instead of an MXU matmul.

    Rationale: TPU matmul units natively accumulate bf16 products; true-f32
    convs (Precision.HIGHEST) are emulated with a multi-pass bf16 decomposition,
    and for 3→3-channel kernels the channel dimension is also padded to the
    128-lane MXU tile — measured on the joint workflow, INet's fixed-filter
    convs at HIGHEST are ~40% of the whole train step (docs/benchmarks.md). For
    a k×k kernel this formulation issues k² shifted views of the input, each
    contracted over the (tiny) channel axis elementwise — f32 throughout, no
    emulation passes, no lane padding. Only sensible when Cin·Cout is small
    (≲64 pairs); large convs should stay on the MXU via :func:`conv2d`.
    """
    # Accumulate in f32 regardless of input dtype: summing k²·Cin taps in bf16
    # (e.g. when the workflow channel dtype is bfloat16) would lose the exact-f32
    # guarantee this op exists for. The result is cast back to the input dtype.
    in_dtype = x.dtype
    x = x.astype(jnp.float32)
    kernel = jnp.asarray(kernel, dtype=jnp.float32)
    kh, kw, cin, cout = kernel.shape
    if padding == 'SAME':
        ph, pw = (kh - 1) // 2, (kw - 1) // 2
        x = jnp.pad(x, ((0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw), (0, 0)))
    elif padding != 'VALID':
        x = jnp.pad(x, ((0, 0), tuple(padding[0]), tuple(padding[1]), (0, 0)))
    h = x.shape[1] - kh + 1
    w = x.shape[2] - kw + 1
    out = jnp.zeros(x.shape[:1] + (h, w, cout), dtype=jnp.float32)
    for dy in range(kh):
        for dx in range(kw):
            patch = jax.lax.slice(x, (0, dy, dx, 0),
                                  (x.shape[0], dy + h, dx + w, x.shape[3]))
            # (N,H,W,Cin,1) * (Cin,Cout) summed over Cin — pure VPU FMAs
            out = out + jnp.sum(patch[..., :, None] * kernel[dy, dx], axis=-2)
    return out.astype(in_dtype)


def conv_chw(x, kernel, padding='VALID', pad_mode='constant'):
    """Exact-f32 conv on channels-FIRST input (N, Cin, H, W) → (N, Cout, H', W').

    Same shift-add math as :func:`small_conv2d` (f32 VPU accumulation, no MXU
    emulation passes), but on W-minor planes: every slice and FMA runs on dense
    tiles, where the NHWC form's (…, C≤12)-minor layout is >90% lane padding
    (round-5 device trace, docs/benchmarks.md). ``kernel`` stays HWIO. 'SAME'
    padding uses ``pad_mode`` ('constant' | 'reflect' | 'symmetric')."""
    in_dtype = x.dtype
    x = x.astype(jnp.float32)
    kernel = jnp.asarray(kernel, dtype=jnp.float32)
    kh, kw, cin, cout = kernel.shape
    if padding == 'SAME' and (kh > 1 or kw > 1):
        ph, pw = (kh - 1) // 2, (kw - 1) // 2
        cfg = ((0, 0), (0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw))
        x = jnp.pad(x, cfg) if pad_mode == 'constant' else jnp.pad(x, cfg, mode=pad_mode)
    n, _, hp, wp = x.shape
    h, w = hp - kh + 1, wp - kw + 1
    out = jnp.zeros((n, cout, h, w), dtype=jnp.float32)
    for dy in range(kh):
        for dx in range(kw):
            patch = jax.lax.slice(x, (0, 0, dy, dx), (n, cin, dy + h, dx + w))
            # contract Cin on the sublane-adjacent axis — VPU broadcast FMAs
            out = out + jnp.einsum('nihw,io->nohw', patch, kernel[dy, dx],
                                   precision=jax.lax.Precision.HIGHEST)
    return out.astype(in_dtype)


def depth_to_space_chw(x, block=2):
    """TF-semantics depth_to_space on (N, C, H, W): channel (i*block+j)*cc + c
    → subpixel (i, j) (the channels-first twin of :func:`depth_to_space`)."""
    n, c, h, w = x.shape
    cc = c // (block * block)
    x = x.reshape(n, block, block, cc, h, w)
    x = x.transpose(0, 3, 4, 1, 5, 2)                  # (n, cc, h, bi, w, bj)
    return x.reshape(n, cc, h * block, w * block)


def normalize_batch(x):
    """uint8/uint16 batches → float32 in [0,1]; float batches pass through.

    Lets trainers ship QUANTIZED batches to the device (4x less host→device
    traffic than float32 — the dominant cost per step on a tunneled chip) and
    normalize in-graph. Matches the host-side conversion bit-for-bit (same
    f32 divide)."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    if x.dtype == jnp.uint16:
        return x.astype(jnp.float32) / 65535.0
    return x.astype(jnp.float32)


def depth_to_space(x, block=2):
    """TF-semantics depth_to_space: channel (i*block+j)*C + c → subpixel (i, j)."""
    n, h, w, c = x.shape
    cc = c // (block * block)
    x = x.reshape(n, h, w, block, block, cc)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * block, w * block, cc)


def space_to_depth(x, block=2):
    n, h, w, c = x.shape
    x = x.reshape(n, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // block, w // block, block * block * c)


def depthwise_conv2d(x, k2d, pad_mode='reflect'):
    """Depthwise spatial filter on an NHWC batch, computed in a DENSE flat form.

    ``k2d``: (kh, kw) shared across channels, or (kh, kw, C) per-channel.
    Values may be traced (randomized-strength kernels recompile nothing).

    Why not small_conv2d with a diagonal (kh,kw,C,C) kernel: (…, C≤4)-minor
    NHWC tensors carry TPU tile layouts whose 128-lane minor dim is >90%
    padding, so every slice/FMA pays ~10× its logical bytes, and the dense
    C_in×C_out accumulation spends VPU flops on the C²−C zero cross terms
    (round-5 device trace, docs/benchmarks.md). Collapsing the contiguous
    (W, C) pair into one minor axis of W·C ≥ 384 makes every shifted FMA run
    on fully dense tiles; measured 2-4× on the blur/sharpen shapes
    (bench_layout.py) and part of the 39 → 54 steps/s round-5 flagship gain.
    """
    k2d = jnp.asarray(k2d, dtype=jnp.float32)
    per_channel = k2d.ndim == 3
    kh, kw = k2d.shape[:2]
    if kh != kw:
        raise NotImplementedError('depthwise_conv2d expects a square kernel')
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    n, h, w, c = x.shape
    in_dtype = x.dtype
    # Pad in the FLAT (N, H, W·C) layout, not NHWC: jnp.pad of a C≤4-minor
    # tensor writes >90%-padding tiles (round-5 device trace: the single pad
    # was ~1 ms/step at 6% roofline efficiency in the flagship step). Row
    # padding maps directly onto axis 1; column padding is group-level
    # (reflection unit = one c-group), built from narrow edge strips.
    flat = x.astype(jnp.float32).reshape(n, h, w * c)
    flat = _pad_flat_groups(flat, c, ph, pw, pad_mode)
    acc = jnp.zeros((n, h, w * c), dtype=jnp.float32)
    for dy in range(kh):
        for dx in range(kw):
            tap = jax.lax.slice(flat, (0, dy, dx * c),
                                (n, dy + h, dx * c + w * c))
            weight = (jnp.tile(k2d[dy, dx], w) if per_channel
                      else k2d[dy, dx])
            acc = acc + tap * weight
    return acc.reshape(n, h, w, c).astype(in_dtype)


def _pad_flat_groups(flat, c, ph, pw, mode):
    """Spatial padding of an (N, H, W·C) flattened NHWC tensor, staying dense.

    Rows (axis 1) pad natively; columns pad at c-group granularity: the pw edge
    groups are sliced, group-reversed through a cheap (…, pw, c) view, and
    concatenated along the minor axis. Supports 'reflect' (no edge repeat),
    'symmetric' (edge repeat) and 'constant' — the modes the manipulation
    kernels use."""
    if ph:
        if mode == 'constant':
            flat = jnp.pad(flat, ((0, 0), (ph, ph), (0, 0)))
        else:
            flat = jnp.pad(flat, ((0, 0), (ph, ph), (0, 0)), mode=mode)
    if not pw:
        return flat
    n, hp, wc = flat.shape
    w = wc // c
    if mode == 'constant':
        return jnp.pad(flat, ((0, 0), (0, 0), (pw * c, pw * c)))
    lo, hi = (1, w - 1 - pw) if mode == 'reflect' else (0, w - pw)

    def grouprev(strip):
        s = strip.reshape(n, hp, pw, c)
        return jnp.flip(s, axis=2).reshape(n, hp, pw * c)

    left = grouprev(jax.lax.slice(flat, (0, 0, lo * c), (n, hp, (lo + pw) * c)))
    right = grouprev(jax.lax.slice(flat, (0, 0, hi * c), (n, hp, (hi + pw) * c)))
    return jnp.concatenate([left, flat, right], axis=2)


def pad2d(x, pad, mode='reflect'):
    """Spatial padding of an NHWC tensor. mode: 'reflect' | 'symmetric' | 'constant'."""
    if pad == 0:
        return x
    cfg = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    if mode == 'constant':
        return jnp.pad(x, cfg)
    return jnp.pad(x, cfg, mode=mode)


def avg_pool(x, factor):
    """Average pooling with window=stride=factor (NHWC)."""
    out = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                (1, factor, factor, 1), (1, factor, factor, 1), 'SAME')
    return out / (factor * factor)


@functools.lru_cache()
def _pool_matrix(n, f):
    m = np.zeros((n // f, n), np.float32)
    for i in range(n // f):
        m[i, i * f:(i + 1) * f] = 1.0 / f
    return m


@functools.lru_cache()
def _pool_matrix_grouped(n, f, c):
    return np.kron(_pool_matrix(n, f).T, np.eye(c, dtype=np.float32)).astype(np.float32)


def avg_pool_flat(x, factor):
    """:func:`avg_pool` as two dense matmuls on the flattened (N, H, W·C)
    layout — for small-C NHWC batches, where reduce_window's C-minor tiles are
    >90% lane padding (round-5 trace). Same mean (separable 1/f · 1/f weights,
    f32 accumulation); falls back to :func:`avg_pool` on non-divisible shapes."""
    n, h, w, c = x.shape
    if h % factor or w % factor:
        return avg_pool(x, factor)
    dt = x.dtype
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else jax.lax.Precision.DEFAULT
    flat = x.reshape(n, h, w * c)
    flat = jnp.matmul(jnp.asarray(_pool_matrix(h, factor), dt), flat,
                      precision=prec, preferred_element_type=jnp.float32).astype(dt)
    flat = jnp.matmul(flat, jnp.asarray(_pool_matrix_grouped(w, factor, c), dt),
                      precision=prec, preferred_element_type=jnp.float32).astype(dt)
    return flat.reshape(n, h // factor, w // factor, c)


def max_pool(x, window=2, stride=None, padding='VALID'):
    stride = stride or window
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, window, window, 1), (1, stride, stride, 1), padding)


def resize_bilinear(x, height, width):
    """Bilinear resize with half-pixel centers (TF2 tf.image.resize parity)."""
    return jax.image.resize(x, (x.shape[0], height, width, x.shape[3]), method='bilinear')


def global_average_pool(x):
    return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------------
# Straight-through estimators
# ---------------------------------------------------------------------------------

def st_clip(x, lo=0.0, hi=1.0):
    """Clip in the forward pass, identity gradient (ref models/pipelines.py:72)."""
    return jax.lax.stop_gradient(jnp.clip(x, lo, hi) - x) + x


def sin_round(x):
    """Differentiable sinusoidal rounding approximation x - sin(2πx)/2π."""
    return x - jnp.sin(2 * jnp.pi * x) / (2 * jnp.pi)


def soft_round(x):
    """Hard round forward, sinusoidal-approximation gradient backward."""
    x_ = sin_round(x)
    return jax.lax.stop_gradient(jnp.round(x) - x_) + x_


def soft_quantization(x, alpha=255.0):
    """Simulate uint8 quantization of a [0,1] image, differentiably."""
    return soft_round(alpha * x) / alpha


def quantize_and_clip(x):
    return jnp.clip(soft_quantization(x), 0, 1)


# ---------------------------------------------------------------------------------
# Losses (255-scaled, matching the reference's conventions in helpers/tf_helpers.py)
# ---------------------------------------------------------------------------------

def mse(a, b):
    return jnp.mean((255.0 * a - 255.0 * b) ** 2)


def mae(a, b):
    return jnp.mean(jnp.abs(255.0 * a - 255.0 * b))


def ssim_loss(a, b):
    return jnp.mean(255.0 * (1.0 - ssim_ops.ssim(a, b, max_val=1.0)))


def msssim_loss(a, b):
    return jnp.mean(255.0 * (1.0 - ssim_ops.ms_ssim(a, b, max_val=1.0)))


def l2_loss(x):
    """0.5 * sum(x**2) — parity with tf.nn.l2_loss used by the DCN objective."""
    return 0.5 * jnp.sum(jnp.square(x))


def corr(a, b):
    """Per-image normalized correlation over (h, w, c)."""
    am = (a - a.mean(axis=(1, 2, 3), keepdims=True)) / (1e-9 + a.std(axis=(1, 2, 3), keepdims=True))
    bm = (b - b.mean(axis=(1, 2, 3), keepdims=True)) / (1e-9 + b.std(axis=(1, 2, 3), keepdims=True))
    return jnp.mean(am * bm, axis=(1, 2, 3))


LOSSES = {'L2': mse, 'L1': mae, 'SSIM': ssim_loss, 'MS-SSIM': msssim_loss}

ACTIVATIONS = {
    'leaky_relu': functools.partial(jax.nn.leaky_relu, negative_slope=0.2),
    'relu': jax.nn.relu,
    'tanh': jnp.tanh,
    'sigmoid': jax.nn.sigmoid,
    'softsign': jax.nn.soft_sign,
}


def psnr(a, b, max_val=1.0):
    """Differentiable per-batch PSNR (dB)."""
    err = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(err, 1e-12))


def batch_psnr(a, b, max_val=1.0):
    err = jnp.mean((a - b) ** 2, axis=(1, 2, 3))
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(err, 1e-12))


def gaussian_kernel_2d(kernlen, std, dtype=jnp.float32):
    g1 = jnp.exp(-0.5 * ((jnp.arange(kernlen) - (kernlen - 1) / 2.0) / std) ** 2)
    g2 = jnp.outer(g1, g1)
    return (g2 / g2.sum()).astype(dtype)


def percentile_normalize(x, percentile=0.5):
    """Global brightness normalization between the given bottom/top percentiles."""
    x = x - jnp.percentile(x, percentile)
    # the top percentile is taken after the shift (reference order of operations)
    return x / jnp.maximum(jnp.percentile(x, 100 - percentile), 1e-9)
