"""
Differentiable quantization and the soft-histogram entropy estimator.

Capability parity with the reference's Quantization/DiscreteLatent layers
(models/layers.py:60-203) and tf_helpers.entropy (the ICLR'20 estimator,
helpers/tf_helpers.py:290). Rounding modes: round | sin | soft | harmonic |
identity | soft-codebook.

TPU-first numerics: the reference computes the soft-codebook kernel weights in
float64 with an eps floor; float64 is emulated (slow) on TPU, so this build
evaluates the kernels in log-space float32 (a numerically-stable softmax), which is
well-conditioned for every input magnitude — including values far outside the
codebook where the reference's direct form underflows. Agreement with a float64
NumPy oracle is pinned by tests to <1e-5.
"""
import jax
import jax.numpy as jnp
import numpy as np

LN2 = float(np.log(2.0))

ROUNDING_MODES = ('round', 'sin', 'soft', 'identity', 'harmonic', 'soft-codebook')


def default_codebook(latent_bpf):
    """Integer codebook {-2^(b-1)+1, ..., 2^(b-1)} with 2^b entries."""
    qmin = -2 ** (latent_bpf - 1) + 1
    qmax = 2 ** (latent_bpf - 1)
    return np.arange(qmin, qmax + 1, dtype=np.float32)


def codebook_log_weights(x, codebook, v=50.0, gamma=25.0):
    """
    Log kernel weights of each sample against each codebook entry, shape
    (..., L). v <= 0 selects the Gaussian kernel, otherwise a t-Student kernel
    with v degrees of freedom.
    """
    d = x[..., None] - codebook
    if v <= 0:
        return -gamma * jnp.square(d)
    dd = gamma * d
    return -(v + 1.0) / 2.0 * jnp.log1p(jnp.square(dd) / v)


def _int_power(t, n):
    """t**n for a static positive integer n via repeated squaring (VPU-only)."""
    result = None
    square = t
    while n:
        if n & 1:
            result = square if result is None else result * square
        square = square * square
        n >>= 1
    return result


def codebook_weights(x, codebook, v=50.0, gamma=25.0):
    """Normalized kernel weights, shape (..., L).

    Fast path for integer t-Student ν (the default ν=50): the unnormalized weight
    (1 + (γd)²/ν)^(-(ν+1)/2) is evaluated as rsqrt(t^(ν+1)) by repeated squaring —
    no transcendentals, and no overflow risk since the maximum weight is 1
    (normalization then only divides by a sum ≥ the max). Other kernels use the
    numerically-stable log-space softmax."""
    if v > 0 and float(v).is_integer() and int(v) + 1 <= 128:
        d = gamma * (x[..., None] - codebook)
        t = 1.0 + d * d / v
        # normalize by the row minimum (exact: the ratio keeps the same exponent),
        # so the largest weight is exactly 1 and far tails shrink instead of the
        # head overflowing; clamp below the f32-overflow point of t^(ν+1) so the
        # backward pass never sees inf (tail weights saturate at ~1e-19)
        t = t / jnp.min(t, axis=-1, keepdims=True)
        t_max = 0.9 * float(3.0e38 ** (1.0 / (int(v) + 1)))
        t = jnp.minimum(t, t_max)
        w = jax.lax.rsqrt(_int_power(t, int(v) + 1))
        return w / jnp.sum(w, axis=-1, keepdims=True)
    return jax.nn.softmax(codebook_log_weights(x, codebook, v, gamma), axis=-1)


def quantize(x, rounding='soft', codebook=None, v=50.0, gamma=25.0, taylor_terms=1):
    """Apply the selected differentiable rounding to x."""
    if rounding == 'round':
        return jnp.round(x)

    if rounding == 'sin':
        return x - jnp.sin(2 * jnp.pi * x) / (2 * jnp.pi)

    if rounding == 'soft':
        x_ = x - jnp.sin(2 * jnp.pi * x) / (2 * jnp.pi)
        return jax.lax.stop_gradient(jnp.round(x) - x_) + x_

    if rounding == 'harmonic':
        xa = x - jnp.sin(2 * jnp.pi * x) / jnp.pi
        for k in range(2, taylor_terms):
            xa = xa + (-1.0) ** k * jnp.sin(2 * jnp.pi * k * x) / (k * jnp.pi)
        return xa

    if rounding == 'identity':
        return x

    if rounding == 'soft-codebook':
        if codebook is None:
            raise ValueError('soft-codebook rounding requires a codebook')
        codebook = jnp.asarray(codebook).reshape(-1)
        w = codebook_weights(x, codebook, v, gamma)
        soft = jnp.einsum('...l,l->...', w, codebook)
        hard = codebook[jnp.argmax(w, axis=-1)]
        return jax.lax.stop_gradient(hard - soft) + soft

    raise ValueError(f'Unsupported quantization: {rounding}')


def entropy(values, codebook, v=50.0, gamma=25.0):
    """
    Differentiable entropy (bits) of values quantized against a codebook: a soft
    histogram from the kernel weights, then H = -Σ p log2 p.
    Returns (entropy, histogram).
    """
    codebook = jnp.asarray(codebook).reshape(-1)
    w = codebook_weights(values.reshape(-1), codebook, v, gamma)
    histogram = jnp.mean(w, axis=0)
    histogram = jnp.clip(histogram, 1e-9, None)
    histogram = histogram / jnp.sum(histogram)
    h = -jnp.sum(histogram * jnp.log(histogram)) / LN2
    return h, histogram


def quantize_with_entropy(x, codebook, rounding='soft-codebook', v=50.0, gamma=25.0):
    """
    Quantization followed by the entropy estimate of the *quantized* latent — the
    same composition as the reference's DiscreteLatent layer (models/layers.py:195-203):
    the STE makes the forward histogram sharp (weights evaluated at hard codewords)
    while gradients flow through the soft branch into both terms.
    Returns (quantized, entropy_bits, histogram).
    """
    codebook = jnp.asarray(codebook).reshape(-1)
    q = quantize(x, rounding, codebook, v, gamma)
    h, histogram = entropy(q, codebook, v, gamma)
    return q, h, histogram
