"""
Fused Pallas TPU kernel for soft-codebook quantization + entropy.

The reference's analogue materializes an (N, 2^bpf) float64 kernel-weight matrix
TWICE per step (once in the quantizer, once in the entropy estimator,
models/layers.py:139-170 + helpers/tf_helpers.py:290-333). This kernel streams the
latent through VMEM once, computing per-tile:

- the log-space t-Student/Gaussian weights against the codebook (two reduction
  passes over codewords: max+argmax, then sum-exp + weighted sum),
- the soft assignment Σ wᵢcᵢ and the hard argmax assignment,
- per-codeword assignment counts (accumulated across the sequential TPU grid).

The entropy of the *quantized* latent then follows exactly (not approximately) from
the counts: weights evaluated at codeword positions form a fixed L×L matrix W_cc,
so soft_histogram = (counts/N) @ W_cc — an O(L²) epilogue instead of O(N·L).

Backward passes (custom VJP):

- fixed codebook (the DCN default): a second fused streaming kernel computes
  d(soft)/dz per tile with the same two-pass reduction structure — no (N, L)
  tensor in the backward either, so training never materializes it at all;
- trainable codebook: a third streaming kernel additionally accumulates the
  codebook cotangent dcb_j = Σ_n gₙ·w_nj·(1 − dlogw_nj·(c_j − softₙ)) as an
  (1, L) output revisited across the sequential TPU grid (padding slots masked
  by a global-index iota), plus an exact O(L²) XLA epilogue for the explicit
  entropy path through W_cc(cb).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_imaging_tpu.ops import quantization as quant

LANE = 128
SUBLANES = 8
TILE = LANE * SUBLANES


def _is_tpu():
    try:
        return jax.devices()[0].platform == 'tpu'
    except (IndexError, RuntimeError):
        return False


def _kernel(z_ref, cb_ref, soft_ref, hard_ref, *, n_codes, v, gamma):
    """One (SUBLANES, LANE) tile: two codeword-reduction passes + count update."""
    z = z_ref[:]

    neg_inf = jnp.float32(-1e30)

    def logw(c):
        d = z - c
        if v <= 0:
            return -gamma * d * d  # Gaussian, XLA convention (quantization.py:40)
        d = gamma * d
        return -(v + 1.0) / 2.0 * jnp.log1p(d * d / v)

    # pass 1: max log-weight and argmax codeword
    def pass1(j, carry):
        m, best = carry
        lw = logw(cb_ref[0, j])
        take = lw > m
        return jnp.where(take, lw, m), jnp.where(take, j, best)

    m0 = jnp.full(z.shape, neg_inf, dtype=jnp.float32)
    b0 = jnp.zeros(z.shape, dtype=jnp.int32)
    m, best = jax.lax.fori_loop(0, n_codes, pass1, (m0, b0))

    # pass 2: normalizer and weighted codeword sum
    def pass2(j, carry):
        s, acc = carry
        w = jnp.exp(logw(cb_ref[0, j]) - m)
        return s + w, acc + w * cb_ref[0, j]

    s0 = jnp.zeros(z.shape, dtype=jnp.float32)
    a0 = jnp.zeros(z.shape, dtype=jnp.float32)
    s, acc = jax.lax.fori_loop(0, n_codes, pass2, (s0, a0))

    soft_ref[:] = acc / s
    hard_ref[:] = best


def _pallas_forward(z_flat, codebook, v, gamma, interpret):
    """Streaming fused forward; ``codebook`` may be a concrete array or a traced
    value (trainable codebook)."""
    n = z_flat.shape[0]
    n_codes = codebook.shape[0]
    padded = int(np.ceil(n / TILE)) * TILE
    cb = jnp.asarray(codebook, jnp.float32)
    pad_val = cb[0]  # padded slots quantize to a real codeword and are sliced off
    z_pad = jnp.concatenate(
        [z_flat, jnp.full((padded - n,), pad_val, jnp.float32)]) \
        if padded > n else z_flat
    z2 = z_pad.reshape(-1, LANE)
    rows = z2.shape[0]
    grid = rows // SUBLANES

    cb_lane = int(np.ceil(n_codes / LANE)) * LANE
    cb2 = jnp.concatenate(
        [cb, jnp.full((cb_lane - n_codes,), pad_val, jnp.float32)]).reshape(1, -1) \
        if cb_lane > n_codes else cb.reshape(1, -1)

    kernel = functools.partial(_kernel, n_codes=n_codes, v=float(v), gamma=float(gamma))
    soft, hard_idx = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((SUBLANES, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            # codebook in SMEM: the reduction loops read it one scalar at a time
            pl.BlockSpec((1, cb_lane), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((SUBLANES, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANE), jnp.int32),
        ],
        interpret=interpret,
    )(z2, cb2)

    soft = soft.reshape(-1)[:n]
    hard_idx = hard_idx.reshape(-1)[:n]
    # per-codeword assignment counts: a cheap XLA scatter-add epilogue (the O(N·L)
    # weight work stays inside the kernel)
    counts = jnp.zeros((n_codes,), jnp.float32).at[hard_idx].add(1.0)
    return soft, hard_idx, counts


def _bwd_kernel(z_ref, g_ref, cb_ref, pc_ref, dz_ref, *, n_codes, v, gamma,
                inv_n):
    """Streaming dz = (g + entropy_term) · d(soft)/dz for one tile.

    With normalized weights w_k = w̃_k/s (softmax over log-weights):
        d soft/dz = Σ_k c_k w_k (dlogw_k − Σ_j w_j dlogw_j)
                  = (B − C·(A/s)) / s
    where s = Σ w̃, A = Σ w̃·dlogw, B = Σ c·w̃·dlogw, C = Σ c·w̃ — four running
    sums over codewords, so the (N, L) weight matrix never exists. The entropy
    cotangent per element, per_codeword[argmax]/N, is accumulated in the same
    loops via where(best == j, pc[j], 0) — no host-visible gather, and the
    forward's hard assignment never round-trips through HBM.
    """
    z = z_ref[:]
    neg_inf = jnp.float32(-1e30)

    def logw_dlogw(c):
        d = z - c
        if v <= 0:
            return -gamma * d * d, -2.0 * gamma * d
        gd = gamma * d
        t = gd * gd
        return (-(v + 1.0) / 2.0 * jnp.log1p(t / v),
                -(v + 1.0) * gamma * gd / (v + t))

    # pass 1: stable-softmax max and the hard (argmax) assignment
    def pass1(j, carry):
        m, best = carry
        lw, _ = logw_dlogw(cb_ref[0, j])
        take = lw > m
        return jnp.where(take, lw, m), jnp.where(take, j, best)

    m0 = jnp.full(z.shape, neg_inf, dtype=jnp.float32)
    b0 = jnp.zeros(z.shape, dtype=jnp.int32)
    m, best = jax.lax.fori_loop(0, n_codes, pass1, (m0, b0))

    def pass2(j, carry):
        s, a, b, csum, ent = carry
        c = cb_ref[0, j]
        lw, dlw = logw_dlogw(c)
        w = jnp.exp(lw - m)
        ent = ent + jnp.where(best == j, pc_ref[0, j], 0.0)
        return s + w, a + w * dlw, b + c * (w * dlw), csum + c * w, ent

    zero = jnp.zeros(z.shape, dtype=jnp.float32)
    s, a, b, csum, ent = jax.lax.fori_loop(
        0, n_codes, pass2, (zero, zero, zero, zero, zero))

    dz_ref[:] = (g_ref[:] + ent * inv_n) * ((b - csum * (a / s)) / s)


def _pallas_backward(z_flat, g_flat, per_codeword, codebook, v, gamma, interpret):
    """dz = (g + per_codeword[argmax]/N) · d(soft)/dz, streaming (fixed
    concrete codebook). ``per_codeword`` is the L-vector of entropy cotangents
    at codeword positions (dw_cc @ g_hist_total)."""
    n = z_flat.shape[0]
    cb = np.asarray(codebook, np.float32).reshape(-1)
    n_codes = cb.shape[0]
    padded = int(np.ceil(n / TILE)) * TILE
    if padded > n:
        z_flat = jnp.concatenate(
            [z_flat, jnp.full((padded - n,), cb[0], jnp.float32)])
        g_flat = jnp.concatenate([g_flat, jnp.zeros((padded - n,), jnp.float32)])
    z2 = z_flat.reshape(-1, LANE)
    g2 = g_flat.reshape(-1, LANE)
    rows = z2.shape[0]

    cb_lane = int(np.ceil(n_codes / LANE)) * LANE
    cb2 = np.concatenate([cb, np.full((cb_lane - n_codes,), cb[0], np.float32)]) \
        .reshape(1, -1) if cb_lane > n_codes else cb.reshape(1, -1)
    pc2 = jnp.concatenate(
        [per_codeword.astype(jnp.float32),
         jnp.zeros((cb_lane - n_codes,), jnp.float32)]).reshape(1, -1) \
        if cb_lane > n_codes else per_codeword.astype(jnp.float32).reshape(1, -1)

    kernel = functools.partial(_bwd_kernel, n_codes=n_codes, v=float(v),
                               gamma=float(gamma), inv_n=1.0 / n)
    dz = pl.pallas_call(
        kernel,
        grid=(rows // SUBLANES,),
        in_specs=[
            pl.BlockSpec((SUBLANES, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb_lane), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cb_lane), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((SUBLANES, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
        interpret=interpret,
    )(z2, g2, jnp.asarray(cb2), pc2)
    return dz.reshape(-1)[:n]


def _bwd_train_kernel(z_ref, g_ref, cb_ref, pc_ref, dz_ref, dcb_ref, *,
                      n_codes, v, gamma, inv_n, n_valid):
    """Trainable-codebook tile: the fixed-path dz reduction PLUS the streaming
    codebook cotangent

        dcb_j += Σ_tile gₙ · w_nj · (1 − dlogw_nj · (c_j − softₙ))

    accumulated into a (1, cb_lane) output block revisited across the
    sequential grid. Padded slots (flat index ≥ n_valid) are masked out of the
    dcb sums via a global-index iota; their dz lanes are garbage and sliced off
    by the caller, exactly like the fixed path."""
    i = pl.program_id(0)
    z = z_ref[:]
    neg_inf = jnp.float32(-1e30)

    def logw_dlogw(c):
        d = z - c
        if v <= 0:
            return -gamma * d * d, -2.0 * gamma * d
        gd = gamma * d
        t = gd * gd
        return (-(v + 1.0) / 2.0 * jnp.log1p(t / v),
                -(v + 1.0) * gamma * gd / (v + t))

    def pass1(j, carry):
        m, best = carry
        lw, _ = logw_dlogw(cb_ref[0, j])
        take = lw > m
        return jnp.where(take, lw, m), jnp.where(take, j, best)

    m0 = jnp.full(z.shape, neg_inf, dtype=jnp.float32)
    b0 = jnp.zeros(z.shape, dtype=jnp.int32)
    m, best = jax.lax.fori_loop(0, n_codes, pass1, (m0, b0))

    def pass2(j, carry):
        s, a, b, csum, ent = carry
        c = cb_ref[0, j]
        lw, dlw = logw_dlogw(c)
        w = jnp.exp(lw - m)
        ent = ent + jnp.where(best == j, pc_ref[0, j], 0.0)
        return s + w, a + w * dlw, b + c * (w * dlw), csum + c * w, ent

    zero = jnp.zeros(z.shape, dtype=jnp.float32)
    s, a, b, csum, ent = jax.lax.fori_loop(
        0, n_codes, pass2, (zero, zero, zero, zero, zero))

    soft = csum / s
    gn = g_ref[:] + ent * inv_n
    dz_ref[:] = gn * ((b - csum * (a / s)) / s)

    # validity mask: global flat index of each tile element
    r = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    flat = (i * SUBLANES + r) * LANE + lane
    gm = jnp.where(flat < n_valid, gn, 0.0)

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, dcb_ref.shape, 1)

    def pass3(j, dcb_row):
        c = cb_ref[0, j]
        lw, dlw = logw_dlogw(c)
        w = jnp.exp(lw - m) / s
        contrib = jnp.sum(gm * w * (1.0 - dlw * (c - soft)))
        return dcb_row + jnp.where(lane_iota == j, contrib, 0.0)

    dcb_row = jax.lax.fori_loop(
        0, n_codes, pass3, jnp.zeros(dcb_ref.shape, dtype=jnp.float32))

    @pl.when(i == 0)
    def _():
        dcb_ref[:] = jnp.zeros_like(dcb_ref)

    dcb_ref[:] = dcb_ref[:] + dcb_row


def _pallas_backward_trainable(z_flat, g_flat, per_codeword, codebook, v, gamma,
                               interpret):
    """(dz, dcb_stream): the streaming halves of the trainable-codebook VJP.
    ``codebook`` is a traced (L,) value here; the explicit entropy path through
    W_cc(cb) is added by the caller's XLA epilogue."""
    n = z_flat.shape[0]
    cb = jnp.asarray(codebook, jnp.float32).reshape(-1)
    n_codes = cb.shape[0]
    padded = int(np.ceil(n / TILE)) * TILE
    if padded > n:
        z_flat = jnp.concatenate(
            [z_flat, jnp.full((padded - n,), cb[0], jnp.float32)])
        g_flat = jnp.concatenate([g_flat, jnp.zeros((padded - n,), jnp.float32)])
    z2 = z_flat.reshape(-1, LANE)
    g2 = g_flat.reshape(-1, LANE)
    rows = z2.shape[0]

    cb_lane = int(np.ceil(n_codes / LANE)) * LANE
    cb2 = jnp.concatenate([cb, jnp.full((cb_lane - n_codes,), cb[0], jnp.float32)]) \
        .reshape(1, -1) if cb_lane > n_codes else cb.reshape(1, -1)
    pc2 = jnp.concatenate(
        [per_codeword.astype(jnp.float32),
         jnp.zeros((cb_lane - n_codes,), jnp.float32)]).reshape(1, -1) \
        if cb_lane > n_codes else per_codeword.astype(jnp.float32).reshape(1, -1)

    kernel = functools.partial(_bwd_train_kernel, n_codes=n_codes, v=float(v),
                               gamma=float(gamma), inv_n=1.0 / n, n_valid=n)
    dz, dcb = pl.pallas_call(
        kernel,
        grid=(rows // SUBLANES,),
        in_specs=[
            pl.BlockSpec((SUBLANES, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb_lane), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cb_lane), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((SUBLANES, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb_lane), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((1, cb_lane), jnp.float32),
        ],
        interpret=interpret,
    )(z2, g2, cb2, pc2)
    return dz.reshape(-1)[:n], dcb.reshape(-1)[:n_codes]


def _codeword_weight_matrix(codebook, v, gamma):
    """W_cc[i, j]: normalized kernel weight of codeword i against codeword j."""
    logw = quant.codebook_log_weights(jnp.asarray(codebook), jnp.asarray(codebook),
                                      v, gamma)
    return jax.nn.softmax(logw, axis=-1)


def quantize_with_entropy_pallas(z, codebook, v=50.0, gamma=25.0, interpret=None,
                                 trainable=None):
    """
    Fused soft-codebook quantization + entropy of the quantized latent.
    Semantics identical to ops.quantization.quantize_with_entropy with
    rounding='soft-codebook'. Returns (quantized, entropy_bits, histogram).

    ``trainable=True`` treats the codebook as a differentiable input (the
    reference's train_codebook option, models/layers.py:113-116): the fused
    streaming forward is unchanged, and the backward pass is the exact VJP of the
    XLA reference composition, producing gradients for both ``z`` and
    ``codebook``. Auto-detected when the codebook is a traced value.
    """
    if interpret is None:
        interpret = not _is_tpu()  # resolve eagerly: a concrete nondiff argument
    if trainable is None:
        trainable = isinstance(codebook, jax.core.Tracer)
    if trainable:
        return _quantize_with_entropy_trainable(
            z, jnp.asarray(codebook, jnp.float32).reshape(-1), float(v), float(gamma),
            bool(interpret))
    cb_key = tuple(float(c) for c in np.asarray(codebook).reshape(-1))
    return _quantize_with_entropy_vjp(z, cb_key, float(v), float(gamma), bool(interpret))


# ----------------------------------------------------------------------------------
# Trainable-codebook variant: fused forward, exact XLA-composition backward
# ----------------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _quantize_with_entropy_trainable(z, codebook, v, gamma, interpret):
    q, h, hist, _ = _fwd_trainable_impl(z, codebook, v, gamma, interpret)
    return q, h, hist


def _fwd_trainable_impl(z, codebook, v, gamma, interpret):
    shape = z.shape
    z_flat = z.reshape(-1).astype(jnp.float32)
    soft, hard_idx, counts = _pallas_forward(z_flat, codebook, v, gamma, interpret)
    hard = codebook[hard_idx]
    q = (jax.lax.stop_gradient(hard - soft) + soft).reshape(shape)

    w_cc = _codeword_weight_matrix(codebook, v, gamma)
    histogram = (counts / z_flat.shape[0]) @ w_cc
    histogram = jnp.clip(histogram, 1e-9, None)
    histogram = histogram / jnp.sum(histogram)
    entropy = -jnp.sum(histogram * jnp.log(histogram)) / quant.LN2
    return q, entropy, histogram, (z, codebook, counts)


def _fwd_trainable(z, codebook, v, gamma, interpret):
    q, h, hist, residuals = _fwd_trainable_impl(z, codebook, v, gamma, interpret)
    return (q, h, hist), residuals


def _bwd_trainable(v, gamma, interpret, residuals, cotangents):
    """Analytic VJP of the reference composition (quantize → entropy-of-q),
    streaming: dz and the Σ_n half of dcb come from the fused kernel; the
    explicit entropy path through W_cc(cb) — an O(L²) term, numerically ~0 at
    production γ where W_cc ≈ I and its diagonal dlogw vanishes — is an exact
    XLA epilogue. Verified against jax.vjp of quantize_with_entropy
    (tests/test_pallas.py::test_trainable_codebook_parity)."""
    z, codebook, counts = residuals
    cb = jnp.asarray(codebook, jnp.float32)
    g_q, g_h, g_hist = cotangents
    z_flat = z.reshape(-1).astype(jnp.float32)
    n = z_flat.shape[0]
    n_codes = cb.shape[0]

    # recompute the O(L²) forward epilogue pieces
    logw_cc = quant.codebook_log_weights(cb, cb, v, gamma)
    w_cc = jax.nn.softmax(logw_cc, axis=-1)
    hist_raw = (counts / n) @ w_cc
    hist = jnp.clip(hist_raw, 1e-9, None)
    S = jnp.sum(hist)
    p = hist / S

    # exact entropy chain: H = -Σ p log p / ln2, p = hist/S, hist = clip(raw)
    dH_dp = -(jnp.log(p) + 1.0) / quant.LN2
    gp = g_h * dH_dp + g_hist                                   # into p
    ghist = (gp / S - jnp.sum(gp * hist) / (S * S)) \
        * (hist_raw > 1e-9)                                     # into raw hist

    d_cc = cb[:, None] - cb[None, :]
    if v <= 0:
        dlogw_cc = -2.0 * gamma * d_cc
    else:
        gd_cc = gamma * d_cc
        dlogw_cc = -(v + 1.0) * gamma * gd_cc / (v + gd_cc * gd_cc)
    mean_cc = jnp.sum(w_cc * dlogw_cc, axis=-1, keepdims=True)
    dw_cc = w_cc * (dlogw_cc - mean_cc)                         # (L_at, L_k)
    per_codeword = dw_cc @ ghist                                # (L_at,)

    # streaming halves: dz and Σ_n gₙ·∂softₙ/∂c_j
    dz, dcb_stream = _pallas_backward_trainable(
        z_flat, g_q.reshape(-1).astype(jnp.float32), per_codeword, cb,
        v, gamma, interpret)

    # explicit entropy path through the second argument of w(q, cb), at the
    # codeword positions q takes in the forward:
    #   T[a, j] = Σ_k ghist_k ∂w_k(c_a, cb)/∂c_j
    #           = w_cc[a, j]·dlogw_cc[a, j]·((w_cc @ ghist)[a] − ghist[j])
    wg = w_cc @ ghist
    T = w_cc * dlogw_cc * (wg[:, None] - ghist[None, :])
    dcb = dcb_stream + (counts / n) @ T
    return dz.reshape(z.shape), dcb


_quantize_with_entropy_trainable.defvjp(_fwd_trainable, _bwd_trainable)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _quantize_with_entropy_vjp(z, codebook, v, gamma, interpret):
    q, h, hist, _ = _fwd_impl(z, codebook, v, gamma, interpret)
    return q, h, hist


def _fwd_impl(z, codebook, v, gamma, interpret):
    shape = z.shape
    z_flat = z.reshape(-1).astype(jnp.float32)
    soft, hard_idx, counts = _pallas_forward(z_flat, np.asarray(codebook, np.float32),
                                             v, gamma, interpret)
    cb = jnp.asarray(codebook, jnp.float32)
    hard = cb[hard_idx]
    q = (jax.lax.stop_gradient(hard - soft) + soft).reshape(shape)

    w_cc = _codeword_weight_matrix(cb, v, gamma)
    histogram = (counts / z_flat.shape[0]) @ w_cc
    histogram = jnp.clip(histogram, 1e-9, None)
    histogram = histogram / jnp.sum(histogram)
    entropy = -jnp.sum(histogram * jnp.log(histogram)) / quant.LN2
    return q, entropy, histogram, (z, histogram)


def _fwd(z, codebook, v, gamma, interpret):
    q, h, hist, residuals = _fwd_impl(z, codebook, v, gamma, interpret)
    return (q, h, hist), residuals


def _bwd(codebook, v, gamma, interpret, residuals, cotangents):
    z, histogram = residuals
    cb = jnp.asarray(codebook, jnp.float32)
    g_q, g_h, g_hist = cotangents

    z_flat = z.reshape(-1).astype(jnp.float32)

    # entropy gradient path: dH/dhist, dhist/dq at codeword positions
    # H = -Σ p log2 p with p = hist (already clipped/normalized; treat the
    # normalization as identity to match the plain-path gradient structure)
    dH_dhist = -(jnp.log(histogram) + 1.0) / quant.LN2
    g_hist_total = g_h * dH_dhist + g_hist                     # (L,)

    # dhist_k/dq_n = w'_k(q_n)/N; at codewords these are rows of a fixed matrix
    logw_cc = quant.codebook_log_weights(cb, cb, v, gamma)
    w_cc = jax.nn.softmax(logw_cc, axis=-1)
    d_cc = cb[:, None] - cb[None, :]
    if v <= 0:
        dlogw_cc = -2.0 * gamma * d_cc
    else:
        gd_cc = gamma * d_cc
        dlogw_cc = -(v + 1.0) * gamma * gd_cc / (v + gd_cc * gd_cc)
    mean_cc = jnp.sum(w_cc * dlogw_cc, axis=-1, keepdims=True)
    dw_cc = w_cc * (dlogw_cc - mean_cc)                        # (L_at, L_k)

    per_codeword = dw_cc @ g_hist_total                        # (L_at,)

    # everything O(N) — the d soft/dz reduction AND the per-element entropy
    # cotangent lookup — streams through the fused kernel; like the forward,
    # the backward never materializes an (N, L) tensor
    dz = _pallas_backward(z_flat, g_q.reshape(-1).astype(jnp.float32),
                          per_codeword, np.asarray(codebook, np.float32),
                          v, gamma, interpret)
    return (dz.reshape(z.shape),)


_quantize_with_entropy_vjp.defvjp(_fwd, _bwd)
