"""
Image forensics: the FAN manipulation classifier with a constrained residual
first layer (Bayar & Stamm, extended to RGB).

Capability parity with reference models/forensics.py and the ConstrainedConv2D
layer (models/layers.py:12-57): the residual filter is re-normalized on every
forward pass — off-center mass scaled to ``filter_strength`` per output channel and
the center tap pinned to its negative — so the constraint holds exactly throughout
training without projection steps.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neural_imaging_tpu.models.base import TPUModel
from neural_imaging_tpu.ops import ops
from neural_imaging_tpu.ops.kernels import center_mask_2dfilter, repeat_2dfilter
from neural_imaging_tpu.utils import paramspec


class ConstrainedConv(nn.Module):
    """Trainable constrained residual filter (5, 5, 3, 3).

    ``dtype`` selects the conv's compute path: float32 keeps the exact-f32 VPU
    formulation (ops.small_conv2d); bfloat16 runs one MXU conv in bf16 —
    measured as the single largest HBM-traffic term of the joint train step
    when left on the 25-tap VPU path (profiling.hlo_traffic: 2×~500 MB/step,
    the k² shifted slices materialize around the select-and-scatter barrier).
    ``impl='chw'`` computes the same exact-f32 shift-add in channels-first
    planes (ops.conv_chw) — dense W-minor tiles instead of the C=3-minor NHWC
    layout whose 128-lane dim is >97% padding.
    The kernel constraint itself is always renormalized in f32."""
    filter_strength: float = 100.0
    dtype: type = jnp.float32
    impl: str = 'auto'

    def normalized_kernel(self, kernel):
        mask = jnp.asarray(center_mask_2dfilter(5, 3), dtype=kernel.dtype)
        nf = kernel * (1 - mask)
        denom = jnp.sum(nf, axis=(0, 1, 2)).reshape(1, 1, 1, 3)
        nf = self.filter_strength * nf / denom
        return nf - self.filter_strength * mask

    @nn.compact
    def __call__(self, x, kernel_only=False):
        f = np.array([[0, 0, 0, 0, 0],
                      [0, -1, -2, -1, 0],
                      [0, -2, 12, -2, 0],
                      [0, -1, -2, -1, 0],
                      [0, 0, 0, 0, 0]], dtype=np.float64)
        init = repeat_2dfilter(f, 3).astype(np.float32)
        kernel = self.param('kernel',
                            lambda key, shape, dtype=jnp.float32: jnp.asarray(init), init.shape)

        nf = self.normalized_kernel(kernel)
        if kernel_only:
            return nf

        if self.impl == 'chw':
            xc = x.astype(jnp.float32).transpose(0, 3, 1, 2)
            xc = jnp.pad(xc, ((0, 0), (0, 0), (2, 2), (2, 2)), mode='symmetric')
            return ops.conv_chw(xc, nf).transpose(0, 2, 3, 1).astype(x.dtype)

        if self.dtype == jnp.bfloat16:
            xp = ops.pad2d(x.astype(jnp.bfloat16), 2, 'symmetric')
            return ops.conv2d(xp, nf.astype(jnp.bfloat16), padding='VALID',
                              precision=jax.lax.Precision.DEFAULT)
        xp = ops.pad2d(x, 2, 'symmetric')
        return ops.small_conv2d(xp, nf, padding='VALID')


def compose_conv_kernels(k1, k2):
    """(k, k, ci, m) then (l, l, m, co) → (k+l-1, k+l-1, ci, co): the single
    kernel whose VALID correlation equals VALID(k2) ∘ VALID(k1)."""
    k = k1.shape[0]
    l, _, _, co = k2.shape
    out = jnp.zeros((k + l - 1, k + l - 1, k1.shape[2], co), k1.dtype)
    for ey in range(l):
        for ex in range(l):
            out = out.at[ey:ey + k, ex:ex + k].add(
                jnp.einsum('abim,mo->abio', k1, k2[ey, ex]))
    return out


class FANCore(nn.Module):
    """Constrained conv → N [conv + maxpool] → 1x1 conv → GAP/flatten → FC stack →
    softmax over n_classes (ref models/forensics.py:62-94).

    ``stem='fused'`` composes the constrained filter with conv0 into ONE
    (k+4)×(k+4) conv (compose_conv_kernels) — the (N, H, W, 3) intermediate
    between them, whose C=3-minor TPU layout is ~98% lane padding, never
    materializes. Interior pixels are bit-equal to 'separate'
    (tests/test_pipelines.py); the 2-px border ring differs (the separate form
    zero-pads the *residual*, the fused form sees symmetric-padded pixels), so
    the stem is part of a trained model's contract and is recorded in the FAN's
    hyper-parameters. ``constrained_impl`` picks the ConstrainedConv compute
    path ('auto' | 'chw') for the separate stem."""
    n_classes: int = 7
    n_filters: int = 32
    n_fscale: float = 2.0
    n_convolutions: int = 4
    kernel: int = 5
    dropout: float = 0.0
    use_gap: bool = False
    n_dense: int = 2
    activation: str = 'leaky_relu'
    dtype: type = jnp.float32
    stem: str = 'separate'
    constrained_impl: str = 'auto'

    @nn.compact
    def __call__(self, x, train=False):
        act = ops.ACTIVATIONS[self.activation]
        constrained = ConstrainedConv(name='constrained', dtype=self.dtype,
                                      impl=self.constrained_impl)
        start = 0
        if self.stem == 'fused':
            if self.n_convolutions < 1:
                raise ValueError("stem='fused' requires n_convolutions >= 1")
            nf = constrained(x, kernel_only=True)
            conv0 = nn.Conv(int(self.n_filters), (self.kernel, self.kernel),
                            dtype=self.dtype, name='conv0')
            _ = conv0(jnp.zeros((1, self.kernel, self.kernel, 3), x.dtype))
            k0 = conv0.variables['params']['kernel']
            b0 = conv0.variables['params']['bias']
            kc = compose_conv_kernels(nf.astype(jnp.float32),
                                      k0.astype(jnp.float32))
            r = (self.kernel - 1) // 2
            xp = ops.pad2d(x.astype(self.dtype), 2, 'symmetric')
            xp = ops.pad2d(xp, r, 'constant')
            h = ops.conv2d(xp, kc.astype(self.dtype), padding='VALID',
                           precision=(jax.lax.Precision.DEFAULT
                                      if self.dtype == jnp.bfloat16
                                      else jax.lax.Precision.HIGHEST))
            h = act((h + b0).astype(self.dtype))
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            start = 1
        else:
            h = constrained(x)
            h = h.astype(self.dtype)

        n_filters = int(self.n_filters * self.n_fscale ** start)
        for i in range(start, self.n_convolutions):
            h = act(nn.Conv(int(n_filters), (self.kernel, self.kernel),
                            dtype=self.dtype, name=f'conv{i}')(h))
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            n_filters = int(n_filters * self.n_fscale)
        n_filters = int(n_filters // self.n_fscale)

        h = act(nn.Conv(int(n_filters), (1, 1), dtype=self.dtype, name='proj')(h))

        if self.use_gap:
            h = jnp.mean(h, axis=(1, 2))
        else:
            h = h.reshape(h.shape[0], -1)

        for i in range(self.n_dense):
            n_filters = int(n_filters // self.n_fscale)
            h = act(nn.Dense(int(n_filters), dtype=self.dtype, name=f'dense{i}')(h))
            if self.dropout > 0:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)

        logits = nn.Dense(self.n_classes, dtype=self.dtype, name='head')(h)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def sparse_categorical_crossentropy(labels, probabilities):
    """CE over probabilities (tf.keras.losses.SparseCategoricalCrossentropy parity)."""
    p = jnp.clip(probabilities, 1e-7, 1.0)
    picked = jnp.take_along_axis(p, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    return -jnp.mean(jnp.log(picked))


class FAN(TPUModel):
    """Forensic analysis network shell."""

    def __init__(self, n_classes, patch_size=None, n_filters=32, n_fscale=2,
                 n_convolutions=4, kernel=5, dropout=0.0, use_gap=True, n_dense=0,
                 activation='leaky_relu', dtype='float32', stem='separate',
                 constrained_impl='auto'):
        super().__init__()
        import jax.numpy as _jnp
        self._dtype = {'float32': _jnp.float32, 'bfloat16': _jnp.bfloat16}[dtype]
        self._h = paramspec.ParamSpec({
            'n_classes': (7, int, (2, 256)),
            'n_filters': (32, int, (4, 128)),
            'n_fscale': (2.0, float, (0.25, 4)),
            'n_convolutions': (4, int, (1, 32)),
            'kernel': (5, int, (3, 11)),
            'dropout': (0.0, float, (0, 1)),
            'use_gap': (False, bool, None),
            'n_dense': (2, int, (0, 16)),
            'activation': ('leaky_relu', str, set(ops.ACTIVATIONS.keys())),
            # recorded so checkpoint sidecars / training.json reconstruct the
            # trained compute dtype — a train/deploy dtype mismatch measured
            # -0.11..-0.12 accuracy (docs/quality_runs.md round-5)
            'dtype': ('float32', str, {'float32', 'bfloat16'}),
            # stem='fused' folds ConstrainedConv+conv0 into one conv — a
            # border-semantics change, so it is part of the trained contract
            # (FANCore docstring); constrained_impl picks the separate stem's
            # compute layout (pure implementation detail, bit-equal paths)
            'stem': ('separate', str, {'separate', 'fused'}),
            'constrained_impl': ('auto', str, {'auto', 'chw'}),
        })
        self._h.update(n_classes=n_classes, n_filters=n_filters, n_fscale=n_fscale,
                       n_convolutions=n_convolutions, kernel=kernel, dropout=dropout,
                       use_gap=use_gap, n_dense=n_dense, activation=activation,
                       dtype=dtype, stem=stem, constrained_impl=constrained_impl)
        self.patch_size = patch_size
        self._module = FANCore(
            n_classes=self._h.n_classes, n_filters=self._h.n_filters,
            n_fscale=self._h.n_fscale, n_convolutions=self._h.n_convolutions,
            kernel=self._h.kernel, dropout=self._h.dropout, use_gap=self._h.use_gap,
            n_dense=self._h.n_dense, activation=self._h.activation, dtype=self._dtype,
            stem=self._h.stem, constrained_impl=self._h.constrained_impl)
        self._init_params()
        self.init_optimizer()

    def _init_params(self, seed=0):
        p = self.patch_size or 128
        dummy = jnp.zeros((1, p, p, 3), dtype=jnp.float32)
        from neural_imaging_tpu.utils.runtime import maybe_jit
        self.params = maybe_jit(self._module.init)(jax.random.PRNGKey(seed), dummy)['params']

    def _apply(self, params, batch_x, train=False, dropout_key=None):
        rngs = None
        if train and self._h.dropout > 0:
            rngs = {'dropout': dropout_key if dropout_key is not None
                    else jax.random.PRNGKey(0)}
        return self._module.apply({'params': params}, batch_x, train=train, rngs=rngs)

    def loss(self, target_labels, class_probabilities):
        return sparse_categorical_crossentropy(jnp.asarray(target_labels),
                                               class_probabilities)

    def process(self, batch_x, training=False):
        """Class probabilities for an image batch (N, h, w, 3)."""
        if '_jit_apply' not in self._jitted:
            self._jitted['_jit_apply'] = jax.jit(self._apply)
        return self._jitted['_jit_apply'](self.params, jnp.asarray(batch_x, jnp.float32))

    def process_and_decide(self, batch_x, with_confidence=False):
        probs = np.asarray(self.process(batch_x))
        if with_confidence:
            return probs.argmax(axis=1), probs.max(axis=1)
        return probs.argmax(axis=1)

    def training_step(self, batch_x, target_labels, learning_rate=None):
        if '_jit_train' not in self._jitted:
            def step(params, opt_state, x, labels, lr, key):
                def loss_of(p):
                    return self.loss(labels, self._apply(p, x, train=True,
                                                         dropout_key=key))
                loss, grads = jax.value_and_grad(loss_of)(params)
                params, opt_state = self.optimizer_update(grads, opt_state, params, lr)
                return params, opt_state, loss
            self._jitted['_jit_train'] = jax.jit(step, donate_argnums=(0, 1))
            self._dropout_key = jax.random.PRNGKey(17)
        lr = jnp.float32(1e-4 if learning_rate is None else learning_rate)
        self._dropout_key, subkey = jax.random.split(self._dropout_key)
        self.params, self.opt_state, loss = self._jitted['_jit_train'](
            self.params, self.opt_state, jnp.asarray(batch_x, jnp.float32),
            jnp.asarray(target_labels), lr, subkey)
        return loss

    def reset_performance_stats(self):
        self.performance = {
            'loss': {'training': [], 'validation': []},
            'accuracy': {'validation': []},
            'confusion': [],
        }

    @property
    def model_code(self):
        return (f'FAN_{self._h.n_classes}x{self._h.n_filters}'
                f'x{self._h.n_convolutions}C_{self._h.kernel}x{self._h.kernel}')

    def summary(self):
        return ('{k}x{k} CNN: 1+{conv}+1 conv layers {gap}+ {fc} fc layers '
                '[{params:,} parameters]').format(
            k=self._h.kernel, conv=self._h.n_convolutions, fc=self._h.n_dense,
            gap='+ (GAP) ' if self._h.use_gap else '', params=self.count_parameters())
