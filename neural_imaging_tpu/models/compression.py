"""
Learned image compression models (DCN family).

Capability parity with reference models/compression.py: an abstract DCN base with
soft-codebook latent quantization, a differentiable entropy rate term and
compression statistics, plus the TwitterDCN compressive autoencoder (Theis et al.).

TPU-first design: encoder/decoder are flax modules; the quantizer + entropy
estimator are the fused log-space float32 kernels from ops.quantization (the
reference materializes a float64 (N, 2^bpf) weight matrix twice); the train step is
one jitted value_and_grad over encoder+quantizer+entropy+decoder.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neural_imaging_tpu.models.base import TPUModel
from neural_imaging_tpu.ops import ops
from neural_imaging_tpu.ops import quantization as quant
from neural_imaging_tpu.utils import paramspec


class TwitterEncoder(nn.Module):
    """Encoder: 2 strided 5x5 convs (64/128) + 3 residual blocks + strided conv to
    n_features (ref models/compression.py:217-237); latent is (h/8, w/8, F)."""
    n_features: int = 32
    activation: str = 'leaky_relu'
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = ops.ACTIVATIONS[self.activation]
        h = (2.0 * (x - 0.5)).astype(self.dtype)
        h = act(nn.Conv(64, (5, 5), strides=(2, 2), name='down1')(h))
        h = nn.Conv(128, (5, 5), strides=(2, 2), name='down2')(h)

        r = jax.nn.leaky_relu(h, 0.2)
        for i in range(3):
            res = act(nn.Conv(128, (3, 3), name=f'res{i}_1')(r))
            res = nn.Conv(128, (3, 3), name=f'res{i}_2')(res)
            r = r + res

        z = nn.Conv(self.n_features, (5, 5), strides=(2, 2), name='to_latent')(r)
        return z.astype(jnp.float32)


class TwitterDecoder(nn.Module):
    """Decoder: mirror with three depth_to_space upsamples 512→256→12
    (ref models/compression.py:247-271)."""
    activation: str = 'leaky_relu'
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, z):
        act = ops.ACTIVATIONS[self.activation]
        h = nn.Conv(512, (3, 3), name='up1')(z.astype(self.dtype))
        h = ops.depth_to_space(h, 2)

        for i in range(3):
            res = act(nn.Conv(128, (3, 3), name=f'res{i}_1')(h))
            res = nn.Conv(128, (3, 3), name=f'res{i}_2')(res)
            h = h + res

        h = act(nn.Conv(256, (3, 3), name='up2')(h))
        h = ops.depth_to_space(h, 2)
        h = nn.Conv(12, (3, 3), name='up3')(h)
        h = ops.depth_to_space(h, 2)

        y = (h.astype(jnp.float32) + 1.0) / 2.0
        return ops.st_clip(y)


class DCN(TPUModel):
    """
    Abstract learned codec: hyper-parameter schema, latent quantization with a
    (optionally trainable) codebook + scale, entropy-regularized L2 loss,
    compression statistics and compress/decompress/process APIs
    (ref models/compression.py:28-184).
    """

    def __init__(self, patch_size=128, latent_bpf=5, rounding='soft-codebook',
                 train_codebook=False, entropy_weight=250, scale_latent=True,
                 use_batchnorm=False, loss_metric='L2', v=50.0, gamma=25.0, **kwargs):
        super().__init__()
        self._h = paramspec.ParamSpec({
            'latent_bpf': (5, int, (1, 8)),
            'train_codebook': (False, bool, None),
            'entropy_weight': (250.0, float, (0, 1e6)),
            'scale_latent': (True, bool, None),
            'use_batchnorm': (False, bool, None),
            'loss_metric': ('L2', str, {'L2'}),
            'rounding': ('soft', str, {'identity', 'soft', 'soft-codebook', 'sin'}),
        })
        self._h.update(latent_bpf=latent_bpf, train_codebook=train_codebook,
                       entropy_weight=entropy_weight, scale_latent=scale_latent,
                       use_batchnorm=use_batchnorm, loss_metric=loss_metric,
                       rounding=rounding)
        self.patch_size = patch_size
        self.v, self.gamma = float(v), float(gamma)
        # Pallas quantization+entropy kernel policy (soft-codebook only), chosen
        # by measurement (docs/benchmarks.md, TPU v5e): 'auto' (default) uses
        # the fused kernels everywhere for FIXED codebooks (fwd 4.5-6.6x, fused
        # streaming bwd 1.0-1.9x, DCN train step +14-22%); for TRAINABLE
        # codebooks, on inference always (fwd 3.8-4.3x) and in training only
        # below the measured latent-size crossover (1.19-1.29x up to ~32^2x32,
        # 0.74-0.82x beyond, where XLA's MXU-matmul backward scales better than
        # the streaming kernel's VPU reductions). True/False force one path.
        self.use_pallas_quantization = kwargs.pop('use_pallas_quantization', 'auto')

        self.construct_model(**kwargs)
        self._has_attributes(['_encoder', '_decoder'])
        self._init_params()
        self.init_optimizer()

    # -- construction -----------------------------------------------------------------

    def construct_model(self, **kwargs):
        raise NotImplementedError('Not implemented!')

    def _init_params(self, seed=0):
        p = self.patch_size or 128
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        dummy = jnp.zeros((1, p, p, 3), dtype=jnp.float32)
        from neural_imaging_tpu.utils.runtime import maybe_jit
        enc_params = maybe_jit(self._encoder.init)(k1, dummy)['params']
        z = maybe_jit(self._encoder.apply)({'params': enc_params}, dummy)
        dec_params = maybe_jit(self._decoder.init)(k2, z)['params']

        self.params = {'encoder': enc_params, 'decoder': dec_params}
        if self._h.scale_latent:
            self.params['latent_scale'] = jnp.ones(())
        if self._h.train_codebook:
            self.params['codebook'] = jnp.asarray(quant.default_codebook(self._h.latent_bpf))

    # -- latent machinery --------------------------------------------------------------

    def get_codebook(self, params=None):
        params = params if params is not None else self.params
        if self._h.train_codebook:
            return np.asarray(params['codebook']).reshape(-1)
        return quant.default_codebook(self._h.latent_bpf)

    def _codebook(self, params):
        if self._h.train_codebook:
            return params['codebook'].reshape(-1)
        return jnp.asarray(quant.default_codebook(self._h.latent_bpf))

    # Measured crossover (docs/benchmarks.md, TPU v5e, interleaved-window
    # train-step benches): the trainable-codebook fused backward wins the full
    # DCN train step at every measured production size (1.33x/1.11x/1.06x at
    # batch 4/8/16, patch 128 == up to 131k latent values); beyond that the
    # isolated-op microbench trend (XLA's MXU-matmul backward scales with N,
    # the streaming kernel is flat) says XLA takes over, so 'auto' stays
    # conservative above the largest measured size.
    _PALLAS_TRAIN_CODEBOOK_MAX_N = 131072

    def _use_pallas(self, inference, n_latent=None):
        if self._h.rounding != 'soft-codebook':
            return False
        if self.use_pallas_quantization == 'auto':
            try:
                on_tpu = jax.devices()[0].platform == 'tpu'
            except (IndexError, RuntimeError):
                on_tpu = False
            if not on_tpu:
                return False
            from neural_imaging_tpu.utils.runtime import warn_if_uncalibrated_device
            warn_if_uncalibrated_device('DCN quantization')
            if inference or not self._h.train_codebook:
                return True
            # trainable codebook in training: fused backward wins only below
            # the measured latent-size crossover (n_latent is static under jit)
            return (n_latent is not None
                    and n_latent <= self._PALLAS_TRAIN_CODEBOOK_MAX_N)
        return bool(self.use_pallas_quantization)

    def _quantize_latent(self, params, z, inference=False):
        """Scale → quantize → entropy (the reference's DiscreteLatent layer)."""
        if self._h.scale_latent:
            z = z * params['latent_scale']
        if self._use_pallas(inference, n_latent=int(np.prod(z.shape))):
            from neural_imaging_tpu.ops.pallas.codebook import quantize_with_entropy_pallas
            # non-trainable codebooks go in as STATIC numpy values: the kernel
            # specializes on them, and a jnp constant would be a tracer inside
            # the enclosing jit (np.asarray on it fails at trace time)
            cb = (params['codebook'].reshape(-1) if self._h.train_codebook
                  else quant.default_codebook(self._h.latent_bpf))
            q, entropy, _ = quantize_with_entropy_pallas(
                z, cb, self.v, self.gamma, trainable=self._h.train_codebook)
            return q, entropy
        q, entropy, _ = quant.quantize_with_entropy(
            z, self._codebook(params), self._h.rounding, self.v, self.gamma)
        return q, entropy

    # -- pure compute graph ------------------------------------------------------------

    def _apply_encoder(self, params, x, inference=False):
        z = self._encoder.apply({'params': params['encoder']}, x)
        return self._quantize_latent(params, z, inference=inference)

    def _apply_decoder(self, params, z):
        return self._decoder.apply({'params': params['decoder']}, z)

    def _apply(self, params, x):
        q, entropy = self._apply_encoder(params, x)
        return self._apply_decoder(params, q), entropy

    def loss(self, batch_x, batch_y, entropy):
        """L2 (tf.nn.l2_loss convention: 0.5·Σ²) + entropy_weight · H."""
        return ops.l2_loss(jnp.asarray(batch_x) - jnp.asarray(batch_y)) \
            + self._h.entropy_weight * entropy

    # -- public API --------------------------------------------------------------------

    def compress(self, batch_x):
        """Quantized latent representation of an RGB batch (N, h/8, w/8, F)."""
        batch_x = jnp.asarray(batch_x, dtype=jnp.float32)
        if batch_x.ndim == 3:
            batch_x = batch_x[None]
        if '_jit_encode' not in self._jitted:
            self._jitted['_jit_encode'] = jax.jit(
                lambda p, x: self._apply_encoder(p, x, inference=True)[0])
        return self._jitted['_jit_encode'](self.params, batch_x)

    def decompress(self, batch_z):
        batch_z = jnp.asarray(batch_z, dtype=jnp.float32)
        if batch_z.ndim == 3:
            batch_z = batch_z[None]
        if '_jit_decode' not in self._jitted:
            self._jitted['_jit_decode'] = jax.jit(self._apply_decoder)
        return self._jitted['_jit_decode'](self.params, batch_z)

    def process(self, batch_x, return_entropy=False):
        batch_x = jnp.asarray(batch_x, dtype=jnp.float32)
        if batch_x.ndim == 3:
            batch_x = batch_x[None]
        if '_jit_apply' not in self._jitted:
            self._jitted['_jit_apply'] = jax.jit(self._apply)
        y, entropy = self._jitted['_jit_apply'](self.params, batch_x)
        return (y, entropy) if return_entropy else y

    def _train_step_math(self, params, opt_state, x, lr):
        """Shared step body: returns (params, opt_state, √(2L) loss, ssim, H).
        All outputs are device scalars — materializing them per step would
        serialize the pipeline (docs/benchmarks.md 'async epoch loop')."""
        from neural_imaging_tpu.ops import ssim as ssim_ops

        def loss_of(p):
            y, entropy = self._apply(p, x)
            return self.loss(x, y, entropy), (y, entropy)
        (loss, (y, entropy)), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
        params, opt_state = self.optimizer_update(grads, opt_state, params, lr)
        ssim = jnp.mean(ssim_ops.ssim(x, y))
        return params, opt_state, jnp.sqrt(2.0 * loss), ssim, entropy

    def training_step(self, batch_x, learning_rate=None):
        """One jitted step; returns {loss (√2L convention), ssim, entropy} as
        DEVICE scalars (callers convert at their validation boundaries)."""
        if '_jit_train' not in self._jitted:
            def step(params, opt_state, x, lr):
                return self._train_step_math(params, opt_state,
                                             ops.normalize_batch(x), lr)
            self._jitted['_jit_train'] = jax.jit(step, donate_argnums=(0, 1))

        lr = jnp.float32(1e-4 if learning_rate is None else learning_rate)
        self.params, self.opt_state, loss, ssim, entropy = self._jitted['_jit_train'](
            self.params, self.opt_state, jnp.asarray(batch_x), lr)
        return {'loss': loss, 'ssim': ssim, 'entropy': entropy}

    def training_scan(self, sampler, n_steps, learning_rate=None,
                      augmentation_probs=None):
        """``n_steps`` steps in ONE jitted lax.scan: in-graph batch sampling
        from the device-resident dataset plus in-graph augmentations (batch
        h/v flips and per-image gamma, matching the host augmentations at
        training/compression.py defaults; the resize augmentation defaults to
        probability 0 and stays host-only). Returns per-step {loss, ssim,
        entropy} device arrays."""
        probs = {'flip_h': 0.5, 'flip_v': 0.5, 'gamma': 0.5}
        probs.update(augmentation_probs or {})
        if not hasattr(self, '_scan_jits'):
            self._scan_jits = {}
            self._scan_key = jax.random.PRNGKey(29)
        cache_key = (n_steps, sampler.signature(),
                     probs['flip_h'], probs['flip_v'], probs['gamma'])
        if cache_key not in self._scan_jits:
            sample = sampler.pure_sample_data

            def augment(x, key):
                k_h, k_v, k_g, k_gv = jax.random.split(key, 4)
                x = jnp.where(jax.random.uniform(k_h) < probs['flip_h'],
                              x[:, :, ::-1, :], x)
                x = jnp.where(jax.random.uniform(k_v) < probs['flip_v'],
                              x[:, ::-1, :, :], x)
                gamma = jax.random.uniform(k_gv, (x.shape[0], 1, 1, 1),
                                           minval=0.25, maxval=3.0)
                x_g = jnp.clip(jnp.power(x, 1.0 / gamma), 0.0, 1.0)
                return jnp.where(jax.random.uniform(k_g) < probs['gamma'], x_g, x)

            def scan_fn(params, opt_state, key, data_args, lr):
                def body(carry, _):
                    params, opt_state, key = carry
                    key, k_s, k_a = jax.random.split(key, 3)
                    _, rgb = sample(k_s, *data_args)
                    x = augment(ops.normalize_batch(rgb), k_a)
                    params, opt_state, loss, ssim, entropy = \
                        self._train_step_math(params, opt_state, x, lr)
                    return (params, opt_state, key), (loss, ssim, entropy)

                (params, opt_state, key), outs = jax.lax.scan(
                    body, (params, opt_state, key), None, length=n_steps)
                return params, opt_state, key, outs
            self._scan_jits[cache_key] = jax.jit(scan_fn, donate_argnums=(0, 1, 2))

        lr = jnp.float32(1e-4 if learning_rate is None else learning_rate)
        self.params, self.opt_state, self._scan_key, (losses, ssims, entropies) = \
            self._scan_jits[cache_key](self.params, self.opt_state,
                                       self._scan_key, sampler.data_args, lr)
        return {'loss': losses, 'ssim': ssims, 'entropy': entropies}

    # -- stats / docs ------------------------------------------------------------------

    def reset_performance_stats(self):
        self.performance = self._reset_performance(['loss', 'entropy', 'ssim', 'psnr'])

    def compression_stats(self, patch_size=None, n_latent_bytes=None):
        n_latent_bytes = n_latent_bytes or self._h.latent_bpf / 8
        ps = patch_size or self.patch_size
        if ps is None:
            raise ValueError('Patch size not specified!')
        n_latent = (ps // 8) * (ps // 8) * self.n_features
        bitmap_size = ps * ps * 3
        return {
            'rate': bitmap_size / (n_latent_bytes * n_latent),
            'bpp': 8 * n_latent * n_latent_bytes / (ps * ps),
            'bpf': 8 * n_latent_bytes,
            'bytes': n_latent * n_latent_bytes,
        }

    @property
    def latent_shape(self):
        if self.patch_size is None:
            return (None, None, self.n_features)
        return (self.patch_size // 8, self.patch_size // 8, self.n_features)

    @property
    def n_latent(self):
        if self.patch_size is None:
            return None
        return int(np.prod(self.latent_shape))

    def summary(self):
        l_shape = 'x'.join(str(x) for x in self.latent_shape if x is not None)
        return (f'{self.class_name} : {l_shape}-D latent space @ {self._h.latent_bpf}-bpf '
                f'[{self.count_parameters():,} params]')

    def summary_compact(self):
        return f'{self.class_name} {self.latent_shape[-1]}-D'

    @property
    def model_code(self):
        code = f'{type(self).__name__}-{self.n_features}C'
        parts = [self._h.rounding,
                 f'Q+{self._h.latent_bpf}bpf' if self._h.train_codebook else f'Q-{self._h.latent_bpf}bpf',
                 'S+' if self._h.scale_latent else 'S-']
        if self._h.entropy_weight is not None:
            parts.append(f'H+{self._h.entropy_weight:.2f}')
        return f'{code}/{"_".join(parts)}'

    def get_hyperparameters(self):
        h = self._h.to_json()
        h['n_features'] = self.n_features
        return h


class TwitterDCN(DCN):
    """Compressive autoencoder of Theis et al. (ref models/compression.py:187)."""

    def construct_model(self, n_features=32, activation='leaky_relu'):
        self._h.add({
            'n_features': (32, int, (4, 128)),
            'activation': ('leaky_relu', str, set(ops.ACTIVATIONS.keys())),
        })
        self._h.update(n_features=n_features, activation=activation)
        self.n_features = self._h.n_features
        self._encoder = TwitterEncoder(n_features=self._h.n_features,
                                       activation=self._h.activation)
        self._decoder = TwitterDecoder(activation=self._h.activation)
