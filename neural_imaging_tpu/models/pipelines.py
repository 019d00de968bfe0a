"""
Camera ISP models (NIPs): INet, UNet, DNet, ONet and ClassicISP.

Capability parity with reference models/pipelines.py (layer-by-layer behavior cited
per class), redesigned as pure flax modules applied under jit:

- every model consumes RGGB Bayer stacks (N, p, p, 4) in [0,1] and emits RGB
  (N, 2p, 2p, 3) clipped with a straight-through estimator
  (ref models/pipelines.py:72,223,289,344),
- fixed filters (CFA upsampling, bilinear demosaic, sRGB matrices) are compile-time
  constants fused by XLA rather than frozen keras layers,
- the training step is a single jitted value_and_grad + Adam update with a
  runtime-fed learning rate (ref models/pipelines.py:77-90).
"""
import functools
import inspect
import json
import sys

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neural_imaging_tpu.models.base import TPUModel
from neural_imaging_tpu.ops import ops
from neural_imaging_tpu.ops.kernels import (bilin_kernel, gamma_kernels, upsampling_kernel)
from neural_imaging_tpu.utils import paramspec

_HI = jax.lax.Precision.HIGHEST


def _const_init(value):
    value = np.asarray(value, dtype=np.float32)
    return lambda key, shape, dtype=jnp.float32: jnp.asarray(value, dtype=dtype)


# ====================================================================================
# Flax cores
# ====================================================================================

class INetCore(nn.Module):
    """Classic-pipeline-as-CNN (ref models/pipelines.py:233): fixed-initialized
    upsample → depth_to_space → bilinear demosaic conv → sRGB 1x1 → 2-layer tanh
    gamma net; all but the upsampling kernel are trainable.

    ``conv_precision``: how the convs are computed — 'exact' (f32 on the VPU
    via :func:`ops.small_conv2d`, default: same numerics as 'highest' at the
    speed of the bf16 fast path — the kernels here have 3-4 channel fan-in, for
    which MXU lowering is pathological, see small_conv2d) | 'highest' (f32 MXU
    emulation; keeps the 0.1 dB oracle parity) | 'high' (bf16x3) | 'default'
    (bf16 fast path)."""
    kernel: int = 5
    random_init: bool = False
    trainable_upsampling: bool = False
    cfa_pattern: str = 'gbrg'
    conv_precision: str = 'exact'

    @nn.compact
    def __call__(self, x):
        if self.conv_precision in ('exact', 'exact_chw'):
            conv = ops.small_conv2d
        else:
            prec = {'highest': jax.lax.Precision.HIGHEST,
                    'high': jax.lax.Precision.HIGH,
                    'default': jax.lax.Precision.DEFAULT}[self.conv_precision]
            conv = functools.partial(ops.conv2d, precision=prec)
        rng = np.random.RandomState(1234)
        upk = upsampling_kernel(self.cfa_pattern).reshape(1, 1, 4, 12)

        if self.random_init:
            dmf = rng.normal(0, 0.1, (self.kernel, self.kernel, 3, 3))
            g1k = rng.normal(0, 0.1, (1, 1, 3, 12))
            g1b = np.zeros(12)
            g2k = rng.normal(0, 0.1, (1, 1, 12, 3))
            g2b = np.zeros(3)
            srgbk = np.eye(3).reshape(1, 1, 3, 3)
        else:
            dmf = bilin_kernel(self.kernel)
            d1k, d1b, d2k, d2b = gamma_kernels()
            g1k, g1b = d1k.reshape(1, 1, 3, 12), d1b
            g2k, g2b = d2k.reshape(1, 1, 12, 3), d2b
            from neural_imaging_tpu.ops.kernels import EXAMPLE_SRGB
            srgbk = EXAMPLE_SRGB.T.reshape(1, 1, 3, 3)

        if self.trainable_upsampling:
            upk = self.param('upsampling', _const_init(upk), upk.shape)

        dm = self.param('demosaic', _const_init(dmf), dmf.shape)
        srgb_k = self.param('srgb', _const_init(srgbk), srgbk.shape)
        gk1 = self.param('gamma_d1_kernel', _const_init(g1k), g1k.shape)
        gb1 = self.param('gamma_d1_bias', _const_init(g1b), g1b.shape)
        gk2 = self.param('gamma_d2_kernel', _const_init(g2k), g2k.shape)
        gb2 = self.param('gamma_d2_bias', _const_init(g2b), g2b.shape)
        pad = (self.kernel - 1) // 2

        if self.conv_precision == 'exact_chw':
            # Same exact-f32 math in channels-FIRST planes: the NHWC form's
            # C≤12-minor tensors are >90% lane padding on TPU; here every
            # intermediate keeps W in the lanes (ops.conv_chw). Only the raw
            # input read and final RGB write touch NHWC layouts.
            xc = x.astype(jnp.float32).transpose(0, 3, 1, 2)   # (N, 4, h, w)
            bayer = ops.depth_to_space_chw(ops.conv_chw(xc, upk), 2)
            bayer = jnp.pad(bayer, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                            mode='reflect')
            rgb = ops.conv_chw(bayer, dm)
            srgb = ops.conv_chw(rgb, srgb_k)
            g = jnp.tanh(ops.conv_chw(srgb, gk1) + gb1[None, :, None, None])
            y = ops.conv_chw(g, gk2) + gb2[None, :, None, None]
            return ops.st_clip(y.transpose(0, 2, 3, 1))

        h12 = conv(x, upk)
        bayer = ops.depth_to_space(h12, 2)

        bayer = ops.pad2d(bayer, pad, 'reflect')
        rgb = conv(bayer, dm, padding='VALID')

        srgb = conv(rgb, srgb_k)

        g = jnp.tanh(conv(srgb, gk1) + gb1)
        y = conv(g, gk2) + gb2
        return ops.st_clip(y)


class UNetCore(nn.Module):
    """UNet developer (ref models/pipelines.py:169): n_steps enc/dec levels with
    32·2^(n-1) channels, skip concats, final 12-channel conv + depth_to_space."""
    n_steps: int = 5
    activation: str = 'leaky_relu'
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = ops.ACTIVATIONS[self.activation]
        skips = []
        h = x.astype(self.dtype)
        for n in range(1, self.n_steps + 1):
            ch = 32 * 2 ** (n - 1)
            h = act(nn.Conv(ch, (3, 3), dtype=self.dtype, name=f'enc{n}_1')(h))
            h = act(nn.Conv(ch, (3, 3), dtype=self.dtype, name=f'enc{n}_2')(h))
            if n < self.n_steps:
                skips.append(h)
                h = nn.max_pool(h, (2, 2), strides=(2, 2), padding='SAME')

        for n in range(1, self.n_steps):
            ch = 32 * 2 ** (self.n_steps - n - 1)
            h = nn.ConvTranspose(ch, (2, 2), strides=(2, 2), dtype=self.dtype,
                                 name=f'dec{n}_up')(h)
            h = jnp.concatenate([h, skips[-n]], axis=-1)
            h = act(nn.Conv(ch, (3, 3), dtype=self.dtype, name=f'dec{n}_1')(h))
            h = act(nn.Conv(ch, (3, 3), dtype=self.dtype, name=f'dec{n}_2')(h))

        h = nn.Conv(12, (3, 3), dtype=self.dtype, name='head')(h)
        y = ops.depth_to_space(h.astype(jnp.float32), 2)
        return ops.st_clip(y)


class DNetCore(nn.Module):
    """Gharbi-style joint demosaic/denoise (ref models/pipelines.py:298): deep conv
    stack on the half-res RGGB input, depth_to_space feature upscale, concat with the
    scattered Bayer mosaic, projection convs to RGB."""
    n_layers: int = 15
    kernel: int = 3
    n_features: int = 64
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        h = x.astype(self.dtype)
        for r in range(self.n_layers):
            feats = 12 if r == self.n_layers - 1 else self.n_features
            h = nn.Conv(feats, (self.kernel, self.kernel), padding='VALID',
                        dtype=self.dtype, name=f'conv{r}')(h)
            h = jax.nn.relu(h)
            h = ops.pad2d(h, pad, 'reflect')

        upk = upsampling_kernel().reshape(1, 1, 4, 12)
        bayer = ops.depth_to_space(ops.small_conv2d(x, upk), 2)

        features = ops.depth_to_space(h.astype(jnp.float32), 2)
        hf = jnp.concatenate([features, bayer], axis=-1).astype(self.dtype)

        hf = nn.Conv(self.n_features, (self.kernel, self.kernel), padding='VALID',
                     dtype=self.dtype, name='project')(hf)
        hf = jax.nn.relu(hf)
        hf = ops.pad2d(hf, pad, 'reflect')
        y = nn.Conv(3, (1, 1), use_bias=False, kernel_init=nn.initializers.ones,
                    dtype=self.dtype, name='to_rgb')(hf)
        return ops.st_clip(y.astype(jnp.float32))


class ONetCore(nn.Module):
    """NULL ISP: identity on RGB inputs (ref models/pipelines.py:353)."""

    @nn.compact
    def __call__(self, x):
        return x


class DemosaicingModule(nn.Module):
    """CNN demosaicing block of ClassicISP (ref models/layers.py:206): either a
    direct CNN → sigmoid RGB, or a learned residual around a fixed bilinear filter
    with a trainable mixing coefficient alpha."""
    c_filters: tuple = ()
    kernel: int = 5
    activation: str = 'leaky_relu'
    residual: bool = True

    @nn.compact
    def __call__(self, bayer, clip=True):
        act = ops.ACTIVATIONS[self.activation]

        if self.residual:
            bilinear_k = bilin_kernel(self.kernel)
            pad = (self.kernel - 1) // 2
            base = ops.small_conv2d(ops.pad2d(bayer, pad, 'reflect'), bilinear_k, padding='VALID')
            alpha = self.param('alpha', _const_init(np.float32(0.1)), ())
            if self.c_filters:
                f = bayer
                for i, nf in enumerate(self.c_filters):
                    f = act(nn.Conv(nf, (self.kernel, self.kernel), name=f'conv{i}')(f))
                f = jnp.tanh(nn.Conv(3, (1, 1), name='out')(f))
            else:
                f = 0.0
            y = base - alpha * f
        else:
            f = bayer
            for i, nf in enumerate(self.c_filters):
                f = act(nn.Conv(nf, (self.kernel, self.kernel), name=f'conv{i}')(f))
            y = jax.nn.sigmoid(nn.Conv(3, (1, 1), name='out')(f))

        return ops.st_clip(y) if clip else y


class ClassicISPCore(nn.Module):
    """Classic ISP with neural demosaicing (ref models/pipelines.py:415): fixed CFA
    upsample → depth_to_space → CNN demosaic → runtime sRGB matrix → optional
    brightness → gamma 1/2.2. The sRGB matrix is a traced input so cameras can be
    switched without recompilation."""
    kernel: int = 5
    c_filters: tuple = ()
    cfa_pattern: str = 'gbrg'
    residual: bool = True
    brightness: str = ''

    @nn.compact
    def __call__(self, x, srgb_mat=None):
        upk = upsampling_kernel(self.cfa_pattern).reshape(1, 1, 4, 12)
        bayer = ops.depth_to_space(ops.small_conv2d(x, upk), 2)

        rgb = DemosaicingModule(self.c_filters, self.kernel, 'leaky_relu',
                                self.residual, name='demosaicing')(bayer)
        if srgb_mat is None:
            srgb_mat = jnp.eye(3, dtype=rgb.dtype)
        rgb = jnp.einsum('nhwc,kc->nhwk', rgb, srgb_mat, precision=_HI)

        if self.brightness == 'percentile':
            rgb = ops.percentile_normalize(rgb, 0.5)
        elif self.brightness == 'shift':
            rgb = rgb * (0.25 / jnp.maximum(jnp.mean(rgb), 1e-9))

        y = rgb
        y = jax.lax.stop_gradient(jnp.clip(y, 1.0 / 255, 1.0) - y) + y
        return jnp.power(y, 1 / 2.2)


# ====================================================================================
# Model shells
# ====================================================================================

class NIPModel(TPUModel):
    """
    Abstract neural imaging pipeline. Subclasses implement ``construct_model`` to set
    ``self._module`` (a flax core) and ``self._h`` (hyper-parameter spec).
    """

    def __init__(self, loss_metric='L2', patch_size=None, in_channels=4, **kwargs):
        super().__init__()
        self.patch_size = patch_size
        self.in_channels = in_channels
        self.loss_metric = loss_metric
        if loss_metric not in ops.LOSSES:
            raise ValueError('Unsupported loss metric!')
        self.loss = ops.LOSSES[loss_metric]
        self.construct_model(**kwargs)
        self._has_attributes(['_module'])
        self._init_params()
        self.init_optimizer()

    def construct_model(self, **kwargs):
        raise NotImplementedError()

    def _init_params(self, seed=0):
        p = self.patch_size or 64
        dummy = jnp.zeros((1, p, p, self.in_channels), dtype=jnp.float32)
        from neural_imaging_tpu.utils.runtime import maybe_jit
        variables = maybe_jit(self._module.init)(jax.random.PRNGKey(seed), dummy)
        self.params = variables.get('params', {})

    # -- compute -------------------------------------------------------------------

    def _apply(self, params, batch_x):
        return self._module.apply({'params': params}, batch_x)

    @functools.cached_property
    def _jit_apply(self):
        return jax.jit(self._apply)

    @functools.cached_property
    def _jit_train_step(self):
        def step(params, opt_state, batch_x, batch_y, lr):
            # batches may arrive quantized (uint16 RAW / uint8 RGB — 4x less
            # host→device traffic); normalize in-graph
            batch_x = ops.normalize_batch(batch_x)
            batch_y = ops.normalize_batch(batch_y)

            def loss_of(p):
                return self.loss(self._apply(p, batch_x), batch_y)
            loss, grads = jax.value_and_grad(loss_of)(params)
            params, opt_state = self.optimizer_update(grads, opt_state, params, lr)
            return params, opt_state, loss
        return jax.jit(step, donate_argnums=(0, 1))

    def process(self, batch_x, training=False):
        """Develop RAW input and return the RGB image (jax array)."""
        batch_x = jnp.asarray(batch_x, dtype=jnp.float32)
        if batch_x.ndim == 3:
            batch_x = batch_x[None]
        return self._jit_apply(self.params, batch_x)

    def training_step(self, batch_x, batch_y, learning_rate=1e-4):
        self.params, self.opt_state, loss = self._jit_train_step(
            self.params, self.opt_state, jnp.asarray(batch_x), jnp.asarray(batch_y),
            jnp.float32(learning_rate))
        return loss

    def training_scan(self, sampler, n_steps, learning_rate=1e-4):
        """``n_steps`` training steps in ONE jitted lax.scan with IN-GRAPH
        batch sampling from the device-resident dataset (sampler.pure_sample)
        — one host dispatch amortizes all per-step overhead. Returns the
        per-step losses as a device array (no host sync)."""
        if not hasattr(self, '_scan_jits'):
            self._scan_jits = {}
            self._scan_key = jax.random.PRNGKey(17)
        cache_key = (n_steps, sampler.signature())
        if cache_key not in self._scan_jits:
            sample = sampler.pure_sample_data
            from neural_imaging_tpu.ops import ops as _ops

            def scan_fn(params, opt_state, key, data_args, lr):
                def body(carry, _):
                    params, opt_state, key = carry
                    key, k_s = jax.random.split(key)
                    raw, rgb = sample(k_s, *data_args)
                    bx = _ops.normalize_batch(raw)
                    by = _ops.normalize_batch(rgb)

                    def loss_of(p):
                        return self.loss(self._apply(p, bx), by)
                    loss, grads = jax.value_and_grad(loss_of)(params)
                    params, opt_state = self.optimizer_update(
                        grads, opt_state, params, lr)
                    return (params, opt_state, key), loss

                (params, opt_state, key), losses = jax.lax.scan(
                    body, (params, opt_state, key), None, length=n_steps)
                return params, opt_state, key, losses
            self._scan_jits[cache_key] = jax.jit(scan_fn, donate_argnums=(0, 1, 2))

        self.params, self.opt_state, self._scan_key, losses = \
            self._scan_jits[cache_key](self.params, self.opt_state, self._scan_key,
                                       sampler.data_args,
                                       jnp.float32(learning_rate))
        return losses

    # -- bookkeeping -----------------------------------------------------------------

    def reset_performance_stats(self):
        self.performance = {
            'loss': {'training': [], 'validation': []},
            'psnr': {'validation': []},
            'ssim': {'validation': []},
        }

    def get_hyperparameters(self):
        p = {'in_channels': self.in_channels}
        if hasattr(self, '_h'):
            p.update(self._h.to_json())
        return p

    @property
    def patch_size_raw(self):
        return (self.patch_size, self.patch_size, self.in_channels)

    @property
    def patch_size_rgb(self):
        if self.patch_size is None:
            return None
        return (2 * self.patch_size, 2 * self.patch_size, 3)

    def summary(self):
        from neural_imaging_tpu.utils.utils import format_patch_shape
        return '{} : {} -> {}'.format(super().summary(),
                                      format_patch_shape(self.patch_size_raw),
                                      format_patch_shape(self.patch_size_rgb))

    def load_model(self, dirname, quiet=False):
        import os
        if '/' not in dirname:
            dirname = os.path.join('data/models/nip', dirname)
        super().load_model(dirname, quiet=quiet)

    def save_model(self, dirname, epoch=0, save_args=False, quiet=False):
        import os
        if '/' not in dirname:
            dirname = os.path.join('data/models/nip', dirname)
        super().save_model(dirname, epoch=epoch, save_args=save_args, quiet=quiet)

    def process_fingerprint(self, k0, demosaicing=True, cfa_pattern=None):
        """Map a RAW-level PRNU fingerprint to RGB space (ref models/pipelines.py:143)."""
        from neural_imaging_tpu.data import bayer as bayer_mod
        cfa = cfa_pattern or getattr(self._h, 'cfa_pattern', None)
        if cfa is None:
            raise ValueError('This ISP is not aware of the CFA! Pass cfa_pattern explicitly.')
        k0m = bayer_mod.merge_bayer(k0, cfa)
        if demosaicing:
            if not hasattr(self, 'demosaic_only'):
                raise ValueError(f'{self.class_name} does not expose a demosaicing stage')
            return np.asarray(self.demosaic_only(k0m[None]))
        return k0m.sum(-1)


class INet(NIPModel):
    """Neural replication of the classic pipeline steps."""

    def construct_model(self, random_init=False, kernel=5, trainable_upsampling=False,
                        cfa_pattern='gbrg', conv_precision='exact'):
        self._h = paramspec.ParamSpec({
            'random_init': (False, bool, None),
            'kernel': (5, int, (3, 11)),
            'trainable_upsampling': (False, bool, None),
            'cfa_pattern': ('gbrg', str, {'gbrg', 'rggb', 'bggr'}),
            'conv_precision': ('exact', str, {'exact', 'exact_chw', 'highest', 'high', 'default'}),
        })
        self._h.update(random_init=random_init, kernel=kernel,
                       trainable_upsampling=trainable_upsampling, cfa_pattern=cfa_pattern,
                       conv_precision=conv_precision)
        self._module = INetCore(kernel=self._h.kernel, random_init=self._h.random_init,
                                trainable_upsampling=self._h.trainable_upsampling,
                                cfa_pattern=self._h.cfa_pattern,
                                conv_precision=self._h.conv_precision)

    @property
    def model_code(self):
        return '{c}_{cfa}{tu}{r}_{k}x{k}'.format(
            c=self.class_name, cfa=self._h.cfa_pattern, k=self._h.kernel,
            tu='T' if self._h.trainable_upsampling else '',
            r='R' if self._h.random_init else '')


class UNet(NIPModel):
    """UNet-based developer."""

    def construct_model(self, n_steps=5, activation='leaky_relu', dtype='float32'):
        self._h = paramspec.ParamSpec({
            'n_steps': (5, int, (2, 6)),
            'activation': ('leaky_relu', str, set(ops.ACTIVATIONS.keys())),
        })
        self._h.update(n_steps=n_steps, activation=activation)
        self._module = UNetCore(n_steps=self._h.n_steps, activation=self._h.activation,
                                dtype={'float32': jnp.float32,
                                       'bfloat16': jnp.bfloat16}[dtype])

    @property
    def model_code(self):
        return f'{self.class_name}_{self._h.n_steps}'


class DNet(NIPModel):
    """Joint demosaicing & denoising developer."""

    def construct_model(self, n_layers=15, kernel=3, n_features=64, dtype='float32'):
        self._h = paramspec.ParamSpec({
            'n_layers': (15, int, (1, 32)),
            'kernel': (3, int, (3, 11)),
            'n_features': (64, int, (4, 128)),
        })
        self._h.update(n_layers=n_layers, kernel=kernel, n_features=n_features)
        self._module = DNetCore(n_layers=self._h.n_layers, kernel=self._h.kernel,
                                n_features=self._h.n_features,
                                dtype={'float32': jnp.float32,
                                       'bfloat16': jnp.bfloat16}[dtype])

    @property
    def model_code(self):
        return '{c}_{k}x{k}_{l}x{f}f'.format(c=self.class_name, k=self._h.kernel,
                                             f=self._h.n_features, l=self._h.n_layers)


class ONet(NIPModel):
    """NULL ISP passing RGB straight through (for RGB-only workflows)."""

    def __init__(self, loss_metric='L2', patch_size=None, **kwargs):
        patch_size = 2 * patch_size if patch_size is not None else None
        super().__init__(loss_metric=loss_metric, patch_size=patch_size, in_channels=3)

    def construct_model(self):
        self._module = ONetCore()

    @property
    def patch_size_rgb(self):
        if self.patch_size is None:
            return None
        return (self.patch_size, self.patch_size, 3)

    @property
    def model_code(self):
        return self.class_name


class ClassicISP(NIPModel):
    """Classic camera ISP with neural demosaicing and runtime camera profiles."""

    def construct_model(self, srgb_mat=None, kernel=5, c_filters=(), cfa_pattern='gbrg',
                        residual=True, brightness=None):
        if isinstance(c_filters, str):
            # JSON stores tuples as strings, e.g. "(16,)" (same convention as the
            # reference's training logs)
            import ast
            c_filters = ast.literal_eval(c_filters)
        if isinstance(c_filters, (int, float)):
            c_filters = (int(c_filters),)
        self._h = paramspec.ParamSpec({
            'kernel': (5, int, (3, 11)),
            'c_filters': ((), tuple, paramspec.numbers_in_range(int, 1, 1024)),
            'cfa_pattern': ('gbrg', str, {'gbrg', 'rggb', 'bggr'}),
            'residual': (True, bool, None),
        })
        self._h.update(kernel=kernel, c_filters=tuple(c_filters), cfa_pattern=cfa_pattern,
                       residual=residual)
        self._brightness = brightness or ''
        self._srgb_mat = (np.eye(3, dtype=np.float32) if srgb_mat is None
                          else np.asarray(srgb_mat, dtype=np.float32))
        self._rebuild_module()

    def _rebuild_module(self):
        self._module = ClassicISPCore(kernel=self._h.kernel, c_filters=self._h.c_filters,
                                      cfa_pattern=self._h.cfa_pattern,
                                      residual=self._h.residual, brightness=self._brightness)
        # clear jit caches tied to the old module
        self.__dict__.pop('_jit_apply', None)
        self.__dict__.pop('_jit_train_step', None)

    def _apply(self, params, batch_x):
        # the core's einsum computes out_k = Σ_c M[k, c] · rgb_c — pass M directly
        srgb = jnp.asarray(self._srgb_mat, dtype=jnp.float32)
        return self._module.apply({'params': params}, batch_x, srgb_mat=srgb)

    def set_cfa_pattern(self, cfa_pattern):
        if cfa_pattern is not None:
            self._h.update(cfa_pattern=cfa_pattern.lower())
            self._rebuild_module()

    def set_srgb_conversion(self, srgb_mat):
        if srgb_mat is not None:
            self._srgb_mat = np.asarray(srgb_mat, dtype=np.float32)
            self.__dict__.pop('_jit_apply', None)
            self.__dict__.pop('_jit_train_step', None)

    def set_camera(self, camera, config_path='config/cameras.json'):
        """Set CFA + sRGB from camera presets (config/cameras.json)."""
        with open(config_path) as f:
            cameras = json.load(f)
        self.set_cfa_pattern(cameras[camera]['cfa'])
        self.set_srgb_conversion(np.array(cameras[camera]['srgb']))

    def process(self, batch_x, training=False, cfa_pattern=None, srgb_mat=None):
        self.set_cfa_pattern(cfa_pattern)
        self.set_srgb_conversion(srgb_mat)
        return super().process(batch_x, training)

    def demosaic_only(self, bayer_rgb):
        """Run only the demosaicing block on a full-res scattered mosaic input."""
        upk = upsampling_kernel(self._h.cfa_pattern).reshape(1, 1, 4, 12)
        del upk  # input here is already a full-res mosaic
        sub = {'params': self.params['demosaicing']}
        return DemosaicingModule(self._h.c_filters, self._h.kernel, 'leaky_relu',
                                 self._h.residual).apply(sub, jnp.asarray(bayer_rgb),
                                                         clip=False)

    @classmethod
    def restore(cls, dir_name='data/models/isp/ClassicISP_auto_3x3_32-32-32-32-3R/', *,
                camera=None, cfa=None, srgb=None, patch_size=128, key=None):
        isp = super().restore(dir_name, key=key, patch_size=patch_size)
        if camera is not None:
            isp.set_camera(camera)
        if cfa is not None:
            isp.set_cfa_pattern(cfa)
        if srgb is not None:
            isp.set_srgb_conversion(srgb)
        return isp

    @property
    def model_code(self):
        fs = '-'.join(str(x) for x in self._h.c_filters)
        return 'ClassicISP_{cfa}_{k}x{k}_{fs}-{of}{r}'.format(
            fs=fs, of=3, k=self._h.kernel, cfa=self._h.cfa_pattern,
            r='R' if self._h.residual else '')

    def summary(self):
        nf = len(self._h.c_filters)
        fs = self._h.c_filters[0] if len(set(self._h.c_filters)) == 1 else '*'
        k = self._h.kernel
        return (f'{self.class_name}[{self._h.cfa_pattern}] + CNN demosaicing '
                f'[{nf}+1 layers : {k}x{k}x{fs} -> 1x1x3]')

    def summary_compact(self):
        nf = len(self._h.c_filters)
        fs = self._h.c_filters[0] if len(set(self._h.c_filters)) == 1 else '*'
        return f'{self.class_name}[{self._h.cfa_pattern}, {nf}+1 conv2D {self._h.kernel}x{self._h.kernel}x{fs} > 1x1x3]'


def tensor_isp(x, srgb_mat=None, cfa_pattern='gbrg', brightness='percentile'):
    """Toy stateless ISP for debugging and testing (the TPU-native equivalent of
    the reference's unexported ``__TensorISP`` debug class, ref
    models/pipelines.py:365-412): fixed CFA upsampling → depth_to_space →
    reflect-padded bilinear demosaic → sRGB matrix → optional brightness
    normalization → straight-through clip → gamma 1/2.2. For real work use
    ``ClassicISP``, which integrates with the rest of the framework.

    ``x`` is an (N, h/2, w/2, 4) RGGB stack in [0,1]; returns (N, h, w, 3).
    Pure and jittable for 'shift'/None brightness; 'percentile' normalization
    uses quantiles of the traced tensor (also jittable — implemented with
    ``jnp.percentile`` rather than the reference's host-side ``np.percentile``).
    """
    kernel = 5
    x = jnp.asarray(x, jnp.float32)
    upk = upsampling_kernel(cfa_pattern).reshape(1, 1, 4, 12)
    dmf = bilin_kernel(kernel)
    if srgb_mat is None:
        srgb_mat = np.eye(3)
    srgb_k = np.asarray(srgb_mat, np.float32).T.reshape(1, 1, 3, 3)

    pad = (kernel - 1) // 2
    h12 = ops.small_conv2d(x, upk)
    bayer = ops.depth_to_space(h12, 2)
    rgb = ops.small_conv2d(ops.pad2d(bayer, pad, 'reflect'), dmf, padding='VALID')
    rgb = ops.small_conv2d(rgb, srgb_k)

    if brightness:
        if brightness == 'percentile':
            rgb = ops.percentile_normalize(rgb, 0.5)
        elif brightness == 'shift':
            rgb = rgb * (0.25 / jnp.mean(rgb))
        else:
            raise ValueError('Brightness normalization not recognized!')

    return jnp.power(ops.st_clip(rgb), 1 / 2.2)


supported_models = [name for name, obj in inspect.getmembers(sys.modules[__name__])
                    if isinstance(obj, type) and issubclass(obj, NIPModel)
                    and name != 'NIPModel']
