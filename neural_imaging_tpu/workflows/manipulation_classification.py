"""
The joint acquisition → manipulation → distribution → forensics workflow.

Capability parity with reference workflows/manipulation_classification.py:

    raw → (nip) → rgb → (K manipulations) → [downsample] → (codec) → (fan) → probs

TPU-first design: the ENTIRE chain — ISP, (K+1)-way batch expansion, differentiable
manipulations, channel, FAN, the combined loss and the Adam update — is ONE jitted
program. Randomized JPEG quality and manipulation strengths enter as traced scalars
(qtables built in-graph), so per-step randomization never recompiles; the reference
instead re-ran an eager graph per step with host-side table swaps.

The reference constructor reads raw ``distribution``/``trainable`` arguments where
it means the sanitized members (workflows/manipulation_classification.py:136-154,
noted in SURVEY.md §2.8); this build uses the sanitized values.
"""
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from neural_imaging_tpu.compression.jpeg_helpers import jpeg_qtable
from neural_imaging_tpu.models import forensics, jpeg as jpeg_models, pipelines
from neural_imaging_tpu.models.forensics import sparse_categorical_crossentropy
from neural_imaging_tpu.ops import manipulations as manips
from neural_imaging_tpu.ops import ops
from neural_imaging_tpu.utils.utils import logger

N_STRENGTH_CANDIDATES = 8


class ManipulationClassification:

    def __init__(self, nip_model, manipulations=None, distribution=None, fan_args=None,
                 trainable=None, raw_patch_size=128, loss_metric='L2', rng_seed=0,
                 remat=False, channel_dtype='float32', nip_args=None,
                 channel_jpeg_dtype=None, manip_jpeg_dtype=None,
                 pool_impl='window'):
        """
        :param nip_model: '<nip class>[:dirname]' — NIP class + optional pretrained dir
        :param manipulations: list of '<name>[:strength]' specs
        :param distribution: {'downsampling': 'pool:2'|'bilinear'|'none',
                              'compression': 'jpeg'|'dcn'|'none',
                              'compression_params': {...}}
        :param trainable: iterable of components to fine-tune; FAN always included
        :param raw_patch_size: RAW patch size (RGB patches are twice as large)
        :param loss_metric: NIP loss metric (L2 / L1 / SSIM)
        """
        if raw_patch_size < 16 or raw_patch_size > 512:
            raise ValueError(f'The patch size ({raw_patch_size}) looks incorrect')
        # rematerialize ISP+manipulation activations in the backward pass — trades
        # FLOPs for memory so the (K+1)-expanded batch fits HBM at large patches
        self.remat = remat

        # distribution-channel compute dtype: the manipulation expansion, pooling
        # and FAN inputs are HBM-bandwidth-bound at large patches; bfloat16 halves
        # that traffic. Numerically-sensitive parts stay f32 regardless: the NIP
        # output used by the fidelity loss, and the dJPEG transform internals.
        if channel_dtype not in ('float32', 'bfloat16'):
            raise ValueError(f'Unsupported channel dtype {channel_dtype}')
        self._channel_dtype = jnp.bfloat16 if channel_dtype == 'bfloat16' else jnp.float32
        # Channel-codec compute dtype: None keeps the dJPEG internals f32 at
        # HIGHEST matmul precision (oracle parity); 'bfloat16' runs the CHANNEL
        # dJPEG in bf16 at DEFAULT precision — the channel only simulates an
        # attack, and its f32 transform is a top HBM-traffic term of the train
        # step (profiling.hlo_traffic). The NIP fidelity loss path never goes
        # through this codec either way.
        if channel_jpeg_dtype not in (None, 'float32', 'bfloat16'):
            raise ValueError(f'Unsupported channel JPEG dtype {channel_jpeg_dtype}')
        self._channel_jpeg_bf16 = channel_jpeg_dtype == 'bfloat16'
        # Manipulation-codec compute dtype: same trade as channel_jpeg_dtype but
        # for the 'jpeg' MANIPULATION branch, which runs at full pre-pooling
        # resolution (4x the channel codec's pixels). With a bf16 channel the
        # branch input is already bf16, so the default f32/HIGHEST transform is
        # the single largest segment of the benched step (round-5 device trace:
        # 2.3 ms of 18.9). A separate knob — not folded into channel_jpeg_dtype —
        # because the channel dtype is part of a trained model's contract
        # (docs/quality_runs.md: a train/deploy dtype mismatch costs ~0.11 acc)
        # and shipped bf16 artifacts predate this knob.
        if manip_jpeg_dtype not in (None, 'float32', 'bfloat16'):
            raise ValueError(f'Unsupported manipulation JPEG dtype {manip_jpeg_dtype}')
        self._manip_jpeg_bf16 = manip_jpeg_dtype == 'bfloat16'
        if pool_impl not in ('window', 'flat'):
            raise ValueError(f'Unsupported pool_impl {pool_impl}')
        self._pool_impl = pool_impl

        self._trainable = set() if trainable is None else set(trainable)
        self._trainable.add('fan')
        self.raw_patch_size = raw_patch_size
        self._rng = np.random.default_rng(rng_seed)
        self._key = jax.random.PRNGKey(rng_seed)

        self._distribution = {
            'downsampling': 'pool:2',
            'compression': 'jpeg',
            'compression_params': {'quality': 50, 'codec': 'soft'},
        }
        if distribution is not None:
            self._distribution.update(distribution)

        # -- NIP -----------------------------------------------------------------
        if ':' in nip_model:
            nip_model, nip_pretrained = nip_model.split(':')
        else:
            logger.warning('NIP model weights not specified — no weights loaded.')
            nip_pretrained = None

        if not (hasattr(pipelines, nip_model)
                and issubclass(getattr(pipelines, nip_model), pipelines.NIPModel)):
            raise ValueError(f'Invalid NIP model ({nip_model})! '
                             f'Available: {pipelines.supported_models}')
        if loss_metric not in ('L2', 'L1', 'SSIM'):
            raise ValueError(f'Invalid loss metric ({loss_metric})!')

        self.nip = getattr(pipelines, nip_model)(loss_metric=loss_metric,
                                                 patch_size=raw_patch_size,
                                                 **(nip_args or {}))
        if nip_pretrained is not None:
            self.nip.load_model(nip_pretrained)
            logger.info('Loaded NIP weights from %s', nip_pretrained)

        # -- manipulations -------------------------------------------------------
        manipulations = manipulations or ['sharpen', 'resample', 'gaussian', 'jpeg']
        self._strengths = dict(manips.DEFAULT_STRENGTHS)
        self._strengths_range = dict(manips.STRENGTH_RANGES)

        requested = []
        for m in manipulations:
            spec = m.split(':')
            if spec[0] not in self._strengths:
                raise ValueError(f'Unsupported manipulation {spec[0]}! '
                                 f'Available: {sorted(self._strengths)}')
            if spec[0] not in requested:
                requested.append(spec[0])
            if len(spec) > 1:
                self._strengths[spec[0]] = float(spec[-1])

        # keep the reference's canonical class ordering
        canonical = ['sharpen', 'resample', 'gaussian', 'jpeg', 'awgn', 'gamma', 'median']
        self._operations = OrderedDict(
            (name, manips.MANIPULATIONS[name]) for name in canonical if name in requested)
        self._forensics_classes = ['native'] + [
            f'{name}:{self._strengths[name]:g}' for name in self._operations]

        # candidate strengths for in-graph randomization (lax.switch / traced scalars)
        self._strength_candidates = {
            name: np.linspace(*self._strengths_range[name], N_STRENGTH_CANDIDATES)
            for name in self._operations}

        # -- channel -------------------------------------------------------------
        compression = self._distribution['compression']
        if compression == 'jpeg':
            self.codec = jpeg_models.JPEG(**self._distribution.get('compression_params', {}))
        elif compression == 'dcn':
            from neural_imaging_tpu.compression import codec as codec_mod
            self.codec = codec_mod.restore(
                self._distribution['compression_params']['dirname'],
                patch_size=2 * raw_patch_size // self.downsampling_factor)
        elif compression == 'none':
            self.codec = None
        else:
            raise ValueError(f'Unsupported channel compression {compression}')

        codec_is_trainable = (self.codec is not None and
                              (hasattr(self.codec, '_apply') or          # DCN
                               getattr(self.codec, 'trainable', False)))  # JPEG qtables
        if 'dcn' in self._trainable and not codec_is_trainable:
            raise ValueError('The current codec does not appear to be trainable!')

        # -- FAN -----------------------------------------------------------------
        fan_input_patch = 2 * raw_patch_size // self.downsampling_factor
        self.fan = forensics.FAN(n_classes=self.n_classes, patch_size=fan_input_patch,
                                 **(fan_args or {}))

        # -- joint optimizer over the trainable partition ------------------------
        import optax
        self._tx = optax.scale_by_adam()
        self.params = self._collect_params()
        self.opt_state = self._tx.init(self._train_partition(self.params))
        self._jitted = {}
        # Per-step NaN-gradient guard (parity with the reference's RuntimeError,
        # workflows/manipulation_classification.py:281). Checking forces a host
        # sync each step; set False to let steps pipeline and check via
        # assert_finite() at validation boundaries instead.
        self.nan_check = True
        self._finite_flags = []
        # snapshot of the freshly-initialized state for reinitialize(). Deep
        # COPIES, not refs: the jitted steps donate parameter buffers, and a
        # donated buffer is invalidated even while other Python refs hold it.
        self._initial_params = jax.tree.map(jnp.copy, self.params)
        self._rng_seed = rng_seed

    def reinitialize(self):
        """Reset to the exact post-construction state WITHOUT rebuilding the
        flow — params, optimizer state, PRNG streams and metric histories all
        reset, while every compiled program in self._jitted is kept. This is
        what makes λ/repetition sweeps cheap: one compile per graph shape for
        the whole sweep instead of one per point (λ, lr and the batch are
        traced arguments, so points share executables)."""
        # copy again so the restored working set can be donated without
        # touching the snapshot
        self.params = jax.tree.map(jnp.copy, self._initial_params)
        self.opt_state = self._tx.init(self._train_partition(self.params))
        self._rng = np.random.default_rng(self._rng_seed)
        self._key = jax.random.PRNGKey(self._rng_seed)
        self._finite_flags = []
        self._push_params_to_models()
        for model in (self.fan, self.nip) + ((self.codec,) if hasattr(
                self.codec, 'reset_performance_stats') else ()):
            if model is not None:
                model.init_optimizer()
                model.reset_performance_stats()

    # ------------------------------------------------------------------ properties

    @property
    def n_classes(self):
        return len(self._operations) + 1

    @property
    def downsampling_factor(self):
        ds = self._distribution['downsampling']
        if ds == 'none':
            return 1
        if ':' in ds:
            return int(ds.split(':')[-1])
        return 2

    def _collect_params(self):
        params = {'fan': self.fan.params, 'nip': self.nip.params}
        if self._distribution['compression'] == 'dcn':
            params['dcn'] = self.codec.params
        elif (self._distribution['compression'] == 'jpeg'
              and getattr(self.codec, 'trainable', False)):
            params['dcn'] = self.codec._model.params
        # Commit to device: numpy leaves (e.g. npz-restored weights) would be
        # re-transferred on every jitted call — frozen partitions are never
        # replaced by jit outputs, so they would pay that upload each step.
        return jax.tree.map(jnp.asarray, params)

    def _train_partition(self, params):
        return {k: v for k, v in params.items() if k in self._trainable}

    def _frozen_partition(self, params):
        return {k: v for k, v in params.items() if k not in self._trainable}

    # ------------------------------------------------------------------ pure graph

    def _nip_apply(self, nip_params, batch_x):
        return self.nip._apply(nip_params, batch_x)

    def _fan_apply(self, fan_params, batch_C):
        return self.fan._apply(fan_params, batch_C)

    def _manip_jpeg(self, batch, quality):
        """'jpeg' manipulation on the bf16 fast path (manip_jpeg_dtype='bfloat16'):
        bf16 input, DEFAULT matmul precision — the branch only simulates a prior
        compression on an already-bf16 tensor, so the f32/HIGHEST default is
        pure overhead there (same reasoning, measurement and quality-arm gating
        as channel_jpeg_dtype; docs/quality_runs.md)."""
        x = batch.astype(jnp.bfloat16)
        if isinstance(quality, (int, float)):
            q_luma = jnp.asarray(jpeg_qtable(quality, 0))
            q_chroma = jnp.asarray(jpeg_qtable(quality, 1))
        else:
            q = quality.astype(jnp.float32)
            q_luma = jpeg_models.jpeg_qtable_traced(q, 0)
            q_chroma = jpeg_models.jpeg_qtable_traced(q, 1)
        y, _ = jpeg_models.jpeg_forward(x, q_luma, q_chroma,
                                        precision=jax.lax.Precision.DEFAULT)
        return y

    def _manipulate(self, batch_Y, key, strength_scalars=None, strength_indices=None,
                    pool=False):
        """(K+1)-way batch expansion: [native] + each manipulation. Randomized
        strengths come in as traced scalars / switch indices.

        ``pool=True`` fuses the channel's 2x average pooling INTO each branch:
        the concat joins (K+1) quarter-size tensors instead of full-resolution
        ones, and the gaussian/resample branches use exact folded kernels
        (manips.POOLED_MANIPULATIONS) so their full-resolution outputs never
        materialize in HBM. pool(concat(...)) == concat(pool(each)) exactly."""
        dt = self._channel_dtype
        batch_Y = batch_Y.astype(dt)
        p2 = (lambda t: ops.avg_pool(t, 2)) if pool else (lambda t: t)
        y_list = [p2(batch_Y)]
        for i, name in enumerate(self._operations):
            key, sub = jax.random.split(key)
            if strength_scalars is None:
                s = self._strengths[name]
                if name == 'jpeg' and self._manip_jpeg_bf16:
                    y_list.append(p2(self._manip_jpeg(batch_Y, s)).astype(dt))
                elif pool and name in manips.POOLED_MANIPULATIONS:
                    y_list.append(manips.POOLED_MANIPULATIONS[name](
                        batch_Y, s, sub).astype(dt))
                else:
                    y_list.append(p2(manips.MANIPULATIONS[name](batch_Y, s, sub)
                                     ).astype(dt))
            else:
                if name == 'jpeg' and self._manip_jpeg_bf16:
                    y_list.append(p2(self._manip_jpeg(
                        batch_Y, strength_scalars[i])).astype(dt))
                elif name in manips.TRACED_MANIPULATIONS:
                    y_list.append(p2(manips.TRACED_MANIPULATIONS[name](
                        batch_Y, strength_scalars[i], sub)).astype(dt))
                elif name == 'resample':
                    cands = [int(c) for c in self._strength_candidates[name]]
                    y_list.append(p2(manips.resample_switch(
                        batch_Y, strength_indices[i], cands)).astype(dt))
                elif name == 'median':
                    cands = sorted({int(c) | 1 for c in self._strength_candidates[name]})
                    y_list.append(p2(manips.median_switch(
                        batch_Y, jnp.clip(strength_indices[i], 0, len(cands) - 1),
                        cands)).astype(dt))
        return jnp.concatenate(y_list, axis=0)

    def _downsample(self, batch):
        ds = self._distribution['downsampling']
        factor = self.downsampling_factor
        if ds.startswith('pool'):
            # 'window' lets XLA fuse the (K+1)-branch concat into the pooling
            # reduce-window (round-4 measurement: breaking that fusion cost
            # 26%); 'flat' pools via dense matmuls on the (N, H, W·C) layout
            # instead (same mean) — a measured-only alternative, since a dot
            # materializes its concat operand.
            if self._pool_impl == 'flat':
                return ops.avg_pool_flat(batch, factor)
            return ops.avg_pool(batch, factor)
        if ds == 'bilinear':
            return ops.resize_bilinear(batch, batch.shape[1] // factor,
                                       batch.shape[2] // factor)
        if ds == 'none':
            return batch
        raise ValueError(f'Unsupported channel down-sampling {ds}')

    def _compress(self, params, batch, q_luma=None, q_chroma=None):
        """Returns (compressed_batch, entropy)."""
        compression = self._distribution['compression']
        if compression == 'jpeg':
            # Trainable JPEG qtables ALSO live under the 'dcn' partition key:
            # 'dcn' names the generic trainable-codec slot (matching the
            # reference CLI's `--train dcn` convention), not the DCN model —
            # see _collect_params, which routes either codec's params here.
            if 'dcn' in params:  # trainable qtables
                y, _ = self.codec._model(batch.astype(jnp.float32),
                                         params=params['dcn'])
            elif self._channel_jpeg_bf16:
                y, _ = jpeg_models.jpeg_forward(
                    batch.astype(jnp.bfloat16), q_luma, q_chroma,
                    rounding=self.codec.codec
                    if self.codec.codec != 'libjpeg' else 'soft',
                    precision=jax.lax.Precision.DEFAULT)
            else:
                batch32 = batch.astype(jnp.float32)  # dJPEG f32 (parity default)
                y, _ = jpeg_models.jpeg_forward(batch32, q_luma, q_chroma,
                                                rounding=self.codec.codec
                                                if self.codec.codec != 'libjpeg' else 'soft')
            return y.astype(self._channel_dtype), jnp.float32(0.0)
        if compression == 'dcn':
            y, entropy = self.codec._apply(params['dcn'], batch.astype(jnp.float32))
            return y.astype(self._channel_dtype), entropy
        return batch, jnp.float32(0.0)

    def _forward(self, params, batch_x, key, q_luma, q_chroma,
                 strength_scalars=None, strength_indices=None):
        def acquire(nip_params, bx):
            Y = self._nip_apply(nip_params, bx)
            # NOTE: a fused per-branch expand→manipulate→pool variant exists
            # (_manipulate(pool=True), exact folded kernels) and was MEASURED
            # SLOWER on TPU than this concat-then-pool form (28.1 vs 38.0
            # steps/s at the bench config): XLA already fuses the concat into
            # the pooling reduce-window, while per-branch pooling fragments
            # that fusion. Measured, not assumed — see docs/benchmarks.md.
            m = self._manipulate(Y, key, strength_scalars, strength_indices)
            return Y, self._downsample(m)

        if self.remat:
            acquire = jax.checkpoint(acquire)
        batch_Y, batch_c = acquire(params['nip'], batch_x)
        batch_C, entropy = self._compress(params, batch_c, q_luma, q_chroma)
        probabilities = self._fan_apply(params['fan'], batch_C)
        return batch_Y, batch_c, batch_C, entropy, probabilities

    def _losses(self, params, batch_x, batch_y, key, q_luma, q_chroma,
                lambda_nip, lambda_dcn, strength_scalars=None, strength_indices=None):
        batch_Y, batch_c, batch_C, entropy, probs = self._forward(
            params, batch_x, key, q_luma, q_chroma, strength_scalars, strength_indices)

        batch_size = batch_x.shape[0]
        labels = jnp.repeat(jnp.arange(self.n_classes), batch_size)
        loss_ce = sparse_categorical_crossentropy(labels, probs)
        loss_nip = (self.nip.loss(batch_y, batch_Y)
                    if batch_y is not None else jnp.float32(0.0))
        if self.codec is not None:
            loss_dcn = self.codec.loss(batch_c.astype(jnp.float32),
                                       batch_C.astype(jnp.float32), entropy)
        else:
            loss_dcn = jnp.float32(0.0)

        loss = loss_ce
        if 'nip' in self._trainable:
            loss = loss + lambda_nip * loss_nip
        if 'dcn' in self._trainable:
            loss = loss + lambda_dcn * loss_dcn
        return loss, {'ce': loss_ce, 'nip': loss_nip, 'dcn': loss_dcn}

    # ------------------------------------------------------------------ public API

    def _channel_qtables(self, quality=None):
        """Resolve the (possibly randomized) channel JPEG quality to qtables."""
        if self._distribution['compression'] != 'jpeg' or self.codec is None:
            z = np.ones((8, 8), dtype=np.float32)
            return z, z
        q = self.codec._resolve_quality(quality) if self.codec.quality is not None else 50
        return jpeg_qtable(q, 0), jpeg_qtable(q, 1)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def run_workflow(self, batch_x, augment=False, training=False):
        """raw → ... → class probabilities.
        Returns (batch_Y, batch_c, batch_C, entropy, probabilities).

        ``augment=True`` draws randomized manipulation strengths (and a
        randomized channel quality when the codec's quality is a range/set) —
        the same distribution the augmented trainer optimizes — so validation
        can measure accuracy under variable-strength deployment rather than
        only at the fixed canonical strengths."""
        cache = 'forward_rand' if augment else 'forward'
        if cache not in self._jitted:
            self._jitted[cache] = jax.jit(self._forward)
        ql, qc = self._channel_qtables()
        args = self._sample_strengths() if augment else ()
        return self._jitted[cache](self.params, jnp.asarray(batch_x, jnp.float32),
                                   self._next_key(), jnp.asarray(ql), jnp.asarray(qc),
                                   *args)

    def run_workflow_to_decisions(self, batch_x, augment=False):
        probs = self.run_workflow(batch_x, augment=augment)[-1]
        return np.asarray(probs).argmax(axis=1)

    def run_manipulations(self, batch_y, randomize=False, override=None):
        key = self._next_key()
        batch_y = jnp.asarray(batch_y, jnp.float32)
        if randomize:
            scalars, indices = self._sample_strengths()
            return self._manipulate(batch_y, key, scalars, indices)
        if override is not None:
            y_list = [batch_y]
            for name in self._operations:
                key, sub = jax.random.split(key)
                y_list.append(manips.MANIPULATIONS[name](batch_y, override[name], sub))
            return jnp.concatenate(y_list, axis=0)
        return self._manipulate(batch_y, key)

    def run_downsampling(self, batch_y):
        return self._downsample(jnp.asarray(batch_y, jnp.float32))

    def run_compression(self, batch_y, return_entropy=False):
        ql, qc = self._channel_qtables()
        out, entropy = self._compress(self.params, jnp.asarray(batch_y, jnp.float32),
                                      jnp.asarray(ql), jnp.asarray(qc))
        return (out, entropy) if return_entropy else out

    def run_rgb_to_fan(self, batch_Y):
        batch_m = self.run_manipulations(batch_Y)
        batch_c = self.run_downsampling(batch_m)
        return np.asarray(self.run_compression(batch_c))

    def run_rgb_to_probabilities(self, batch_Y):
        batch_C = self.run_rgb_to_fan(batch_Y)
        return np.asarray(self._fan_apply(self.params['fan'], jnp.asarray(batch_C)))

    def _batch_labels(self, batch_size):
        return np.repeat(np.arange(self.n_classes, dtype=np.int32), batch_size)

    def _sample_strengths(self):
        scalars = np.zeros(len(self._operations), dtype=np.float32)
        indices = np.zeros(len(self._operations), dtype=np.int32)
        for i, name in enumerate(self._operations):
            lo, hi = self._strengths_range[name]
            scalars[i] = self._rng.uniform(lo, hi)
            indices[i] = self._rng.integers(0, N_STRENGTH_CANDIDATES)
        return jnp.asarray(scalars), jnp.asarray(indices)

    def _channel_qtables_in_graph(self, key):
        """Channel JPEG qtables resolved INSIDE the jitted step: static quality
        folds to constants, a 2-range samples a traced quality scalar, a longer
        set gathers from precomputed tables — per-step quality randomization with
        zero host work and no recompiles (vs. the reference's host-side table
        swaps, models/jpeg.py:236-243)."""
        from neural_imaging_tpu.utils.utils import is_number

        if self._distribution['compression'] != 'jpeg' or self.codec is None:
            z = jnp.ones((8, 8), jnp.float32)
            return z, z
        quality = self.codec.quality if self.codec.quality is not None else 50
        if is_number(quality):
            return (jnp.asarray(jpeg_qtable(quality, 0)),
                    jnp.asarray(jpeg_qtable(quality, 1)))
        if len(quality) == 2:
            q = jax.random.randint(key, (), int(quality[0]), int(quality[1]))
            return (jpeg_models.jpeg_qtable_traced(q.astype(jnp.float32), 0),
                    jpeg_models.jpeg_qtable_traced(q.astype(jnp.float32), 1))
        tables_l = jnp.stack([jpeg_qtable(q, 0) for q in quality])
        tables_c = jnp.stack([jpeg_qtable(q, 1) for q in quality])
        idx = jax.random.randint(key, (), 0, len(quality))
        return tables_l[idx], tables_c[idx]

    def _sample_strengths_in_graph(self, key):
        """Per-manipulation strength randomization inside the step."""
        n = len(self._operations)
        k_s, k_i = jax.random.split(key)
        lo = jnp.asarray([self._strengths_range[m][0] for m in self._operations],
                         jnp.float32)
        hi = jnp.asarray([self._strengths_range[m][1] for m in self._operations],
                         jnp.float32)
        scalars = lo + (hi - lo) * jax.random.uniform(k_s, (n,))
        indices = jax.random.randint(k_i, (n,), 0, N_STRENGTH_CANDIDATES)
        return scalars, indices

    def training_step(self, batch_x, batch_y, lambda_nip=0, lambda_dcn=0,
                      augment=False, learning_rate=1e-4):
        """One jitted step over the whole chain. Returns (loss, {'ce','nip','dcn'}).

        ALL per-step randomness (PRNG splitting, manipulation strengths, channel
        JPEG quality) is derived in-graph from a device-resident key that the step
        advances and returns — steps enqueue with no host round-trips, which
        matters both for dispatch latency and for multi-step pipelining."""
        cache_key = ('train', augment, batch_y is not None)
        if cache_key not in self._jitted:
            def step(tparams, fparams, opt_state, key, batch_x, batch_y,
                     l_nip, l_dcn, lr):
                # batches may arrive quantized (uint16 RAW / uint8 RGB — 4x
                # less host→device traffic); normalize in-graph
                batch_x = ops.normalize_batch(batch_x)
                if batch_y is not None:
                    batch_y = ops.normalize_batch(batch_y)
                key_next, k_manip, k_q, k_str = jax.random.split(key, 4)
                ql, qc = self._channel_qtables_in_graph(k_q)
                scalars, indices = (self._sample_strengths_in_graph(k_str)
                                    if augment else (None, None))

                def loss_of(tp):
                    params = {**fparams, **tp}
                    return self._losses(params, batch_x, batch_y, k_manip, ql, qc,
                                        l_nip, l_dcn, scalars, indices)
                (loss, parts), grads = jax.value_and_grad(loss_of, has_aux=True)(tparams)
                finite = jnp.all(jnp.asarray(
                    [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]))
                updates, opt_state = self._tx.update(grads, opt_state, tparams)
                updates = jax.tree.map(lambda u: -lr * u, updates)
                import optax
                tparams = optax.apply_updates(tparams, updates)
                return tparams, opt_state, key_next, loss, parts, finite
            self._jitted[cache_key] = jax.jit(step, donate_argnums=(0, 2, 3))

        tparams = self._train_partition(self.params)
        fparams = self._frozen_partition(self.params)
        by = None if batch_y is None else jnp.asarray(batch_y)

        tparams, self.opt_state, self._key, loss, parts, finite = self._jitted[cache_key](
            tparams, fparams, self.opt_state, self._key,
            jnp.asarray(batch_x), by,
            jnp.float32(lambda_nip), jnp.float32(lambda_dcn), jnp.float32(learning_rate))

        if self.nan_check:
            if not bool(finite):
                raise RuntimeError('∇ NaNs encountered in the joint training step')
        else:
            self._finite_flags.append(finite)

        self.params = {**fparams, **tparams}
        self._push_params_to_models()
        return loss, parts

    def training_scan(self, sampler, n_steps, lambda_nip=0, lambda_dcn=0,
                      augment=False, learning_rate=1e-4):
        """Run ``n_steps`` training steps in ONE jitted program: a lax.scan
        whose body samples the batch IN-GRAPH (sampler.pure_sample — the
        device-resident dataset) and applies the same loss/update as
        ``training_step``. One host dispatch per call amortizes all dispatch
        and argument-processing overhead — the fully device-resident trainer.

        Returns (losses, nip_losses) as length-``n_steps`` DEVICE arrays (no
        host sync); finite-flags accumulate for ``assert_finite``."""
        import optax
        # structural cache key: sweep points / fresh samplers with the same
        # geometry reuse the compiled scan (data enters as traced arguments)
        cache_key = ('scan', n_steps, augment, sampler.signature())
        if cache_key not in self._jitted:
            sample = sampler.pure_sample_data
            loaded = sampler._loaded

            def scan_fn(tparams, fparams, opt_state, key, data_args,
                        l_nip, l_dcn, lr):
                def body(carry, _):
                    tparams, opt_state, key = carry
                    key, k_s, k_manip, k_q, k_str = jax.random.split(key, 5)
                    raw, rgb = sample(k_s, *data_args)
                    if loaded == 'xy':
                        batch_x, batch_y = raw, rgb
                    elif loaded == 'y':
                        batch_x = batch_y = rgb
                    else:
                        batch_x, batch_y = raw, None
                    batch_x = ops.normalize_batch(batch_x)
                    if batch_y is not None:
                        batch_y = ops.normalize_batch(batch_y)

                    ql, qc = self._channel_qtables_in_graph(k_q)
                    scalars, indices = (self._sample_strengths_in_graph(k_str)
                                        if augment else (None, None))

                    def loss_of(tp):
                        params = {**fparams, **tp}
                        return self._losses(params, batch_x, batch_y, k_manip,
                                            ql, qc, l_nip, l_dcn, scalars, indices)
                    (loss, parts), grads = jax.value_and_grad(
                        loss_of, has_aux=True)(tparams)
                    finite = jnp.all(jnp.asarray(
                        [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]))
                    updates, opt_state = self._tx.update(grads, opt_state, tparams)
                    updates = jax.tree.map(lambda u: -lr * u, updates)
                    tparams = optax.apply_updates(tparams, updates)
                    return (tparams, opt_state, key), (loss, parts['nip'], finite)

                (tparams, opt_state, key), outs = jax.lax.scan(
                    body, (tparams, opt_state, key), None, length=n_steps)
                return tparams, opt_state, key, outs
            self._jitted[cache_key] = jax.jit(scan_fn, donate_argnums=(0, 2, 3))

        tparams = self._train_partition(self.params)
        fparams = self._frozen_partition(self.params)
        tparams, self.opt_state, self._key, (losses, nip_losses, finite) = \
            self._jitted[cache_key](
                tparams, fparams, self.opt_state, self._key, sampler.data_args,
                jnp.float32(lambda_nip), jnp.float32(lambda_dcn),
                jnp.float32(learning_rate))
        self._finite_flags.append(finite)
        self.params = {**fparams, **tparams}
        self._push_params_to_models()
        return losses, nip_losses

    def assert_finite(self, timeout_s=None):
        """Deferred NaN-gradient check (used when nan_check=False). Flags are
        stacked on device so the check costs one transfer, not one per step.

        ``timeout_s`` bounds the device→host transfer: over a tunneled device
        whose downlink has wedged (round-5 notes), an unguarded fetch blocks
        forever — with a timeout the check degrades to a warning instead."""
        if not self._finite_flags:
            return
        stacked = jnp.stack([jnp.atleast_1d(jnp.asarray(f)).all()
                             for f in self._finite_flags])
        self._finite_flags = []
        if timeout_s is None:
            flags = np.asarray(stacked)
        else:
            from neural_imaging_tpu.utils.runtime import fetch_with_timeout
            flags = fetch_with_timeout(stacked, timeout_s)
            if flags is None:
                import warnings
                warnings.warn('assert_finite: device→host transfer timed out; '
                              'NaN check skipped (downlink stalled)')
                return
        if not flags.all():
            raise RuntimeError('∇ NaNs encountered in a joint training step')

    def _push_params_to_models(self):
        """Keep the component shells in sync so their save/validate APIs see the
        jointly-trained parameters."""
        self.fan.params = self.params['fan']
        self.nip.params = self.params['nip']
        if self._distribution['compression'] == 'dcn' and 'dcn' in self.params:
            self.codec.params = self.params['dcn']
        elif (self._distribution['compression'] == 'jpeg' and 'dcn' in self.params):
            self.codec._model.params = self.params['dcn']
            self.codec.params = self.params['dcn']  # keep save_model in sync too

    # ------------------------------------------------------------------ summaries

    def is_trainable(self, model):
        return model in self._trainable

    @property
    def trainable_models(self):
        return tuple(self._trainable)

    def summary_compact(self):
        return '{cls}[{tr}]: {nip} -> [{mn}] {pool}{codec}-> FAN'.format(
            cls=type(self).__name__, nip=self.nip.class_name,
            mn=''.join(x[0] for x in self._forensics_classes),
            tr=''.join(x[0] for x in self.trainable_models),
            pool='' if self._distribution['downsampling'] == 'none'
                 else '-> {} '.format(self._distribution['downsampling']),
            codec='' if self.codec is None else '-> {} '.format(self.codec.summary_compact()))

    def summary(self):
        return ('{cls}[opt={tr}]: {inp} -> {nip} -> {n} manipulations [{mn}] '
                '{pool}{codec}-> FAN -> (prob. {k} classes)').format(
            cls=type(self).__name__,
            inp='(rgb)' if self.nip.in_channels == 3 else '(raw)',
            nip=self.nip.class_name, n=self.n_classes - 1,
            mn=''.join(x[0] for x in self._forensics_classes),
            tr=''.join(x[0] for x in self.trainable_models),
            pool='' if self._distribution['downsampling'] == 'none'
                 else '-> {} '.format(self._distribution['downsampling']),
            codec='' if self.codec is None else '-> {} '.format(self.codec.summary_compact()),
            k=self.n_classes)

    def details(self):
        out = [self.summary()]
        out.append('Input         : raw patch {} {}'.format(
            self.raw_patch_size, '(rgb)' if self.nip.in_channels == 3 else '(raw)'))
        out.append('Camera ISP    : {}'.format(self.nip.summary()))
        out.append('Manipulations : {} -> {}'.format(self.n_classes, self._forensics_classes))
        out.append('Downsampling  : {}'.format(self._distribution['downsampling']))
        out.append('Codec         : {}'.format('' if self.codec is None else self.codec.summary()))
        out.append('Forensics     : {}'.format(self.fan.summary()))
        return '\n'.join(out)
