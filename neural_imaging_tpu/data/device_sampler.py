"""
Device-resident training data with in-graph patch sampling.

The host-feed path (Dataset.next_training_batch → prefetch → device_put) pays a
host→device transfer per step; over a tunneled chip that link is the throughput
cap even with quantized batches (docs/benchmarks.md "async epoch loop"). The
reference-scale datasets are tiny by accelerator standards (60 full-res
training images ≈ 20 MB quantized; even 120 D90 captures ≈ 10 GB fit a v5e's
HBM), so the TPU-native answer is to upload the WHOLE training set once and
sample patches on device:

- full images live in HBM quantized (uint16 RAW stacks + uint8 RGB);
- one jitted function per step draws image indices + Bayer-aligned even
  coordinates from a folded PRNG key and gathers the patches
  (vmap of lax.dynamic_slice);
- the ``flat`` discard policy becomes candidate oversampling: draw
  ``oversample``×batch patches, rank qualifiers (variance ≥ 0.01, the
  reference's threshold — loading.py::sample_patch) by a uniform random
  tiebreak and non-qualifiers by variance, keep the top batch. Uniform among
  qualifying patches, best-effort otherwise — the same intent as the
  reference's soft-reject + panic counter, without data-dependent control flow.

Zero host→device traffic and zero host sampling in the hot loop; the sampler's
output dtypes (uint16/uint8) match the quantized host path, so the SAME
compiled train step consumes either source.

Data-parallel composition (``sharding``): the image tensors are REPLICATED
over the mesh (reference-scale sets are tiny; every chip holds a full copy)
and the sampled batch carries a ``with_sharding_constraint`` on its leading
axis, so everything downstream of the sample — the whole scanned train step —
runs SPMD with XLA-inserted gradient all-reduces. Each device materializes
only its batch shard of the gather; the per-step sample remains identical to
the single-chip draw (same key → same indices), so losses match across mesh
sizes up to reduction order.
"""
import jax
import jax.numpy as jnp
import numpy as np

FLAT_VARIANCE_THRESHOLD = 0.01  # ref loading.py::sample_patch 'flat' policy


class DeviceSampler:
    """Uploads a Dataset's training images once; callable(step) → batch."""

    def __init__(self, data, batch_size, rgb_patch_size, discard='flat',
                 oversample=2, seed=0, sharding=None):
        self.batch_size = batch_size
        self.rgb_patch_size = rgb_patch_size
        self.raw_patch_size = rgb_patch_size // 2
        self.discard = discard if 'y' in data._loaded_data else None
        self.oversample = max(1, int(oversample)) if self.discard else 1
        self._loaded = data._loaded_data
        self._sharding = sharding
        if sharding is not None:
            n_dev = sharding.mesh.devices.size
            if batch_size % n_dev:
                raise ValueError(f'batch size ({batch_size}) must divide across '
                                 f'the {n_dev}-device mesh')
            from jax.sharding import NamedSharding, PartitionSpec
            placement = NamedSharding(sharding.mesh, PartitionSpec())  # replicated
        else:
            placement = None

        def put(arr):
            arr = np.ascontiguousarray(arr)
            return jax.device_put(arr, placement) if placement is not None \
                else jax.device_put(arr)

        train = data.data['training']
        self._X = put(train['x']) if 'x' in self._loaded else None
        self._Y = put(train['y']) if 'y' in self._loaded else None
        ref = train['y'] if 'y' in self._loaded else train['x']
        self.n_images = ref.shape[0]
        if 'y' in self._loaded:
            self.H, self.W = train['y'].shape[1:3]
        else:
            self.H, self.W = (2 * d for d in train['x'].shape[1:3])
        if self.H < rgb_patch_size or self.W < rgb_patch_size:
            raise ValueError(f'Images ({self.H}x{self.W}) smaller than the '
                             f'requested patch ({rgb_patch_size})')
        self._key = jax.random.PRNGKey(seed)
        # pure (un-jitted) sampling fns — composable into larger jitted
        # programs (e.g. a lax.scan over training steps with in-graph
        # sampling). ``pure_sample_data(key, X, Y)`` takes the image tensors
        # as TRACED ARGUMENTS so host programs can cache compiled scans by
        # :meth:`signature` and swap datasets without retracing (and the data
        # is never baked into an executable as a constant).
        self.pure_sample_data = self._build()
        self.data_args = (self._X, self._Y)
        self.pure_sample = lambda key: self.pure_sample_data(key, *self.data_args)
        self._sample = jax.jit(self.pure_sample_data)

    def signature(self):
        """Structural identity for compiled-program caching: two samplers with
        equal signatures trace to identical programs (data enters as traced
        arguments of matching shape/dtype)."""
        mesh_token = (None if self._sharding is None
                      else ('dp', int(self._sharding.mesh.devices.size)))
        return (self.batch_size, self.rgb_patch_size, self.discard,
                self.oversample, self._loaded, self.n_images, self.H, self.W,
                mesh_token)

    def _build(self):
        B, M = self.batch_size, self.batch_size * self.oversample
        P, R = self.rgb_patch_size, self.raw_patch_size
        H, W, N = self.H, self.W, self.n_images
        discard = self.discard
        has_x, has_y = self._X is not None, self._Y is not None
        sharding = self._sharding

        def shard(t):
            # pin the batch axis to the mesh so the train step downstream of
            # the in-graph sample runs data-parallel (no-op single-chip)
            if t is None or sharding is None:
                return t
            return jax.lax.with_sharding_constraint(t, sharding)

        def sample(key, X, Y):
            def slice_rgb(idx, y0, x0):
                return jax.lax.dynamic_slice(Y, (idx, y0, x0, 0), (1, P, P, 3))[0]

            def slice_raw(idx, ry, rx):
                return jax.lax.dynamic_slice(X, (idx, ry, rx, 0), (1, R, R, 4))[0]

            k_i, k_y, k_x, k_u = jax.random.split(key, 4)
            idx = jax.random.randint(k_i, (M,), 0, N)
            # even coordinates keep the half-res RAW patch Bayer-aligned
            yy = 2 * jax.random.randint(k_y, (M,), 0, (H - P) // 2 + 1)
            xx = 2 * jax.random.randint(k_x, (M,), 0, (W - P) // 2 + 1)

            if discard and M > B:
                rgb = shard(jax.vmap(slice_rgb)(idx, yy, xx))
                var = jnp.var(rgb.astype(jnp.float32) / 255.0, axis=(1, 2, 3))
                u = jax.random.uniform(k_u, (M,))
                score = jnp.where(var >= FLAT_VARIANCE_THRESHOLD, 1.0 + u, var)
                _, keep = jax.lax.top_k(score, B)
                idx, yy, xx = idx[keep], yy[keep], xx[keep]
                rgb = rgb[keep]
            elif has_y:
                rgb = jax.vmap(slice_rgb)(idx[:B], yy[:B], xx[:B])
                idx, yy, xx = idx[:B], yy[:B], xx[:B]
            else:
                idx, yy, xx = idx[:B], yy[:B], xx[:B]
                rgb = None

            raw = (jax.vmap(slice_raw)(idx, yy // 2, xx // 2)
                   if has_x else None)
            return shard(raw), shard(rgb)

        return sample

    def __call__(self, step):
        """Batch for a training step: ('xy' → (raw, rgb); 'x' → raw; 'y' → rgb),
        uint16/uint8 device arrays. Deterministic in (seed, step)."""
        raw, rgb = self._sample(jax.random.fold_in(self._key, step),
                                *self.data_args)
        if self._loaded == 'xy':
            return raw, rgb
        return rgb if self._loaded == 'y' else raw

    def epoch_steps(self):
        """Steps per 'epoch' — matches the host path's batches-per-epoch so
        schedules/logs stay comparable."""
        return max(1, self.n_images // self.batch_size)
