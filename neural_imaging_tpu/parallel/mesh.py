"""
Device-mesh and sharding helpers.

The reference toolbox is strictly single-device (SURVEY.md §2.9) — this layer is
new, TPU-native capability. Scale-out model: SPMD data parallelism over the batch
axis of a 1-D ``('data',)`` mesh (optionally 2-D ``('data', 'space')`` with spatial
sharding of full-resolution images for inference). Parameters are replicated;
gradients are reduced with XLA-inserted collectives over ICI — no hand-written
communication. Model sizes (≤ a few M params) make tensor/pipeline parallelism
unnecessary for parity (documented out of scope in SURVEY.md §2.9).
"""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axes=('data',), devices=None):
    """Create a Mesh over the first n available devices (1-D by default)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if len(axes) == 1:
        shape = (n,)
    elif len(axes) == 2:
        # favor the data axis; spatial axis gets the residual factor
        space = 1
        for cand in (2, 4):
            if n % cand == 0 and n // cand >= 1:
                space = cand
        shape = (n // space, space)
    else:
        raise ValueError('Only 1-D or 2-D meshes are supported')
    return Mesh(np.array(devices).reshape(shape), axes)


def batch_sharding(mesh, axis='data'):
    """NamedSharding that splits the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis='data'):
    """Place the GLOBAL host batch onto the mesh, split along the leading axis.

    Single-process: device_put splits it locally. Multi-process: every process
    passes the same global batch (datasets are deterministic per-process); this
    process's slice is cut out here and the slices are assembled into one
    global jax.Array without any cross-host data movement."""
    return put_global(batch, batch_sharding(mesh, axis))


def put_global(batch, sharding):
    """device_put that is multi-process aware: batch-sharded inputs are sliced
    to this process's rows first (multihost.local_batch_slice), replicated
    inputs are provided whole by every process."""
    if sharding is None:
        return jax.device_put(batch)
    if jax.process_count() > 1:
        batch = np.asarray(batch)
        if not sharding.is_fully_replicated:
            from neural_imaging_tpu.parallel import multihost
            start, size = multihost.local_batch_slice(batch.shape[0])
            batch = batch[start:start + size]
        return jax.make_array_from_process_local_data(sharding, batch)
    return jax.device_put(batch, sharding)


def replicate(tree, mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
            tree)
    return jax.device_put(tree, sharding)


def spatial_sharding(mesh, axis='space'):
    """Shard the image height axis of an NHWC tensor (for full-res inference);
    XLA inserts halo exchanges for the convolution overlaps."""
    return NamedSharding(mesh, P(None, axis))
