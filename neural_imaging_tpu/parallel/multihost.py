"""
Multi-host (multi-process) scale-out helpers.

One TPU host only sees its local chips; multi-host jobs run one process per host
with ``jax.distributed`` coordinating a global device view. The SPMD story is
unchanged from single-host (mesh + replicated params + sharded batch — see
parallel/mesh.py): the mesh simply spans all hosts' devices and XLA routes
collectives over ICI within a slice (DCN between slices is handled by the runtime).

This module can only be exercised on real multi-host topologies; on a single host
it degrades to no-ops so the same training scripts run anywhere.
"""
import jax
import numpy as np

from neural_imaging_tpu.utils.utils import logger


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize jax.distributed (no-op when unset / single process)."""
    if coordinator_address is None and num_processes is None:
        logger.info('multihost: single-process mode (jax.distributed not initialized)')
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes, process_id=process_id)
    logger.info('multihost: process %d/%d, %d local / %d global devices',
                jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())
    return True


def global_mesh(axes=('data',)):
    """Mesh over ALL processes' devices (call after initialize())."""
    from neural_imaging_tpu.parallel.mesh import make_mesh
    return make_mesh(n_devices=None, axes=axes, devices=jax.devices())


def is_primary():
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0


def primary_only(fn):
    """Decorator running fn only on process 0 (checkpoint/log writers)."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if is_primary():
            return fn(*args, **kwargs)
        return None
    return wrapper


def local_batch_slice(global_batch_size):
    """(start, size) of this process's slice of a globally-sharded batch."""
    per_process = global_batch_size // jax.process_count()
    return jax.process_index() * per_process, per_process


def sync_global_value(value):
    """Agree on a scalar across processes (mean via a tiny psum)."""
    if jax.process_count() == 1:
        return float(value)
    import jax.numpy as jnp
    from jax.experimental.multihost_utils import process_allgather
    gathered = process_allgather(jnp.asarray(value))
    return float(np.mean(np.asarray(gathered)))
