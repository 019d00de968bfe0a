"""
Data-parallel training wrappers: place parameters replicated and batches sharded on
a mesh, so the existing jitted train steps run SPMD with XLA-inserted gradient
all-reduces over ICI.

Works with every trainer in the framework (NIP, DCN, FAN, and the joint workflow):
the jitted steps are pure functions of (params, opt_state, batch, ...), so sharding
is fully determined by input placement — no step rewrites needed.
"""
import jax.numpy as jnp

from neural_imaging_tpu.parallel import mesh as mesh_lib


def distribute_model(model, mesh):
    """Replicate a TPUModel's parameters/optimizer state across the mesh."""
    model.params = mesh_lib.replicate(model.params, mesh)
    if model.opt_state is not None:
        model.opt_state = mesh_lib.replicate(model.opt_state, mesh)
    return model


def distribute_workflow(flow, mesh):
    """Replicate the joint workflow's parameter partitions across the mesh."""
    flow.params = mesh_lib.replicate(flow.params, mesh)
    flow.opt_state = mesh_lib.replicate(flow.opt_state, mesh)
    return flow


def shard_batch_args(mesh, *arrays):
    """Shard each array along its leading (batch) axis."""
    return tuple(mesh_lib.shard_batch(jnp.asarray(a), mesh) if a is not None else None
                 for a in arrays)


def data_parallel_batch_size(per_device_batch, mesh, axis='data'):
    return per_device_batch * mesh.shape[axis]


def pad_batch_to_devices(batch, mesh, axis='data'):
    """Pad the batch so its leading dim divides the mesh's data axis."""
    import numpy as np
    n = mesh.shape[axis]
    b = batch.shape[0]
    if b % n == 0:
        return batch, b
    pad = n - b % n
    padded = np.concatenate([batch, np.repeat(batch[-1:], pad, axis=0)], axis=0)
    return padded, b


def sharded_inference(model, batch, mesh, micro_batch=None):
    """Run model.process over the mesh with the batch split across devices."""
    padded, orig = pad_batch_to_devices(batch, mesh)
    out = model.process(mesh_lib.shard_batch(jnp.asarray(padded), mesh))
    return out[:orig]
