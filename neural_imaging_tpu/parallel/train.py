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


class DataParallel:
    """
    User-reachable data-parallel context for the production trainers
    (SURVEY.md §2.9: "all five training loops run under one jitted train_step
    with NamedSharding on batch" — new TPU capability, absent in the reference,
    whose loops are single-device: ref training/pipeline.py:105,
    training/compression.py:123, training/manipulation.py:36).

    Parsed from the CLI ``--devices`` flag; carries the mesh plus the sharding
    used to place training batches. Parameters/optimizer state stay replicated;
    XLA inserts the gradient all-reduce over ICI.
    """

    def __init__(self, mesh):
        self.mesh = mesh
        self.batch_sharding = mesh_lib.batch_sharding(mesh)

    @classmethod
    def from_spec(cls, spec, batch_size=None):
        """
        ``spec``: None/'none' → None (single-device path untouched);
        'auto' → all local devices; an int/str-int → that many devices.
        When ``batch_size`` is given and does not divide across the requested
        devices, the mesh shrinks to the largest divisor (with a warning) so
        per-device batches stay equal-sized (static shapes under jit).
        """
        import jax

        from neural_imaging_tpu.utils.utils import logger
        if spec in (None, 'none', ''):
            return None
        n = len(jax.devices()) if spec == 'auto' else int(spec)
        if n <= 1:
            return None
        if batch_size is not None and batch_size % n != 0:
            best = max(d for d in range(1, n + 1) if batch_size % d == 0)
            logger.warning('batch size %d does not divide over %d devices; '
                           'using a %d-device mesh', batch_size, n, best)
            n = best
            if n <= 1:
                return None
        return cls(mesh_lib.make_mesh(n))

    @property
    def n_devices(self):
        return int(self.mesh.devices.size)

    def check_batch(self, batch_size, what='batch size'):
        if batch_size % self.n_devices != 0:
            raise ValueError(f'{what} ({batch_size}) must divide across the '
                             f'{self.n_devices}-device mesh')

    def distribute(self, model_or_flow):
        """Replicate a TPUModel's or a workflow's state across the mesh."""
        if hasattr(model_or_flow, 'fan'):  # the joint workflow
            return distribute_workflow(model_or_flow, self.mesh)
        return distribute_model(model_or_flow, self.mesh)

    def shard(self, *arrays):
        return shard_batch_args(self.mesh, *arrays)

    def describe(self):
        return (f'data-parallel over {self.n_devices} devices '
                f'({self.mesh.devices.flat[0].platform})')


def add_cli_args(parser):
    """Attach the shared scale-out flags to a trainer CLI parser."""
    parser.add_argument('--devices', default=None,
                        help="data-parallel device count: an int, 'auto' (all "
                             "local devices) or 'none' (default, single device)")
    parser.add_argument('--coordinator', default=None,
                        help='multi-host: coordinator address host:port')
    parser.add_argument('--nproc', type=int, default=None,
                        help='multi-host: total number of processes')
    parser.add_argument('--procid', type=int, default=None,
                        help='multi-host: this process id')
    return parser


def from_cli_args(args, batch_size=None):
    """Initialize multi-host (if requested) and build the DataParallel context
    from the CLI flags; returns None for the plain single-device path."""
    from neural_imaging_tpu.parallel import multihost
    multihost.initialize(args.coordinator, args.nproc, args.procid)
    spec = args.devices
    if spec is None and args.coordinator is not None:
        spec = 'auto'  # multi-host runs default to the full global mesh
    return DataParallel.from_spec(spec, batch_size=batch_size)
