"""
Worker process for the 2-process jax.distributed test (tests/test_multihost.py).

Run as: python multihost_worker.py <process_id> <num_processes> <port>

Exercises the non-noop branches of neural_imaging_tpu.parallel.multihost on a
CPU backend (2 local devices per process) and prints machine-checkable lines.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))

pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
try:
    jax.config.update('jax_cpu_collectives_implementation', 'gloo')
except Exception:
    pass  # older jax: cross-process CPU collectives may still work via default

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from neural_imaging_tpu.parallel import multihost  # noqa: E402
from neural_imaging_tpu.parallel.mesh import batch_sharding  # noqa: E402

ok = multihost.initialize(coordinator_address=f'127.0.0.1:{port}',
                          num_processes=nprocs, process_id=pid)
assert ok, 'initialize() returned False for a real multi-process setup'
print(f'CHECK init {jax.process_index()}/{jax.process_count()} '
      f'local={jax.local_device_count()} global={jax.device_count()}', flush=True)

mesh = multihost.global_mesh()
assert mesh.devices.size == jax.device_count()
print(f'CHECK mesh {mesh.devices.size}', flush=True)

# local_batch_slice: each process owns a contiguous slice of the global batch
start, size = multihost.local_batch_slice(8)
assert size == 8 // nprocs and start == pid * size
print(f'CHECK slice {start} {size}', flush=True)

# primary_only: only process 0 executes
calls = []


@multihost.primary_only
def record():
    calls.append(1)
    return 'ran'


result = record()
assert (result == 'ran') == (pid == 0)
print(f'CHECK primary {multihost.is_primary()} {result}', flush=True)

# sync_global_value: mean of per-process values via allgather
synced = multihost.sync_global_value(float(pid))
expected = float(np.mean(np.arange(nprocs)))
assert abs(synced - expected) < 1e-6, (synced, expected)
print(f'CHECK sync {synced}', flush=True)

# a real SPMD reduction over the global mesh: each process contributes its local
# shard; the jitted global sum must see all processes' data
global_batch = np.arange(8, dtype=np.float32)  # 0..7, sum 28
local = global_batch[start:start + size]
arr = jax.make_array_from_process_local_data(batch_sharding(mesh), local, (8,))
total = jax.jit(lambda x: jnp.sum(x), out_shardings=None)(arr)
# the result is replicated; fetch it via allgather-safe conversion
total = float(jax.device_get(total))
assert abs(total - 28.0) < 1e-6, total
print(f'CHECK spmd_sum {total}', flush=True)

print('CHECK done', flush=True)
