"""
Real multi-process jax.distributed coverage: launches 2 CPU processes (2 virtual
devices each -> a 4-device global mesh) and checks every non-noop branch of
parallel/multihost.py — initialize, global_mesh, local_batch_slice, primary_only,
sync_global_value, and a cross-process SPMD reduction.
"""
import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      'support', 'multihost_worker.py')


def _free_port():
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def test_two_process_distributed():
    port = _free_port()
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)  # workers set their own device count

    procs = [subprocess.Popen([sys.executable, WORKER, str(pid), '2', str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env)
             for pid in range(2)]
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)

    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f'worker {pid} failed:\n{out[-3000:]}'
        assert 'CHECK done' in out, out[-3000:]
        assert f'CHECK init {pid}/2 local=2 global=4' in out
        assert 'CHECK mesh 4' in out
        assert f'CHECK slice {pid * 4} 4' in out
        assert 'CHECK sync 0.5' in out
        assert 'CHECK spmd_sum 28.0' in out

    assert 'CHECK primary True ran' in outputs[0]
    assert 'CHECK primary False None' in outputs[1]
