"""
Memory and device diagnostics.

Capability parity with reference helpers/debugging.py (RSS probes + array sizing),
extended with JAX device-memory reporting (the TPU-side analog of the reference's
TF session probes).
"""
import os
import resource

import numpy as np


def memory_usage_resource():
    """Peak RSS of the current process in MB (via getrusage)."""
    rusage = resource.getrusage(resource.RUSAGE_SELF)
    return rusage.ru_maxrss / 1024.0


def memory_usage_proc():
    """Current RSS in MB (via /proc/self/status)."""
    try:
        with open('/proc/self/status') as f:
            for line in f:
                if line.startswith('VmRSS:'):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return float('nan')


def memory_usage_psutil():
    try:
        import psutil
        return psutil.Process(os.getpid()).memory_info().rss / 1024.0 / 1024.0
    except ImportError:
        return memory_usage_proc()


def array_megabytes(arr):
    """Size of a numpy/jax array in MB."""
    arr = np.asarray(arr) if not hasattr(arr, 'nbytes') else arr
    return arr.nbytes / 1024.0 / 1024.0


def device_memory_stats():
    """Per-device memory statistics from the JAX runtime (when available)."""
    import jax
    stats = {}
    for device in jax.devices():
        try:
            stats[str(device)] = device.memory_stats()
        except (AttributeError, NotImplementedError, RuntimeError):
            stats[str(device)] = None
    return stats


def live_device_arrays():
    """Summary of live device buffers: count and total MB per device."""
    import jax
    totals = {}
    for buf in jax.live_arrays():
        key = str(buf.devices() if hasattr(buf, 'devices') else 'unknown')
        count, mb = totals.get(key, (0, 0.0))
        totals[key] = (count + 1, mb + buf.nbytes / 1024.0 / 1024.0)
    return totals
