"""
Runtime/backend configuration.

``configure_jax()`` applies environment-driven JAX settings before the first
computation:

- ``NI_TPU_PLATFORM``: force a backend ('cpu' / 'tpu' / ...). Needed because some
  deployments pre-register an accelerator platform in sitecustomize, which ignores
  ``JAX_PLATFORMS`` set later.
- ``NI_TPU_CACHE_DIR``: persistent compilation cache directory (defaults to
  ``<repo>/.jax_cache``; set to '0' to disable). Remote/tunneled compilation can
  take minutes for the joint workflow graph — the cache amortizes it across runs.
- ``NI_TPU_CACHE_WRITE``: set to '0' to keep cache READS but skip WRITES. Over
  a tunneled device, writing an entry downloads the multi-MB serialized
  executable from the compile server — measured at 45 KB/s → minutes per
  program when the tunnel's downlink degrades (round-5 notes), while the
  server-side compile itself stays fast. Bench tooling defaults writes OFF.
"""
import os

_configured = False


def configure_jax(platform=None, cache_dir=None, cache_writes=None):
    global _configured
    import jax

    platform = platform or os.environ.get('NI_TPU_PLATFORM')
    if platform:
        jax.config.update('jax_platforms', platform)

    if cache_dir is None:
        cache_dir = os.environ.get('NI_TPU_CACHE_DIR')
    if cache_dir is None:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        cache_dir = os.path.join(repo, '.jax_cache')
    if cache_dir and cache_dir != '0':
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        if cache_writes is None:
            cache_writes = os.environ.get('NI_TPU_CACHE_WRITE', '1') != '0'
        # an effectively-infinite threshold keeps reads while skipping writes
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          5.0 if cache_writes else 1e9)

    _configured = True
    return jax


# Device generation the 'auto' implementation-selection crossovers were
# measured on (docs/benchmarks.md). The constants encode where a Pallas kernel
# beats XLA's form *on that chip*; other generations (v4's larger cores, v6's
# higher HBM bandwidth) shift the crossover, so 'auto' may pick the slower —
# never an incorrect — path there.
CALIBRATED_DEVICE_KIND = 'TPU v5 lite'

_warned_device_kinds = set()


def warn_if_uncalibrated_device(feature):
    """One-time warning when an 'auto' crossover runs on a device generation
    other than the one its constants were measured on."""
    import jax
    try:
        dev = jax.devices()[0]
    except (IndexError, RuntimeError):
        return
    if dev.platform != 'tpu':
        return
    kind = getattr(dev, 'device_kind', '')
    if kind == CALIBRATED_DEVICE_KIND or (feature, kind) in _warned_device_kinds:
        return
    _warned_device_kinds.add((feature, kind))
    import warnings
    warnings.warn(
        f"{feature}: 'auto' implementation crossover was calibrated on "
        f"{CALIBRATED_DEVICE_KIND!r} but this device is {kind!r}; the selected "
        f"path is still correct but may not be the fastest — re-measure with "
        f"bench_pallas.py and pin impl explicitly if performance matters.",
        stacklevel=3)


def fetch_with_timeout(arr, timeout_s=15.0):
    """Device→host fetch guarded by a timeout: returns np.asarray(arr), or
    None if the transfer doesn't complete in time.

    Over a tunneled device the downlink can wedge entirely (round-5 notes:
    even 4-byte fetches hang); an unguarded fetch then blocks forever. The
    fetch runs in a daemon thread so a stall can't hang the caller — used by
    bench tooling to keep reporting alive when only the downlink is broken."""
    import threading
    import numpy as np
    out = {}

    def pull():
        out['v'] = np.asarray(arr)

    t = threading.Thread(target=pull, daemon=True)
    t.start()
    t.join(timeout_s)
    return out.get('v')


def maybe_jit(fn):
    """jit on accelerator backends (collapses eager dispatch storms over remote
    device tunnels); skip on CPU where per-op dispatch is cheap and tracing isn't."""
    import jax
    if jax.default_backend() == 'cpu':
        return fn
    return jax.jit(fn)
