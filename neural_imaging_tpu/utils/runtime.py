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
"""
import os

_configured = False


def configure_jax(platform=None, cache_dir=None):
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
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

    _configured = True
    return jax


def maybe_jit(fn):
    """jit on accelerator backends (collapses eager dispatch storms over remote
    device tunnels); skip on CPU where per-op dispatch is cheap and tracing isn't."""
    import jax
    if jax.default_backend() == 'cpu':
        return fn
    return jax.jit(fn)
