"""cgx_tpu: TPU-native hierarchical translation grammar extractor.

Persistent XLA compilation caching is enabled on import: the extraction kernels are
large unrolled programs whose compile time dwarfs toy-corpus runtime; the cache makes
every run after the first start instantly.
"""

import os as _os

_cache_dir = _os.environ.get(
    "CGX_TPU_JAX_CACHE", _os.path.expanduser("~/.cache/cgx_tpu_jax"))
try:
    import jax as _jax

    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - cache is an optimization only
    pass
