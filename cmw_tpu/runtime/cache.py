"""Persistent XLA compilation cache.

The closed-loop episode graphs (multi-rate scan over SQP solves, MANN
rollouts and the WBC stage) take minutes to compile while running in
milliseconds; without a disk cache every CLI invocation pays that cost
again. The reference app has the same shape of problem — CasADi JIT
artifacts shipped in its config tree (SURVEY.md §2.1 R10,
`config/robots/ergoCubGazeboV1/tmp_casadi_compiler_shellWKu4VE.so`) are
its persistent compile cache. Ours is XLA's, keyed by HLO hash.
"""

from __future__ import annotations

import os

_DEFAULT = "~/.cache/cmw_tpu_xla"


def enable_persistent_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at a disk directory.

    Safe to call more than once. Returns the cache directory. Set
    ``CMW_NO_CACHE=1`` to disable (e.g. when benchmarking compile time).
    """
    import jax

    if os.environ.get("CMW_NO_CACHE"):
        return ""
    path = os.path.expanduser(path or os.environ.get("CMW_CACHE_DIR", _DEFAULT))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # default threshold (1 s) would skip small kernels that still add up
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    return path
