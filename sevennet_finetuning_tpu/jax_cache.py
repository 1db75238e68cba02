"""Persistent XLA compilation cache setup.

The SevenNet-0 double-backprop train step costs minutes of XLA compile
per process; a persistent on-disk cache makes every later run of the same
model/shape start in seconds.  (The reference has no equivalent cost:
eager PyTorch does not compile.  This is the TPU-native counterpart of
"warm start".)

Called from every entry point (CLI, bench, tools) before the first jit.
Opt out with SEVENN_NO_JAX_CACHE=1; relocate with SEVENN_JAX_CACHE_DIR.
"""

import os


def enable_persistent_cache() -> str | None:
    """Point JAX at an on-disk compilation cache; returns the directory
    (None if disabled or unsupported by the installed jax)."""
    if os.environ.get('SEVENN_NO_JAX_CACHE'):
        return None
    cache_dir = os.environ.get('SEVENN_JAX_CACHE_DIR') or os.path.join(
        os.path.expanduser('~'), '.cache', 'sevennet_ft_tpu', 'xla'
    )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        # cache everything that takes longer than a second to compile
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    except Exception as exc:
        import sys

        print(
            f'warning: persistent XLA compile cache disabled '
            f'({cache_dir}): {exc!r} -- every run will pay full '
            'recompilation',
            file=sys.stderr,
        )
        return None
    return cache_dir
