"""Persistent XLA compile cache shared by every entry point.

Full-model compiles through the remote (axon) TPU tunnel take minutes and
the CPU test/dryrun compiles are similarly slow on this 1-core host; the
persistent cache makes warm reruns of the same graph near-instant.  The
reference has no counterpart (PyTorch eager); this is TPU-runtime plumbing.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Point jax's persistent compilation cache at ``<repo>/.jax_cache``.

    Safe to call multiple times and before or after backend init; silently
    a no-op on jax builds without the config knobs.
    """
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_cache",
        )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
