"""One canonical persistent XLA compile-cache location for every entry point.

Previously the CLIs and the perf scripts pointed at two different
directories, so identical programs were compiled and persisted twice. Note
the measured caveat (CLAUDE.md): over the tunnel-attached TPU the cache does
NOT carry compiles across processes — entry points absorb first compiles in
synced warm-ups — but on honest backends (CPU tests, direct-attached chips)
the cache is what makes restarts fast.
"""

from __future__ import annotations

import os

CACHE_DIR = os.path.expanduser("~/.cache/vaenar_tts_tpu_xla")


def setup_compile_cache() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    # JAX_PLATFORM_NAME=cpu must mean CPU-ONLY: with just the env var, jax
    # still INSTANTIATES every registered plugin backend — including the
    # axon TPU client, which opens a second connection to a chip another
    # process may be training on (measured: a concurrent CPU-intended CLI
    # stalled a live training job for ~20 min). The sitecustomize hook
    # clobbers the JAX_PLATFORMS env var, but the config knob set after
    # import wins and keeps the TPU client from ever being created.
    if os.environ.get("JAX_PLATFORM_NAME", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
