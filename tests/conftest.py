"""Test harness: run everything on CPU with 8 virtual devices so multi-chip
sharding is exercised without TPU hardware (the JAX analog of the reference's
degenerate world_size==1 testing, gradio_demo/detectron2/utils/comm.py:138).

The environment pre-imports jax via sitecustomize with JAX_PLATFORMS=axon
(real TPU tunnel), so the platform must be overridden through jax.config, not
env vars. XLA_FLAGS still works because the CPU backend initializes lazily.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the tiny-model programs repeat across test files
# (pipeline/train/zero1/parallel all jit the same tiny stacks) and across
# runs; caching them locally cuts suite wall time on this 1-CPU host.
# (The TPU relay compiles server-side and ignores this cache — CLAUDE.md —
# but the CPU backend honors it.)
jax.config.update("jax_compilation_cache_dir", "/tmp/idmvton_jax_test_cache")
# Threshold 0: the dominant repeated cost is ~120 per-leaf random-normal init
# programs at ~0.33 s each (below any nonzero threshold, so they recompiled in
# EVERY test that builds tiny models — ~40 s/test). Caching them cuts a warm
# TryonModels.init(tiny) from ~43 s to ~4 s (measured).
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8
