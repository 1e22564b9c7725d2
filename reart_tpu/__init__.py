"""reart_tpu — a TPU-native framework for building rearticulable models from 4D point clouds.

Capabilities-equivalent, architecture-idiomatic rebuild of the CVPR'23 "reart"
pipeline (reference: stevenlsw/reart). Given a sequence of T point-cloud frames
of one articulated object, the framework fits, by per-sequence test-time
optimization:

  1. a rigid-part segmentation of a chosen canonical frame,
  2. a per-part SE(3) trajectory for every non-canonical frame,
  3. a kinematic tree over the parts,
  4. screw joint (revolute / prismatic) parameters on every tree edge,

so the object can be re-posed / retargeted afterwards.

Design stance (TPU-first, not a port):
  * functional core — pure functions over pytrees, `optax` optimizers,
    `lax.scan`-chunked optimization loops compiled once with XLA;
  * geometry & neighbor ops are branchless `jnp` / Pallas code (jit/vmap-safe);
  * the kinematic tree is compiled to static padded arrays so forward
    kinematics is a `scan` over tree depth instead of a Python graph walk;
  * host-side combinatorics (Hungarian assignment, MST, tree edit distance)
    run in a small native C++ library (ctypes), with pure-python fallbacks;
  * multi-chip scaling through `jax.sharding.Mesh` + `shard_map` (frames /
    sweep axes over ICI), not per-op device code.
"""

import jax as _jax

# This workload is geometry-heavy: chained 3x3/4x4 composes, point-cloud
# pairwise distances, screw exponentials. TPU matmuls default to bfloat16
# accumulation inputs, which corrupts those (observed ~1e-2 error on SO(3)
# exponentials). Full-f32 MXU passes are the right default here; the big
# matmuls in this pipeline are bandwidth-bound, not FLOP-bound, so the cost
# is negligible. Override after import if you know better.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: per-sequence test-time optimization means many
# short-lived processes compiling the same handful of programs; with remote
# TPU compile each miss costs tens of seconds. Respect an explicit user dir.
import os as _os

def _host_cache_tag() -> str:
    """CPU-feature fingerprint for the cache path (same rationale as
    native/__init__.py:_host_tag). XLA:CPU cache entries embed AOT machine
    code keyed without the host's machine features; this VM live-migrates
    between hosts with different CPUs, and loading a foreign entry logs
    'could lead to execution errors such as SIGILL' (observed 2026-08-18).
    A per-host subdirectory trades a one-time recompile after a migration
    for never executing foreign machine code. TPU entries are device code
    and would be reusable, but correctness of the CPU path (tests, dryrun,
    hostops) wins."""
    import hashlib as _hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return _hashlib.md5(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    return "unknown"


if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    _cache_dir = _os.path.join(
        _os.path.expanduser("~/.cache/reart_tpu_jax"), _host_cache_tag())
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except OSError:
        pass

__version__ = "0.1.0"

