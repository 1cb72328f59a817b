"""Global numeric configuration.

The parity bar (BASELINE.json:5 — nodal displacements within 1e-8 relative of
the CPU reference) forces f64 accumulation everywhere on the correctness path,
so x64 is enabled at import time. The f32 element-kernel / PCG path (Pallas)
is an explicit, benchmarked opt-in (see SURVEY.md §9 risk 2/5).

Platform facts probed on the dev TPU (jax 0.9.0, TPU v5 lite, SURVEY.md §9
risk 5):
  * Pallas kernels are f32-only (XLA's X64 rewrite is unimplemented for
    ``tpu_custom_call``).
  * f64 LU (``jnp.linalg.inv/solve``) is unimplemented on TPU — all dense
    direct solves use Cholesky (K is SPD after Dirichlet reduction) and all
    3x3 inverses use the explicit adjugate formula (`ops.smallmat`).
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# The dev image force-registers its TPU platform before user code runs, so
# plain JAX_PLATFORMS env is ignored; resetting jax_platforms after import is
# the supported escape hatch. FEA_PLATFORM=cpu forces the CPU backend (used
# by CI subprocesses and the fake-8-device distributed tests).
if os.environ.get("FEA_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["FEA_PLATFORM"])

# Persistent compilation cache: XLA compiles of large f64 graphs are
# multi-minute on the tunneled TPU backend; cache them across processes.
# The default directory is scoped by a hash of the HOST CPU feature set:
# XLA:CPU AOT executables record the compile machine's features, and
# loading an entry produced on a different host SEGFAULTS outright
# (measured 2026-08-21: cpu_aot_loader machine-feature-mismatch warnings
# followed by a segfault inside compilation_cache.get_executable_and_time
# mid-test-suite). A feature-scoped directory makes foreign entries
# invisible instead of fatal.


def _host_feature_tag() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    return "nohost"


_cache_dir = os.environ.get(
    "FEA_COMPILE_CACHE", f"/tmp/fea_jax_cache-{_host_feature_tag()}"
)
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

# Debug profile (SURVEY.md §7.2c): FEA_DEBUG=1 turns on NaN screens and
# tracer-leak checking — slow, for debugging solver blow-ups only.
if os.environ.get("FEA_DEBUG"):
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_check_tracer_leaks", True)

import jax.numpy as jnp  # noqa: E402

#: dtype of the correctness/parity path.
DTYPE = jnp.float64

#: dtype of the performance (Pallas) path.
FAST_DTYPE = jnp.float32

#: int dtype for all connectivity / index arrays.
INDEX_DTYPE = jnp.int32


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def on_cpu() -> bool:
    return jax.default_backend() == "cpu"


def pallas_interpret() -> bool:
    """Pallas kernels run in interpret mode off-TPU (CI runs on CPU)."""
    return not on_tpu()
