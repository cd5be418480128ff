import os
import sys

# Multi-chip sharding tests run on a virtual 8-device CPU mesh (SURVEY.md §4:
# the standard fake backend for pod code without a pod). Must be set before
# jax import.
# Force CPU: the environment exports JAX_PLATFORMS=axon (the tunneled real
# TPU); unit tests must not compile through the tunnel. The axon
# sitecustomize ignores the env var, so set the config explicitly too.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8").strip()
# Small wavefront unroll on CPU: compile time is ~linear in KD and the
# results are KD-invariant (models/wavefront.py); the CI box has 2 cores.
os.environ.setdefault("VP8TPU_KD", "2")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NOTE: no persistent compilation cache here on purpose — XLA:CPU's
# persistent cache routes compiles through its (much slower) AOT
# pipeline; measured 156s JIT vs >20min AOT for the encode wavefront.

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VECTOR_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "vectors")


def vector(name):
    return os.path.join(VECTOR_DIR, name)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    A full-suite run accumulates hundreds of XLA:CPU executables in one
    process; past a threshold the next backend_compile segfaults inside
    LLVM (reproduced twice at different tests, never standalone —
    jax/jaxlib 0.9.0). Programs are rarely shared across modules (they
    are keyed by geometry), so per-module clearing costs little."""
    yield
    jax.clear_caches()
