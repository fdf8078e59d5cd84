"""Test configuration: CPU backend, 8 virtual devices, float64.

Multi-chip sharding tests run on a simulated 8-device CPU mesh
(``xla_force_host_platform_device_count``); numerical parity tests against the
NumPy/f64 reference oracle require x64. Must run before the first jax import.
"""

import os

# The container pins JAX_PLATFORMS=axon (the tunnelled TPU); tests must run
# on the host CPU with 8 virtual devices. The env var is overridden by the
# platform plugin, so force the platform through jax.config instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: the suite is dominated by XLA compiles of the
# big shard_map/LM programs (~3 min of the wall clock); repeat runs reuse
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pathlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens"
DAY_PICKLE = pathlib.Path("/root/reference/docs/tutorials/Example_Input_Day.p")
NIGHT_PICKLE = pathlib.Path(
    "/root/reference/docs/tutorials/Example_Input_Night.p")


def _load_profile(path):
    import pickle
    with open(path, "rb") as f:
        d = pickle.load(f)
    return d


@pytest.fixture(scope="session")
def day_profile():
    if not DAY_PICKLE.exists():
        pytest.skip("reference Day pickle not available")
    return _load_profile(DAY_PICKLE)


@pytest.fixture(scope="session")
def night_profile():
    if not NIGHT_PICKLE.exists():
        pytest.skip("reference Night pickle not available")
    return _load_profile(NIGHT_PICKLE)


@pytest.fixture(scope="session")
def goldens():
    """Reference-oracle golden arrays (tools/gen_reference_goldens.py)."""
    path = GOLDEN_DIR / "reference_goldens.npz"
    if not path.exists():
        pytest.skip("reference goldens not generated")
    return dict(np.load(path, allow_pickle=False))


@pytest.fixture(autouse=True, scope="module")
def _drop_jax_executables_between_modules():
    """Clear in-process XLA executables after every test module.

    With ~150 tests in one process the XLA:CPU (LLVM JIT) backend
    eventually SEGFAULTS while compiling yet another program — observed
    deterministically in full-suite runs and never in any half-suite
    subset. Dropping the live executables between modules keeps the JIT
    code pools small; the on-disk compilation cache (min_compile_time
    0.5 s) makes the re-JITs cheap.
    """
    yield
    import gc

    jax.clear_caches()
    gc.collect()
