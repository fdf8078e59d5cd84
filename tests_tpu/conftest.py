"""On-hardware test configuration (real TPU via the tunnel).

Unlike ``tests/conftest.py`` (which pins the host-CPU backend and an
8-virtual-device mesh), this suite runs on whatever accelerator the
container provides and SKIPS everything unless it is a TPU. Run it
explicitly:

    python -m pytest tests_tpu/ -q

It is intentionally outside the default ``testpaths`` so the CPU suite
stays hermetic. Purpose (round-3 verdict item): the on-device parity
table and gradient checks used to live only in ``bench.py`` — a Mosaic
regression surfaced as a bench-number drift, not a red test.
"""

import os
import pathlib
import pickle

import numpy as np
import pytest

# the persistent compile cache makes repeat runs of the heavy Mosaic
# kernels (~20-40 s first compile each) near-instant
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DAY_PICKLE = pathlib.Path("/root/reference/docs/tutorials/Example_Input_Day.p")
NIGHT_PICKLE = pathlib.Path(
    "/root/reference/docs/tutorials/Example_Input_Night.p")
GOLDEN_DIR = pathlib.Path(__file__).parent.parent / "tests" / "goldens"


def _tpu_responsive(timeout_s=150):
    """Probe the accelerator in a SUBPROCESS with a timeout.

    jax.devices() HANGS (no error) when the axon tunnel dies; probing
    in-process would hang collection itself. Any failure → not a TPU.
    """
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s)
        return r.returncode == 0 and "tpu" in r.stdout
    except Exception:
        return False


def pytest_collection_modifyitems(config, items):
    if _tpu_responsive():
        return
    skip = pytest.mark.skip(
        reason="requires real TPU hardware (none responsive)")
    for item in items:
        item.add_marker(skip)


@pytest.fixture(scope="session")
def day_profile():
    if not DAY_PICKLE.exists():
        pytest.skip("reference Day pickle not available")
    with open(DAY_PICKLE, "rb") as f:
        return pickle.load(f)


@pytest.fixture(scope="session")
def night_profile():
    if not NIGHT_PICKLE.exists():
        pytest.skip("reference Night pickle not available")
    with open(NIGHT_PICKLE, "rb") as f:
        return pickle.load(f)


@pytest.fixture(scope="session")
def goldens():
    path = GOLDEN_DIR / "reference_goldens.npz"
    if not path.exists():
        pytest.skip("reference goldens not generated")
    return dict(np.load(path, allow_pickle=False))
