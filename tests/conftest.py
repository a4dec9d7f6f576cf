"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh *before* jax is imported anywhere,
so multi-chip sharding logic is exercised without TPU hardware (the idiomatic
substitute for the reference's absent multi-process tests, SURVEY.md section 4).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# The environment's sitecustomize registers the axon TPU plugin and forces
# jax_platforms="axon,cpu" via jax.config -- the env var alone is ignored.
# Tests must run on the virtual 8-device CPU mesh (the TPU tunnel is a
# single-client resource), so override through jax.config before any
# backend is initialized.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Files whose tests dominate suite wall time (jit-heavy model-zoo sweeps,
# multi-device training, golden-file physics). Everything else is the
# `-m fast` iteration lane (~7 min on this container's single CPU core
# when idle; slower if a TPU run shares the core).
SLOW_FILES = {
    "test_model_zoo.py",
    "test_training.py",
    "test_training_loop.py",
    "test_provider.py",
    "test_physics.py",
    "test_evaluation.py",
    "test_mh.py",
}


def pytest_collection_modifyitems(items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if fname in SLOW_FILES:
            item.add_marker(pytest.mark.slow)
        elif item.get_closest_marker("slow") is not None:
            # Explicitly slow-marked items in fast files (e.g. the full
            # model-family invariance sweeps) stay out of the fast lane.
            pass
        else:
            item.add_marker(pytest.mark.fast)


REFERENCE_TESTDATA = "/root/reference/testdata"
REFERENCE_SIM_TESTDATA = "/root/reference/simulation/testdata"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def testdata_2olx():
    return (
        os.path.join(REFERENCE_TESTDATA, "output", "2olx-traj-state0.pdb"),
        os.path.join(REFERENCE_TESTDATA, "output", "2olx-traj-arrays.npz"),
    )


@pytest.fixture(scope="session")
def testdata_1hgv():
    return (
        os.path.join(REFERENCE_TESTDATA, "output", "1hgv-traj-state0.pdb"),
        os.path.join(REFERENCE_TESTDATA, "output", "1hgv-traj-arrays.npz"),
    )


@pytest.fixture(scope="session")
def dummy_datapoints(rng):
    """Two synthetic molecules with 3 and 5 atoms (mirrors the reference's
    conftest fixture, reference: tests/conftest.py:14-40)."""
    from timewarp_tpu.data.batch import MolDynDatapoint

    def make(name, n):
        coords = rng.normal(size=(n, 3)).astype(np.float32)
        return MolDynDatapoint(
            name=name,
            atom_types=rng.integers(0, 5, size=(n,)).astype(np.int32),
            adj_list=np.array([[i, i + 1] for i in range(n - 1)], dtype=np.int32),
            atom_coords=coords,
            atom_velocs=rng.normal(size=(n, 3)).astype(np.float32),
            atom_forces=rng.normal(size=(n, 3)).astype(np.float32),
            atom_coord_targets=coords + 0.01 * rng.normal(size=(n, 3)).astype(np.float32),
            atom_veloc_targets=rng.normal(size=(n, 3)).astype(np.float32),
            atom_force_targets=rng.normal(size=(n, 3)).astype(np.float32),
        )

    return [make("mol3", 3), make("mol5", 5)]
