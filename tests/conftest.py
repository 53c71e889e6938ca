"""Test configuration.

Tests run on CPU with a *virtual 8-device mesh* so pjit/shard_map paths are
exercised without TPU hardware (SURVEY.md §4 test strategy). The env vars
must be set before jax is imported anywhere.
"""

import os

# NOTE: this image's sitecustomize.py registers the axon TPU plugin in
# every interpreter and pins JAX_PLATFORMS=axon, so a plain env default is
# not enough — force the config through the jax API before any backend
# initializes, or every test process serializes on the single TPU chip.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent XLA compilation cache: the suite is compile-dominated on a
# single CPU core (~50 min cold); cached re-runs skip unchanged programs.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    # Function-scoped on purpose: a session-scoped generator makes every
    # test's data depend on which tests ran before it (order-dependent
    # parity flakes — a tolerance that holds for one draw can miss for
    # another); fresh-per-test means `pytest file.py::test` reproduces
    # exactly what the full tier saw.
    return np.random.default_rng(0)


EXAMPLE_CLASSES_3LEVEL = {
    # mirrors /root/reference/example-config.yaml:9-29
    "super_coarse_to_coarse_map": [[0, 2], [3]],
    "super_coarse_names": {0: "Plant", 1: "Fungus"},
    "coarse_to_fine_map": [[0, 3], [4, 6], [7], [8]],
    "coarse_names": {0: "Flower", 1: "Tree", 2: "Grass", 3: "Mushroom"},
    "fine_names": {i: f"f{i}" for i in range(9)},
}

EXAMPLE_CLASSES_2LEVEL = {
    "coarse_to_fine_map": [[0, 3], [4, 6], [7], [8]],
    "coarse_names": {0: "Flower", 1: "Tree", 2: "Grass", 3: "Mushroom"},
    "fine_names": {i: f"f{i}" for i in range(9)},
}


@pytest.fixture
def classes_3level():
    return dict(EXAMPLE_CLASSES_3LEVEL)


@pytest.fixture
def classes_2level():
    return dict(EXAMPLE_CLASSES_2LEVEL)
