import os

# Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
# without TPU hardware (SURVEY.md §4). The axon sitecustomize force-registers
# the TPU platform regardless of JAX_PLATFORMS, so we must override via
# jax.config after import.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True)
def _flag_guard():
    """Snapshot/restore the central flag registry around EVERY test — a
    test that flips a measured-experiment flag can no longer leak it into
    later tests (the d93a70d leak class, VERDICT r4 weak #5)."""
    from s2m2_tpu import flags
    snap = flags.snapshot()
    yield
    flags.restore(snap)
