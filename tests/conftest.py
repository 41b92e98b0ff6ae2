import os

# Tests run on a virtual 8-device CPU mesh so sharding semantics are
# exercised without TPU hardware (SURVEY.md §4).  XLA_FLAGS must be in the
# environment before the CPU backend initializes; the platform itself is
# forced via jax.config because the TPU boot shim (sitecustomize) re-sets
# JAX_PLATFORMS in the environment after importing jax.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture()
def rng():
    # function-scoped: each test sees the same deterministic stream
    # regardless of which other tests ran before it
    return np.random.default_rng(20260817)


def random_haplotypes(rng, n_variants, n_haplotypes, maf_low=0.0, maf_high=1.0):
    """Random {0,1} haplotype block with per-variant alt frequencies."""
    freqs = rng.uniform(maf_low, maf_high, size=(n_variants, 1))
    return (rng.random((n_variants, n_haplotypes)) < freqs).astype(np.int8)
