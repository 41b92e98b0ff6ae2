"""Sharded sweep semantics on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ld_tools_tpu.ops.ld_math import ld_block, round4_f32
from ld_tools_tpu.parallel import (
    all_pairs_replicated,
    all_pairs_ring,
    make_mesh,
)

from .conftest import random_haplotypes


@pytest.fixture(scope="module")
def reference_case():
    rng = np.random.default_rng(8)
    G = random_haplotypes(rng, 100, 96, maf_low=0.05, maf_high=0.95)
    out = ld_block(jnp.asarray(G), jnp.asarray(G))
    return G, np.asarray(out["r_square"]), np.asarray(out["d_prime"])


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_replicated_matches_single_device(reference_case, n_dev):
    G, r2_ref, dp_ref = reference_case
    mesh = make_mesh(n_dev)
    r2, dp = all_pairs_replicated(G, mesh=mesh)
    # separately-jitted XLA programs may fuse/FMA differently; the FMA on
    # the cancelled d = p_ab - p1*p2 moves D' by up to ~1e-4 relative in
    # f32.  Counts themselves are exact (test_ld_math); file outputs go
    # through the exact f64 finisher, so fast-path wiggle is acceptable.
    np.testing.assert_allclose(np.asarray(r2), r2_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dp), dp_ref, atol=1e-4)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_ring_matches_single_device(reference_case, n_dev):
    G, r2_ref, dp_ref = reference_case
    mesh = make_mesh(n_dev)
    r2, dp = all_pairs_ring(G, mesh=mesh)
    np.testing.assert_allclose(np.asarray(r2), r2_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dp), dp_ref, atol=1e-4)


def test_ring_result_is_row_sharded(reference_case):
    G, _, _ = reference_case
    mesh = make_mesh(8)
    r2, _ = all_pairs_ring(G, mesh=mesh)
    # result should be laid out across all 8 devices
    assert len({s.device for s in r2.addressable_shards}) == 8


def test_ragged_variant_count(reference_case):
    # V not divisible by device count exercises the padding path
    rng = np.random.default_rng(13)
    G = random_haplotypes(rng, 37, 64, maf_low=0.1, maf_high=0.9)
    out = ld_block(jnp.asarray(G), jnp.asarray(G))
    mesh = make_mesh(8)
    for fn in (all_pairs_replicated, all_pairs_ring):
        r2, dp = fn(G, mesh=mesh)
        np.testing.assert_allclose(
            np.asarray(r2), np.asarray(out["r_square"]), atol=1e-5
        )


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_trapezoid_matches_single_device(reference_case, n_dev):
    from ld_tools_tpu.parallel import all_pairs_trapezoid

    G, r2_ref, dp_ref = reference_case
    mesh = make_mesh(n_dev)
    r2, dp = all_pairs_trapezoid(G, mesh=mesh)
    # trapezoid zeroes the strict upper triangle; compare lower only
    tri = np.tril_indices(G.shape[0], 0)
    np.testing.assert_allclose(np.asarray(r2)[tri], r2_ref[tri], atol=1e-5)
    np.testing.assert_allclose(np.asarray(dp)[tri], dp_ref[tri], atol=1e-4)
    assert np.all(np.triu(np.asarray(r2), 1) == 0)


def test_trapezoid_ragged(reference_case):
    from ld_tools_tpu.parallel import all_pairs_trapezoid
    from ld_tools_tpu.ops.ld_math import ld_block

    rng = np.random.default_rng(99)
    G = random_haplotypes(rng, 53, 64, maf_low=0.1, maf_high=0.9)
    out = ld_block(jnp.asarray(G), jnp.asarray(G))
    r2, dp = all_pairs_trapezoid(G, mesh=make_mesh(4))
    tri = np.tril_indices(53, 0)
    np.testing.assert_allclose(
        np.asarray(r2)[tri], np.asarray(out["r_square"])[tri], atol=1e-5
    )
