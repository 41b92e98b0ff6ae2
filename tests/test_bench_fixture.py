"""The whole-genome bench fixture's LD structure, pinned.

`scripts/bench_suite._write_gb_fixture` cycles pre-encoded genotype
lines, so variants one cycle apart are IDENTICAL (r^2 == 1.0).  The wg
scan config depends on two properties checked here at miniature scale:
(a) `correlated=True` rows carry genuine LD-decay structure, and (b) a
scan whose distance window is SHORTER than the cycle's repeat distance
sees no degenerate duplicate pairs — its hit set matches a brute-force
oracle over the ingested matrix exactly.
"""

import os

import numpy as np

from ld_tools_tpu.ingest.vcf import iter_records
from ld_tools_tpu.ops.ld_stream import stream_threshold_scan
from scripts.bench_suite import _write_gb_fixture

from .oracle import oracle_ld


def test_wg_fixture_windowed_scan_matches_bruteforce(tmp_path):
    n_samples, n_base = 30, 64
    path = str(tmp_path / "9.vcf.gz")
    v, _ = _write_gb_fixture(
        path, "9", n_samples, 60_000, np.random.default_rng(3),
        n_base=n_base, correlated=True,
    )
    assert v >= 2 * n_base  # at least two full cycles on disk

    recs = list(iter_records(path))
    assert len(recs) == v
    G = np.vstack([r.genotypes for r in recs])
    pos = np.asarray([r.pos for r in recs], dtype=np.int64)

    # rows one cycle apart are identical by construction (spacing 50 bp
    # -> repeat distance n_base * 50); the window below excludes them
    np.testing.assert_array_equal(G[0], G[n_base])
    cycle_bp = n_base * 50
    max_dist = cycle_bp - 100

    hits = stream_threshold_scan(
        G[: 3 * n_base], pos=pos[: 3 * n_base], measure="r_square",
        thres=0.8, max_dist=max_dist, band=64, chunk=64,
        use_pallas=False, exact=True,
    )
    got = set(zip(hits.i.tolist(), hits.j.tolist()))
    expected = set()
    n = 3 * n_base
    for i in range(n):
        for j in range(i):
            if int(pos[i]) - int(pos[j]) > max_dist:
                continue
            if oracle_ld(list(G[i]), list(G[j]))["r_square"] >= 0.8:
                expected.add((i, j))
    assert got == expected
    # real LD structure survives the window, and no in-window pair spans
    # a full cycle (adjacent rows CAN be identical by chance at this tiny
    # haplotype count — that is the LD process, not the cycling artifact)
    assert got
    assert all(i - j < n_base for i, j in got)
