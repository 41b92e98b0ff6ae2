"""The multi-chip scaling model reproduces its published artifact.

`SCALING_MODEL_r05.json` is evidence for the >=85%-at-2-hosts BASELINE
target (structurally unbenchmarkable on one chip).  This pins the
model's provenance: feeding the artifact's recorded `measured` block
back through `scripts/scaling_model.model*` must regenerate the
artifact's prediction tables exactly — the published numbers are pure
functions of the measurements, not hand-edits.
"""

import json
import os

import pytest

from scripts.scaling_model import batch_model, model, model_multihost

_ART = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "SCALING_MODEL_r05.json")

_CFGS = {
    "chr21_scan": dict(v=102400, hits=2_000_000),
    "chr2_scan": dict(v=204_800, hits=4_000_000),
    "chr_800k_scan": dict(v=819_200, hits=16_000_000),
}


def _intkeys(rows):
    return {int(k): v for k, v in rows.items()}


@pytest.fixture(scope="module")
def artifact():
    with open(_ART) as fh:
        return json.load(fh)


def test_model_reproduces_artifact(artifact):
    meas = artifact["measured"]
    for name, kw in _CFGS.items():
        pub = artifact["models"][name]
        for link, fn in (
            ("relay", lambda: model(meas, direct=False, **kw)),
            ("direct", lambda: model(meas, direct=True, **kw)),
            ("multihost_direct", lambda: model_multihost(meas, **kw)),
        ):
            got = fn()
            want = {ph: _intkeys(rows) for ph, rows in pub[link].items()}
            assert got == want, f"{name}/{link} diverged from artifact"


def test_batch_model_load_balance(artifact):
    pub = artifact["models"]["genome_batch_24chrom"]["any_link"]["cold"]
    assert batch_model(24) == _intkeys(pub)
    # share-nothing: 24 chromosomes over 8 workers = 3 each, perfect
    assert batch_model(24)[8]["efficiency"] == 1.0


def test_efficiency_normalization(artifact):
    # every table's 1-chip efficiency is exactly 1.0 by construction
    for name in _CFGS:
        pub = artifact["models"][name]
        for link in ("relay", "direct", "multihost_direct"):
            for phase_rows in pub[link].values():
                assert phase_rows["1"]["efficiency"] == 1.0
