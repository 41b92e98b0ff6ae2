"""Multi-host execution proof: 2 REAL processes, one global mesh.

SURVEY.md §2b row 3 calls for multi-host data parallelism via
jax.distributed; this test actually runs it (no simulation): two
subprocesses join a localhost coordinator, each contributes 2 virtual CPU
devices, and the pair forms one 4-device global mesh with gloo CPU
collectives.  Exercised end-to-end:

- utils.distributed.initialize_if_needed from the standard env vars;
- parallel.batch.chromosomes_for_this_process round-robin split;
- one cross-process all_pairs_ring — lax.ppermute traffic crosses the
  process boundary every ring step.

On TPU pods the same code paths run unchanged over ICI/DCN (the mesh is
built from jax.devices() after initialization either way).
"""

import json
import os
import socket
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.environ["TPU_LD_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from ld_tools_tpu.utils.distributed import initialize_if_needed

assert initialize_if_needed(), "env-driven initialization must engage"
assert jax.process_count() == 2
assert len(jax.devices()) == 4, jax.devices()
assert len(jax.local_devices()) == 2

from ld_tools_tpu.parallel.batch import chromosomes_for_this_process

chroms = chromosomes_for_this_process(["1", "2", "3", "4", "5"])

from ld_tools_tpu.ops.ld_math import ld_block
from ld_tools_tpu.parallel.sweep import all_pairs_ring, make_mesh

rng = np.random.default_rng(0)
G = (rng.random((32, 40)) < 0.4).astype(np.int8)  # identical on every host
mesh = make_mesh()  # ALL 4 global devices -> bands span both processes
r2, dp = all_pairs_ring(G, mesh=mesh)

ref = ld_block(G, G)
ref_r2 = np.asarray(jax.device_put(ref["r_square"], jax.local_devices()[0]))
ref_dp = np.asarray(jax.device_put(ref["d_prime"], jax.local_devices()[0]))
checked = 0
for arr, ref_full in ((r2, ref_r2), (dp, ref_dp)):
    for shard in arr.addressable_shards:
        got = np.asarray(shard.data)
        want = ref_full[shard.index]
        # f32 fast path: last-ulp differences across differently-fused
        # XLA programs are expected; exact file outputs use ops/exact.py
        np.testing.assert_allclose(got, want, atol=2e-6, rtol=2e-6)
        checked += got.size

print(json.dumps({
    "pid": jax.process_index(),
    "nproc": jax.process_count(),
    "ndev": len(jax.devices()),
    "chroms": chroms,
    "checked": checked,
}), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_ring(tmp_path):
    # bounded by the workers' communicate(timeout=240) below
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            TPU_LD_REPO=_REPO,
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    results = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
            results.append(json.loads(out.strip().splitlines()[-1]))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert {r["pid"] for r in results} == {0, 1}
    assert all(r["nproc"] == 2 and r["ndev"] == 4 for r in results)
    assert all(r["checked"] == 2 * 2 * 8 * 32 for r in results)
    # round-robin chromosome split: disjoint, complete, balanced
    split = {r["pid"]: r["chroms"] for r in results}
    assert split[0] == ["1", "3", "5"]
    assert split[1] == ["2", "4"]
