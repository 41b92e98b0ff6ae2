#!/usr/bin/env python3
"""Component-measured multi-chip scaling model (VERDICT r4 next #8).

Multi-chip hardware does not exist in this environment (one relayed
chip), so the >=85%-at-2-hosts BASELINE target cannot be benchmarked
directly.  What CAN be measured on the real chip is every component a
multi-chip chromosome scan is built from:

  - per-dispatch latency (chained, so relay memoization can't lie);
  - host->device and device->host bandwidth;
  - the fused count kernel's device rate and per-call fixed cost;
  - the scan's host-side phase costs (N-independent).

This script measures those, then composes the streamed-scan cost model

  T(N) = upload(N) + count(N) + fetch(N) + host
    upload(N): replicated G — N uploads through one relay link, or one
               broadcast-capable upload on direct-attached hosts;
    count(N):  pairs / (N * device_rate) + ceil(blocks / (cap * N)) *
               dispatch (each device's block slice dispatches in
               parallel; the tile-sharded engine issues ONE program);
    fetch(N):  hit bytes / d2h + one dispatch (hits are tile-sharded;
               transfer is the same total bytes regardless of N);
    host:      prep + finish, unchanged by N

and prints predicted 2/4/8-chip efficiency under BOTH link models with
every assumption stated.  Writes SCALING_MODEL_rNN.json for docs/
SCALING.md.  Falsifiable: the day real multi-chip hardware exists, run
`ld_scan --devices all` on config 4 and compare.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _chain_median(fn, x0, n=7):
    """Median latency of fn chained by data dependency (the relay
    memoizes identical calls; chaining defeats that)."""
    import jax

    xs = [x0]
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        xs.append(jax.block_until_ready(fn(xs[-1])))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts[1:]))  # drop the compile call


def measure():
    import jax
    import jax.numpy as jnp

    out = {"backend": jax.default_backend(),
           "device": str(jax.devices()[0])}

    # --- dispatch latency: trivial chained add ---
    f = jax.jit(lambda x: x + 1)
    out["dispatch_s"] = _chain_median(f, jnp.zeros((8, 128), jnp.float32))

    # --- H2D: chr21-scale packed matrix (64 MB) ---
    h2d_bytes = 64 << 20
    host = np.random.default_rng(0).integers(
        0, 255, size=(h2d_bytes,), dtype=np.uint8
    )
    ts = []
    for k in range(3):
        host[0] = k  # defeat memoization
        t0 = time.perf_counter()
        jax.block_until_ready(jnp.asarray(host))
        ts.append(time.perf_counter() - t0)
    out["h2d_MBps"] = h2d_bytes / float(np.median(ts)) / 1e6

    # --- D2H: 8 MB result pull ---
    d = jnp.asarray(np.zeros((8 << 20,), dtype=np.uint8))
    g = jax.jit(lambda x, s: x + s)
    ts = []
    for k in range(3):
        dd = jax.block_until_ready(g(d, jnp.uint8(k)))
        t0 = time.perf_counter()
        np.asarray(dd)
        ts.append(time.perf_counter() - t0)
    out["d2h_MBps"] = d.nbytes / float(np.median(ts)) / 1e6

    # --- fused count kernel: device rate + per-call fixed cost ---
    from ld_tools_tpu.ops.ld_pallas import (
        ld_band_count,
        pack_block_coords,
    )

    V, H = 10240, 5120
    rng = np.random.default_rng(1)
    G = (rng.random((V, H)) < 0.3).astype(np.int8)
    c1 = G.astype(np.float32).sum(axis=1, keepdims=True)
    p = c1 / H
    pq = p * (1 - p)
    ipq = np.where(pq == 0, 0, 1 / np.where(pq == 0, 1, pq)).astype(
        np.float32
    )
    pos = np.arange(V, dtype=np.int32) * 500
    g_dev = jnp.asarray(G)
    c1_dev = jnp.asarray(c1)
    ipq_dev = jnp.asarray(ipq)
    pos_dev = jnp.asarray(pos)
    pi = jnp.asarray([H, 0], dtype=jnp.int32)
    pf_arr = jnp.asarray([0.7995], dtype=jnp.float32)
    nb = V // 640

    def count_call(bi_l, bj_l, salt):
        cij = jnp.asarray(pack_block_coords(bi_l, bj_l))
        return ld_band_count(
            g_dev, c1_dev, ipq_dev, pos_dev, cij, pi,
            pf_arr + jnp.float32(salt * 1e-7), packed=False, sel=0,
            exact_mask=True, use_dist=False, block_m=640, block_n=640,
        )

    tri = [(i, j) for i in range(nb) for j in range(i + 1)]
    big_bi = [t[0] for t in tri]
    big_bj = [t[1] for t in tri]
    # pad to power of two like the scan does
    tgt = 1 << (len(tri) - 1).bit_length()
    big_bi += [0] * (tgt - len(tri))
    big_bj += [0] * (tgt - len(tri))
    # warm both shapes
    jax.block_until_ready(count_call(big_bi, big_bj, 0))
    jax.block_until_ready(count_call([0], [0], 0))
    ts_big, ts_one = [], []
    for k in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(count_call(big_bi, big_bj, k + 1))
        ts_big.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(count_call([0], [0], k + 1))
        ts_one.append(time.perf_counter() - t0)
    t_big = float(np.median(ts_big))
    t_one = float(np.median(ts_one))
    pairs_big = len(tri) * 640 * 640
    out["count_call_fixed_s"] = t_one
    out["count_device_gpairs_s"] = pairs_big / max(t_big - t_one, 1e-9) / 1e9
    out["count_blocks_measured"] = len(tri)
    return out


def model(meas, *, v=102400, h=5008, hits=2_000_000, cap=98304,
          direct=False):
    """Predicted streamed-scan phase times for 1/2/4/8 chips.

    direct=False: this environment's relay (one serialized link — N
    replicated uploads pay N transfers).  direct=True: direct-attached
    hosts (PCIe per chip, ~8 GB/s H2D, ~8 GB/s D2H, ~50 us dispatch) —
    the deployment target's numbers, stated, not measured here.
    """
    if direct:
        h2d = 8e9 / 1e6
        d2h = 8e9 / 1e6
        disp = 50e-6
    else:
        h2d = meas["h2d_MBps"]
        d2h = meas["d2h_MBps"]
        disp = meas["dispatch_s"]
    rate = meas["count_device_gpairs_s"] * 1e9
    fixed = meas["count_call_fixed_s"] if not direct else disp * 2
    g_bytes = v * (h // 8)  # bitpacked wire format
    pairs = v * (v - 1) / 2
    blocks = (v / 640) ** 2 / 2
    hit_bytes = hits * 12  # i, j (packed int32) + int16 cab + padding
    # N-independent host work, scaled from measured chr21 phase stats:
    # prep ~O(V) padding/popcounts, finish ~O(hits) exact f64
    host_s = 0.15 + (v / 102400) * 0.2 + (hits / 2e6) * 0.15
    rows = {}
    for n in (1, 2, 4, 8):
        upload = g_bytes / 1e6 / h2d * (1 if direct else n)
        count = pairs / (rate * n) + np.ceil(blocks / (cap * n)) * fixed
        fetch = hit_bytes / 1e6 / d2h + (fixed if not direct else disp)
        total = upload + count + fetch + host_s
        rows[n] = {
            "upload_s": round(upload, 3),
            "count_s": round(count, 3),
            "fetch_s": round(fetch, 3),
            "host_s": host_s,
            "total_s": round(total, 3),
        }
    t1 = rows[1]["total_s"]
    for n, r in rows.items():
        r["efficiency"] = round(t1 / (n * r["total_s"]), 3)
    # warm variant: resident cache holds G, upload drops out entirely
    warm = {}
    for n, r in rows.items():
        wt = r["count_s"] + r["fetch_s"] + r["host_s"]
        warm[n] = {"total_s": round(wt, 3)}
    wt1 = warm[1]["total_s"]
    for n, r in warm.items():
        r["efficiency"] = round(wt1 / (n * r["total_s"]), 3)
    return {"cold": rows, "warm_resident": warm}


def model_multihost(meas, *, v=102400, h=5008, hits=2_000_000,
                    cap=98304):
    """Cooperative multi-process scan, one host per chip (the actual
    pod-slice deployment, tests/test_distributed.py topology): each
    host uploads its own replica over its OWN link (parallel), counts
    and fetches only its tile slice, finishes only its own hits, and
    the full sets meet in one allgather.  Unlike the single-host model,
    fetch and finish SCALE — only host prep (padding/popcounts) and
    the allgather replicate.  Direct-attached link numbers (8 GB/s
    PCIe, 50 us dispatch, 3 GB/s DCN for the allgather)."""
    h2d = 8e9
    d2h = 8e9
    dcn = 3e9
    disp = 50e-6
    rate = meas["count_device_gpairs_s"] * 1e9
    fixed = disp * 2
    g_bytes = v * (h // 8)
    pairs = v * (v - 1) / 2
    blocks = (v / 640) ** 2 / 2
    hit_bytes = hits * 12
    prep = 0.15 + (v / 102400) * 0.2    # replicated per process
    finish = (hits / 2e6) * 0.15        # shards with the hits
    out = {}
    for phase, with_upload in (("cold", True), ("warm_resident", False)):
        rows = {}
        for n in (1, 2, 4, 8):
            upload = (g_bytes / h2d if with_upload else 0.0)
            count = pairs / (rate * n) + np.ceil(
                blocks / (cap * n)
            ) * fixed
            fetch = hit_bytes / n / d2h + disp
            host = (prep if with_upload else 0.0) + finish / n
            gather = hit_bytes / dcn if n > 1 else 0.0
            rows[n] = {
                "total_s": round(upload + count + fetch + host + gather,
                                 4),
            }
        t1 = rows[1]["total_s"]
        for n, r in rows.items():
            r["efficiency"] = round(t1 / (n * r["total_s"]), 3)
        out[phase] = rows
    return out


def batch_model(n_chroms=24):
    """Data-parallel whole-genome batch (the reference's actual
    multi-file workload, one chromosome per worker —
    parallel/batch.py): share-nothing, so efficiency is pure
    load-balance: (n_chroms / N) / ceil(n_chroms / N)."""
    rows = {}
    for n in (1, 2, 4, 8):
        rows[n] = {
            "efficiency": round(
                (n_chroms / n) / -(-n_chroms // n) / 1.0, 3
            )
        }
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--measured", default=None,
                    help="reuse a prior artifact's measured block "
                         "instead of re-measuring on hardware")
    args = ap.parse_args()
    if args.measured:
        with open(args.measured) as fh:
            meas = json.load(fh)["measured"]
    else:
        meas = measure()
    print(json.dumps(meas, indent=1))
    configs = {
        "chr21_scan": dict(v=102400, hits=2_000_000),
        "chr2_scan": dict(v=204_800, hits=4_000_000),
        "chr_800k_scan": dict(v=819_200, hits=16_000_000),
    }
    result = {"measured": meas, "models": {}}
    for cname, kw in configs.items():
        result["models"][cname] = {
            "relay": model(meas, direct=False, **kw),
            "direct": model(meas, direct=True, **kw),
            "multihost_direct": model_multihost(meas, **kw),
        }
    result["models"]["genome_batch_24chrom"] = {
        "any_link": {"cold": batch_model(24)},
        "note": "share-nothing chromosome-per-worker data parallelism "
                "(parallel/batch.py) — the reference's own multi-file "
                "workload shape; no replication, no collectives",
    }
    result["assumptions"] = {
        "configs": "V x 5008 haplotypes, thres 0.8 cooperative scan of "
                   "ONE chromosome; hits scale ~linearly with V here",
        "direct_link": "8 GB/s PCIe per host, 50 us dispatch, per-host "
                       "uploads overlap (each host feeds its own "
                       "chips); count-call fixed cost ~2 dispatches",
        "relay_link": "measured on this environment's serialized RPC "
                      "relay; N replicated uploads pay N transfers",
        "host_s": "0.5 s N-independent host prep+finish (phase stats, "
                  "BENCH_suite config 4); the Amdahl term that caps "
                  "small-chromosome cooperative efficiency",
        "not_modeled": "allgather of hits across processes (hit bytes "
                       "<< G bytes; rides ICI/DCN at link speed), "
                       "multi-host jax.distributed startup",
        "falsify": "run `ld_scan --devices all` on the config-4 "
                   "fixture on real multi-chip hardware and compare "
                   "phase stats",
    }
    for cname in configs:
        print(f"\n{cname}:")
        for link in ("relay", "direct", "multihost_direct"):
            for phase in ("cold", "warm_resident"):
                effs = {
                    n: float(
                        result["models"][cname][link][phase][n][
                            "efficiency"
                        ]
                    )
                    for n in (2, 4, 8)
                }
                print(f"  {link}/{phase}: eff {effs}")
    print("\ngenome_batch_24chrom (share-nothing): eff "
          + str({n: batch_model(24)[n]['efficiency'] for n in (2, 4, 8)}))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
