#!/usr/bin/env python3
"""Sharded-scan scaling efficiency over a virtual device mesh.

Measures the tile-sharded streamed scan (ops/ld_stream.scan_mesh) and the
ring sweep (parallel/sweep.all_pairs_ring) at 1 -> 2 -> 4 -> 8 devices and
reports pairs/s + efficiency vs the 1-device run.

Honesty note: without multi-chip TPU hardware the mesh devices are
virtual CPU devices timesharing this host's physical cores, so ideal
scaling is capped at ~min(n_devices, n_cores) — the curve demonstrates
that the sharded path adds no pathological overhead as the mesh grows,
not real ICI scaling.  On a TPU pod slice the identical code paths run
with one chip per mesh device.

Writes one JSON line per mesh size and a markdown table to stdout; pass
--doc to also rewrite docs/SCALING.md.
"""

import argparse
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def _workload(v=4096, h=512, seed=0):
    rng = np.random.default_rng(seed)
    blk = 32
    base = (
        rng.random((v // blk, h)) < rng.uniform(0.05, 0.95, (v // blk, 1))
    ).astype(np.int8)
    G = np.repeat(base, blk, axis=0)
    G = np.where(rng.random(G.shape) < 0.03, 1 - G, G).astype(np.int8)
    pos = np.sort(rng.choice(10**8, size=v, replace=False)).astype(np.int64)
    return G, pos


def bench_scan(G, pos, n_devices, reps=3):
    from ld_tools_tpu.ops.ld_stream import scan_mesh, stream_threshold_scan

    kw = dict(
        pos=pos, measure="r_square", thres=0.8, band=512, chunk=1024,
        exact=False,
    )
    mesh = scan_mesh(n_devices) if n_devices > 1 else None
    stream_threshold_scan(G, mesh=mesh, **kw)  # warm the compile caches
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        hits = stream_threshold_scan(G, mesh=mesh, **kw)
        best = min(best, time.perf_counter() - t0)
    return best, len(hits.i)


def bench_ring(G, n_devices, reps=3):
    from ld_tools_tpu.parallel.sweep import all_pairs_ring, make_mesh

    mesh = make_mesh(n_devices)
    all_pairs_ring(G, mesh=mesh)[0].block_until_ready()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        all_pairs_ring(G, mesh=mesh)[0].block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--doc", action="store_true",
                        help="rewrite docs/SCALING.md")
    parser.add_argument("--v", type=int, default=4096)
    parser.add_argument("--h", type=int, default=512)
    args = parser.parse_args()

    G, pos = _workload(args.v, args.h)
    pairs = args.v * (args.v - 1) / 2
    rows = []
    base_scan = base_ring = None
    for n in (1, 2, 4, 8):
        t_scan, n_hits = bench_scan(G, pos, n)
        t_ring = bench_ring(G[: min(args.v, 2048)], n)
        if n == 1:
            base_scan, base_ring = t_scan, t_ring
        row = {
            "devices": n,
            "scan_s": round(t_scan, 3),
            "scan_gpairs_per_s": round(pairs / t_scan / 1e9, 3),
            "scan_speedup": round(base_scan / t_scan, 2),
            "scan_efficiency": round(base_scan / t_scan / n, 2),
            "ring_s": round(t_ring, 3),
            "ring_speedup": round(base_ring / t_ring, 2),
            "hits": int(n_hits),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    cores = os.cpu_count() or 1
    lines = [
        "# Sharded-scan scaling (virtual CPU mesh)",
        "",
        f"Workload: {args.v} variants x {args.h} haplotypes, all lower-"
        f"triangle pairs, r^2 >= 0.8 threshold scan (exact=False), plus a "
        f"{min(args.v, 2048)}-variant all_pairs_ring.",
        "",
        f"Host: {cores} physical cores; mesh devices are VIRTUAL "
        "(--xla_force_host_platform_device_count), so they timeshare the "
        f"cores and ideal scaling saturates at ~{cores}x. The table "
        "demonstrates the sharded paths add no pathological overhead as "
        "the mesh grows; real scaling numbers require a multi-chip pod "
        "slice, where these exact code paths run one chip per mesh device "
        "(tests/test_distributed.py proves the cross-process mesh path).",
        "",
        "| devices | scan s | scan Gpairs/s | scan speedup | scan eff | "
        "ring s | ring speedup |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['devices']} | {r['scan_s']} | {r['scan_gpairs_per_s']} "
            f"| {r['scan_speedup']}x | {r['scan_efficiency']} "
            f"| {r['ring_s']} | {r['ring_speedup']}x |"
        )
    table = "\n".join(lines) + "\n"
    print(table)
    if args.doc:
        doc = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "SCALING.md")
        with open(doc, "w") as fh:
            fh.write(table)
        print(f"wrote {doc}")


if __name__ == "__main__":
    main()
