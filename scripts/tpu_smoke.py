#!/usr/bin/env python3
"""Real-TPU kernel smoke suite: compile + numerically check every
production Pallas configuration on actual hardware.

CI runs the kernels in interpret mode (correct but compiled by the
Pallas interpreter, not Mosaic), so the Mosaic-specific behavior the
tools rely on — the `_int8_k_chunk` scoped-VMEM budgets, the dense vs
bitplane lowerings, block-shape legality — is otherwise only exercised
implicitly by the benchmarks.  This script runs each configuration the
shipping tools/benches use, on small shapes but with the REAL haplotype
width (5,008 -> the production K dimension and K-chunking), and checks
the device results against a host-side f64 oracle.

Writes one JSON line per config and an artifact (--out TPU_SMOKE_rNN.json);
exits nonzero if any config fails to compile or mismatches.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = []


def host_oracle(G, n_hap):
    """f64 all-pairs r^2 / D' (reference op order, ops/exact.py semantics)."""
    Gf = G.astype(np.float64)
    c_ab = Gf @ Gf.T
    c1 = Gf.sum(axis=1)
    n = float(n_hap)
    p1 = c1 / n
    p_ab = c_ab / n
    d = p_ab - p1[:, None] * p1[None, :]
    q1 = 1.0 - p1
    dmax = np.where(
        d >= 0,
        np.minimum(p1[:, None] * q1[None, :], q1[:, None] * p1[None, :]),
        np.maximum(-p1[:, None] * p1[None, :], -q1[:, None] * q1[None, :]),
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        dp = np.where(dmax == 0, 0.0, d / dmax)
        denom = p1[:, None] * q1[:, None] * p1[None, :] * q1[None, :]
        r2 = np.where(denom == 0, 0.0, d * d / np.where(denom == 0, 1, denom))
    return r2, dp


def record(name, ok, seconds, max_err=None, note=""):
    rec = {
        "config": name,
        "ok": bool(ok),
        "seconds": round(seconds, 2),
    }
    if max_err is not None:
        rec["max_abs_err"] = float(f"{max_err:.3g}")
    if note:
        rec["note"] = note
    RESULTS.append(rec)
    print(json.dumps(rec), flush=True)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--v", type=int, default=1536)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ld_tools_tpu.ops.ld_pallas import (
        ld_band_sweep,
        ld_triangle_matrix,
        ld_triangle_matrix_packed,
        pack_rows,
    )

    backend = jax.default_backend()
    print(f"tpu_smoke backend={backend} devices={jax.devices()}", flush=True)
    if backend in ("cpu",):
        print("refusing to smoke on CPU: this suite exists to exercise "
              "Mosaic compilation on real hardware", flush=True)
        sys.exit(2)

    V, H = args.v, 5008
    rng = np.random.default_rng(0)
    freqs = rng.uniform(0.0, 1.0, size=(V, 1))
    G = (rng.random((V, H)) < freqs).astype(np.int8)
    G[0] = 0  # monomorphic rows exercise the sentinel branch
    G[1] = 1
    r2_o, dp_o = host_oracle(G, H)
    tril = np.tril_indices(V, -1)

    h_pad = -(-H // 128) * 128
    Gw = np.zeros((V, h_pad), dtype=np.uint8)
    Gw[:, :H] = G
    gp = pack_rows(Gw)

    failures = 0

    # --- triangle kernels: every (input, kernel, epilogue) the tools/bench use
    tri_cases = [
        ("tri_dense_exact_dp", dict(packed=False, epilogue="exact",
                                    want_dprime=True, block=512)),
        ("tri_dense_fast", dict(packed=False, epilogue="fast",
                                want_dprime=False, block=512)),
        ("tri_dense_fast_b640", dict(packed=False, epilogue="fast",
                                     want_dprime=False, block=640)),
        ("tri_packed_dense_exact_dp", dict(packed=True, kernel="dense",
                                           epilogue="exact", want_dprime=True,
                                           block=512)),
        ("tri_packed_dense_fast", dict(packed=True, kernel="dense",
                                       epilogue="fast", want_dprime=False,
                                       block=512)),
        ("tri_packed_bitplane_exact_dp", dict(packed=True, kernel="bitplane",
                                              epilogue="exact",
                                              want_dprime=True, block=512)),
        ("tri_packed_bitplane_fast", dict(packed=True, kernel="bitplane",
                                          epilogue="fast", want_dprime=False,
                                          block=512)),
    ]
    for name, cfg in tri_cases:
        t0 = time.time()
        try:
            if cfg["packed"]:
                r2, dp = ld_triangle_matrix_packed(
                    gp, H, kernel=cfg["kernel"], epilogue=cfg["epilogue"],
                    want_dprime=cfg["want_dprime"],
                    block_m=cfg["block"], block_n=cfg["block"],
                )
            else:
                r2, dp = ld_triangle_matrix(
                    jnp.asarray(G), H, epilogue=cfg["epilogue"],
                    want_dprime=cfg["want_dprime"], mxu_dtype=jnp.int8,
                    block_m=cfg["block"], block_n=cfg["block"],
                )
            r2 = np.asarray(r2)
            err = np.abs(r2[tril] - r2_o[tril]).max()
            if dp is not None:
                err = max(err, np.abs(np.asarray(dp)[tril] - dp_o[tril]).max())
            tol = 2e-5 if cfg["epilogue"] == "fast" else 5e-6
            ok = err <= tol
        except Exception as e:  # compile aborts are exactly what we hunt
            ok, err = False, None
            record(name, False, time.time() - t0,
                   note=f"{type(e).__name__}: {str(e)[:160]}")
            failures += 1
            continue
        failures += not record(name, ok, time.time() - t0, err)

    # --- band sweep: the streamed scan's count + fetch configurations
    band, chunk = 512, 1024
    v_band = -(-V // max(band, chunk)) * max(band, chunk)
    Gb = np.zeros((v_band, h_pad), dtype=np.int8)
    Gb[:V, :H] = G
    gpb = pack_rows(Gb.astype(np.uint8))
    c1 = Gb.astype(np.float32).sum(axis=1, keepdims=True)
    p = c1 / np.float32(H)
    pq = p * (1 - p)
    ipq = np.where(pq == 0, 0, 1 / np.where(pq == 0, 1, pq)).astype(np.float32)
    g_rows = jnp.asarray(Gb[:band])
    g_cols = jnp.asarray(Gb[:chunk])
    gp_rows = jnp.asarray(gpb[:band])
    gp_cols = jnp.asarray(gpb[:chunk])
    c1r, c1c = jnp.asarray(c1[:band]), jnp.asarray(c1[:chunk])
    ipqr, ipqc = jnp.asarray(ipq[:band]), jnp.asarray(ipq[:chunk])
    cab_o = G.astype(np.int64)[:band] @ G.astype(np.int64)[:chunk].T

    band_cases = [
        ("band_dense_count_r2", dict(packed=False, outs=("meas",), sel=0)),
        ("band_dense_count_dp", dict(packed=False, outs=("meas",), sel=1)),
        ("band_dense_fetch", dict(packed=False,
                                  outs=("meas", "r2", "dp", "cab"), sel=0)),
        ("band_packed_count_r2", dict(packed=True, outs=("meas",), sel=0)),
        ("band_packed_fetch", dict(packed=True,
                                   outs=("meas", "r2", "dp", "cab"), sel=0)),
    ]
    for name, cfg in band_cases:
        t0 = time.time()
        try:
            vals = ld_band_sweep(
                gp_rows if cfg["packed"] else g_rows,
                gp_cols if cfg["packed"] else g_cols,
                c1r, c1c, ipqr, ipqc, jnp.int32(H),
                packed=cfg["packed"], outs=cfg["outs"], sel=cfg["sel"],
                block_m=256, block_n=512,
            )
            nb, nc = min(band, V), min(chunk, V)
            meas = np.asarray(vals["meas"])[:nb, :nc]
            ref = (r2_o if cfg["sel"] == 0 else dp_o)[:nb, :nc]
            err = np.abs(meas - ref).max()
            ok = err <= 2e-5
            if "cab" in cfg["outs"]:
                cab = np.asarray(vals["cab"])[:nb, :nc].astype(np.int64)
                ok &= np.array_equal(cab, cab_o[:nb, :nc])
                err = max(err, float(np.abs(cab - cab_o[:nb, :nc]).max()))
        except Exception as e:
            record(name, False, time.time() - t0,
                   note=f"{type(e).__name__}: {str(e)[:160]}")
            failures += 1
            continue
        failures += not record(name, ok, time.time() - t0, err)

    out = {
        "meta": {"backend": backend, "devices": [str(d) for d in jax.devices()],
                 "v": V, "h": H},
        "results": RESULTS,
        "failures": failures,
    }
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"wrote {args.out}", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
