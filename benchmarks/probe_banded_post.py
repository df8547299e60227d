"""Chip-side error isolation for the banded NUFFT: which stage loses
the north-star accuracy?

Runs the banded engine at the north-star shape (8-baseline slice, full
786k-source sky) three ways:
  a) all on device (prep + Pallas spread + device post)   — production
  b) device prep + spread, but POST (wrap + FFT + deconv + rank
     combine) recomputed on host in float64 from the fetched rows
  c) device prep + spread, host post in float32 (numpy)
and compares each against the f64 golden (cached by
accuracy_northstar). (a)-(b) separates spread error from post error;
(b)-(c) separates f32 rounding from the TPU FFT implementation.

    PYTHONPATH=/root/repo:/root/.axon_site python \
        benchmarks/probe_banded_post.py [--nside 256]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from accuracy_northstar import (build_problem, engine_amps,
                                golden_slice, baseline_slice)


def host_post(plan, rows, Qc, dtype):
    """_post re-implemented in numpy at the requested dtype."""
    B = rows.shape[0]
    r = plan.rank
    n = plan.n
    R = plan.R_max
    m = -(-R // n)
    gu = np.pad(rows.astype(dtype), ((0, 0), (0, m * n - R), (0, 0)))
    gw = gu.reshape(B, m, n, 2 * r).sum(axis=1)
    grid_c = gw[..., :r] + 1j * gw[..., r:]
    Gf = np.fft.fft(grid_c, axis=1)
    C = plan.nchan
    half = C // 2
    Gk = np.concatenate([Gf[:, n - half:, :], Gf[:, :C - half, :]],
                        axis=1)
    ramp = np.asarray(plan.ramp,
                      np.complex128 if dtype == np.float64
                      else np.complex64)
    Gk = Gk * ramp[:, :, None]
    dec = np.asarray(plan.deconv, dtype)[None, :, None]
    return np.einsum("bcr,cr->bc", Gk * dec, np.asarray(Qc, dtype))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nside", type=int, default=256)
    ap.add_argument("--nchan", type=int, default=1024)
    ap.add_argument("--nbl-slice", type=int, default=8)
    ap.add_argument("--ktaps", type=int, default=None)
    ap.add_argument("--compare-interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from prisim_tpu import twofloat as tf
    from prisim_tpu.beams import airy_beam
    from prisim_tpu.engine import Instrument
    from prisim_tpu.engine.nufft_banded import (
        banded_spread_available, make_banded_plan,
        make_banded_snapshot_fns)
    from prisim_tpu.engine.nufft_delay import chebyshev_projection

    prob = build_problem(nside=args.nside, nchan=args.nchan)
    bl = np.asarray(prob["inst"].bl_hi, np.float64) + \
        np.asarray(prob["inst"].bl_lo, np.float64)
    bl_idx, _ = baseline_slice(prob, args.nbl_slice)

    sh, sl, amps_np = engine_amps(prob)
    cache = "/tmp/acc_ns_golden_%d_%d_%d.npz" % (
        args.nside, args.nchan, args.nbl_slice)
    if os.path.exists(cache):
        z = np.load(cache)
        Vg = z["Vg"]
    else:
        Vg, _, _ = golden_slice(prob, amps_np, bl_idx)

    inst = prob["inst"]
    bl64 = bl[bl_idx]
    inst_sl = Instrument.build(bl64, prob["freqs"],
                               latitude=inst.latitude)
    pinvQ, Q = chebyshev_projection(prob["freqs"], 24)
    kw = dict(K=args.ktaps) if args.ktaps else {}
    plan = make_banded_plan(bl64, inst_sl.nu0, inst_sl.dnu, args.nchan,
                            rank=24, **kw)
    interp = not banded_spread_available()
    run = make_banded_snapshot_fns(
        inst_sl, prob["sky"], lambda s, f: airy_beam(s, f, 14.0),
        plan, pinvQ, Q, interpret=interp)
    assert run.n_chunks == 1, (
        "stage isolation needs the unchunked 3-stage path; lower "
        "--nbl-slice (n_chunks=%d)" % run.n_chunks)
    prep, spread, post = run.stages
    Mh, Ml = tf.split_f64(prob["M64"])
    pch, pcl = tf.split_f64(prob["pc"])
    margs = (jnp.asarray(Mh), jnp.asarray(Ml), jnp.asarray(pch),
             jnp.asarray(pcl))
    u_h, u_l, P_r, ok = prep(*margs, *run.sky_args)
    rows_dev = spread(u_h, u_l, P_r)
    _vp = post(rows_dev)
    v_dev = np.asarray(jnp.real(_vp)) + 1j * np.asarray(jnp.imag(_vp))
    rows = np.asarray(jax.device_get(rows_dev))
    print(json.dumps({"ok": bool(np.asarray(jax.device_get(ok))),
                      "rows_shape": list(rows.shape),
                      "plan": dict(K=plan.K, G_blk=plan.G_blk,
                                   T_s=plan.T_s)}))

    v_h64 = host_post(plan, rows, Q, np.float64)
    v_h32 = host_post(plan, rows, Q, np.float32)
    scale = np.abs(Vg).max()
    for name, V in (("device_post", v_dev), ("host_post_f64", v_h64),
                    ("host_post_f32", v_h32)):
        print(json.dumps({
            "variant": name,
            "rel_max_scaled": float(np.abs(V - Vg).max() / scale)}))
    # and device-post vs host-f64-post on the SAME rows: pure post error
    print(json.dumps({
        "variant": "device_post_vs_host_f64_same_rows",
        "rel_max_scaled": float(np.abs(v_dev - v_h64).max() / scale)}))

    if args.compare_interpret:
        # Recompute the SAME spread in interpret mode (XLA f32
        # semantics) from the same device (u, P) inputs: the row-diff
        # magnitude distinguishes a bf16-class Mosaic dot (~2e-3
        # relative) from f32 rounding (~1e-7)
        from prisim_tpu.engine.nufft_banded import _banded_spread
        rows_int = np.asarray(jax.device_get(_banded_spread(
            plan, jnp.asarray(jax.device_get(u_h)),
            jnp.asarray(jax.device_get(u_l)),
            jnp.asarray(jax.device_get(P_r)), interpret=True)))
        d = np.abs(rows - rows_int)
        rn = max(float(np.abs(rows_int).max()), 1e-30)
        print(json.dumps({
            "variant": "chip_rows_vs_interpret_rows",
            "rel_max_vs_rowmax": float(d.max() / rn),
            "rel_rms": float(np.sqrt((d ** 2).mean())
                             / np.sqrt((rows_int ** 2).mean()))}))
        v_hi = host_post(plan, rows_int, Q, np.float64)
        print(json.dumps({
            "variant": "interpret_rows_host_f64_post",
            "rel_max_scaled": float(np.abs(v_hi - Vg).max() / scale)}))


if __name__ == "__main__":
    main()
