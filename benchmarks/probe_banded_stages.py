"""Shared-amps chip-side stage split for the banded engine at the
north star: prep+spread error vs post error, each against the f64
golden, with NO yardstick traps:

  - amps come from accuracy_northstar.engine_amps (the same device
    array the cached golden was built from — never recomputed by a
    second jit program whose ~1e-7/element fusion differences sum
    coherently into a fake 3.4e-6 floor; see run_banded's docstring)
  - everything runs on the default backend (the probe is meaningless
    if the golden cache was built from another backend's amps)

Rows are real f32 so they fetch cleanly over the axon tunnel
(complex64 transfers are UNIMPLEMENTED there, ROADMAP.md).

    PYTHONPATH=/root/repo python benchmarks/probe_banded_stages.py \
        [--nside 256] [--rank 32]
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
from probe_banded_post import host_post


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nside", type=int, default=256)
    ap.add_argument("--nchan", type=int, default=1024)
    ap.add_argument("--nbl-slice", type=int, default=8)
    ap.add_argument("--rank", type=int, default=32)
    ap.add_argument("--ktaps", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from prisim_tpu import twofloat as tf
    from prisim_tpu.engine import Instrument
    from prisim_tpu.engine.nufft_banded import (
        banded_spread_available, make_banded_plan, _prep,
        _banded_spread, _post)
    from prisim_tpu.engine.nufft_delay import (chebyshev_projection,
                                               spectral_project)

    prob = build_problem(nside=args.nside, nchan=args.nchan)
    bl = np.asarray(prob["inst"].bl_hi, np.float64) + \
        np.asarray(prob["inst"].bl_lo, np.float64)
    bl_idx, _ = baseline_slice(prob, args.nbl_slice)
    sh, sl, amps_np = engine_amps(prob)
    cache = "/tmp/acc_ns_golden_%d_%d_%d.npz" % (
        args.nside, args.nchan, args.nbl_slice)
    if os.path.exists(cache):
        Vg = np.load(cache)["Vg"]
    else:
        Vg, tg, n_up = golden_slice(prob, amps_np, bl_idx)
        np.savez(cache, Vg=Vg, tg=tg, n_up=int(n_up))

    inst = prob["inst"]
    bl64 = bl[bl_idx]
    inst_sl = Instrument.build(bl64, prob["freqs"],
                               latitude=inst.latitude)
    pinvQ, Q = chebyshev_projection(prob["freqs"], args.rank)
    kw = dict(K=args.ktaps) if args.ktaps else {}
    plan = make_banded_plan(bl64, inst_sl.nu0, inst_sl.dnu, args.nchan,
                            rank=args.rank, **kw)
    interp = not banded_spread_available()
    pch, pcl = tf.split_f64(prob["pc"])

    @jax.jit
    def stage_a(sh, sl, amps):
        seh, sel = tf.df_add(sh, sl, -jnp.asarray(pch)[None, :],
                             -jnp.asarray(pcl)[None, :])
        P = spectral_project(amps, pinvQ)
        u_h, u_l, P_r, ok = _prep(plan, seh, sel, P)
        rows = _banded_spread(plan, u_h, u_l, P_r, interpret=interp)
        return rows, ok

    @jax.jit
    def stage_b(rows):
        v = _post(plan, rows, Q, matmul_fft=not interp)
        return jnp.real(v), jnp.imag(v)

    t0 = time.perf_counter()
    rows_dev, ok = jax.block_until_ready(
        stage_a(sh, sl, jnp.asarray(amps_np)))
    t_spread = time.perf_counter() - t0
    vr, vi = jax.block_until_ready(stage_b(rows_dev))
    v_dev = np.asarray(vr) + 1j * np.asarray(vi)
    rows = np.asarray(jax.device_get(rows_dev))
    print(json.dumps({"ok": bool(np.asarray(jax.device_get(ok))),
                      "rows_shape": list(rows.shape),
                      "spread_sec": round(t_spread, 1),
                      "plan": dict(K=plan.K, G_blk=plan.G_blk,
                                   T_s=plan.T_s, rank=plan.rank)}))

    v_h64 = host_post(plan, rows, Q, np.float64)
    scale = np.abs(Vg).max()
    for name, V in (("full_engine", v_dev),
                    ("spread_only_host_f64_post", v_h64)):
        print(json.dumps({
            "variant": name,
            "rel_max_scaled": float(np.abs(V - Vg).max() / scale)}))
    print(json.dumps({
        "variant": "device_post_vs_host_f64_same_rows",
        "rel_max_scaled": float(np.abs(v_dev - v_h64).max() / scale)}))


if __name__ == "__main__":
    main()
