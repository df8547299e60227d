"""Attribute the banded shared-amps gate residual (round 5).

The north-star e2e and BASELINE config #3 both demote on the banded
gate (rel = 3.89e-5 / 2.77e-5 > 2e-6) even though the bench
(accuracy_northstar --truth-amps --golden f64amps) measures the banded
engine at 1.28e-6 and the XLA direct at 3.57e-6 vs the f64 truth —
triangle inequality says their difference cannot exceed ~5e-6, so the
gate must be comparing something the bench doesn't.

Stage 1 (this script, run with --run): drive the real driver gate at a
reduced scale with PRISIM_DEBUG_XCHECK_DUMP, capturing direct0/banded0
AND the sky arrays.

Stage 2 (--analyze): host-f64 references from the dump:

  T_model = f64 NUDFT of the f64 rank-r node-model amps
            (truth mode: BOTH gate sides should match this to their
            transform floor)

reporting |direct0-T|, |banded0-T|, |direct0-banded0| scaled, per
baseline — whichever side deviates is the culprit.

    PYTHONPATH=/root/repo:/root/.axon_site python \
        benchmarks/probe_gate_budget.py --run [--nside 64] [--nchan 256]
    ... --analyze /tmp/gate_dump.npz
"""

import argparse
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run(nside, nchan, dnu, dump):
    from prisim_tpu.config import load_parms
    from prisim_tpu.driver import run_simulation
    os.environ["PRISIM_DEBUG_XCHECK_DUMP"] = dump
    root = "/tmp/probe_gate_budget"
    shutil.rmtree(root, ignore_errors=True)
    parms = load_parms({
        "dirstruct": {"rootdir": root, "project": "p"},
        "telescope": {"id": "hera", "latitude": -30.7224,
                      "A_eff": 154.0, "eff_Q": 0.96, "Trx": 100.0},
        "array": {"layout": "HERA-37", "redundant": True},
        "antenna": {"shape": "dish", "size": 14.0},
        "bandpass": {"freq": 150e6, "freq_resolution": dnu,
                     "nchan": nchan},
        "obsparm": {"obs_mode": "drift", "n_acc": 1, "t_acc": 60.0},
        "pointing": {"lst_init": 0.0},
        "skyparm": {"model": "usm", "nside": nside},
        "processing": {"engine": "nufft", "nufft_spread": "banded"},
        "save_formats": {"fmt": "HDF5", "npz": False},
    })
    try:
        run_simulation(parms, verbose=True, save=False)
    except Exception as exc:          # demotion may re-run direct; fine
        print("run ended:", str(exc)[:120])


def bessel_j1_np(x):
    from prisim_tpu.beams.analytic import _J1_CHEB
    ax = np.abs(x)
    t = x * x / 32.0 - 1.0
    small = x * np.polynomial.chebyshev.chebval(t, _J1_CHEB)
    z = 8.0 / np.maximum(ax, 1e-20)
    y2 = z * z
    p1 = 1.0 + y2 * (0.183105e-2 + y2 * (-0.3516396496e-4
         + y2 * (0.2457520174e-5 + y2 * (-0.240337019e-6))))
    p2 = 0.04687499995 + y2 * (-0.2002690873e-3 + y2 * (0.8449199096e-5
         + y2 * (-0.88228987e-6 + y2 * 0.105787412e-6)))
    xx = ax - 2.356194491
    big = np.sqrt(0.636619772 / np.maximum(ax, 1e-20)) * \
        (np.cos(xx) * p1 - z * np.sin(xx) * p2) * np.sign(x)
    return np.where(ax < 8.0, small, big)


def airy_power_np(s, freqs, diameter):
    """f64 zenith Airy power, horizon-masked outside."""
    from prisim_tpu import constants as CNST
    sin_t = np.sqrt(np.clip(s[:, 0] ** 2 + s[:, 1] ** 2, 0.0, 1.0))
    x = (np.pi * diameter / CNST.c) * np.outer(sin_t, freqs)
    small = np.abs(x) < 1e-6
    xs = np.where(small, 1.0, x)
    e = np.where(small, 1.0 - x * x / 8.0, 2.0 * bessel_j1_np(xs) / xs)
    return e * e


def analyze(path):
    from prisim_tpu import constants as CNST
    from prisim_tpu.engine.nufft_delay import chebyshev_node_model
    z = np.load(path)
    direct0 = z["direct0"]
    banded0 = z["fast0"]
    freqs = np.asarray(z["freqs"], np.float64)
    bl = np.asarray(z["bl"], np.float64)
    rank = int(z["rank"])
    truth_on = bool(z["truth_on"])
    M = np.asarray(z["Mh0"], np.float64) + np.asarray(z["Ml0"],
                                                      np.float64)
    pc = np.asarray(z["pch0"], np.float64) + np.asarray(z["pcl0"],
                                                        np.float64)
    s_eq = np.asarray(z["s_eq_hi"], np.float64) + \
        np.asarray(z["s_eq_lo"], np.float64)
    s = s_eq @ M.T
    up = s[:, 2] > 0.0
    print(json.dumps({"truth_on": truth_on, "rank": rank,
                      "resid0": float(z["resid0"]),
                      "nsrc_up": int(up.sum()),
                      "nbl": int(bl.shape[0]),
                      "nchan": int(freqs.size)}))

    nm = chebyshev_node_model(freqs, rank)
    # f64 model amps: beam(nodes) x flux(nodes) -> coeffs -> channels
    beam_n = airy_power_np(s, np.asarray(nm.nu_nodes, np.float64), 14.0)
    if truth_on:
        flux_n = np.asarray(z["flux_nodes"], np.float64)
    else:
        # flat USM: node flux equals the per-channel table row 0
        flux_n = np.repeat(np.asarray(z["flux"], np.float64)[:, :1],
                           rank, axis=1)
    amps_n = np.where(up[:, None], beam_n * flux_n, 0.0)
    P64 = amps_n @ np.asarray(nm.node2coef64, np.float64)     # (S, r)
    A64 = P64 @ np.asarray(nm.Q64, np.float64).T              # (S, C)

    # f64 NUDFT on the up-sources
    se = s[up] - pc[None, :]
    A = A64[up]
    V = np.zeros((bl.shape[0], freqs.size), np.complex128)
    for i0 in range(0, A.shape[0], 4096):
        sl_ = slice(i0, min(i0 + 4096, A.shape[0]))
        tau = se[sl_] @ bl.T / CNST.c                         # (s, B)
        ph = np.exp(-2j * np.pi * tau[:, :, None] *
                    freqs[None, None, :])
        V += np.einsum("sc,sbc->bc", A[sl_], ph)
    scale = np.abs(V).max()

    def rep(name, X, Y):
        d = np.abs(X - Y)
        i = np.unravel_index(int(d.argmax()), d.shape)
        print(json.dumps({
            "cmp": name, "rel_max_scaled": float(d.max() / scale),
            "argmax_bl": int(i[0]), "argmax_chan": int(i[1]),
            "bl_len_m": float(np.linalg.norm(bl[i[0]])),
            "rel_p99": float(np.percentile(d / scale, 99))}))

    rep("direct_vs_Tmodel", direct0, V)
    rep("banded_vs_Tmodel", banded0, V)
    rep("direct_vs_banded", direct0, banded0)
    # per-baseline profile of the top-8 worst rows of each comparison
    for name, X in (("direct", direct0), ("banded", banded0)):
        row = np.abs(X - V).max(axis=1) / scale
        worst = np.argsort(row)[::-1][:8]
        print(json.dumps({
            "rows": name,
            "worst": [[int(b), float(np.linalg.norm(bl[b])),
                       float(row[b])] for b in worst]}))


def standalone(path, nbl_sub=6, beta=2.0, ktaps=9, dot_split=1,
               seed_rows=(0, 29, 30)):
    """Re-run the banded TRUTH engine standalone on the dump's inputs
    (worst gate rows + a few more), CPU-interpret or TPU, and compare
    vs the f64 node-model transform — validates engine fixes (beta,
    K, dot_split) without re-driving the full gate."""
    import jax
    import jax.numpy as jnp
    from prisim_tpu import constants as CNST
    from prisim_tpu import twofloat as tf
    from prisim_tpu.engine.nufft_banded import (
        make_banded_plan, make_coeff_fn_truth, _prep, _banded_spread,
        _post, banded_spread_available)
    from prisim_tpu.engine.nufft_delay import (chebyshev_projection,
                                               chebyshev_node_model)
    from prisim_tpu.beams.analytic import airy_beam_df

    z = np.load(path)
    freqs = np.asarray(z["freqs"], np.float64)
    bl_all = np.asarray(z["bl"], np.float64)
    rank = int(z["rank"])
    rows = sorted(set(list(seed_rows))
                  | set(range(min(nbl_sub, bl_all.shape[0]))))
    bl = bl_all[rows]
    nchan = freqs.size
    dnu = freqs[1] - freqs[0]
    plan = make_banded_plan(bl, freqs[0], dnu, nchan, rank=rank,
                            beta=beta, K=ktaps, dot_split=dot_split)
    interp = not banded_spread_available()
    _, Q = chebyshev_projection(freqs, rank)
    Q_j = jnp.asarray(Q, jnp.float32)
    cf = make_coeff_fn_truth(freqs, rank,
                             lambda a, b, f: airy_beam_df(a, b, f, 14.0))
    nm = cf.node_model
    M = np.asarray(z["Mh0"], np.float64) + np.asarray(z["Ml0"],
                                                      np.float64)
    pc = np.asarray(z["pch0"], np.float64) + np.asarray(z["pcl0"],
                                                        np.float64)
    s_eq = np.asarray(z["s_eq_hi"], np.float64) + \
        np.asarray(z["s_eq_lo"], np.float64)
    s64 = s_eq @ M.T
    up = s64[:, 2] > 0.0
    sh, sl = tf.split_f64(s64)
    flux_n = np.asarray(z["flux_nodes"], np.float64)
    fnh, fnl = tf.split_f64(flux_n)
    pch, pcl = tf.split_f64(pc)

    @jax.jit
    def banded(sh, sl, fnh, fnl):
        seh, sel = tf.df_add(sh, sl, -jnp.asarray(pch)[None, :],
                             -jnp.asarray(pcl)[None, :])
        Ph, Pl = cf(sh, sl, fnh, fnl)
        u_h, u_l, P_r, ok = _prep(plan, seh, sel, Ph)
        v = _post(plan, _banded_spread(plan, u_h, u_l, P_r,
                                       interpret=interp),
                  Q_j, matmul_fft=not interp)
        Pl_r = jnp.transpose(jnp.asarray(Pl, jnp.float32))
        v = v + _post(plan, _banded_spread(plan, u_h, u_l, Pl_r,
                                           interpret=interp),
                      Q_j, matmul_fft=not interp)
        return jnp.real(v), jnp.imag(v), ok

    vr, vi, ok = jax.block_until_ready(
        banded(jnp.asarray(sh), jnp.asarray(sl), jnp.asarray(fnh),
               jnp.asarray(fnl)))
    V = np.asarray(vr).astype(np.float64) + \
        1j * np.asarray(vi).astype(np.float64)

    # f64 model-amps NUDFT on the same rows
    beam_n = airy_power_np(s64, np.asarray(nm.nu_nodes, np.float64),
                           14.0)
    amps_n = np.where(up[:, None], beam_n * flux_n, 0.0)
    P64 = amps_n @ np.asarray(nm.node2coef64, np.float64)
    A64 = (P64 @ np.asarray(nm.Q64, np.float64).T)[up]
    se = s64[up] - pc[None, :]
    T = np.zeros((bl.shape[0], nchan), np.complex128)
    for i0 in range(0, A64.shape[0], 4096):
        sl_ = slice(i0, min(i0 + 4096, A64.shape[0]))
        tau = se[sl_] @ bl.T / CNST.c
        ph = np.exp(-2j * np.pi * tau[:, :, None] *
                    freqs[None, None, :])
        T += np.einsum("sc,sbc->bc", A64[sl_], ph)
    scale = np.abs(T).max()
    # normalize ALSO by the full-array gate scale so numbers are
    # comparable with --analyze (gate rel = max|diff| / max|direct0|)
    scale_full = float(np.abs(z["direct0"]).max())
    d = np.abs(V - T) / scale
    i = np.unravel_index(int(d.argmax()), d.shape)
    edge = max(float(d[:, 0].max()), float(d[:, -1].max()))
    dg = float(np.abs(V - z["fast0"][rows]).max())
    # attribute BOTH gate sides on these rows against the f64 truth
    dd = np.abs(z["direct0"][rows] - T)
    db = np.abs(z["fast0"][rows] - T)
    print(json.dumps({
        "standalone": True, "platform": jax.devices()[0].platform,
        "beta": beta, "K": ktaps, "dot_split": dot_split,
        "rows": rows, "ok": bool(np.asarray(ok)),
        "rel_max_scaled": float(d.max()),
        "rel_max_fullscale": float(np.abs(V - T).max() / scale_full),
        "vs_gate_banded0_fullscale": dg / scale_full,
        "gate_direct_vs_T_fullscale": float(dd.max() / scale_full),
        "gate_banded_vs_T_fullscale": float(db.max() / scale_full),
        "scale_subset": float(scale), "scale_full": scale_full,
        "argmax_row": int(i[0]), "argmax_chan": int(i[1]),
        "edge_max": edge,
        "interior_max": float(d[:, 8:-8].max())}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", action="store_true")
    ap.add_argument("--analyze", default=None)
    ap.add_argument("--standalone", default=None,
                    help="dump path: re-run the banded truth engine "
                         "standalone on its inputs")
    ap.add_argument("--nside", type=int, default=64)
    ap.add_argument("--nchan", type=int, default=256)
    ap.add_argument("--dnu", type=float, default=390625.0)
    ap.add_argument("--beta", type=float, default=2.0)
    ap.add_argument("--ktaps", type=int, default=9)
    ap.add_argument("--dot-split", type=int, default=1)
    ap.add_argument("--nbl-sub", type=int, default=6)
    ap.add_argument("--rows", default=None,
                    help="comma-separated explicit row indices for "
                         "--standalone (overrides seed rows)")
    ap.add_argument("--worst", default=None,
                    help="dump path: print the top rows by "
                         "|direct0 - fast0| (no truth compute)")
    ap.add_argument("--dump", default="/tmp/gate_dump.npz")
    args = ap.parse_args()
    if args.worst:
        z = np.load(args.worst)
        d = np.abs(z["direct0"] - z["fast0"])
        scale = float(np.abs(z["direct0"]).max())
        row = d.max(axis=1) / scale
        bl = np.asarray(z["bl"], np.float64)
        worst = np.argsort(row)[::-1][:12]
        ch = [int(d[b].argmax()) for b in worst]
        print(json.dumps({"gate_rel": float(row.max()),
                          "worst_rows": [
            [int(b), float(np.linalg.norm(bl[b])), float(row[b]), c]
            for b, c in zip(worst, ch)]}))
    if args.run:
        run(args.nside, args.nchan, args.dnu, args.dump)
    if args.analyze:
        analyze(args.analyze)
    if args.standalone:
        sr = (0, 29, 30)
        nbl_sub = args.nbl_sub
        if args.rows:
            sr = tuple(int(r) for r in args.rows.split(","))
            nbl_sub = 0
        standalone(args.standalone, nbl_sub=nbl_sub,
                   beta=args.beta, ktaps=args.ktaps,
                   dot_split=args.dot_split, seed_rows=sr)
