"""Does spatially-sorted source order amplify the banded spread's f32
rounding? (round 5)

The production path (make_banded_snapshot_fns) reorders sources with
spatial_permutation for sweep locality; the accuracy harness
(accuracy_northstar.run_banded) consumes HEALPix ring order. If nearby
sources produce near-coherent in-dot partials, the sorted order's
rounding walk grows linearly instead of sqrt — a candidate for the
driver gate's 1.7e-5 vs the harness's 1.08e-6 at the same full scale.

Runs the banded TRUTH path at a small shape on CPU (interpret) or TPU,
same inputs in three orders: ring, spatial (production), and
spatial-with-per-tile-shuffle. Compares each against the f64
model-amps NUDFT of the same rows.

    python benchmarks/probe_order_coherence.py [--nside 64] [--nchan 256]
"""

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nside", type=int, default=64)
    ap.add_argument("--nchan", type=int, default=256)
    ap.add_argument("--rank", type=int, default=32)
    ap.add_argument("--nbl", type=int, default=8)
    ap.add_argument("--dot-split", type=int, default=4)
    ap.add_argument("--tile", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from prisim_tpu import constants as CNST
    from prisim_tpu import healpix as hp
    from prisim_tpu import twofloat as tf
    from prisim_tpu import layouts as lay
    from prisim_tpu import baselines as bls
    from prisim_tpu.beams.analytic import airy_beam_df
    from prisim_tpu.engine.nufft_banded import (
        make_banded_plan, make_coeff_fn_truth, spatial_permutation,
        banded_spread_available, _prep, _banded_spread, _post)
    from prisim_tpu.engine.nufft_delay import (chebyshev_projection,
                                               chebyshev_node_model)

    layout = lay.preset_layout("HERA-331")
    bset = bls.build_baselines(layout, redundant=True)
    bl_all = np.asarray(bset.vectors, np.float64)
    lengths = np.sqrt((bl_all ** 2).sum(1))
    order = np.argsort(lengths)
    pick = np.unique(np.linspace(0, order.size - 1, args.nbl)
                     .astype(int))
    bl = bl_all[order[pick]]

    nchan = args.nchan
    freqs = 100e6 + 97656.25 * np.arange(nchan)
    rank = args.rank
    kw = {} if args.tile is None else {"T_s": args.tile}
    plan = make_banded_plan(bl, freqs[0], freqs[1] - freqs[0], nchan,
                            rank=rank, dot_split=args.dot_split, **kw)
    interp = not banded_spread_available()
    _, Q = chebyshev_projection(freqs, rank)
    Q_j = jnp.asarray(Q, jnp.float32)
    cf = make_coeff_fn_truth(freqs, rank,
                             lambda a, b, f: airy_beam_df(a, b, f,
                                                          14.0))
    nm = cf.node_model

    # USM-like sky (flat unit flux, matching the north-star driver run)
    theta, phi = hp.pix2ang(args.nside,
                            np.arange(hp.nside2npix(args.nside)))
    dec = np.pi / 2 - theta
    lat = np.radians(-30.7224)
    lst = 0.0
    # equatorial unit vectors -> ENU at lst 0
    s_eq = np.stack([np.cos(dec) * np.cos(phi),
                     np.cos(dec) * np.sin(phi), np.sin(dec)], -1)
    from prisim_tpu.engine import enu_rotation_from_eq
    M64 = enu_rotation_from_eq(lst, np.degrees(lat))
    s64 = s_eq @ M64.T
    nsrc = s64.shape[0]
    flux_n64 = np.ones((nsrc, rank), np.float64)

    def run_order(perm):
        s_o = s64[perm]
        fn_o = flux_n64[perm]
        sh, sl = tf.split_f64(s_o)
        fnh, fnl = tf.split_f64(fn_o)

        @jax.jit
        def banded(sh, sl, fnh, fnl):
            Ph, Pl = cf(sh, sl, fnh, fnl)
            u_h, u_l, P_r, ok = _prep(plan, sh, sl, Ph)
            v = _post(plan, _banded_spread(plan, u_h, u_l, P_r,
                                           interpret=interp),
                      Q_j, matmul_fft=not interp)
            Pl_r = jnp.transpose(jnp.asarray(Pl, jnp.float32))
            v = v + _post(plan, _banded_spread(plan, u_h, u_l, Pl_r,
                                               interpret=interp),
                          Q_j, matmul_fft=not interp)
            return jnp.real(v), jnp.imag(v), ok

        t0 = time.perf_counter()
        vr, vi, ok = jax.block_until_ready(
            banded(jnp.asarray(sh), jnp.asarray(sl),
                   jnp.asarray(fnh), jnp.asarray(fnl)))
        dt = time.perf_counter() - t0
        return (np.asarray(vr).astype(np.float64)
                + 1j * np.asarray(vi)), bool(np.asarray(ok)), dt

    # f64 truth of the node-model amps (order-independent)
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from probe_gate_budget import airy_power_np
    up = s64[:, 2] > 0.0
    beam_n = airy_power_np(s64, np.asarray(nm.nu_nodes, np.float64),
                           14.0)
    amps_n = np.where(up[:, None], beam_n * flux_n64, 0.0)
    P64 = amps_n @ np.asarray(nm.node2coef64, np.float64)
    A64 = (P64 @ np.asarray(nm.Q64, np.float64).T)[up]
    se = s64[up]
    T = np.zeros((bl.shape[0], nchan), np.complex128)
    for i0 in range(0, A64.shape[0], 8192):
        sl_ = slice(i0, min(i0 + 8192, A64.shape[0]))
        tau = se[sl_] @ bl.T / CNST.c
        ph = np.exp(-2j * np.pi * tau[:, :, None]
                    * freqs[None, None, :])
        T += np.einsum("sc,sbc->bc", A64[sl_], ph)
    scale = np.abs(T).max()

    rng = np.random.default_rng(0)
    perm_ring = np.arange(nsrc)
    perm_sp = spatial_permutation(s_eq)
    perm_shuf = perm_sp.copy()
    T_s = int(plan.T_s)
    for b0 in range(0, nsrc, T_s):
        seg = perm_shuf[b0:b0 + T_s]
        rng.shuffle(seg)
        perm_shuf[b0:b0 + T_s] = seg

    for name, perm in (("ring", perm_ring), ("spatial", perm_sp),
                       ("spatial+tile-shuffle", perm_shuf)):
        V, ok, dt = run_order(perm)
        d = np.abs(V - T) / scale
        i = np.unravel_index(int(d.argmax()), d.shape)
        print(json.dumps({
            "order": name, "ok": ok, "seconds": round(dt, 2),
            "rel_max_scaled": float(d.max()),
            "argmax_bl_len_m": float(np.linalg.norm(bl[i[0]])),
            "argmax_chan": int(i[1]),
            "edge_max": max(float(d[:, 0].max()),
                            float(d[:, -1].max())),
            "interior_max": float(d[:, 8:-8].max()),
            "platform": jax.devices()[0].platform,
            "dot_split": args.dot_split, "nsrc_up": int(up.sum())}))


if __name__ == "__main__":
    main()
