"""Bisect the banded truth engine's 1e-5-class error on driver inputs
(round 5): phase center vs node fluxes vs baseline set.

probe_gate_budget --standalone showed the engine at ~1e-5
(band-edge-dominated) on the REAL driver inputs while
probe_order_coherence measures 3e-7 on synthetic inputs at the same
scale. The two input deltas are (a) a nonzero phase center pc
(se = s - pc; carrier at nu0 re-centered) and (b) real USM node
fluxes. Re-runs the standalone engine on the dump inputs with each
delta toggled off.

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python \
        benchmarks/probe_pc_bisect.py /tmp/gate_dump.npz
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    from prisim_tpu import constants as CNST
    from prisim_tpu import twofloat as tf
    from prisim_tpu.engine.nufft_banded import (
        make_banded_plan, make_coeff_fn_truth, _prep, _banded_spread,
        _post, banded_spread_available)
    from prisim_tpu.engine.nufft_delay import chebyshev_projection
    from prisim_tpu.beams.analytic import airy_beam_df
    from probe_gate_budget import airy_power_np

    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gate_dump.npz"
    z = np.load(path)
    freqs = np.asarray(z["freqs"], np.float64)
    bl_all = np.asarray(z["bl"], np.float64)
    rank = int(z["rank"])
    rows = [0, 5, 11, 29, 30]          # gate-worst rows (short bls)
    bl = bl_all[rows]
    nchan = freqs.size
    dnu = freqs[1] - freqs[0]
    interp = not banded_spread_available()
    _, Q = chebyshev_projection(freqs, rank)
    Q_j = jnp.asarray(Q, jnp.float32)
    cf = make_coeff_fn_truth(freqs, rank,
                             lambda a, b, f: airy_beam_df(a, b, f,
                                                          14.0))
    nm = cf.node_model
    M = np.asarray(z["Mh0"], np.float64) + np.asarray(z["Ml0"],
                                                      np.float64)
    pc_real = (np.asarray(z["pch0"], np.float64)
               + np.asarray(z["pcl0"], np.float64))
    s_eq = np.asarray(z["s_eq_hi"], np.float64) + \
        np.asarray(z["s_eq_lo"], np.float64)
    s64 = s_eq @ M.T
    up = s64[:, 2] > 0.0
    flux_real = np.asarray(z["flux_nodes"], np.float64)
    scale_full = float(np.abs(z["direct0"]).max())

    def run_case(name, pc, flux_n):
        plan = make_banded_plan(bl, freqs[0], dnu, nchan, rank=rank,
                                dot_split=4)
        sh, sl = tf.split_f64(s64)
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
            banded(jnp.asarray(sh), jnp.asarray(sl),
                   jnp.asarray(fnh), jnp.asarray(fnl)))
        V = (np.asarray(vr).astype(np.float64)
             + 1j * np.asarray(vi).astype(np.float64))

        beam_n = airy_power_np(s64, np.asarray(nm.nu_nodes,
                                               np.float64), 14.0)
        amps_n = np.where(up[:, None], beam_n * flux_n, 0.0)
        P64 = amps_n @ np.asarray(nm.node2coef64, np.float64)
        A64 = (P64 @ np.asarray(nm.Q64, np.float64).T)[up]
        se = s64[up] - pc[None, :]
        T = np.zeros((bl.shape[0], nchan), np.complex128)
        for i0 in range(0, A64.shape[0], 4096):
            sl_ = slice(i0, min(i0 + 4096, A64.shape[0]))
            tau = se[sl_] @ bl.T / CNST.c
            ph = np.exp(-2j * np.pi * tau[:, :, None]
                        * freqs[None, None, :])
            T += np.einsum("sc,sbc->bc", A64[sl_], ph)
        d = np.abs(V - T) / scale_full
        print(json.dumps({
            "case": name, "ok": bool(np.asarray(ok)),
            "rel_max_fullscale": float(d.max()),
            "edge_max": max(float(d[:, 0].max()),
                            float(d[:, -1].max())),
            "interior_max": float(d[:, 8:-8].max()),
            "argmax_row": int(d.max(1).argmax())}))

    run_case("real pc + real flux", pc_real, flux_real)
    run_case("pc=0  + real flux", np.zeros(3), flux_real)
    run_case("real pc + flux=1", pc_real,
             np.ones_like(flux_real))
    run_case("pc=0  + flux=1", np.zeros(3),
             np.ones_like(flux_real))




def main2():
    """Stage 2: bisect freqs band and baseline set (same sky/flux)."""
    import jax
    import jax.numpy as jnp
    from prisim_tpu import constants as CNST
    from prisim_tpu import twofloat as tf
    from prisim_tpu import layouts as lay
    from prisim_tpu import baselines as bls_mod
    from prisim_tpu.engine.nufft_banded import (
        make_banded_plan, make_coeff_fn_truth, _prep, _banded_spread,
        _post, banded_spread_available)
    from prisim_tpu.engine.nufft_delay import chebyshev_projection
    from prisim_tpu.beams.analytic import airy_beam_df
    from probe_gate_budget import airy_power_np

    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gate_dump.npz"
    z = np.load(path)
    freqs_dump = np.asarray(z["freqs"], np.float64)
    bl_37 = np.asarray(z["bl"], np.float64)[[0, 5, 11, 29, 30]]
    layout = lay.preset_layout("HERA-331")
    bset = bls_mod.build_baselines(layout, redundant=True)
    bl_all = np.asarray(bset.vectors, np.float64)
    lengths = np.sqrt((bl_all ** 2).sum(1))
    order = np.argsort(lengths)
    pick = np.unique(np.linspace(0, order.size - 1, 8).astype(int))
    bl_331 = bl_all[order[pick]]

    rank = int(z["rank"])
    nchan = freqs_dump.size
    freqs_low = 100e6 + 97656.25 * np.arange(nchan)
    interp = not banded_spread_available()
    M = np.asarray(z["Mh0"], np.float64) + np.asarray(z["Ml0"],
                                                      np.float64)
    s_eq = np.asarray(z["s_eq_hi"], np.float64) + \
        np.asarray(z["s_eq_lo"], np.float64)
    s64 = s_eq @ M.T
    up = s64[:, 2] > 0.0
    flux_real = np.asarray(z["flux_nodes"], np.float64)

    def run_case(name, bl, freqs, flux_n):
        dnu = freqs[1] - freqs[0]
        plan = make_banded_plan(bl, freqs[0], dnu, nchan, rank=rank,
                                dot_split=4)
        _, Q = chebyshev_projection(freqs, rank)
        Q_j = jnp.asarray(Q, jnp.float32)
        cf = make_coeff_fn_truth(freqs, rank,
                                 lambda a, b, f: airy_beam_df(a, b, f,
                                                              14.0))
        nm = cf.node_model
        sh, sl = tf.split_f64(s64)
        fnh, fnl = tf.split_f64(flux_n)

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

        vr, vi, ok = jax.block_until_ready(
            banded(jnp.asarray(sh), jnp.asarray(sl),
                   jnp.asarray(fnh), jnp.asarray(fnl)))
        V = (np.asarray(vr).astype(np.float64)
             + 1j * np.asarray(vi).astype(np.float64))

        beam_n = airy_power_np(s64, np.asarray(nm.nu_nodes,
                                               np.float64), 14.0)
        amps_n = np.where(up[:, None], beam_n * flux_n, 0.0)
        P64 = amps_n @ np.asarray(nm.node2coef64, np.float64)
        A64 = (P64 @ np.asarray(nm.Q64, np.float64).T)[up]
        se = s64[up]
        T = np.zeros((bl.shape[0], nchan), np.complex128)
        for i0 in range(0, A64.shape[0], 4096):
            sl_ = slice(i0, min(i0 + 4096, A64.shape[0]))
            tau = se[sl_] @ bl.T / CNST.c
            ph = np.exp(-2j * np.pi * tau[:, :, None]
                        * freqs[None, None, :])
            T += np.einsum("sc,sbc->bc", A64[sl_], ph)
        scale = np.abs(T).max()
        d = np.abs(V - T) / scale
        print(json.dumps({
            "case": name, "ok": bool(np.asarray(ok)),
            "rel_max_ownscale": float(d.max()),
            "edge_max": max(float(d[:, 0].max()),
                            float(d[:, -1].max())),
            "interior_max": float(d[:, 8:-8].max())}))

    flux_ones = np.ones_like(flux_real)
    run_case("bl37  + 137-162MHz + realflux", bl_37, freqs_dump,
             flux_real)
    run_case("bl37  + 100-125MHz + realflux", bl_37, freqs_low,
             flux_real)
    run_case("bl331 + 137-162MHz + realflux", bl_331, freqs_dump,
             flux_real)
    run_case("bl331 + 100-125MHz + ones", bl_331, freqs_low,
             flux_ones)


if __name__ == "__main__":
    if os.environ.get("PC_BISECT_STAGE2"):
        main2()
    else:
        main()


def main3():
    """Stage 3: is it a plan-global quantity? Same 5 short HERA-37
    rows, with/without a 292 m row appended to the plan set (error
    measured on the short rows only); plus single-row plans."""
    import jax
    import jax.numpy as jnp
    from prisim_tpu import constants as CNST
    from prisim_tpu import twofloat as tf
    from prisim_tpu.engine.nufft_banded import (
        make_banded_plan, make_coeff_fn_truth, _prep, _banded_spread,
        _post, banded_spread_available)
    from prisim_tpu.engine.nufft_delay import chebyshev_projection
    from prisim_tpu.beams.analytic import airy_beam_df
    from probe_gate_budget import airy_power_np

    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gate_dump.npz"
    z = np.load(path)
    freqs = np.asarray(z["freqs"], np.float64)
    bl_dump = np.asarray(z["bl"], np.float64)
    bl_short = bl_dump[[0, 5, 11, 29, 30]]
    bl_long = np.array([[292.0, 0.0, 0.0]])
    rank = int(z["rank"])
    nchan = freqs.size
    dnu = freqs[1] - freqs[0]
    interp = not banded_spread_available()
    _, Q = chebyshev_projection(freqs, rank)
    Q_j = jnp.asarray(Q, jnp.float32)
    cf = make_coeff_fn_truth(freqs, rank,
                             lambda a, b, f: airy_beam_df(a, b, f,
                                                          14.0))
    nm = cf.node_model
    M = np.asarray(z["Mh0"], np.float64) + np.asarray(z["Ml0"],
                                                      np.float64)
    s_eq = np.asarray(z["s_eq_hi"], np.float64) + \
        np.asarray(z["s_eq_lo"], np.float64)
    s64 = s_eq @ M.T
    up = s64[:, 2] > 0.0
    flux_n = np.asarray(z["flux_nodes"], np.float64)
    sh, sl = tf.split_f64(s64)
    fnh, fnl = tf.split_f64(flux_n)
    beam_n = airy_power_np(s64, np.asarray(nm.nu_nodes, np.float64),
                           14.0)
    amps_n = np.where(up[:, None], beam_n * flux_n, 0.0)
    P64 = amps_n @ np.asarray(nm.node2coef64, np.float64)
    A64 = (P64 @ np.asarray(nm.Q64, np.float64).T)[up]
    se = s64[up]

    def truth(bl):
        T = np.zeros((bl.shape[0], nchan), np.complex128)
        for i0 in range(0, A64.shape[0], 4096):
            sl_ = slice(i0, min(i0 + 4096, A64.shape[0]))
            tau = se[sl_] @ bl.T / CNST.c
            ph = np.exp(-2j * np.pi * tau[:, :, None]
                        * freqs[None, None, :])
            T += np.einsum("sc,sbc->bc", A64[sl_], ph)
        return T

    def run_case(name, bl, keep):
        plan = make_banded_plan(bl, freqs[0], dnu, nchan, rank=rank,
                                dot_split=4)

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

        vr, vi, ok = jax.block_until_ready(
            banded(jnp.asarray(sh), jnp.asarray(sl),
                   jnp.asarray(fnh), jnp.asarray(fnl)))
        V = (np.asarray(vr).astype(np.float64)
             + 1j * np.asarray(vi).astype(np.float64))[keep]
        T = truth(bl[keep])
        scale = np.abs(T).max()
        d = np.abs(V - T) / scale
        print(json.dumps({
            "case": name, "ok": bool(np.asarray(ok)),
            "rel_max_ownscale": float(d.max()),
            "edge_max": max(float(d[:, 0].max()),
                            float(d[:, -1].max())),
            "per_row_max": [float(x) for x in d.max(1)]}))

    run_case("5 short rows alone", bl_short, slice(None))
    run_case("5 short rows + 292m appended (short rows scored)",
             np.concatenate([bl_short, bl_long]), slice(0, 5))
    run_case("row 14.6m alone", bl_short[:1], slice(None))
    run_case("row 25.3m alone", bl_short[1:2], slice(None))


def main4():
    """Stage 4: single-row plans + per-row errors in set plans."""
    import jax
    import jax.numpy as jnp
    from prisim_tpu import constants as CNST
    from prisim_tpu import twofloat as tf
    from prisim_tpu.engine.nufft_banded import (
        make_banded_plan, make_coeff_fn_truth, _prep, _banded_spread,
        _post, banded_spread_available)
    from prisim_tpu.engine.nufft_delay import chebyshev_projection
    from prisim_tpu.beams.analytic import airy_beam_df
    from probe_gate_budget import airy_power_np

    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gate_dump.npz"
    z = np.load(path)
    freqs = np.asarray(z["freqs"], np.float64)
    rank = int(z["rank"])
    nchan = freqs.size
    dnu = freqs[1] - freqs[0]
    interp = not banded_spread_available()
    _, Q = chebyshev_projection(freqs, rank)
    Q_j = jnp.asarray(Q, jnp.float32)
    cf = make_coeff_fn_truth(freqs, rank,
                             lambda a, b, f: airy_beam_df(a, b, f,
                                                          14.0))
    nm = cf.node_model
    M = np.asarray(z["Mh0"], np.float64) + np.asarray(z["Ml0"],
                                                      np.float64)
    s_eq = np.asarray(z["s_eq_hi"], np.float64) + \
        np.asarray(z["s_eq_lo"], np.float64)
    s64 = s_eq @ M.T
    up = s64[:, 2] > 0.0
    flux_n = np.asarray(z["flux_nodes"], np.float64)
    sh, sl = tf.split_f64(s64)
    fnh, fnl = tf.split_f64(flux_n)
    beam_n = airy_power_np(s64, np.asarray(nm.nu_nodes, np.float64),
                           14.0)
    amps_n = np.where(up[:, None], beam_n * flux_n, 0.0)
    P64 = amps_n @ np.asarray(nm.node2coef64, np.float64)
    A64 = (P64 @ np.asarray(nm.Q64, np.float64).T)[up]
    se = s64[up]

    def truth(bl):
        T = np.zeros((bl.shape[0], nchan), np.complex128)
        for i0 in range(0, A64.shape[0], 4096):
            sl_ = slice(i0, min(i0 + 4096, A64.shape[0]))
            tau = se[sl_] @ bl.T / CNST.c
            ph = np.exp(-2j * np.pi * tau[:, :, None]
                        * freqs[None, None, :])
            T += np.einsum("sc,sbc->bc", A64[sl_], ph)
        return T

    def run_case(name, bl):
        plan = make_banded_plan(bl, freqs[0], dnu, nchan, rank=rank,
                                dot_split=4)

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

        vr, vi, ok = jax.block_until_ready(
            banded(jnp.asarray(sh), jnp.asarray(sl),
                   jnp.asarray(fnh), jnp.asarray(fnl)))
        V = (np.asarray(vr).astype(np.float64)
             + 1j * np.asarray(vi).astype(np.float64))
        T = truth(bl)
        # fixed normalization: |T| of the 14.6m-class row == global max
        scale = np.abs(T).max()
        d = np.abs(V - T) / scale
        print(json.dumps({
            "case": name, "R_max": int(plan.R_max),
            "n_blk": [int(x) for x in np.atleast_1d(plan.n_blk)],
            "blk_lo": [int(x) for x in np.atleast_1d(plan.blk_lo)],
            "per_row_max": [float(x) for x in d.max(1)],
            "scale": float(scale)}))

    b_diag = np.array([[7.3, 12.6439709, 0.0]])
    b_292 = np.array([[292.0, 0.0, 0.0]])
    run_case("diag14.6 alone", b_diag)
    run_case("diag14.6 + 292m", np.concatenate([b_diag, b_292]))
    bl_all = np.asarray(z["bl"], np.float64)
    run_case("diag14.6 + dump rows 0,5", 
             np.concatenate([b_diag, bl_all[[0, 5]]]))
