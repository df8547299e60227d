"""Round-5 regressions: collapsed banded plans through the cross-check
gate (ADVICE r4 high finding), node-model safety warning, multi-device
gate parity."""

import numpy as np

from prisim_tpu.config import load_parms
from prisim_tpu.driver import run_simulation


def test_banded_gate_with_collapsed_plan(capsys):
    """ADVICE r4 (high): with array.redundant=False the all-pairs
    baseline set reaches make_banded_plan uncollapsed, the plan dedups
    21 -> 9 canonical rows (HERA-7), and the gate's banded accumulator
    must run over the COLLAPSED rows while the direct-side cross-check
    accumulators run over the full set. Previously raised
    'add got incompatible shapes (21,40,16), (9,40,16)'."""
    base = {
        "bandpass": {"nchan": 16, "freq": 150e6,
                     "freq_resolution": 195312.5},
        "array": {"layout": "HERA-7", "redundant": False},
        "obsparm": {"n_acc": 1, "t_acc": 60.0},
        "skyparm": {"model": "random", "nsrc": 64, "seed": 5},
        "pp": {"key": "none"},
    }
    p = load_parms(dict(base, processing={
        "engine": "nufft", "nufft_spread": "banded"}))
    vs, _ = run_simulation(p, verbose=True, save=False)
    out = capsys.readouterr().out
    assert "shared-amps cross-check ok" in out
    assert vs.skyvis.shape[0] == 21          # full all-pairs rows out
    # against the direct engine on the same (uncollapsed) baselines
    p2 = load_parms(dict(base, processing={"engine": "direct"}))
    vs2, _ = run_simulation(p2, verbose=False, save=False)
    g = np.abs(np.asarray(vs2.skyvis)).max()
    rel = np.abs(np.asarray(vs.skyvis)
                 - np.asarray(vs2.skyvis)).max() / g
    assert rel < 2e-6


def test_mesh_banded_gate_demotes_degraded_run(capsys):
    """VERDICT r4 item 5: the multi-device banded path carries the same
    shared-amps 2e-6 gate as the single-device path. A deliberately
    degraded run (forced rank 4 over a full octave) must trip it and
    demote to the direct engine."""
    import jax
    assert len(jax.devices()) == 8
    base = {
        "bandpass": {"nchan": 32, "freq": 150e6,
                     "freq_resolution": 3.125e6},   # 100-200 MHz octave
        "array": {"layout": "HERA-7"},
        "obsparm": {"n_acc": 1, "t_acc": 60.0},
        "skyparm": {"model": "random", "nsrc": 128, "seed": 5},
        "pp": {"key": "bl"},
    }
    p = load_parms(dict(base, processing={
        "engine": "nufft", "nufft_spread": "banded", "nufft_rank": 4}))
    vs, _ = run_simulation(p, verbose=True, save=False)
    out = capsys.readouterr().out
    assert "mesh shared-amps cross-check FAILED" in out
    p2 = load_parms(dict(base, processing={"engine": "direct"}))
    vs2, _ = run_simulation(p2, verbose=False, save=False)
    np.testing.assert_allclose(np.asarray(vs.skyvis),
                               np.asarray(vs2.skyvis), rtol=0, atol=0)


def test_mesh_banded_gate_passes_good_run(capsys):
    """A healthy multi-device banded run passes the mesh shared-amps
    gate at its 2e-6 default."""
    import jax
    assert len(jax.devices()) == 8
    p = load_parms({
        "bandpass": {"nchan": 16, "freq": 155e6,
                     "freq_resolution": 195312.5},
        "array": {"layout": "HERA-7"},
        "obsparm": {"n_acc": 1, "t_acc": 60.0},
        "skyparm": {"model": "random", "nsrc": 32, "seed": 4},
        "pp": {"key": "bl"},
        "processing": {"engine": "nufft", "nufft_spread": "banded"}})
    vs, _ = run_simulation(p, verbose=True, save=False)
    out = capsys.readouterr().out
    assert "mesh shared-amps cross-check ok" in out
    assert np.isfinite(np.asarray(vs.skyvis)).all()


def _truth_problem(S=4096, nchan=32, seed=3):
    """HERA-7-scale problem with f64 host-side model pieces."""
    import jax.numpy as jnp
    from prisim_tpu import layouts as lay
    from prisim_tpu import baselines as bls_m
    from prisim_tpu import twofloat as tf
    from prisim_tpu import constants as CNST

    rng = np.random.default_rng(seed)
    z = rng.uniform(0.02, 1, S)
    az = rng.uniform(0, 2 * np.pi, S)
    r = np.sqrt(np.clip(1 - z * z, 0, 1))
    s_enu = np.stack([r * np.cos(az), r * np.sin(az), z], -1)
    freqs = 100e6 + 195312.5 * np.arange(nchan)
    fp = dict(scale=rng.uniform(0.1, 10.0, S),
              alpha=np.full(S, -0.8), ref=150e6)
    layout = lay.preset_layout("HERA-7")
    bset = bls_m.build_baselines(layout)
    return dict(s_enu=s_enu, freqs=freqs, fp=fp, bl=bset.vectors,
                c=CNST.c)


def _f64_model_beam(s_enu, freqs, diameter=14.0):
    """f64 host twin of the Airy truth model (Cheb<8 + true-J1 tail)."""
    from prisim_tpu.beams.analytic import _J1_CHEB, _AIRY_TAIL_CHEB
    sin_t = np.sqrt(np.clip(s_enu[:, 0]**2 + s_enu[:, 1]**2, 0, 1))
    x = np.pi * freqs[None, :] * diameter / 299792458.0 * sin_t[:, None]
    small = 2.0 * np.polynomial.chebyshev.chebval(
        x * x / 32.0 - 1.0, _J1_CHEB)
    tail = np.polynomial.chebyshev.chebval((x - 20.0) / 12.0,
                                           _AIRY_TAIL_CHEB)
    pat = np.where(x < 8.0, small, tail)
    return np.where(s_enu[:, 2:3] <= 0, 0.0, pat * pat)


def test_truth_coeffs_vs_f64():
    """make_coeff_fn_truth reproduces the f64 node-model coefficients
    to ~1e-8 where the f32 node path carries ~1e-7/element rounding
    (the round-5 truth-amps accuracy claim, coefficient level)."""
    import jax
    import jax.numpy as jnp
    from prisim_tpu import twofloat as tf
    from prisim_tpu.beams.analytic import airy_beam_df
    from prisim_tpu.engine.nufft_banded import make_coeff_fn_truth
    from prisim_tpu.engine.nufft_delay import chebyshev_node_model

    prob = _truth_problem()
    S, freqs, fp = prob["s_enu"].shape[0], prob["freqs"], prob["fp"]
    rank = 12
    nm = chebyshev_node_model(freqs, rank)
    fluxn = fp["scale"][:, None] * (nm.nu_nodes[None, :] / fp["ref"]) \
        ** fp["alpha"][:, None]
    # f64 truth coefficients
    b64 = _f64_model_beam(prob["s_enu"], nm.nu_nodes)
    P64 = (b64 * fluxn) @ nm.node2coef64

    sh, sl = tf.split_f64(prob["s_enu"])
    fnh, fnl = tf.split_f64(fluxn)
    cf = make_coeff_fn_truth(freqs, rank,
                             lambda a, b, f: airy_beam_df(a, b, f, 14.0))
    Ph, Pl = jax.jit(cf)(jnp.asarray(sh), jnp.asarray(sl),
                         jnp.asarray(fnh), jnp.asarray(fnl))
    got = np.asarray(Ph, np.float64) + np.asarray(Pl, np.float64)
    scale = np.abs(P64).max()
    err_df = np.abs(got - P64).max() / scale
    assert err_df < 3e-8, err_df


def test_truth_banded_vs_f64_model_nudft():
    """End-to-end: banded truth visibilities vs a host f64 NUDFT of the
    f64 rank-r model amps — validates the dual-spread plumbing at the
    f32 transform floor."""
    import jax.numpy as jnp
    from prisim_tpu import twofloat as tf
    from prisim_tpu.beams.analytic import airy_beam_df
    from prisim_tpu.engine.nufft_banded import (
        make_banded_plan, make_banded_snapshot_fns)
    from prisim_tpu.engine.nufft_delay import (chebyshev_node_model,
                                               chebyshev_projection)
    from prisim_tpu.engine import Instrument, SkySources

    prob = _truth_problem()
    s_enu, freqs, fp = prob["s_enu"], prob["freqs"], prob["fp"]
    S = s_enu.shape[0]
    rank = 12
    nm = chebyshev_node_model(freqs, rank)
    fluxn = fp["scale"][:, None] * (nm.nu_nodes[None, :] / fp["ref"]) \
        ** fp["alpha"][:, None]
    b64 = _f64_model_beam(s_enu, nm.nu_nodes)
    amps64 = ((b64 * fluxn) @ nm.node2coef64) @ nm.Q64.T   # (S, C)
    # f64 golden NUDFT of the model amps (identity rotation, zenith pc)
    tau = (s_enu - np.array([0.0, 0.0, 1.0])) @ prob["bl"].T / prob["c"]
    ph = np.exp(-2j * np.pi * freqs[None, None, :]
                * tau[:, :, None])                       # (S, B, C)
    Vg = np.einsum("sc,sbc->bc", amps64, ph)

    inst = Instrument.build(prob["bl"], freqs, latitude=-30.72)
    flux32 = (fp["scale"][:, None]
              * (freqs[None, :] / fp["ref"]) ** fp["alpha"][:, None]
              ).astype(np.float32)
    # celestial = ENU here: identity rotation via M = I
    sh, sl = tf.split_f64(s_enu)
    sks = SkySources(jnp.asarray(sh), jnp.asarray(sl),
                     jnp.asarray(flux32))
    plan = make_banded_plan(prob["bl"], inst.nu0, inst.dnu,
                            freqs.size, rank=rank)
    pinvQ, Q = chebyshev_projection(freqs, rank)
    run = make_banded_snapshot_fns(
        inst, sks, lambda s, f: jnp.ones((s.shape[0], f.shape[0])),
        plan, pinvQ, Q, interpret=True, spatial_sort=True,
        truth={"beam_df": lambda a, b, f: airy_beam_df(a, b, f, 14.0),
               "flux_nodes": fluxn})
    Mh = jnp.asarray(np.eye(3), jnp.float32)
    Ml = jnp.asarray(np.zeros((3, 3)), jnp.float32)
    pch = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    pcl = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
    v, ok = run(Mh, Ml, pch, pcl)
    assert bool(np.asarray(ok))
    scale = np.abs(Vg).max()
    err = np.abs(np.asarray(v) - Vg).max() / scale
    assert err < 1.5e-6, err
