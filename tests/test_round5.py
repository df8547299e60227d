"""Round-5 regression tests: in-dot Kahan split, gate diagnostics."""

import numpy as np
import jax.numpy as jnp
import pytest

from prisim_tpu import twofloat as tf
from prisim_tpu.engine.nufft_banded import (make_banded_plan,
                                            nufft_banded_visibilities)
from prisim_tpu.engine.nufft_delay import (chebyshev_projection,
                                           spectral_project)


def _small_problem(seed=0, S=768, B=4, C=32, r=6):
    rng = np.random.default_rng(seed)
    bl = rng.uniform(-60, 60, (B, 3))
    bl[:, 2] = 0.0
    freqs = 150e6 + 390625.0 * np.arange(C)
    th = np.arccos(rng.uniform(0.05, 1.0, S))
    ph = rng.uniform(0, 2 * np.pi, S)
    s = np.stack([np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph),
                  np.cos(th)], axis=-1)
    amps = rng.uniform(0.1, 1.0, (S, C)) * \
        (freqs[None] / 150e6) ** -0.8
    return bl, freqs, s, amps


def test_dot_split_matches_plain_spread():
    """dot_split splits the kernel MXU dot into Kahan-folded sub-dots;
    it must reproduce the dot_split=1 result to f32 accumulation noise
    (it REDUCES rounding, never changes the math)."""
    bl, freqs, s, amps = _small_problem()
    C = freqs.size
    r = 6
    sh, sl = tf.split_f64(s)
    pinvQ, Q = chebyshev_projection(freqs, r)
    P = spectral_project(jnp.asarray(amps, jnp.float32),
                         jnp.asarray(pinvQ))
    out = {}
    for ds in (1, 4):
        plan = make_banded_plan(bl, freqs[0], freqs[1] - freqs[0], C,
                                rank=r, T_s=256, dot_split=ds)
        v, ok = nufft_banded_visibilities(
            plan, jnp.asarray(sh), jnp.asarray(sl), P, Q,
            interpret=True)
        assert bool(ok)
        out[ds] = np.asarray(v)
    scale = np.abs(out[1]).max()
    assert np.abs(out[1] - out[4]).max() / scale < 2e-6


def test_native_fits_roundtrip(tmp_path):
    """save_fits/load_fits round-trips the VisibilitySet — the
    reference's save(fmt='fits') + init_file flow
    (interferometry.py:8393,5140)."""
    from prisim_tpu.io import save_fits, load_fits
    from prisim_tpu.vis import VisibilitySet
    rng = np.random.default_rng(3)
    B, C, T = 5, 16, 3
    vs = VisibilitySet(
        baselines=rng.normal(size=(B, 3)),
        labels=np.asarray([("A%d" % i, "B%d" % i) for i in range(B)]),
        freqs=150e6 + 1e5 * np.arange(C),
        lst=np.asarray([10.0, 20.0, 30.0]),
        skyvis=(rng.normal(size=(B, C, T))
                + 1j * rng.normal(size=(B, C, T))).astype(np.complex64),
        vis=(rng.normal(size=(B, C, T))
             + 1j * rng.normal(size=(B, C, T))).astype(np.complex64),
        vis_noise=(rng.normal(size=(B, C, T))
                   + 1j * rng.normal(size=(B, C, T))).astype(
                       np.complex64),
        vis_rms=rng.uniform(0.1, 1.0, (B, C, T)).astype(np.float32),
        timestamps=2451545.0 + np.arange(T) / 24.0,
        t_acc=np.full(T, 60.0),
        bp=np.ones((B, C, T), np.float32),
        bp_wts=np.ones((B, C, T), np.float32),
        Tsys=np.full((B, C, T), 180.0, np.float32),
        A_eff=154.0, eff_Q=0.96,
        latitude=-30.72, longitude=21.43, altitude=1100.0,
        pointing_center=np.tile([0.0, 90.0], (T, 1)),
        phase_center=np.tile([0.0, 90.0], (T, 1)),
        telescope={"id": "hera", "shape": "dish", "size": 14.0},
        layout={"labels": ["a0", "a1"], "ids": [0, 1],
                "positions": np.zeros((2, 3)), "coords": "ENU"},
        flux_unit="Jy")
    path = str(tmp_path / "sim.fits")
    save_fits(vs, path)
    back = load_fits(path)
    assert np.allclose(back.baselines, vs.baselines)
    assert list(back.labels[:, 0]) == list(vs.labels[:, 0])
    assert np.allclose(back.freqs, vs.freqs)
    assert np.allclose(back.lst, vs.lst)
    for nm in ("skyvis", "vis", "vis_noise"):
        assert np.allclose(getattr(back, nm), getattr(vs, nm),
                           atol=0, rtol=1e-6), nm
    assert np.allclose(back.vis_rms, vs.vis_rms)
    assert np.allclose(back.Tsys, vs.Tsys)
    assert np.allclose(back.timestamps, vs.timestamps)
    assert back.telescope["id"] == "hera"
    assert abs(back.A_eff - 154.0) < 1e-9
    assert abs(back.latitude - (-30.72)) < 1e-9
    assert np.allclose(back.pointing_center, vs.pointing_center)
    assert np.allclose(back.layout["positions"],
                       vs.layout["positions"])


def test_native_fits_lag_products(tmp_path):
    """Lag-domain products (delay transform outputs) survive the FITS
    round trip, matching the reference's real/imag_lag_* extensions."""
    from prisim_tpu.io import save_fits, load_fits
    from prisim_tpu.vis import VisibilitySet
    rng = np.random.default_rng(4)
    B, C, T = 3, 8, 2
    vs = VisibilitySet(
        baselines=rng.normal(size=(B, 3)),
        labels=np.asarray([("A%d" % i, "B%d" % i) for i in range(B)]),
        freqs=150e6 + 1e5 * np.arange(C),
        lst=np.asarray([10.0, 20.0]),
        lags=np.fft.fftshift(np.fft.fftfreq(C, 1e5)),
        skyvis_lag=(rng.normal(size=(B, C, T))
                    + 1j * rng.normal(size=(B, C, T))).astype(
                        np.complex64))
    path = str(tmp_path / "simlag.fits")
    save_fits(vs, path)
    back = load_fits(path)
    assert np.allclose(back.lags, vs.lags)
    assert np.allclose(back.skyvis_lag, vs.skyvis_lag, rtol=1e-6)
    assert back.vis_lag is None


def test_dot_split_non_divisor_falls_back():
    """A dot_split that does not divide T_s silently degrades to 1
    (documented fallback, not an error)."""
    bl, freqs, s, amps = _small_problem()
    C = freqs.size
    r = 6
    sh, sl = tf.split_f64(s)
    pinvQ, Q = chebyshev_projection(freqs, r)
    P = spectral_project(jnp.asarray(amps, jnp.float32),
                         jnp.asarray(pinvQ))
    plan = make_banded_plan(bl, freqs[0], freqs[1] - freqs[0], C,
                            rank=r, T_s=256, dot_split=7)
    v, ok = nufft_banded_visibilities(
        plan, jnp.asarray(sh), jnp.asarray(sl), P, Q, interpret=True)
    assert bool(ok)
    assert np.isfinite(np.asarray(v)).all()


def test_gate_coherent_scale_normalization(capsys):
    """Round 5: the banded shared-amps gate normalizes by the coherent
    flux scale max_c Σ_s|A_sc| (>= max|V|), not by max|V| over the
    simulated rows — on diffuse pixelized skies the same absolute f32
    error reads 10-100x larger against max|V| (probe_pc_bisect.py) and
    would spuriously demote every such run. Asserts (a) the gate
    returns a coherent scale >= the direct side's |V| max, (b) a
    diffuse USM run whose max|V|-relative error exceeds 2e-6 still
    passes the gate."""
    from prisim_tpu.config import load_parms
    from prisim_tpu.driver import run_simulation

    p = load_parms({
        "bandpass": {"nchan": 32, "freq": 150e6,
                     "freq_resolution": 781250.0},
        "array": {"layout": "HERA-19"},
        "obsparm": {"n_acc": 1, "t_acc": 60.0},
        "skyparm": {"model": "usm", "nside": 32},
        "pp": {"key": "none"},
        "processing": {"engine": "nufft", "nufft_spread": "banded"}})
    import os
    dump = os.path.join(os.environ.get("TMPDIR", "/tmp"),
                        "gate_cscale_test.npz")
    os.environ["PRISIM_DEBUG_XCHECK_DUMP"] = dump
    try:
        vs, _ = run_simulation(p, verbose=True, save=False)
    finally:
        os.environ.pop("PRISIM_DEBUG_XCHECK_DUMP", None)
    out = capsys.readouterr().out
    assert "shared-amps cross-check ok" in out
    z = np.load(dump)
    csA = float(z["csA0"])
    vmax = float(np.abs(z["direct0"]).max())
    # triangle inequality: no visibility can exceed the coherent sum
    assert csA >= vmax * (1.0 - 1e-5)
    # diffuse-sky cancellation is what makes the metric choice matter
    assert csA > 2.0 * vmax
