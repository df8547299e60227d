"""Catalog readers: SUMSS text, NVSS/GLEAM FITS (written with the
in-tree bintable writer), MWACS csv, flux cuts, driver integration."""

import io
import numpy as np
import pytest

from prisim_tpu import catalogs as C
from prisim_tpu.io import fitsio as F


def _write_sumss(path, n=4):
    # cols: RAh RAm RAs DECd DECm DECs x x x x Sint(mJy) x fmaj fmin fpa dmaj dmin
    rows = []
    for i in range(n):
        dmaj = 0.0 if i < 3 else 30.0   # last source extended
        rows.append("%d 30 0.0 -35 %d 0.0 0 0 0 0 %g 0 45.0 40.0 10.0 %g %g"
                    % (i + 1, i, 100.0 * (i + 1), dmaj, dmaj))
    with open(path, "w") as f:
        f.write("\n".join(rows))


def test_read_sumss(tmp_path):
    path = str(tmp_path / "sumss.txt")
    _write_sumss(path)
    sm = C.read_sumss(path, spindex_rms=0.0)
    assert sm.nsrc == 3                    # extended source dropped
    np.testing.assert_allclose(sm.location[0, 0], 15.0 * 1.5)  # 1h30m
    np.testing.assert_allclose(sm.location[0, 1], -(35 + 0 / 60.0))
    np.testing.assert_allclose(sm.spec_parms["flux-scale"][0], 0.1)
    np.testing.assert_allclose(sm.spec_parms["freq-ref"][0], 0.843e9)


def _write_nvss(path, n=5):
    with open(path, "wb") as fh:
        cards = [F.card("SIMPLE", True), F.card("BITPIX", 8),
                 F.card("NAXIS", 0), F.card("EXTEND", True)]
        fh.write(F.format_header(cards))
        rng = np.random.RandomState(0)
        F.write_bintable(fh, "NVSS", [
            ("RA(2000)", "1D", rng.uniform(0, 360, n)),
            ("DEC(2000)", "1D", np.linspace(-60, 40, n)),
            ("PEAK INT", "1D", np.linspace(1.0, 5.0, n)),
            ("MAJOR AX", "1D", np.full(n, 0.01)),
            ("MINOR AX", "1D", np.full(n, 0.008)),
        ])


def test_read_nvss(tmp_path):
    path = str(tmp_path / "nvss.fits")
    _write_nvss(path)
    sm = C.read_nvss(path)
    assert sm.nsrc == 5
    np.testing.assert_allclose(sm.spec_parms["freq-ref"], 1.4e9)
    assert sm.src_shape.shape == (5, 3)
    # SUMSS-sky exclusion keeps dec > -30 only
    sm2 = C.read_nvss(path, exclude_sumss_sky=True)
    assert sm2.nsrc == np.sum(np.linspace(-60, 40, 5) > -30.0)


def _write_gleam(path, n=4):
    with open(path, "wb") as fh:
        cards = [F.card("SIMPLE", True), F.card("BITPIX", 8),
                 F.card("NAXIS", 0), F.card("EXTEND", True)]
        fh.write(F.format_header(cards))
        F.write_bintable(fh, "GLEAM", [
            ("RAJ2000", "1D", np.linspace(0, 300, n)),
            ("DEJ2000", "1D", np.full(n, -27.0)),
            ("int_flux_151", "1D", np.linspace(2, 8, n)),
            ("int_flux_174", "1D", np.linspace(1.8, 7.5, n)),
            ("alpha", "1D", np.full(n, -0.75)),
            ("a_wide", "1E", np.full(n, 60.0)),
            ("b_wide", "1E", np.full(n, 50.0)),
            ("pa_wide", "1E", np.zeros(n)),
        ])


def test_read_gleam(tmp_path):
    path = str(tmp_path / "gleam.fits")
    _write_gleam(path)
    sm = C.read_gleam(path, select_freq=150e6)
    assert sm.nsrc == 4
    np.testing.assert_allclose(sm.spec_parms["freq-ref"], 151e6)
    np.testing.assert_allclose(sm.spec_parms["power-law-index"], -0.75)
    np.testing.assert_allclose(sm.spec_parms["flux-scale"],
                               np.linspace(2, 8, 4))
    # semi-axes arcsec -> FWHM deg
    np.testing.assert_allclose(sm.src_shape[:, 0], 120.0 / 3600.0)


def test_read_mwacs(tmp_path):
    path = str(tmp_path / "mwacs.csv")
    with open(path, "w") as f:
        f.write("ra,dec,flux,alpha\n")
        f.write("10.0,-26.0,5.5,-0.7\n20.0,-28.0,2.5,\n")
    sm = C.read_mwacs(path, spindex_mean=-0.9, spindex_rms=0.0)
    assert sm.nsrc == 2
    np.testing.assert_allclose(sm.spec_parms["power-law-index"],
                               [-0.7, -0.9])


def test_flux_cut():
    sm = C.read_mwacs.__wrapped__ if False else None
    from prisim_tpu.catalogs import _powerlaw_model, flux_cut
    sm = _powerlaw_model([0, 10, 20], [-30, -30, -30], [1.0, 5.0, 20.0],
                         150e6, [-0.8, -0.8, -0.8])
    cut = flux_cut(sm, flux_min=2.0)
    assert cut.nsrc == 2
    cut2 = flux_cut(sm, flux_min=2.0, flux_max=10.0)
    assert cut2.nsrc == 1
    with pytest.raises(IndexError):
        flux_cut(sm, flux_min=1000.0)


def test_driver_with_nvss(tmp_path):
    path = str(tmp_path / "nvss.fits")
    _write_nvss(path, n=8)
    from prisim_tpu.config import load_parms
    from prisim_tpu.driver import run_simulation
    p = load_parms({
        "bandpass": {"nchan": 8, "freq": 155e6,
                     "freq_resolution": 195312.5},
        "array": {"layout": "HERA-7"},
        "obsparm": {"n_acc": 1, "t_acc": 10.0},
        "skyparm": {"model": "nvss", "flux_min": None},
        "catalog": {"NVSS_file": path}})
    vs, _ = run_simulation(p, verbose=False, save=False)
    assert np.isfinite(vs.skyvis).all()


def test_csm_merge(tmp_path):
    from prisim_tpu.skymodel import SkyModel
    sumss = str(tmp_path / "sumss.txt")
    _write_sumss(sumss)
    nvss = str(tmp_path / "nvss.fits")
    _write_nvss(nvss)
    from prisim_tpu.config import load_parms
    from prisim_tpu.driver import build_sky, build_frequencies
    p = load_parms({"skyparm": {"model": "csm", "flux_min": None},
                    "catalog": {"SUMSS_file": sumss, "NVSS_file": nvss}})
    sm = build_sky(p, build_frequencies(p))
    # 3 SUMSS point sources + NVSS sources with dec > -30
    assert sm.nsrc == 3 + np.sum(np.linspace(-60, 40, 5) > -30.0)
    assert "SUMSS" in sm.name and "NVSS" in sm.name


def test_noise_only_model():
    from prisim_tpu.config import load_parms
    from prisim_tpu.driver import run_simulation
    p = load_parms({
        "bandpass": {"nchan": 8, "freq": 155e6,
                     "freq_resolution": 195312.5},
        "array": {"layout": "HERA-7"},
        "obsparm": {"n_acc": 1, "t_acc": 10.0},
        "skyparm": {"model": "noise"}})
    vs, _ = run_simulation(p, verbose=False, save=False)
    np.testing.assert_allclose(np.abs(vs.skyvis), 0.0, atol=1e-12)
    assert np.abs(vs.vis).max() > 0  # pure noise present


def test_hi_monopole_model():
    from prisim_tpu.config import load_parms
    from prisim_tpu.driver import build_sky, build_frequencies
    p = load_parms({"skyparm": {"model": "hi_monopole", "nside": 8,
                                "global_EoR_parms": [0.03, 150e6, 1.0]}})
    freqs = build_frequencies(p)
    sm = build_sky(p, freqs)
    from prisim_tpu import healpix as hp
    assert sm.nsrc == hp.nside2npix(8)
    spec = sm.generate_spectrum(freqs)
    # tanh monopole: monotonic in frequency, uniform across pixels
    assert np.allclose(spec, spec[:1, :])
    d = np.diff(spec[0])
    assert np.all(d <= 0) or np.all(d >= 0)


def test_baseline_group_keys():
    from prisim_tpu.layouts import ArrayLayout
    from prisim_tpu.baselines import (build_baselines,
                                      baseline_group_keys,
                                      baselines_in_group)
    pos = np.zeros((4, 3))
    pos[:, 0] = 14.6 * np.arange(4)
    bset = build_baselines(ArrayLayout(
        pos, np.asarray(["0", "1", "2", "3"])), redundant=True)
    # query the shortest spacing, forward and flipped
    idx, conj = baseline_group_keys(
        bset, [[14.6, 0, 0], [-14.6, 0, 0], [1000.0, 0, 0]])
    assert idx[0] == idx[1] and idx[0] >= 0
    assert not conj[0] and conj[1]
    assert idx[2] == -1
    labels, vecs = baselines_in_group(bset, idx[0])
    assert len(labels) == 3  # 3 copies of the 14.6 m spacing


def test_hi_cube_lightcone(tmp_path):
    """hi_cube/21cmfast lightcone dispatch: HEALPix maps x model freqs,
    interpolated onto the simulation grid and simulated end-to-end."""
    from prisim_tpu.config import load_parms
    from prisim_tpu.driver import run_simulation, build_sky, \
        build_frequencies
    from prisim_tpu import healpix as hp
    nside = 8
    npix = hp.nside2npix(nside)
    fmdl = np.linspace(140e6, 170e6, 5)
    rng = np.random.RandomState(0)
    # per-pixel random lightcone with a linear frequency ramp
    maps = (1.0 + 0.5 * rng.rand(npix, 1)) \
        * np.linspace(1.0, 2.0, 5)[None, :]
    path = str(tmp_path / "lightcone.npz")
    np.savez(path, maps=maps, freqs=fmdl)
    p = load_parms({
        "bandpass": {"nchan": 8, "freq": 155e6,
                     "freq_resolution": 195312.5},
        "array": {"layout": "HERA-7"},
        "obsparm": {"n_acc": 1, "t_acc": 10.0},
        "skyparm": {"model": "hi_cube"},
        "catalog": {"spectrum_file": path}})
    freqs = build_frequencies(p)
    sm = build_sky(p, freqs)
    assert sm.nsrc == npix
    # interpolated spectrum preserves the linear ramp shape per pixel,
    # times the Rayleigh-Jeans K -> Jy conversion (S ~ T f^2)
    spec = sm.generate_spectrum(freqs)
    ratio = spec / spec[:, :1]
    expect = np.interp(freqs, fmdl, np.linspace(1.0, 2.0, 5)) \
        * (freqs / freqs[0]) ** 2
    np.testing.assert_allclose(ratio, np.broadcast_to(
        (expect / expect[0])[None, :], ratio.shape), rtol=1e-3)
    vs, _ = run_simulation(p, verbose=False, save=False)
    assert np.isfinite(np.asarray(vs.skyvis)).all()
    assert np.abs(np.asarray(vs.skyvis)).max() > 0
