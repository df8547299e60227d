"""Diffuse-sky FITS catalog formats: DSM/GSM per-pixel tables and HI
simulation cubes (reference branches run_prisim.py:1020-1065 and
:1089-1126/:1210-1249)."""

import numpy as np
import pytest

from prisim_tpu import constants as CNST
from prisim_tpu import healpix as hp
from prisim_tpu.config import load_parms
from prisim_tpu.driver import build_sky, build_frequencies
from prisim_tpu.io.fitsio import card, write_bintable, write_image


NSIDE = 8
NPIX = hp.nside2npix(NSIDE)


def _write_dsm(path, nside=NSIDE, map_mhz=150.0):
    npix = hp.nside2npix(nside)
    theta, phi = hp.pix2ang(nside, np.arange(npix))
    ra = np.degrees(phi)
    dec = 90.0 - np.degrees(theta)
    rng = np.random.RandomState(7)
    temp = 100.0 + 10.0 * rng.rand(npix)
    spindex = -2.55 + 0.05 * rng.randn(npix)
    pixarea = hp.nside2pixarea(nside)
    with open(path, "wb") as fh:
        write_image(fh, None, primary=True,
                    extra_cards=[card("PIXAREA", pixarea)])
        write_bintable(fh, "DSM", [
            ("RA", "1D", ra), ("DEC", "1D", dec),
            ("T_%.0f" % map_mhz, "1D", temp),
            ("spindex", "1D", spindex)])
    return ra, dec, temp, spindex, pixarea


def test_read_dsm_fits(tmp_path):
    from prisim_tpu.catalogs import read_dsm_fits
    path = str(tmp_path / "dsm_150.0_MHz_nside_8.fits")
    ra, dec, temp, spindex, pixarea = _write_dsm(path)
    sm = read_dsm_fits(path)
    assert sm.nsrc == NPIX
    np.testing.assert_allclose(sm.location[:, 0], ra, atol=1e-9)
    expected = temp * 2.0 * CNST.k_B * (150e6 / CNST.c) ** 2 \
        * pixarea / CNST.Jy
    np.testing.assert_allclose(sm.spec_parms["flux-scale"], expected,
                               rtol=1e-12)
    # FLUX spectral index = temperature spindex + 2
    np.testing.assert_allclose(sm.spec_parms["power-law-index"],
                               spindex + 2.0, atol=1e-9)
    # prefix expansion (the reference's DSM_file_prefix convention)
    sm2 = read_dsm_fits(str(tmp_path / "dsm"), nside=8)
    np.testing.assert_allclose(sm2.spec_parms["flux-scale"], expected,
                               rtol=1e-12)


def test_build_sky_dsm_fits(tmp_path):
    path = str(tmp_path / "dsm_150.0_MHz_nside_8.fits")
    _write_dsm(path)
    parms = load_parms({
        "bandpass": {"nchan": 4, "freq": 150e6,
                     "freq_resolution": 390625.0},
        "skyparm": {"model": "dsm", "nside": 8},
        "catalog": {"DSM_file_prefix": str(tmp_path / "dsm")},
    })
    sm = build_sky(parms, build_frequencies(parms))
    assert sm.nsrc == NPIX
    spec = sm.generate_spectrum(build_frequencies(parms))
    assert spec.shape == (NPIX, 4)
    assert np.all(spec > 0)


def _write_hi_cube(path, fitstype="IMAGE"):
    nside = 4
    npix = hp.nside2npix(nside)
    theta, phi = hp.pix2ang(nside, np.arange(npix))
    ra, dec = np.degrees(phi), 90.0 - np.degrees(theta)
    freqs_mhz = np.asarray([140.0, 150.0, 160.0])
    rng = np.random.RandomState(3)
    temp = 0.02 * rng.rand(npix, freqs_mhz.size)
    pixarea = hp.nside2pixarea(nside)
    with open(path, "wb") as fh:
        write_image(fh, None, primary=True, extra_cards=[
            card("NEXTEN", 3 if fitstype == "IMAGE" else
                 1 + freqs_mhz.size),
            card("FITSTYPE", fitstype), card("PIXAREA", pixarea)])
        write_bintable(fh, "COORDINATE", [("RA", "1D", ra),
                                          ("DEC", "1D", dec)])
        if fitstype == "IMAGE":
            write_bintable(fh, "FREQUENCY",
                           [("Frequency [MHz]", "1D", freqs_mhz)])
            write_image(fh, temp, extname="TEMPERATURE")
        else:
            for i, f in enumerate(freqs_mhz):
                write_bintable(fh, "%.1f MHz" % f,
                               [("Temperature", "1D", temp[:, i])])
    return ra, dec, freqs_mhz, temp, pixarea


@pytest.mark.parametrize("fitstype", ["IMAGE", "TABLE"])
def test_read_hi_cube_fits(tmp_path, fitstype):
    from prisim_tpu.catalogs import read_hi_cube_fits
    path = str(tmp_path / "hi.fits")
    ra, dec, fmhz, temp, pixarea = _write_hi_cube(path, fitstype)
    sm = read_hi_cube_fits(path, center_freq=150e6)
    assert sm.spec_kind == "spectrum"
    np.testing.assert_allclose(sm.freqs_model, fmhz * 1e6)
    expected = temp * (2.0 * CNST.k_B * 150e6 ** 2 / CNST.c ** 2) \
        * pixarea / CNST.Jy
    np.testing.assert_allclose(sm.spectrum, expected, rtol=1e-6)
    # fluctuations variant removes the per-channel monopole
    smf = read_hi_cube_fits(path, center_freq=150e6, fluctuations=True)
    np.testing.assert_allclose(smf.spectrum.mean(axis=0), 0.0,
                               atol=1e-12 * np.abs(expected).max())


def test_build_sky_hi_cube_fits(tmp_path):
    path = str(tmp_path / "hi.fits")
    _write_hi_cube(path)
    parms = load_parms({
        "bandpass": {"nchan": 4, "freq": 150e6,
                     "freq_resolution": 390625.0},
        "skyparm": {"model": "hi_cube"},
        "catalog": {"spectrum_file": path},
    })
    freqs = build_frequencies(parms)
    sm = build_sky(parms, freqs)
    spec = sm.generate_spectrum(freqs)          # pchip onto channels
    assert spec.shape == (hp.nside2npix(4), 4)
    assert np.isfinite(spec).all()
