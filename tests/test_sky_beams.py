"""Tests for sky models and primary beams (closed-form checks)."""

import numpy as np
import pytest
import scipy.special as sps

from prisim_tpu import skymodel as sm
from prisim_tpu import geometry as geom
from prisim_tpu import healpix as hp
from prisim_tpu import constants as CNST
from prisim_tpu.beams import (bessel_j1, airy_beam, gaussian_beam,
                              dipole_beam, ground_plane_pattern,
                              vla_pbcor_beam, gmrt_beam,
                              uniform_rect_aperture_beam,
                              array_field_pattern, primary_beam)


# ---------------------------------------------------------------- sky model

def test_powerlaw_spectrum():
    freqs = np.array([100e6, 150e6, 200e6])
    s = sm.powerlaw_spectrum(freqs, [2.0], [150e6], [-0.7])
    assert s.shape == (1, 3)
    assert s[0, 1] == pytest.approx(2.0)
    assert s[0, 0] == pytest.approx(2.0 * (100 / 150.) ** -0.7)


def test_tanh_spectrum_asymptotes():
    freqs = np.linspace(50e6, 400e6, 512)
    scale = 0.03
    s = sm.tanh_eor_spectrum(freqs, [scale], [150e6], [0.5], [0.5 * scale])
    assert s[0, 0] == pytest.approx(scale, rel=1e-3)   # high z: neutral
    assert s[0, -1] == pytest.approx(0.0, abs=1e-4)    # low z: ionized
    imid = np.argmin(np.abs(freqs - 150e6))
    assert s[0, imid] == pytest.approx(0.5 * scale, rel=0.05)


def test_tabulated_spectrum_pchip():
    fm = np.linspace(100e6, 200e6, 8)
    spec = (fm / 150e6)[None, :] ** -0.8 * 5.0
    model = sm.SkyModel(location=[[0.0, -30.0]], spec_kind="spectrum",
                        spectrum=spec, freqs_model=fm)
    chans = np.linspace(110e6, 190e6, 64)
    got = model.generate_spectrum(chans)
    want = 5.0 * (chans / 150e6) ** -0.8
    assert np.max(np.abs(got[0] / want - 1)) < 1e-3  # pchip on smooth curve


def test_skymodel_subset_and_io(tmp_path):
    model = sm.random_point_source_model(100, seed=1)
    sub = model.subset(np.arange(10))
    assert sub.nsrc == 10
    s_full = model.generate_spectrum(np.array([150e6]), ind=np.arange(10))
    s_sub = sub.generate_spectrum(np.array([150e6]))
    assert np.allclose(s_full, s_sub)
    p = str(tmp_path / "sky.hdf5")
    model.save_hdf5(p)
    model2 = sm.SkyModel.load_hdf5(p)
    assert model2.nsrc == model.nsrc
    assert np.allclose(model2.location, model.location)
    assert np.allclose(
        model2.generate_spectrum(np.array([120e6, 180e6])),
        model.generate_spectrum(np.array([120e6, 180e6])))


def test_healpix_diffuse_model():
    nside = 8
    T = np.full(hp.nside2npix(nside), 100.0)  # 100 K flat sky
    model = sm.healpix_diffuse_model(T, 150e6, spindex=-2.5)
    assert model.nsrc == hp.nside2npix(nside)
    s = model.generate_spectrum(np.array([150e6]))
    # Flux per pixel = 2 k T nu^2/c^2 * Omega / Jy
    want = 2 * CNST.k_B * 100.0 * (150e6) ** 2 / CNST.c ** 2 \
        * hp.nside2pixarea(nside) / CNST.Jy
    assert np.allclose(s, want, rtol=1e-12)
    # Spectral index of flux is alpha+2
    s2 = model.generate_spectrum(np.array([300e6]))
    assert np.allclose(s2 / s, 2.0 ** (-2.5 + 2.0), rtol=1e-12)


# -------------------------------------------------------------------- beams

def test_bessel_j1_vs_scipy():
    x = np.linspace(-30, 30, 4001)
    got = np.asarray(bessel_j1(x.astype(np.float32)))
    want = sps.j1(x)
    assert np.max(np.abs(got - want)) < 5e-6


def _zenith_and_ring(alt_deg):
    altaz = np.array([[90.0, 0.0]] + [[alt_deg, az] for az in (0, 90, 180)])
    return geom.altaz2dircos(altaz, xp=np)


def test_airy_peak_and_null():
    freqs = np.array([150e6])
    D = 14.0
    wl = CNST.c / 150e6
    null_sin = 1.2196699 * wl / D  # first null of 2J1(x)/x at x=3.8317
    alt_null = 90.0 - np.degrees(np.arcsin(null_sin))
    dc = geom.altaz2dircos(np.array([[90.0, 0.0], [alt_null, 45.0]]), xp=np)
    pb = np.asarray(airy_beam(dc, freqs, D))
    assert pb[0, 0] == pytest.approx(1.0, abs=1e-6)
    assert pb[1, 0] < 1e-6


def test_airy_offaxis_pointing():
    freqs = np.array([150e6])
    pc = geom.altaz2dircos(np.array([[60.0, 90.0]]), xp=np)[0]
    dc = geom.altaz2dircos(np.array([[60.0, 90.0], [90.0, 0.0]]), xp=np)
    pb = np.asarray(airy_beam(dc, freqs, 14.0, pointing_dircos=pc))
    assert pb[0, 0] == pytest.approx(1.0, abs=1e-6)
    assert pb[1, 0] < pb[0, 0]


def test_gaussian_halfpower():
    freqs = np.array([150e6])
    D = 14.0
    wl = CNST.c / 150e6
    # Field sigma_l = 1/(2 pi sigma_u); power FWHM in l:
    sigma_l = wl * 2 * np.sqrt(2 * np.log(2)) / (2 * np.pi * D)
    l_half = sigma_l * np.sqrt(2 * np.log(2)) / np.sqrt(2)  # power=0.5
    alt = 90.0 - np.degrees(np.arcsin(l_half))
    dc = geom.altaz2dircos(np.array([[alt, 30.0]]), xp=np)
    pb = np.asarray(gaussian_beam(dc, freqs, D))
    assert pb[0, 0] == pytest.approx(0.5, rel=1e-3)


def test_dipole_patterns():
    freqs = np.array([150e6])
    # Broadside (perpendicular to dipole axis): peak = 1 for all variants.
    dc = np.array([[0.0, 0.0, 1.0]])  # zenith; dipole along east
    for kw in ({}, {"short_dipole": True}, {"half_wave": True}):
        pb = np.asarray(dipole_beam(dc, freqs, 0.74, (1.0, 0, 0), **kw))
        assert pb[0, 0] == pytest.approx(1.0, abs=1e-5)
    # Along the dipole axis the pattern vanishes.
    dc_axis = np.array([[1.0, 0.0, 0.0]])
    pb = np.asarray(dipole_beam(dc_axis, freqs, 0.74, (1.0, 0, 0)))
    assert pb[0, 0] == pytest.approx(0.0, abs=1e-6)
    # Short-dipole at 45 deg from axis: sin^2 = 0.5.
    dc45 = np.array([[np.sqrt(0.5), 0.0, np.sqrt(0.5)]])
    pb45 = np.asarray(dipole_beam(dc45, freqs, 0.74, (1.0, 0, 0),
                                  short_dipole=True))
    assert pb45[0, 0] == pytest.approx(0.5, rel=1e-6)


def test_ground_plane():
    freqs = np.array([150e6])
    wl = CNST.c / 150e6
    h = wl / 4.0  # quarter-wave: maximum toward zenith
    dc = np.array([[0.0, 0.0, 1.0], [np.sin(1.0), 0.0, np.cos(1.0)]])
    gp = np.asarray(ground_plane_pattern(dc, freqs, h, power=True))
    assert gp[0, 0] == pytest.approx(1.0, abs=1e-6)
    assert gp[1, 0] < 1.0


def test_vla_gmrt_peak():
    dc = np.array([[0.0, 0.0, 1.0]])
    pb = np.asarray(vla_pbcor_beam(dc, np.array([1.465e9])))
    assert pb[0, 0] == pytest.approx(1.0)
    pb2 = np.asarray(gmrt_beam(dc, np.array([0.325e9])))
    assert pb2[0, 0] == pytest.approx(1.0)


def test_rect_aperture_nulls():
    freqs = np.array([150e6])
    wl = CNST.c / 150e6
    a = 10.0
    l_null = wl / a  # first sinc null at l = lambda/a
    dc = np.array([[0.0, 0.0, 1.0], [l_null, 0.0, np.sqrt(1 - l_null ** 2)]])
    pb = np.asarray(uniform_rect_aperture_beam(dc, freqs, (a, 5.0)))
    assert pb[0, 0] == pytest.approx(1.0)
    assert pb[1, 0] < 1e-10


def test_array_factor_pointing():
    freqs = np.array([150e6])
    pos = np.stack([np.arange(4) * 2.0, np.zeros(4), np.zeros(4)], axis=-1)
    pc = geom.altaz2dircos(np.array([[70.0, 90.0]]), xp=np)[0]
    af = np.asarray(array_field_pattern(pos, np.array([pc]), freqs,
                                        pointing_dircos=pc))
    # Delay compensation: unity response toward the pointing center.
    assert np.abs(af[0, 0, 0]) == pytest.approx(1.0, abs=1e-5)


def test_primary_beam_dispatcher():
    dc = geom.altaz2dircos(
        np.array([[90.0, 0.0], [45.0, 120.0], [20.0, 300.0]]), xp=np)
    freqs = np.linspace(100e6, 200e6, 4)
    for tel in ({"id": "hera"}, {"id": "paper"},
                {"id": "mwa", "groundplane": 0.3},
                {"shape": "delta"},
                {"shape": "dish", "size": 14.0},
                {"shape": "gaussian", "size": 10.0},
                {"shape": "dipole", "size": 0.74,
                 "orientation_dircos": (1.0, 0, 0), "groundplane": 0.3},
                {"shape": "square", "size": 4.0}):
        pb = np.asarray(primary_beam(dc, freqs, tel))
        assert pb.shape == (3, 4)
        assert np.all(pb >= -1e-12)
        assert np.all(pb <= 1.0 + 1e-6), tel


def test_external_beam_constant():
    from prisim_tpu.beams import ExternalBeam
    nside = 16
    npix = hp.nside2npix(nside)
    maps = np.ones((npix, 3))
    eb = ExternalBeam(maps, np.array([100e6, 150e6, 200e6]))
    altaz = np.array([[90.0, 0.0], [40.0, 200.0]])
    pb = eb.evaluate(altaz, np.linspace(110e6, 190e6, 16))
    assert pb.shape == (2, 16)
    assert np.allclose(pb, 1.0, atol=1e-10)


def test_external_beam_airy_matches_analytic():
    # Tabulate an airy beam on a HEALPix grid, interpolate back at random
    # points, compare against the direct evaluation.
    nside = 64
    npix = hp.nside2npix(nside)
    theta, phi = hp.pix2ang(nside, np.arange(npix))
    alt = 90.0 - np.degrees(theta)
    az = np.degrees(phi)
    dc = geom.altaz2dircos(np.stack([alt, az], axis=-1), xp=np)
    freqs = np.array([140e6, 160e6])
    from prisim_tpu.beams import ExternalBeam
    maps = np.asarray(airy_beam(dc, freqs, 14.0))
    eb = ExternalBeam(maps, freqs)
    rng = np.random.default_rng(0)
    test_altaz = np.stack([rng.uniform(40, 85, 50),
                           rng.uniform(0, 360, 50)], axis=-1)
    got = eb.evaluate(test_altaz, np.array([150e6]))
    want = np.asarray(airy_beam(
        geom.altaz2dircos(test_altaz, xp=np), np.array([150e6]), 14.0))
    assert np.max(np.abs(got - want)) < 0.02
