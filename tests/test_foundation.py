"""Tests for the foundation layer: two-float math, geometry, ephemeris,
HEALPix, spectral windows."""

import numpy as np
import pytest

from prisim_tpu import twofloat as tf
from prisim_tpu import geometry as geom
from prisim_tpu import ephemeris as eph
from prisim_tpu import healpix as hp
from prisim_tpu import windows as win


# ---------------------------------------------------------------- two-float

def test_twofloat_dot3_accuracy():
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, size=(1000, 3))
    b = rng.uniform(-1000, 1000, size=(1000, 3))
    ah, al = tf.split_f64(a)
    bh, bl = tf.split_f64(b)
    dh, dl = tf.df_dot3(ah.astype(np.float32), al.astype(np.float32),
                        bh.astype(np.float32), bl.astype(np.float32))
    got = tf.join_f64(dh, dl)
    want = np.sum(a * b, axis=-1)
    scale = np.maximum(np.abs(want), np.sum(np.abs(a * b), axis=-1))
    assert np.max(np.abs(got - want) / np.maximum(scale, 1e-3)) < 1e-12


def test_twofloat_frac():
    rng = np.random.default_rng(1)
    x = rng.uniform(-2000, 2000, size=20000)
    xh, xl = tf.split_f64(x)
    fh, fl = tf.df_frac(xh, xl, xp=np)
    got = tf.join_f64(fh, fl)
    want = x - np.round(x)
    assert np.max(np.abs(got - want)) < 1e-10
    assert np.max(np.abs(got)) <= 0.5 + 1e-9


def test_twofloat_mul_scalar():
    rng = np.random.default_rng(2)
    x = rng.uniform(-1e-6, 1e-6, size=1000)  # delays in seconds
    xh, xl = tf.split_f64(x)
    nu = np.float32(1.5e8)
    ph, pl = tf.df_mul_f(xh, xl, nu)
    got = tf.join_f64(ph, pl)
    want = x * float(nu)
    assert np.max(np.abs(got - want)) < np.max(np.abs(want)) * 1e-12


# ----------------------------------------------------------------- geometry

def test_altaz_dircos_roundtrip():
    rng = np.random.default_rng(3)
    altaz = np.stack([rng.uniform(1, 89, 500), rng.uniform(0, 360, 500)],
                     axis=-1)
    dc = geom.altaz2dircos(altaz, xp=np)
    assert np.allclose(np.sum(dc ** 2, axis=-1), 1.0, atol=1e-12)
    back = geom.dircos2altaz(dc, xp=np)
    assert np.allclose(back, altaz, atol=1e-9)


def test_altaz_zenith_and_cardinal():
    dc = geom.altaz2dircos(np.array([[90.0, 0.0]]), xp=np)
    assert np.allclose(dc, [[0, 0, 1]], atol=1e-12)
    east = geom.altaz2dircos(np.array([[0.0, 90.0]]), xp=np)
    assert np.allclose(east, [[1, 0, 0]], atol=1e-12)
    north = geom.altaz2dircos(np.array([[0.0, 0.0]]), xp=np)
    assert np.allclose(north, [[0, 1, 0]], atol=1e-12)


def test_hadec_altaz_roundtrip():
    rng = np.random.default_rng(4)
    lat = -30.72
    hadec = np.stack([rng.uniform(-179, 179, 500),
                      rng.uniform(-89, 89, 500)], axis=-1)
    altaz = geom.hadec2altaz(hadec, lat, xp=np)
    back = geom.altaz2hadec(altaz, lat, xp=np)
    dha = (back[:, 0] - hadec[:, 0] + 180) % 360 - 180
    assert np.max(np.abs(dha)) < 1e-8
    assert np.max(np.abs(back[:, 1] - hadec[:, 1])) < 1e-8


def test_hadec_zenith():
    lat = -30.0
    # Source at HA=0, dec=latitude is at zenith.
    altaz = geom.hadec2altaz(np.array([[0.0, lat]]), lat, xp=np)
    assert altaz[0, 0] == pytest.approx(90.0, abs=1e-9)


def test_enu_xyz_roundtrip():
    rng = np.random.default_rng(5)
    enu = rng.uniform(-100, 100, size=(100, 3))
    xyz = geom.enu2xyz(enu, 37.0, xp=np)
    back = geom.xyz2enu(xyz, 37.0, xp=np)
    assert np.allclose(back, enu, atol=1e-10)
    # Lengths preserved.
    assert np.allclose(np.linalg.norm(xyz, axis=1),
                       np.linalg.norm(enu, axis=1))


def test_sphdist():
    # 90 degrees from equator to pole.
    d = geom.sphdist(np.array([0.0]), np.array([0.0]),
                     np.array([0.0]), np.array([90.0]), xp=np)
    assert d[0] == pytest.approx(90.0, abs=1e-9)


# ---------------------------------------------------------------- ephemeris

def test_julian_date_j2000():
    assert eph.julian_date(2000, 1, 1, 12) == pytest.approx(2451545.0)
    assert eph.julian_date(2015, 11, 23, 0) == pytest.approx(2457349.5)


def test_gmst_j2000():
    # GMST at J2000.0 epoch ~ 280.46061837 deg.
    assert eph.gmst_deg(2451545.0) == pytest.approx(280.46061837, abs=1e-6)


def test_precession_magnitude_and_inverse():
    ra, dec = eph.precess_radec(10.0, 20.0, eph.JD_J2000,
                                eph.jyear_to_jd(2050.0))
    # General precession ~ 0.64 deg in RA over 50 years near this position.
    assert 0.3 < abs(ra - 10.0) < 1.2
    ra2, dec2 = eph.precess_radec(ra, dec, eph.jyear_to_jd(2050.0),
                                  eph.JD_J2000)
    assert ra2 == pytest.approx(10.0, abs=1e-9)
    assert dec2 == pytest.approx(20.0, abs=1e-9)


# ------------------------------------------------------------------ healpix

@pytest.mark.parametrize("nside", [1, 2, 4, 16, 64])
def test_healpix_ring_roundtrip(nside):
    ipix = np.arange(hp.nside2npix(nside))
    theta, phi = hp.pix2ang(nside, ipix)
    back = hp.ang2pix(nside, theta, phi)
    assert np.array_equal(back, ipix)


@pytest.mark.parametrize("nside", [1, 2, 4, 16, 64])
def test_healpix_nest_roundtrip(nside):
    ipix = np.arange(hp.nside2npix(nside))
    nest = hp.ring2nest(nside, ipix)
    assert np.array_equal(np.sort(nest), ipix)  # permutation
    assert np.array_equal(hp.nest2ring(nside, nest), ipix)
    theta, phi = hp.pix2ang(nside, nest, nest=True)
    t2, p2 = hp.pix2ang(nside, ipix)
    assert np.allclose(theta, t2) and np.allclose(phi, p2)
    assert np.array_equal(hp.ang2pix(nside, t2, p2, nest=True), nest)


def test_healpix_known_values():
    # nside=1: 12 pixels; first 4 in north cap at z=2/3... for nside=1 all
    # pixels are in the "polar" regime. Check z symmetry and areas.
    theta, _ = hp.pix2ang(1, np.arange(12))
    z = np.cos(theta)
    assert np.allclose(np.sort(z), np.sort(-z))  # N/S symmetric
    assert hp.nside2npix(8) == 768
    assert hp.npix2nside(768) == 8
    # Mean of z over all pixel centers is 0 (equal-area property).
    theta64, _ = hp.pix2ang(64, np.arange(hp.nside2npix(64)))
    assert abs(np.mean(np.cos(theta64))) < 1e-12


def test_healpix_interp_constant_and_gradient():
    nside = 16
    npix = hp.nside2npix(nside)
    rng = np.random.default_rng(6)
    theta = np.arccos(rng.uniform(-0.99, 0.99, 300))
    phi = rng.uniform(0, 2 * np.pi, 300)
    pix, wgt = hp.get_interp_weights(nside, theta, phi)
    assert np.allclose(wgt.sum(axis=0), 1.0, atol=1e-12)
    assert pix.min() >= 0 and pix.max() < npix
    const = np.ones(npix)
    assert np.allclose(hp.interp_map(const, theta, phi), 1.0, atol=1e-12)
    # Smooth map z = cos(theta): interpolation should be accurate ~ pixel^2.
    tc, _ = hp.pix2ang(nside, np.arange(npix))
    zmap = np.cos(tc)
    got = hp.interp_map(zmap, theta, phi)
    assert np.max(np.abs(got - np.cos(theta))) < 0.01


def test_healpix_ud_grade():
    nside = 8
    m = np.cos(hp.pix2ang(nside, np.arange(hp.nside2npix(nside)))[0])
    md = hp.ud_grade(m, 4)
    assert md.shape[0] == hp.nside2npix(4)
    assert abs(np.mean(md) - np.mean(m)) < 1e-12
    mu = hp.ud_grade(m, 16)
    assert mu.shape[0] == hp.nside2npix(16)
    assert abs(np.mean(mu) - np.mean(m)) < 1e-12


# ------------------------------------------------------------------ windows

def test_window_frac_width():
    assert win.window_frac_width("rect") == pytest.approx(1.0)
    assert win.window_frac_width("bhw") == pytest.approx(0.5, abs=0.01)


def test_delay_transform_tone():
    # V(nu) = exp(-2pi i nu tau0) -> delta at lag tau0 with amplitude ~ B.
    nchan, df = 256, 1e5
    freqs = 1e8 + df * np.arange(nchan)
    tau0 = 2e-6  # on-grid: tau0 * (nchan*df) integer?
    tau0 = 20 / (nchan * df)  # exactly on lag grid
    vis = np.exp(-2j * np.pi * freqs * tau0)[None, :, None]
    lag = np.asarray(win.ifft_delay_transform(vis, df, pad=0.0, xp=np))
    lags = win.spectral_axis(nchan, delx=df, shift=True, xp=np)
    peak = np.argmax(np.abs(lag[0, :, 0]))
    assert lags[peak] == pytest.approx(tau0)  # e^{-2pi i nu tau} peaks at +tau in ifft
    assert np.abs(lag[0, peak, 0]) == pytest.approx(nchan * df, rel=1e-6)


def test_downsampler_identity_band_limited():
    rng = np.random.default_rng(7)
    n = 64
    x = rng.normal(size=n) + 1j * rng.normal(size=n)
    # Downsample by 2 then the values at shared positions come from FFT
    # truncation; check a pure low-frequency signal survives exactly.
    t = np.arange(n)
    sig = np.exp(2j * np.pi * 3 * t / n)
    ds = win.downsample_fourier(np.fft.fftshift(np.fft.ifft(sig)) * n, n // 2,
                                axis=0, xp=np)
    assert ds.shape[0] == n // 2


def test_subband_window():
    chans = 1e8 + 1e5 * np.arange(256)
    w = win.subband_window(chans, 1.1e8, 5e6, shape="bhw")
    assert w.shape == (256,)
    assert w.max() > 0
    ic = np.argmax(w)
    assert abs(chans[ic] - 1.1e8) < 2e5
