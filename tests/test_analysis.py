"""Analysis stack tests: cosmology, subband delay transform, CLEAN,
delay power spectrum."""

import numpy as np
import pytest

from prisim_tpu.analysis import cosmology as C
from prisim_tpu.analysis.delay import (delay_envelope, horizon_delay_limits,
                                       subband_delay_transform)
from prisim_tpu.analysis.clean import complex_clean_1d, batch_clean, \
    delay_clean_vs
from prisim_tpu.analysis.power_spectrum import (beam3Dvol,
                                                delay_power_spectrum,
                                                subband_power_spectra)
from prisim_tpu.vis import VisibilitySet, delay_transform
from prisim_tpu import constants as CNST


# -- cosmology ---------------------------------------------------------------

def test_efunc_matter_dominated_limit():
    cos = C.FlatLCDM(H0=100.0, Om0=1.0, Tcmb0=0.0)
    z = np.asarray([0.0, 1.0, 3.0])
    np.testing.assert_allclose(cos.efunc(z), (1 + z) ** 1.5, rtol=1e-12)


def test_comoving_distance_einstein_de_sitter():
    # EdS closed form: D_C = 2 (c/H0) [1 - 1/sqrt(1+z)]
    cos = C.FlatLCDM(H0=100.0, Om0=1.0, Tcmb0=0.0)
    z = 8.0
    expect = 2 * (CNST.c / 1e3 / 100.0) * (1 - 1 / np.sqrt(1 + z))
    np.testing.assert_allclose(cos.comoving_distance(z), expect, rtol=1e-5)


def test_comoving_distance_lcdm_value():
    # Planck15-with-h=1 at z=8.5 (150 MHz band): ~ 6380 Mpc/h
    d = C.cosmo100.comoving_distance(8.5)
    assert 6000 < d < 6700


def test_kparallel_scaling():
    z = 8.0
    lags = np.asarray([0.0, 1e-7, 2e-7])
    k = C.k_parallel(lags, z)
    assert k[0] == 0.0
    np.testing.assert_allclose(k[2], 2 * k[1], rtol=1e-12)
    # known magnitude: dkprll_deta(z=8.5) ~ 5.4e5 (h/Mpc)/s
    assert 3e5 < C.dkprll_deta(8.5) < 8e5


def test_freq_z_roundtrip():
    f = 150e6
    np.testing.assert_allclose(C.z_to_freq(C.freq_to_z(f)), f, rtol=1e-12)


# -- horizon limits ----------------------------------------------------------

def test_horizon_limits_zenith_symmetric():
    bl = np.asarray([[100.0, 0.0, 0.0], [0.0, 50.0, 0.0]])
    zenith = np.asarray([[0.0, 0.0, 1.0]])
    h = horizon_delay_limits(bl, zenith)
    assert h.shape == (1, 2, 2)
    np.testing.assert_allclose(h[0, :, 1], [100.0 / CNST.c, 50.0 / CNST.c],
                               rtol=1e-12)
    np.testing.assert_allclose(h[0, :, 0], -h[0, :, 1], rtol=1e-12)


def test_horizon_limits_shifted_phase_center():
    bl = np.asarray([[100.0, 0.0, 0.0]])
    pc = np.asarray([[0.5, 0.0, np.sqrt(1 - 0.25)]])
    h = horizon_delay_limits(bl, pc)
    np.testing.assert_allclose(h[0, 0, 1], (100.0 - 50.0) / CNST.c,
                               rtol=1e-12)
    np.testing.assert_allclose(h[0, 0, 0], (-100.0 - 50.0) / CNST.c,
                               rtol=1e-12)


# -- subband transform -------------------------------------------------------

def _vs_flat(nbl=2, nchan=64, nacc=1):
    rng = np.random.RandomState(0)
    return VisibilitySet(
        baselines=rng.randn(nbl, 3) * 30,
        labels=np.asarray([[str(i + 1), "0"] for i in range(nbl)]),
        freqs=150e6 + 1e5 * np.arange(nchan),
        lst=np.asarray([10.0] * nacc),
        skyvis=np.ones((nbl, nchan, nacc), dtype=np.complex128),
        latitude=-30.7)


def test_subband_transform_shapes_and_peak():
    vs = _vs_flat()
    out = subband_delay_transform(vs, freq_center=[152e6, 155e6],
                                  bw_eff=2e6, shape="bhw", pad=1.0)
    assert out["freq_wts"].shape == (2, 64)
    nlag = 128
    assert out["lags"].size == nlag
    assert out["skyvis_lag"].shape == (2, 2, nlag, 1)
    # flat spectrum: delay peak at 0 lag for every window
    pk = np.argmax(np.abs(out["skyvis_lag"][0, :, :, 0]), axis=1)
    assert np.all(out["lags"][pk] == 0.0)


def test_subband_window_normalization():
    # center the subband so the window lies fully inside the band
    vs = _vs_flat()
    out = subband_delay_transform(vs, freq_center=[153e6], bw_eff=2e6)
    w = out["freq_wts"][0]
    from prisim_tpu.windows import window_frac_width
    fw = window_frac_width("bhw")
    n_window = int(np.round(2e6 / 1e5 / fw))
    assert np.sum(w > 0) == n_window
    np.testing.assert_allclose(np.sum(w ** 2), fw * n_window, rtol=1e-6)


# -- CLEAN -------------------------------------------------------------------

def test_clean_recovers_single_component():
    n = 64
    kernel = np.zeros(n, dtype=complex)
    kernel[0] = 1.0  # delta kernel, peak at index 0
    true = np.zeros(n, dtype=complex)
    true[20] = 3.0 - 1.0j
    out = complex_clean_1d(true, kernel, gain=0.2, maxiter=500,
                           threshold=1e-4)
    cc = np.asarray(out["cc"])
    res = np.asarray(out["res"])
    np.testing.assert_allclose(cc[20], 3.0 - 1.0j, rtol=1e-3)
    assert np.abs(res).max() < 1e-3 * 3.1
    assert int(out["terminated_by"]) == 0


def test_clean_with_broad_kernel():
    n = 128
    x = np.arange(n)
    kern = np.fft.fftshift(np.sinc((x - n // 2) / 4.0)).astype(complex)
    true_cc = np.zeros(n, dtype=complex)
    true_cc[10] = 2.0
    true_cc[40] = -1.0j
    dirty = np.zeros(n, dtype=complex)
    kmax = np.argmax(np.abs(kern))
    for idx in (10, 40):
        dirty += true_cc[idx] * np.roll(kern, idx - kmax)
    out = complex_clean_1d(dirty, kern, gain=0.1, maxiter=2000,
                           threshold=1e-3)
    cc = np.asarray(out["cc"])
    # clean components concentrate at/near the true locations
    assert np.abs(cc[8:13]).sum() > 1.5
    assert np.abs(cc[38:43]).sum() > 0.7
    assert np.abs(np.asarray(out["res"])).max() < 0.05


def test_batch_clean_shapes():
    n = 32
    rng = np.random.RandomState(1)
    specs = rng.randn(3, 2, n) + 1j * rng.randn(3, 2, n)
    kern = np.zeros(n, dtype=complex)
    kern[0] = 1.0
    out = batch_clean(specs, kern, maxiter=50)
    assert out["cc"].shape == (3, 2, n)
    assert out["niter"].shape == (3, 2)


def test_delay_clean_vs_runs():
    vs = _vs_flat(nbl=2, nchan=32, nacc=2)
    # baselines long enough that the horizon clean box spans several lag
    # bins (a 1-pixel box makes the in/out-rms stop degenerate, matching
    # the reference's behavior)
    vs.baselines = vs.baselines * 50.0
    out = delay_clean_vs(vs, pad=0.0, maxiter=200, threshold=1e-3)
    assert out["cc_skyvis_lag"].shape == (2, 32, 2)
    # flat band: residuals should be small after cleaning the zero-lag peak
    assert (np.abs(out["res_skyvis_lag"]).max()
            < 0.1 * np.abs(out["cc_skyvis_lag"]).max())


# -- power spectrum ----------------------------------------------------------

def test_beam3Dvol_uniform_beam():
    from prisim_tpu import healpix as hp
    nside = 8
    npix = hp.nside2npix(nside)
    nchan = 4
    freqs = 150e6 + 1e5 * np.arange(nchan)
    vol = beam3Dvol(np.ones(npix), freqs, hemisphere=True)
    # hemisphere solid angle 2 pi, x bandwidth
    np.testing.assert_allclose(vol, 2 * np.pi * nchan * 1e5, rtol=1e-6)


def test_delay_power_spectrum_units_and_shapes():
    vs = _vs_flat(nbl=3, nchan=32, nacc=2)
    vst = delay_transform(vs, pad=0.0)
    dps = delay_power_spectrum(vst, omega_bw=2 * np.pi * 32 * 1e5)
    assert dps["skyvis"].shape == (3, 32, 2)
    assert dps["kprll"].size == 32
    assert dps["kperp"].size == 3
    assert dps["z"] == pytest.approx(
        CNST.rest_freq_HI / vs.freqs[16] - 1, rel=1e-12)
    assert np.all(dps["skyvis"] >= 0)
    # flat 1 Jy spectrum over B: peak dps ~ factor * B^2
    B = 32 * 1e5
    np.testing.assert_allclose(dps["skyvis"].max(),
                               dps["factor"] * B ** 2, rtol=1e-5)


def test_subband_power_spectra_shapes():
    from prisim_tpu import healpix as hp
    vs = _vs_flat(nbl=2, nchan=64, nacc=1)
    sb = subband_delay_transform(vs, freq_center=[152e6, 155e6],
                                 bw_eff=2e6)
    nside = 8
    beam = np.ones(hp.nside2npix(nside))
    ps = subband_power_spectra(vs, sb, beam)
    assert ps["skyvis"].shape == (2, 2, 128, 1)
    assert ps["kprll"].shape == (2, 128)
    assert ps["kperp"].shape == (2, 2)
    assert np.all(np.isfinite(ps["skyvis"]))


def test_subband_resampled_products():
    vs = _vs_flat(nbl=2, nchan=64, nacc=1)
    out = subband_delay_transform(vs, freq_center=[153e6, 155e6],
                                  bw_eff=2e6, pad=1.0, resample=True)
    assert "lags_resampled" in out
    n_over = out["lags"].size
    n_res = out["lags_resampled"].size
    assert n_res < n_over
    assert out["skyvis_lag_resampled"].shape[2] == n_res
    # oversampling factor consistent: total band / effective bandwidth
    assert out["lag_corr_length"][0] == pytest.approx(
        (64 + 64) * 1e5 / 2e6)
