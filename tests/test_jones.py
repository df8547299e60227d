"""Full-polarization Jones/Mueller beams (beams/jones.py + the
beam.pol='full' driver path). Beyond the single-pol reference
(/root/reference/prisim/primary_beams.py:9 returns one power pattern;
exports carry flagged zero cross-pols) — these tests pin the leakage
physics against direct f64 Jones algebra and drive the 4-pol export
end-to-end."""

import numpy as np
import pytest

from prisim_tpu.beams.jones import (dipole_jones, mueller_unpol_weights,
                                    mueller_from_jones)


def _f64_mueller(dircos, freqs, length, ground_height, ax_deg, ay_deg,
                 half_wave=True, short_dipole=False):
    """Independent float64 numpy Jones -> Mueller reference."""
    c = 299792458.0
    dircos = np.asarray(dircos, np.float64)
    freqs = np.atleast_1d(np.asarray(freqs, np.float64))
    out = {}
    amps, evecs = {}, {}
    for name, adeg in (("X", ax_deg), ("Y", ay_deg)):
        a = np.radians(adeg)
        p = np.array([np.cos(a), np.sin(a), 0.0])
        cosa = np.clip(dircos @ p, -1, 1)
        sina2 = np.clip(1 - cosa**2, 1e-12, 1)
        if short_dipole:
            amp = np.ones((dircos.shape[0], freqs.size))
        elif half_wave:
            amp = (np.cos(0.5 * np.pi * cosa) / sina2)[:, None] \
                * np.ones((1, freqs.size))
        else:
            kh = 2 * np.pi * freqs / c * (0.5 * length)
            amp = ((np.cos(kh[None, :] * cosa[:, None])
                    - np.cos(kh)[None, :])
                   / sina2[:, None] / (1 - np.cos(kh))[None, :])
        if ground_height is not None:
            k = 2 * np.pi * freqs / c
            amp = amp * 2 * np.sin(k[None, :] * ground_height
                                   * np.clip(dircos[:, 2], 0, 1)[:, None])
        amps[name] = amp
        evecs[name] = p[None, :] - cosa[:, None] * dircos
    for pq in ("XX", "YY", "XY"):
        p, q = pq[0], pq[1]
        dot = np.sum(evecs[p] * evecs[q], axis=1)[:, None]
        out[pq] = amps[p] * amps[q] * dot
    # zenith normalization (same convention as mueller_unpol_weights)
    zen = _f64_zenith(freqs, length, ground_height, ax_deg, ay_deg,
                      half_wave, short_dipole)
    out["XX"] /= zen["XX"]
    out["YY"] /= zen["YY"]
    out["XY"] /= np.sqrt(zen["XX"] * zen["YY"])
    return out


def _f64_zenith(freqs, length, ground_height, ax_deg, ay_deg,
                half_wave, short_dipole):
    z = np.array([[0.0, 0.0, 1.0]])
    c = 299792458.0
    freqs = np.atleast_1d(np.asarray(freqs, np.float64))
    zen = {}
    for name, adeg in (("XX", ax_deg), ("YY", ay_deg)):
        # at zenith cosa = 0: every element factor is 1
        amp = np.ones((1, freqs.size))
        if ground_height is not None:
            k = 2 * np.pi * freqs / c
            amp = amp * 2 * np.sin(k[None, :] * ground_height)
        zen[name] = amp * amp  # |evec| = 1 at zenith
    return zen


def _grid_dircos(n=40, seed=0):
    rng = np.random.default_rng(seed)
    az = rng.uniform(0, 2 * np.pi, n)
    alt = rng.uniform(np.radians(10), np.radians(85), n)
    return np.stack([np.cos(alt) * np.sin(az), np.cos(alt) * np.cos(az),
                     np.sin(alt)], axis=-1)


def test_ideal_crossed_dipoles_zenith():
    """Orthogonal ideal feeds: XX=YY=1, XY=0 at zenith."""
    z = np.asarray([[0.0, 0.0, 1.0]])
    freqs = np.asarray([150e6])
    w = mueller_unpol_weights(z, freqs)
    np.testing.assert_allclose(np.asarray(w["XX"]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w["YY"]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w["XY"]), 0.0, atol=1e-6)


def test_rotated_feed_zenith_leakage():
    """Y feed at 60 deg from east: zenith leakage = cos(60 deg)."""
    z = np.asarray([[0.0, 0.0, 1.0]])
    w = mueller_unpol_weights(z, [150e6], y_orientation_deg=60.0)
    np.testing.assert_allclose(np.asarray(w["XY"])[0, 0],
                               np.cos(np.radians(60.0)), atol=1e-6)


@pytest.mark.parametrize("kw", [
    dict(half_wave=True, short_dipole=False, ground_height=None),
    dict(half_wave=False, short_dipole=True, ground_height=None),
    dict(half_wave=False, short_dipole=False, ground_height=0.3,
         length=1.3),
    dict(half_wave=True, short_dipole=False, ground_height=None,
         y_orientation_deg=75.0),
])
def test_mueller_vs_f64_reference(kw):
    """mueller_unpol_weights matches the independent f64 Jones algebra
    over random directions and a 3-frequency chromatic axis."""
    dircos = _grid_dircos(64)
    freqs = np.asarray([120e6, 150e6, 180e6])
    kw = dict(kw)
    got = mueller_unpol_weights(dircos, freqs,
                                length=kw.pop("length", 1.3),
                                **kw)
    ref = _f64_mueller(dircos, freqs, length=1.3,
                       ground_height=kw.get("ground_height"),
                       ax_deg=0.0,
                       ay_deg=kw.get("y_orientation_deg", 90.0),
                       half_wave=kw.get("half_wave", True),
                       short_dipole=kw.get("short_dipole", False))
    for pq in ("XX", "YY", "XY"):
        np.testing.assert_allclose(np.asarray(got[pq]), ref[pq],
                                   atol=2e-5)


def test_mueller_cauchy_schwarz_and_jones_norm():
    """|B_XY|^2 <= B_XX B_YY (Jones vectors obey Cauchy-Schwarz), and
    the half-wave Jones norm |J| equals the dipole field pattern F."""
    dircos = _grid_dircos(128, seed=3)
    w = mueller_unpol_weights(dircos, [150e6])
    xx, yy, xy = (np.asarray(w[k]) for k in ("XX", "YY", "XY"))
    assert (xy**2 <= xx * yy + 1e-7).all()
    from prisim_tpu.beams.analytic import dipole_beam
    amp, evec = dipole_jones(dircos, [150e6], half_wave=True)
    jnorm = np.asarray(amp)[:, 0] * np.linalg.norm(np.asarray(evec),
                                                   axis=1)
    f = np.sqrt(np.asarray(dipole_beam(dircos, [150e6], 1.0,
                                       half_wave=True, power=True)))[:, 0]
    np.testing.assert_allclose(jnorm, f, atol=2e-5)


def test_mueller_from_jones_complex():
    """Complex-Jones combiner: hermitian XY, real non-negative autos."""
    rng = np.random.default_rng(1)
    shp = (32, 4)
    jxt, jxp, jyt, jyp = (rng.normal(size=shp) + 1j * rng.normal(size=shp)
                          for _ in range(4))
    b = mueller_from_jones(jxt, jxp, jyt, jyp)
    assert np.asarray(b["XX"]).dtype == np.float32
    assert (np.asarray(b["XX"]) >= 0).all()
    ref_xy = jxt * np.conj(jyt) + jxp * np.conj(jyp)
    np.testing.assert_allclose(np.asarray(b["XY"]), ref_xy, rtol=2e-6,
                               atol=1e-5)
    # swapping feeds conjugates
    b2 = mueller_from_jones(jyt, jyp, jxt, jxp)
    np.testing.assert_allclose(np.asarray(b2["XY"]),
                               np.conj(ref_xy), rtol=2e-6, atol=1e-5)


def _fullpol_parms(tmp_path, cat, y_deg=90.0, save=False):
    from prisim_tpu.config import load_parms
    return load_parms({
        "dirstruct": {"rootdir": str(tmp_path), "project": "fp"},
        "telescope": {"id": "custom", "latitude": -30.7224},
        "antenna": {"shape": "delta"},
        "beam": {"pol": "full",
                 "feeds": {"length": 1.3, "height": None,
                           "y_orientation_deg": y_deg}},
        "bandpass": {"nchan": 8, "freq": 150e6,
                     "freq_resolution": 97656.25},
        "array": {"layout": "HERA-7"},
        "obsparm": {"n_acc": 1, "t_acc": 10.0},
        "pointing": {"lst_init": 40.0 / 15.0},
        "skyparm": {"model": "custom", "flux_min": None, "epoch": None},
        "catalog": {"custom_file": cat},
        "save_formats": {"fmt": "HDF5", "npz": False},
    })


def test_driver_fullpol_zenith_source(tmp_path):
    """beam.pol='full' with one zenith source: V_XX = flux, V_XY = 0
    for ideal feeds; V_XY/V_XX = cos(60 deg) with the Y feed at 60
    deg (the Mueller weight of a zenith point rides straight through
    the NUDFT)."""
    from prisim_tpu.driver import run_simulation
    cat = str(tmp_path / "zen.txt")
    np.savetxt(cat, np.asarray([[40.0, -30.7224, 10.0, 0.0]]))
    out, _ = run_simulation(_fullpol_parms(tmp_path, cat),
                            verbose=False, save=False)
    vs_xx, vs_yy, vs_xy = out
    xx = np.asarray(vs_xx.skyvis)
    xy = np.asarray(vs_xy.skyvis)
    assert np.abs(np.abs(xx) - 10.0).max() < 1e-3
    assert np.abs(xy).max() < 1e-3
    out2, _ = run_simulation(_fullpol_parms(tmp_path, cat, y_deg=60.0),
                             verbose=False, save=False)
    ratio = np.abs(np.asarray(out2[2].skyvis)) / np.abs(
        np.asarray(out2[0].skyvis))
    np.testing.assert_allclose(ratio, np.cos(np.radians(60.0)),
                               atol=1e-3)


def test_driver_fullpol_exports(tmp_path):
    """4-pol UVFITS/UVH5 exports carry REAL unflagged cross-pols that
    round-trip to the simulated XY cube."""
    import os
    import h5py
    from prisim_tpu.driver import run_simulation
    from prisim_tpu.io.fitsio import read_fits
    cat = str(tmp_path / "two.txt")
    np.savetxt(cat, np.asarray([[40.0, -30.7224, 10.0, 0.0],
                                [43.0, -25.0, 6.0, -0.7]]))
    out, outdir = run_simulation(
        _fullpol_parms(tmp_path, cat, y_deg=70.0), verbose=False,
        save=True)
    vs_xx, vs_yy, vs_xy = out
    base = os.path.join(outdir, "simdata", "simvis_fullpol")
    # UVH5: 4 pols, cross data == XY cube, unflagged, nsample 1
    with h5py.File(base + ".uvh5", "r") as f:
        pols = f["Header/polarization_array"][()]
        np.testing.assert_array_equal(pols, [-5, -6, -7, -8])
        vis = f["Data/visdata"][()]
        flags = f["Data/flags"][()]
        ns = f["Data/nsamples"][()]
    nbl, nchan = vs_xy.nbl, vs_xy.nchan
    # writers conjugate to the UVFITS/UVH5 convention; undo to compare
    xy_file = np.conj(vis[:, :, 2]).reshape(1, nbl, nchan) \
        .transpose(1, 2, 0)
    np.testing.assert_allclose(xy_file, np.asarray(vs_xy.skyvis),
                               rtol=2e-6, atol=1e-6)
    np.testing.assert_allclose(vis[:, :, 2], vis[:, :, 3])
    assert not flags[:, :, 2:].any()
    assert (ns[:, :, 2:] == 1.0).all()
    assert np.abs(vis[:, :, 2]).max() > 0.1  # real leakage, not zeros
    # UVFITS: 4-pol STOKES axis, positive cross-pol weights
    hdus = read_fits(base + ".uvfits")
    gh = next(h for h in hdus if "pars" in h)
    npol = int(gh["header"]["NAXIS3"])
    assert npol == 4
    d = gh["data"].reshape(-1, nchan, npol, 3)
    assert (d[:, :, 2:, 2] > 0).all()       # cross-pols unflagged
    xyf = d[:, :, 2, 0] + 1j * d[:, :, 2, 1]
    # save_uvfits conjugates to the UVFITS convention; undo to compare
    np.testing.assert_allclose(
        np.conj(xyf).reshape(1, nbl, nchan).transpose(1, 2, 0),
        np.asarray(vs_xy.skyvis), rtol=2e-6, atol=1e-6)
