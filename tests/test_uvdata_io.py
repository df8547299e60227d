"""UVFITS / UVH5 export tests (pure-numpy FITS + h5py UVH5 writers)."""

import os

import numpy as np
import pytest

from prisim_tpu.vis import VisibilitySet, project_baselines
from prisim_tpu.io.uvfits import (save_uvfits, uvdata_arrays,
                                  antnums_to_blnum, blnum_to_antnums)
from prisim_tpu.io.uvh5 import save_uvh5, read_uvh5_arrays
from prisim_tpu.io.fitsio import read_fits
from prisim_tpu import constants as CNST


def _vs(nbl=3, nchan=8, nacc=2):
    rng = np.random.RandomState(5)
    bl = rng.randn(nbl, 3) * 30
    labels = np.asarray([["1", "0"], ["2", "0"], ["2", "1"]])[:nbl]
    sv = (rng.randn(nbl, nchan, nacc) +
          1j * rng.randn(nbl, nchan, nacc)).astype(np.complex128)
    vs = VisibilitySet(
        baselines=bl, labels=labels,
        freqs=150e6 + 1e5 * np.arange(nchan),
        lst=np.asarray([30.0, 30.5])[:nacc],
        skyvis=sv, timestamps=2458100.25 + np.arange(nacc) * 1e-4,
        t_acc=np.full(nacc, 10.0), latitude=-30.7, longitude=21.4,
        altitude=1050.0,
        pointing_center=np.tile([[90.0, 270.0]], (nacc, 1)),
        pointing_coords="altaz",
        phase_center=np.tile([[90.0, 270.0]], (nacc, 1)),
        phase_center_coords="altaz",
        telescope={"id": "hera", "shape": "dish", "size": 14.0},
        layout=dict(positions=rng.randn(3, 3) * 20,
                    labels=np.asarray(["0", "1", "2"]),
                    ids=np.arange(3), coords="ENU"))
    return project_baselines(vs)


def test_blnum_roundtrip():
    i = np.asarray([0, 5, 100, 2000])
    j = np.asarray([1, 7, 300, 2040])
    blnum = antnums_to_blnum(i, j)
    i2, j2 = blnum_to_antnums(blnum)
    np.testing.assert_array_equal(i2, i)
    np.testing.assert_array_equal(j2, j)
    # 256 convention
    blnum = antnums_to_blnum(3, 4, attempt256=True)
    assert blnum == 256 * 5 + 4
    i2, j2 = blnum_to_antnums(np.asarray([blnum]))
    assert (i2[0], j2[0]) == (3, 4)


def test_uvdata_arrays_conventions():
    vs = _vs()
    a = uvdata_arrays(vs, "noiseless")
    assert a["data"].shape == (6, 8)
    # conjugated, time-major
    np.testing.assert_allclose(a["data"][0], np.conj(vs.skyvis[0, :, 0]))
    np.testing.assert_allclose(a["data"][3], np.conj(vs.skyvis[0, :, 1]))
    # ant arrays: A1 is ant1, A2 is ant2
    np.testing.assert_array_equal(a["ant_1_array"][:3], [0, 0, 1])
    np.testing.assert_array_equal(a["ant_2_array"][:3], [1, 2, 2])
    assert a["baseline_array"][0] == 2048 * 2 + 1 + 2 ** 16
    # drift scan at fixed zenith pointing => phased in RA? zenith drifts
    assert not a["is_phased"]


def test_uvfits_file_roundtrip(tmp_path):
    vs = _vs()
    path = str(tmp_path / "sim.uvfits")
    save_uvfits(vs, path)
    hdus = read_fits(path)
    assert len(hdus) == 2
    gh = hdus[0]["header"]
    assert gh["GCOUNT"] == 6 and gh["PCOUNT"] == 6
    assert gh["CTYPE4"].startswith("FREQ")
    assert gh["CRVAL4"] == vs.freqs[0]
    # uvw in seconds
    pars = hdus[0]["pars"]
    np.testing.assert_allclose(
        pars[:3, 0] * CNST.c, vs.projected_baselines[:, 0, 0], rtol=1e-6)
    # JD reconstruction from two-part DATE
    jd = gh["PZERO4"] + pars[:, 3] + pars[:, 4]
    np.testing.assert_allclose(jd[0], vs.timestamps[0], atol=1e-6)
    # visibilities
    data = hdus[0]["data"]   # (nblts, ..., 3) float32
    flat = data.reshape(6, -1, 3)
    re, im = flat[..., 0], flat[..., 1]
    expect = np.conj(np.transpose(vs.skyvis, (2, 0, 1))).reshape(6, 8)
    np.testing.assert_allclose(re + 1j * im, expect, rtol=1e-6)
    # AIPS AN table
    an = hdus[1]
    assert an["header"]["EXTNAME"].startswith("AIPS AN")
    assert an["columns"]["NOSTA"].tolist() == [1, 2, 3]
    assert an["columns"]["STABXYZ"].shape == (3, 3)
    # antenna positions: ENU -> ECEF-rel should preserve pairwise distances
    d_enu = np.linalg.norm(vs.layout["positions"][0] -
                           vs.layout["positions"][1])
    d_ecef = np.linalg.norm(an["columns"]["STABXYZ"][0] -
                            an["columns"]["STABXYZ"][1])
    np.testing.assert_allclose(d_ecef, d_enu, rtol=1e-9)


def test_uvh5_roundtrip(tmp_path):
    vs = _vs()
    path = str(tmp_path / "sim.uvh5")
    save_uvh5(vs, path)
    back = read_uvh5_arrays(path)
    assert back["visdata"].shape == (6, 8, 1)   # v1.0: no Nspws axis
    expect = np.conj(np.transpose(vs.skyvis, (2, 0, 1))).reshape(6, 8)
    np.testing.assert_allclose(back["visdata"][:, :, 0], expect,
                               rtol=1e-6)
    np.testing.assert_allclose(back["freq_array"], vs.freqs)
    np.testing.assert_allclose(back["uvw_array"][:3],
                               vs.projected_baselines[:, :, 0])
    assert back["phase_type"] == "drift"
    assert back["Nbls"] == 3 and back["Ntimes"] == 2
    assert list(back["antenna_names"]) == ["0", "1", "2"]


def test_uvh5_missing_datatype_raises(tmp_path):
    vs = _vs()
    with pytest.raises(ValueError):
        save_uvh5(vs, str(tmp_path / "x.uvh5"), datatype="noisy")


def test_uvh5_to_visibilityset_roundtrip(tmp_path):
    from prisim_tpu.io.uvh5 import load_uvh5
    vs = _vs()
    # make baselines consistent with the layout: b = pos(A2) - pos(A1)
    pos = vs.layout["positions"]
    lut = {l: i for i, l in enumerate(vs.layout["labels"])}
    vs.baselines = np.stack([pos[lut[a2]] - pos[lut[a1]]
                             for a2, a1 in vs.labels])
    path = str(tmp_path / "rt.uvh5")
    save_uvh5(vs, path)
    back = load_uvh5(path)
    assert back.nbl == vs.nbl and back.n_acc == vs.n_acc
    np.testing.assert_allclose(back.skyvis, vs.skyvis, rtol=1e-6)
    np.testing.assert_allclose(back.freqs, vs.freqs)
    np.testing.assert_allclose(back.lst, vs.lst, atol=1e-9)
    # ENU baselines recovered from ECEF antenna positions
    np.testing.assert_allclose(back.baselines, vs.baselines, atol=1e-6)
    assert back.latitude == vs.latitude


def test_uvfits_to_visibilityset_roundtrip(tmp_path):
    from prisim_tpu.io.uvfits import load_uvfits
    vs = _vs()
    pos = vs.layout["positions"]
    lut = {l: i for i, l in enumerate(vs.layout["labels"])}
    vs.baselines = np.stack([pos[lut[a2]] - pos[lut[a1]]
                             for a2, a1 in vs.labels])
    from prisim_tpu.vis import project_baselines
    vs = project_baselines(vs)
    path = str(tmp_path / "rt.uvfits")
    save_uvfits(vs, path)
    back = load_uvfits(path)
    assert back.nbl == vs.nbl and back.n_acc == vs.n_acc
    # f32 storage in UVFITS
    np.testing.assert_allclose(back.skyvis, vs.skyvis, atol=2e-6)
    np.testing.assert_allclose(back.freqs, vs.freqs)
    np.testing.assert_allclose(back.baselines, vs.baselines, atol=1e-4)
    np.testing.assert_allclose(back.latitude, vs.latitude, atol=0.2)
    assert back.telescope["id"] == "hera"


def test_flags_propagate_to_uv_exports(tmp_path):
    """Edge-channel flags (bp=0) become negative UVFITS weights and
    UVH5 flag booleans."""
    import h5py
    from prisim_tpu.config import load_parms
    from prisim_tpu.driver import run_simulation
    from prisim_tpu.io.fitsio import read_fits
    p = load_parms({
        "bandpass": {"nchan": 8, "freq": 155e6, "freq_resolution": 1e5},
        "array": {"layout": "HERA-7"},
        "obsparm": {"n_acc": 2, "t_acc": 10.0},
        "skyparm": {"model": "random", "nsrc": 8, "seed": 0},
        "flags": {"bp_flag_repeat": False, "n_edge_flag": [2, 1]},
        "dirstruct": {"rootdir": str(tmp_path), "project": "p"},
        "save_formats": {"fmt": "HDF5", "uvfits": True, "uvh5": True}})
    vs, outdir = run_simulation(p, verbose=False)
    base = outdir + "/simdata/simvis"
    expect_flag = np.array([1, 1, 0, 0, 0, 0, 0, 1], bool)
    with h5py.File(base + ".uvh5") as f:
        fl = f["Data/flags"][()]
    assert (fl[0, :, 0] == expect_flag).all()
    gh = next(h for h in read_fits(base + ".uvfits") if "pars" in h)
    w = gh["data"].reshape(gh["header"]["GCOUNT"], -1, 3)[0, :, 2]
    assert ((w < 0) == expect_flag).all()


def test_dual_pol_run_and_exports(tmp_path):
    """beam.pol='XY' simulates both feeds (Y = X rotated 90 deg in
    azimuth -> different dipole patterns), writes per-pol products and a
    combined two-polarization UVH5/UVFITS (Npols=2, codes XX=-5,
    YY=-6)."""
    import h5py
    from prisim_tpu.config import load_parms
    from prisim_tpu.driver import run_simulation
    from prisim_tpu.io.fitsio import read_fits
    parms = load_parms({
        "dirstruct": {"rootdir": str(tmp_path)},
        "bandpass": {"nchan": 8, "freq": 155e6,
                     "freq_resolution": 195312.5},
        "array": {"layout": "HERA-7", "redundant": False},
        "antenna": {"shape": "dipole", "size": 0.74,
                    "orientation": [0.0, 90.0], "ocoords": "altaz"},
        "beam": {"pol": "XY"},
        "obsparm": {"n_acc": 1, "t_acc": 10.0},
        "skyparm": {"model": "random", "nsrc": 12},
        "save_formats": {"uvh5": True, "npz": False},
        "pp": {"key": "none"}})
    out, outdir = run_simulation(parms, verbose=False)
    vs_x, vs_y = out
    # orientation-sensitive beam: the two pols must differ
    assert np.abs(np.asarray(vs_x.skyvis)
                  - np.asarray(vs_y.skyvis)).max() > 1e-6
    base = os.path.join(outdir, "simdata", "simvis_dualpol")
    with h5py.File(base + ".uvh5") as f:
        assert int(f["Header/Npols"][()]) == 2
        np.testing.assert_array_equal(
            f["Header/polarization_array"][()], [-5, -6])
        vd = f["Data/visdata"][()]
        assert vd.shape[-1] == 2
        expect_x = np.conj(np.transpose(vs_x.skyvis, (2, 0, 1))
                           ).reshape(-1, 8)
        np.testing.assert_allclose(vd[:, :, 0], expect_x, rtol=1e-6)
    gh = next(h for h in read_fits(base + ".uvfits") if "pars" in h)
    assert gh["header"]["NAXIS3"] == 2
    assert gh["header"]["CRVAL3"] == -5.0
    # combined standard 4-pol products are written alongside
    base4 = os.path.join(outdir, "simdata", "simvis_4pol")
    with h5py.File(base4 + ".uvh5") as f:
        assert int(f["Header/Npols"][()]) == 4
        assert f["Data/flags"][()][:, :, 2:].all()
    gh4 = next(h for h in read_fits(base4 + ".uvfits") if "pars" in h)
    assert gh4["header"]["NAXIS3"] == 4


def test_four_pol_exports(tmp_path):
    """four_pol=True writes the standard 4-pol linear axis (XX, YY +
    explicit zero cross-pols): UVFITS STOKES -5..-8 with cross-pol
    weights flagged, UVH5 polarization_array [-5,-6,-7,-8] with
    cross-pol flags set and nsample 0 (interferometry.py:9528-9618
    conventions)."""
    import dataclasses
    import h5py
    vs_x = _vs()
    vs_y = dataclasses.replace(vs_x, skyvis=vs_x.skyvis * 0.5)

    p4 = str(tmp_path / "four.uvfits")
    save_uvfits(vs_x, p4, vs_second=vs_y, four_pol=True)
    gh = next(h for h in read_fits(p4) if "pars" in h)
    hdr = gh["header"]
    assert hdr["NAXIS3"] == 4
    assert hdr["CRVAL3"] == -5.0 and hdr["CDELT3"] == -1.0
    nblts = vs_x.skyvis.shape[0] * vs_x.skyvis.shape[2]
    nchan = vs_x.freqs.size
    data = gh["data"].reshape(nblts, nchan, 4, 3)
    # XX / YY carry the data; XY / YX are explicit zeros, flagged
    expect_x = np.conj(np.transpose(vs_x.skyvis, (2, 0, 1))
                       ).reshape(nblts, nchan)
    np.testing.assert_allclose(data[:, :, 0, 0] + 1j * data[:, :, 0, 1],
                               expect_x, rtol=1e-6)
    np.testing.assert_allclose(
        data[:, :, 1, 0] + 1j * data[:, :, 1, 1], expect_x * 0.5,
        rtol=1e-6)
    assert np.all(data[:, :, 2:, :2] == 0.0)
    assert np.all(data[:, :, :2, 2] > 0)      # sim pols unflagged
    assert np.all(data[:, :, 2:, 2] <= 0)     # cross-pols flagged

    ph = str(tmp_path / "four.uvh5")
    save_uvh5(vs_x, ph, vs_second=vs_y, four_pol=True)
    with h5py.File(ph) as f:
        assert int(f["Header/Npols"][()]) == 4
        np.testing.assert_array_equal(
            f["Header/polarization_array"][()], [-5, -6, -7, -8])
        vd = f["Data/visdata"][()]
        assert vd.shape[-1] == 4
        np.testing.assert_allclose(vd[:, :, 0], expect_x, rtol=1e-6)
        np.testing.assert_allclose(vd[:, :, 1], expect_x * 0.5,
                                   rtol=1e-6)
        assert np.all(vd[:, :, 2:] == 0)
        flags = f["Data/flags"][()]
        ns = f["Data/nsamples"][()]
        assert not flags[:, :, :2].any() and flags[:, :, 2:].all()
        assert np.all(ns[:, :, :2] == 1.0) and np.all(ns[:, :, 2:] == 0)


def test_four_pol_requires_second(tmp_path):
    vs_x = _vs()
    with pytest.raises(ValueError):
        save_uvfits(vs_x, str(tmp_path / "x.uvfits"), four_pol=True)
    with pytest.raises(ValueError):
        save_uvh5(vs_x, str(tmp_path / "x.uvh5"), four_pol=True)
