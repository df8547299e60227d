"""Tooling tests: convert, update-noise, replicate, redundant expansion,
ls/grep, FEKO->HEALPix."""

import os

import numpy as np
import pytest
import yaml

from prisim_tpu.vis import VisibilitySet
from prisim_tpu.io import save_hdf5, load_hdf5
from prisim_tpu import tools


def _vs(tmp_path, redundant=True):
    """Small 4-antenna linear-array sim (redundant baselines)."""
    from prisim_tpu.layouts import ArrayLayout
    from prisim_tpu.baselines import build_baselines
    pos = np.zeros((4, 3))
    pos[:, 0] = 14.6 * np.arange(4)
    layout = ArrayLayout(pos, np.asarray([str(i) for i in range(4)]))
    bls = build_baselines(layout, redundant=redundant)
    nchan, nacc = 8, 2
    rng = np.random.RandomState(0)
    sv = rng.randn(bls.nbl, nchan, nacc) \
        + 1j * rng.randn(bls.nbl, nchan, nacc)
    vs = VisibilitySet(
        baselines=bls.vectors, labels=bls.labels,
        freqs=150e6 + 1e5 * np.arange(nchan),
        lst=np.asarray([10.0, 10.5]), skyvis=sv,
        timestamps=2458000.0 + np.arange(nacc) * 1e-3,
        t_acc=np.full(nacc, 10.0), Tsys=np.full((bls.nbl, nchan, nacc),
                                                180.0),
        latitude=-30.7,
        layout=dict(positions=pos, labels=layout.labels,
                    ids=np.arange(4), coords="ENU"))
    path = str(tmp_path / "sim.hdf5")
    save_hdf5(vs, path)
    return vs, path


def test_convert_formats(tmp_path):
    vs, path = _vs(tmp_path)
    out = str(tmp_path / "conv")
    written = tools.convert(path, out, formats=["hdf5", "npz", "uvfits",
                                                "uvh5"])
    assert len(written) == 4
    for w in written:
        assert os.path.exists(w)
    back = load_hdf5(out + ".hdf5")
    np.testing.assert_allclose(back.skyvis, vs.skyvis)


def test_update_noise(tmp_path):
    vs, path = _vs(tmp_path)
    out = tools.update_noise(path, Tsys=400.0, seed=3)
    assert out.vis is not None
    np.testing.assert_allclose(out.vis - out.vis_noise, vs.skyvis,
                               rtol=1e-6)
    # doubled Tsys -> rms scales by ~2 vs Tsys=200 run
    out2 = tools.update_noise(path, Tsys=200.0, seed=3)
    np.testing.assert_allclose(out.vis_rms / out2.vis_rms, 2.0,
                               rtol=1e-6)
    back = load_hdf5(path)
    assert back.vis is not None  # written in place


def test_replicate_npz(tmp_path):
    vs, path = _vs(tmp_path)
    written = tools.replicate(path, str(tmp_path / "rep"), n_realize=3,
                              fmt="npz")
    with np.load(written[0]) as d:
        assert d["vis"].shape == (3,) + vs.skyvis.shape
        # distinct realizations
        assert not np.allclose(d["noise"][0], d["noise"][1])
        np.testing.assert_allclose(
            d["vis"][0] - d["noise"][0], vs.skyvis, rtol=1e-6)


def test_expand_redundant(tmp_path):
    vs, path = _vs(tmp_path, redundant=True)
    out_path = str(tmp_path / "full.hdf5")
    out = tools.expand_redundant_file(path, out_path)
    assert out.nbl == 6  # 4 antennas all-pairs
    # redundant copies share the unique visibilities
    lens = np.round(out.baseline_lengths, 6)
    for L in np.unique(lens):
        rows = np.where(lens == L)[0]
        for r in rows[1:]:
            np.testing.assert_allclose(out.skyvis[r],
                                       out.skyvis[rows[0]])


def test_ls_and_grep(tmp_path):
    for name, layout in [("sim1", "HERA-19"), ("sim2", "HERA-37")]:
        d = tmp_path / "proj" / name / "metainfo"
        d.mkdir(parents=True)
        with open(d / "simparms.yaml", "w") as f:
            yaml.safe_dump({"array": {"layout": layout},
                            "bandpass": {"nchan": 64}}, f)
    res = tools.list_sims(str(tmp_path / "proj"))
    assert res["sims"] == ["sim1", "sim2"]
    assert "array.layout" in res["diffs"]
    assert "bandpass.nchan" not in res["diffs"]
    hits = tools.grep_sims(str(tmp_path / "proj"),
                           **{"array.layout": "HERA-37"})
    assert hits == ["sim2"]


def test_feko_to_healpix(tmp_path):
    # synthesize a FEKO-like theta/phi grid of a cos^2(theta) beam
    lines = ["# header", "* comment"]
    for th in range(0, 181, 5):
        for ph in range(0, 360, 5):
            e = np.cos(np.radians(th)) if th <= 90 else 0.0
            lines.append("%g %g %g 0 0 0" % (th, ph, e))
    infile = str(tmp_path / "feko.txt")
    with open(infile, "w") as f:
        f.write("\n".join(lines))
    outfile = str(tmp_path / "beam.hdf5")
    hmap = tools.feko_to_healpix(infile, outfile, nside=16)
    from prisim_tpu import healpix as hp
    assert hmap.size == hp.nside2npix(16)
    assert hmap.max() == 1.0
    # zenith pixel ~1, horizon ~0
    t, _ = hp.pix2ang(16, np.arange(hmap.size))
    assert hmap[np.argmin(t)] > 0.9
    assert hmap[np.argmin(np.abs(t - np.pi / 2))] < 0.05
    import h5py
    with h5py.File(outfile) as f:
        assert f["beam"].attrs["nside"] == 16


def test_delay_ps(tmp_path):
    vs, path = _vs(tmp_path)
    out = str(tmp_path / "dps.hdf5")
    dps = tools.delay_ps(path, out, nside_beam=8, clean=True,
                         maxiter=20)
    assert os.path.exists(out)
    # physical sanity: z from mid-band, P(k) cube shapes, finite values
    f0 = vs.freqs[vs.nchan // 2]
    assert abs(dps["z"] - (1420405751.77 / f0 - 1)) < 1e-3
    assert dps["skyvis"].shape == (vs.nbl, vs.nchan, 2)
    assert dps["kprll"].shape == (vs.nchan,)
    assert np.isfinite(dps["skyvis"]).all() and (dps["skyvis"] >= 0).all()
    assert dps["cc_skyvis_ps"].shape == dps["skyvis"].shape
    from prisim_tpu.io.dicth5 import load_dict_hdf5
    back = load_dict_hdf5(out)
    np.testing.assert_allclose(back["skyvis"], dps["skyvis"], rtol=1e-6)
    # subband mode
    f = vs.freqs
    dps2 = tools.delay_ps(path, str(tmp_path / "dps2.hdf5"),
                          nside_beam=8,
                          subband_centers=[f[2], f[5]],
                          subband_bw=[3 * vs.freq_resolution])
    sb = dps2["subband"]
    assert sb["skyvis"].shape[:2] == (vs.nbl, 2)
    assert np.isfinite(sb["skyvis"]).all()
    assert sb["z"][0] > sb["z"][1]  # lower freq -> higher z


def test_xcpdps(tmp_path):
    from prisim_tpu.analysis.bispectrum import (ClosurePhaseData,
                                                read_xcpdps)
    rng = np.random.RandomState(1)
    nlst, ndays, ntri, nchan = 6, 4, 5, 32
    cpd = ClosurePhaseData(
        cp=rng.uniform(-0.4, 0.4, (nlst, ndays, ntri, nchan)),
        wts=np.ones((nlst, ndays, ntri, nchan)),
        freqs=150e6 + 1e5 * np.arange(nchan),
        lst=np.linspace(1.0, 2.0, nlst),
        days=2458000.0 + np.arange(ndays),
        triads=np.array([["%d" % i, "%d" % (i + 1), "%d" % (i + 2)]
                         for i in range(ntri)]))
    npz = str(tmp_path / "cp.npz")
    cpd.save_npz(npz)
    out = str(tmp_path / "xc.hdf5")
    ps = tools.xcpdps(npz, out, ndaybins=2, num_kbins=5)
    assert ps["mode"] == "cross"
    assert ps["P"].shape == (1, nlst, ntri, 2 * nchan)
    assert np.isfinite(ps["P"]).all()
    assert ps["P_kbin"].shape == (1, nlst, ntri, 5)
    back = read_xcpdps(out)
    np.testing.assert_allclose(np.asarray(back["P"]), ps["P"], rtol=1e-6)
    # single day -> auto spectrum fallback
    cpd1 = ClosurePhaseData(cp=cpd.cp[:, :1], wts=cpd.wts[:, :1],
                            freqs=cpd.freqs, lst=cpd.lst,
                            days=cpd.days[:1], triads=cpd.triads)
    npz1 = str(tmp_path / "cp1.npz")
    cpd1.save_npz(npz1)
    ps1 = tools.xcpdps(npz1, str(tmp_path / "xc1.hdf5"))
    assert ps1["mode"] == "auto"
    # auto spectrum of e^{i cp} is real and positive at lag 0 dominance
    assert np.isfinite(ps1["P"]).all()


def test_xcpdps_errinfo_and_rescale(tmp_path):
    from prisim_tpu.analysis.bispectrum import (
        ClosurePhaseData, power_spectrum_uncertainty,
        rescale_power_spectrum, average_rescaled_power_spectrum)
    rng = np.random.RandomState(2)
    nlst, ndays, ntri, nchan = 3, 4, 2, 16
    base = rng.uniform(-0.3, 0.3, (nlst, 1, ntri, nchan))
    # identical days -> subsample differences vanish -> P_err == 0
    cpd = ClosurePhaseData(
        cp=np.broadcast_to(base, (nlst, ndays, ntri, nchan)).copy(),
        wts=np.ones((nlst, ndays, ntri, nchan)),
        freqs=150e6 + 1e5 * np.arange(nchan),
        lst=np.linspace(1.0, 2.0, nlst),
        days=2458000.0 + np.arange(ndays),
        triads=np.array([["0", "1", "2"], ["1", "2", "3"]]))
    err = power_spectrum_uncertainty(
        cpd, [cpd.freqs[nchan // 2]], [4e5], ndaybins=2)
    np.testing.assert_allclose(err["P_err"], 0.0, atol=1e-20)
    # noisy days -> nonzero uncertainty
    cpd2 = cpd
    cpd2.cp = cpd.cp + rng.normal(0, 0.1, cpd.cp.shape)
    err2 = power_spectrum_uncertainty(
        cpd2, [cpd.freqs[nchan // 2]], [4e5], ndaybins=2)
    assert np.abs(err2["P_err"]).max() > 0
    # rescaling: constant |V|=2 on all 3 baselines -> mult = 4/3
    ps = dict(P=np.ones((1, nlst, ntri, 8)), lst=cpd.lst,
              kprll=np.linspace(-1, 1, 8)[None])
    fw = np.ones((1, nchan))
    vt = np.full((nlst, 3, nchan), 2.0 + 0.0j)
    out = rescale_power_spectrum(ps, fw, vt, cpd.lst)
    np.testing.assert_allclose(out["absscale_mult"], 4.0 / 3.0)
    np.testing.assert_allclose(out["P_absscale"], 4.0 / 3.0)
    # averaging with inverse-variance weights preserves a constant
    avg = average_rescaled_power_spectrum(out["P_absscale"], ps["kprll"],
                                          avgax=(1, 2), kprll_llim=0.2)
    assert avg.shape == (1, 1, 1, 8)
    np.testing.assert_allclose(avg, 4.0 / 3.0)


def test_xcpdps_full_cli(tmp_path):
    """--cohax/--incohax/--collapse-axes route through xcpdps_full and
    the result round-trips through the HDF5 writer."""
    from prisim_tpu.analysis.bispectrum import (ClosurePhaseData,
                                                read_xcpdps)
    rng = np.random.RandomState(2)
    nlst, ndays, ntri, nchan = 5, 4, 4, 32
    cpd = ClosurePhaseData(
        cp=rng.uniform(-0.4, 0.4, (nlst, ndays, ntri, nchan)),
        wts=np.ones((nlst, ndays, ntri, nchan)),
        freqs=150e6 + 1e5 * np.arange(nchan),
        lst=np.linspace(1.0, 2.0, nlst),
        days=2458000.0 + np.arange(ndays),
        triads=np.array([["%d" % i, "%d" % (i + 1), "%d" % (i + 2)]
                         for i in range(ntri)]))
    npz = str(tmp_path / "cp.npz")
    cpd.save_npz(npz)
    out = str(tmp_path / "xcf.hdf5")
    ps = tools.xcpdps(npz, out, ndaybins=2, cohax=[2], incohax=[1, 3],
                      collapse_axes=[3], lst_shifts=[0, 1])
    assert ps["mode"] == "xcpdps_full"
    # (nwin, nshift, nlst, ndaybins->1, 2*ntri-1, nlag)
    assert ps["P"].shape == (1, 2, nlst, 1, 2 * ntri - 1, 2 * nchan)
    back = read_xcpdps(out)
    np.testing.assert_allclose(np.asarray(back["P"]), ps["P"],
                               rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(back["diagoffsets"]["3"]),
        np.arange(-(ntri - 1), ntri))
