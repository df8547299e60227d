"""Gain-table tests: HDF5 round-trip, interpolation, baseline extraction
conventions (g_A2 * conj(g_A1); reversed baseline-based rows conjugate)."""

import numpy as np
import pytest

from prisim_tpu.gains import GainTable, GainInfo, apply_gains


def _antenna_table(nant=4, nchan=8, nt=3, seed=0):
    rng = np.random.RandomState(seed)
    g = (rng.randn(nant, nchan, nt) + 1j * rng.randn(nant, nchan, nt))
    return GainTable(g, label=np.asarray([str(i) for i in range(nant)]),
                     frequency=np.linspace(100e6, 108e6, nchan),
                     time=np.arange(nt, dtype=float))


def test_antenna_gain_extraction_convention():
    tab = _antenna_table()
    gi = GainInfo(antenna_based=tab)
    bl_labels = np.asarray([["1", "0"], ["3", "2"]])  # (A2, A1)
    out = gi.eval_gains(bl_labels, freqs=tab.frequency, times=tab.time)
    assert out.shape == (2, 8, 3)
    np.testing.assert_allclose(out[0], tab.gains[1] * np.conj(tab.gains[0]),
                               rtol=1e-12)
    np.testing.assert_allclose(out[1], tab.gains[3] * np.conj(tab.gains[2]),
                               rtol=1e-12)


def test_baseline_gain_reversed_conjugates():
    rng = np.random.RandomState(1)
    g = rng.randn(1, 4, 1) + 1j * rng.randn(1, 4, 1)
    tab = GainTable(g, label=np.asarray([["0", "1"]]),
                    frequency=np.linspace(100e6, 103e6, 4))
    gi = GainInfo(baseline_based=tab)
    fwd = gi.eval_gains(np.asarray([["0", "1"]]), freqs=tab.frequency)
    rev = gi.eval_gains(np.asarray([["1", "0"]]), freqs=tab.frequency)
    np.testing.assert_allclose(rev, np.conj(fwd), rtol=1e-12)
    # unknown baseline -> unity
    unk = gi.eval_gains(np.asarray([["5", "6"]]), freqs=tab.frequency)
    np.testing.assert_allclose(unk, 1.0)


def test_scalar_broadcast_table():
    gi = GainInfo(antenna_based=GainTable(np.asarray(2.0 + 0j)))
    out = gi.eval_gains(np.asarray([["0", "1"]]), freqs=np.arange(5.0),
                        times=np.arange(3.0))
    assert out.shape == (1, 5, 3)
    np.testing.assert_allclose(out, 4.0)  # g * conj(g) = |2|^2


@pytest.mark.parametrize("kind", ["linear", "cubic", "nearest"])
def test_interpolation_recovers_grid_points(kind):
    tab = _antenna_table(nchan=16)
    sub = tab.frequency[::2]
    out = tab.interpolated(freqs=sub, kind=kind)
    np.testing.assert_allclose(out.gains, tab.gains[:, ::2, :], rtol=1e-9)


def test_cubic_interp_smooth_function():
    f = np.linspace(100e6, 110e6, 32)
    phase = 2 * np.pi * (f - f[0]) / 40e6
    g = np.exp(1j * phase)[None, :, None]
    tab = GainTable(g, label=np.asarray(["0"]), frequency=f)
    fq = np.linspace(100e6, 110e6, 101)
    out = tab.interpolated(freqs=fq, kind="cubic").gains
    expect = np.exp(1j * 2 * np.pi * (fq - f[0]) / 40e6)[None, :, None]
    np.testing.assert_allclose(out, expect, atol=1e-4)


def test_hdf5_roundtrip(tmp_path):
    gi = GainInfo(antenna_based=_antenna_table(),
                  baseline_based=GainTable(
                      np.asarray([[[1.5 - 0.5j]]]),
                      label=np.asarray([["0", "1"]])))
    path = str(tmp_path / "gains.hdf5")
    gi.write_hdf5(path)
    back = GainInfo.read_hdf5(path)
    np.testing.assert_allclose(back.antenna_based.gains,
                               gi.antenna_based.gains)
    np.testing.assert_allclose(back.antenna_based.frequency,
                               gi.antenna_based.frequency)
    assert list(back.antenna_based.label) == list(gi.antenna_based.label)
    np.testing.assert_allclose(back.baseline_based.gains,
                               gi.baseline_based.gains)


def test_axes_ordering_normalized(tmp_path):
    import h5py
    nant, nchan, nt = 3, 4, 2
    rng = np.random.RandomState(2)
    g = rng.randn(nt, nant, nchan) + 1j * rng.randn(nt, nant, nchan)
    path = str(tmp_path / "g.hdf5")
    with h5py.File(path, "w") as f:
        grp = f.create_group("antenna-based")
        grp["ordering"] = np.asarray([b"time", b"label", b"frequency"])
        grp["gains"] = g
        grp["label"] = np.asarray([b"0", b"1", b"2"])
    gi = GainInfo.read_hdf5(path)
    np.testing.assert_allclose(gi.antenna_based.gains,
                               np.transpose(g, (1, 2, 0)))


def test_apply_gains():
    rng = np.random.RandomState(3)
    vis = rng.randn(2, 4, 3) + 1j * rng.randn(2, 4, 3)
    gains = rng.randn(2, 4, 3) + 1j * rng.randn(2, 4, 3)
    noise = rng.randn(2, 4, 3) + 1j * rng.randn(2, 4, 3)
    np.testing.assert_allclose(apply_gains(vis, gains, noise),
                               gains * vis + noise)


def test_spline_gains_2d_golden(tmp_path):
    """kind='spline' matches a hand-built scipy RectBivariateSpline
    golden through the full read->eval path (GainInfo.splinator/
    spline_gains, interferometry.py:3107-3599)."""
    from scipy.interpolate import RectBivariateSpline
    import h5py
    nant, nchan, nt = 3, 12, 6
    f = np.linspace(100e6, 111e6, nchan)
    t = np.linspace(0.0, 5.0, nt)
    rng = np.random.RandomState(5)
    g = (1.0 + 0.1 * rng.randn(nant, nchan, nt)
         + 1j * 0.1 * rng.randn(nant, nchan, nt))
    path = str(tmp_path / "gains.hdf5")
    with h5py.File(path, "w") as fh:        # reference HDF5 schema
        grp = fh.create_group("antenna-based")
        grp["ordering"] = np.asarray([b"label", b"frequency", b"time"])
        grp["gains"] = g
        grp["label"] = np.asarray([b"0", b"1", b"2"])
        grp["frequency"] = f
        grp["time"] = t
    gi = GainInfo.read_hdf5(path)
    fq = np.linspace(100.5e6, 110.5e6, 7)
    tq = np.linspace(0.25, 4.75, 4)
    s = 0.5
    out = gi.eval_gains(np.asarray([["1", "0"]]), freqs=fq, times=tq,
                        kind="spline", smoothness=s)

    def spl(a):                              # golden (per label)
        re = RectBivariateSpline(t, f, a.real.T, s=s)
        im = RectBivariateSpline(t, f, a.imag.T, s=s)
        return (re(tq, fq) + 1j * im(tq, fq)).T
    golden = spl(g[1]) * np.conj(spl(g[0]))
    np.testing.assert_allclose(out[0], golden, rtol=1e-10)


@pytest.mark.parametrize("axis", ["freq", "time"])
def test_spline_gains_1d_smoothing(axis):
    """One varying axis -> UnivariateSpline with smoothing: a large
    smoothness flattens noisy gains toward their mean (the point of the
    reference's splinator over plain interpolation)."""
    from scipy.interpolate import UnivariateSpline
    n = 32
    x = np.linspace(0.0, 1.0, n)
    rng = np.random.RandomState(9)
    noisy = 2.0 + 0.05 * rng.randn(n)
    if axis == "freq":
        tab = GainTable(noisy.reshape(1, n, 1).astype(complex),
                        label=np.asarray(["0"]),
                        frequency=x)
        kw = dict(freqs=x)
    else:
        tab = GainTable(noisy.reshape(1, 1, n).astype(complex),
                        label=np.asarray(["0"]),
                        time=x)
        kw = dict(times=x)
    gi = GainInfo(antenna_based=tab)
    out = gi.eval_gains(np.asarray([["0", "0"]]), kind="spline",
                        smoothness=10.0, **kw)
    g_spl = UnivariateSpline(x, noisy, s=10.0, k=3)(x)
    golden = (g_spl * np.conj(g_spl)).reshape(-1)
    np.testing.assert_allclose(out[0].ravel(), golden, rtol=1e-10)
    # heavily smoothed -> much flatter than the raw |g|^2
    assert np.std(out[0].real) < 0.5 * np.std(noisy ** 2)
