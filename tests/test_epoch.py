"""Epoch handling: obs_date-derived JD, catalog precession, beam_switch.

Reference behaviors: run_prisim.py:661-667 (JD from obs_date + LST),
run_prisim.py:1690-1692 (sky precessed to the observing epoch),
run_prisim.py:563-656 (beam_switch snapshot selection)."""

import numpy as np

from prisim_tpu import ephemeris as eph
from prisim_tpu.config import load_parms
from prisim_tpu.driver import (build_schedule, build_sky,
                               build_frequencies, run_simulation,
                               precess_sky_to_obs_epoch)


def _parms(**over):
    base = {
        "bandpass": {"nchan": 8, "freq": 155e6,
                     "freq_resolution": 195312.5},
        "array": {"layout": "HERA-7"},
        "obsparm": {"n_acc": 2, "t_acc": 60.0, "obs_date": "2015/11/23"},
        "skyparm": {"model": "random", "nsrc": 16, "seed": 3},
    }
    for k, v in over.items():
        base.setdefault(k, {}).update(v) if isinstance(v, dict) \
            else base.__setitem__(k, v)
    return load_parms(base)


def test_jd_init_from_obs_date():
    """With pointing.jd_init unset, the JD comes from obsparm.obs_date:
    LST at jd_init equals pointing.lst_init, and the date is obs_date."""
    p = _parms(pointing={"lst_init": 4.5})          # hours
    lon = float(p["telescope"]["longitude"])
    obs = build_schedule(p, -30.7, lon)
    t_acc = 60.0
    jd_init = obs.jd[0] - 0.5 * t_acc / 86400.0
    assert abs(jd_init - eph.julian_date(2015, 11, 23)) < 1.0
    lst0 = eph.lst_deg(jd_init, lon)
    assert abs((lst0 - 4.5 * 15.0 + 180) % 360 - 180) < 1e-6


def test_explicit_jd_init_still_wins():
    p = _parms(pointing={"jd_init": 2458123.5, "lst_init": 0.0})
    obs = build_schedule(p, -30.7)
    assert abs(obs.jd[0] - (2458123.5 + 0.5 * 60.0 / 86400.0)) < 1e-9


def test_sky_precession_applied_by_driver():
    """A J2000 catalog observed in 2015 is precessed with the IAU
    matrix: driver-run equals a run fed the manually precessed catalog
    with precession disabled (same seed -> same base catalog)."""
    p1 = _parms()
    vs1, _ = run_simulation(p1, verbose=False, save=False)

    p2 = _parms()
    freqs = build_frequencies(p2)
    sky = build_sky(p2, freqs)
    obs = build_schedule(p2, float(p2["telescope"]["latitude"]))
    manual = precess_sky_to_obs_epoch(sky, p2, obs)
    # the 2000->2015 shift is real (~0.2 deg global scale)
    shift = np.abs(manual.location - sky.location)
    shift[:, 0] = (shift[:, 0] + 180) % 360 - 180
    assert shift.max() > 0.01
    vs2, _ = run_simulation(p2, verbose=False, save=False,
                            _sky_override=manual)
    np.testing.assert_allclose(vs2.skyvis, vs1.skyvis, rtol=1e-6,
                               atol=1e-8)


def test_precession_noop_at_same_epoch():
    p = _parms()
    p["skyparm"]["epoch"] = None
    freqs = build_frequencies(p)
    sky = build_sky(p, freqs)
    obs = build_schedule(p, -30.7)
    out = precess_sky_to_obs_epoch(sky, p, obs)
    np.testing.assert_array_equal(out.location, sky.location)


def test_beam_switch_selects_pointing_changes(tmp_path):
    """beam_switch keeps only snapshots where the pointing changes
    (pointing-file mode)."""
    pf = tmp_path / "pointings.txt"
    rows = [(10.0, 90.0, 270.0), (10.5, 90.0, 270.0),
            (11.0, 80.0, 180.0), (11.5, 80.0, 180.0),
            (12.0, 70.0, 0.0)]
    pf.write_text("\n".join("%g %g %g" % r for r in rows))
    p = _parms(pointing={"file": str(pf)},
               snapshot={"beam_switch": True, "all": False})
    obs = build_schedule(p, -30.7)
    assert obs.n_acc == 3
    np.testing.assert_allclose(obs.pointing_altaz[:, 0],
                               [90.0, 80.0, 70.0])
    # dns semantics (run_prisim.py:604-660): each kept snapshot spans
    # its whole drift segment — LST midpoint, duration from the edges
    from prisim_tpu.driver import SIDEREAL_DEG_PER_SEC
    np.testing.assert_allclose(obs.lst_deg, [10.5, 11.5, 12.25])
    np.testing.assert_allclose(obs.t_acc * SIDEREAL_DEG_PER_SEC,
                               [1.0, 1.0, 0.5])
    # sub-threshold wobble (< 1 deg) is NOT a switch
    pf2 = pf.parent / "pointings2.txt"
    pf2.write_text("\n".join("%g %g %g" % r for r in
                             [(10.0, 90.0, 270.0), (10.5, 89.8, 270.0),
                              (11.0, 70.0, 0.0)]))
    p2 = _parms(pointing={"file": str(pf2)},
                snapshot={"beam_switch": True, "all": False})
    assert build_schedule(p2, -30.7).n_acc == 2


def test_memuse_bounds_src_block():
    from prisim_tpu.driver import _src_block_from_memuse
    p = _parms()
    p["processing"]["memuse"] = 0.001           # 1 MB -> tiny blocks
    blk = _src_block_from_memuse(p, nbl=100, nchan=1024, nsrc=5000)
    assert blk == max(16, int(0.001 * 2**30 / (100 * 1024 * 8)))
    p["processing"]["memuse"] = None
    assert _src_block_from_memuse(p, 100, 1024, 5000) is None
