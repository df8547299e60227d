"""Chunked execution with checkpoint/resume (part files + concatenate)."""

import os

import numpy as np
import pytest

from prisim_tpu.config import load_parms
from prisim_tpu.driver import run_simulation, run_simulation_chunked


def _parms(tmp_path, n_chunks, key="freq", cleanup=0):
    return load_parms({
        "dirstruct": {"rootdir": str(tmp_path), "project": "p",
                      "simid": "chunked"},
        "bandpass": {"nchan": 16, "freq": 155e6,
                     "freq_resolution": 195312.5},
        "array": {"layout": "HERA-7"},
        "obsparm": {"n_acc": 4, "t_acc": 60.0},
        "skyparm": {"model": "random", "nsrc": 24, "seed": 6},
        "pp": {"key": key, "n_chunks": n_chunks},
        "processing": {"cleanup": cleanup},
        "save_formats": {"npz": False},
    })


@pytest.mark.parametrize("key,axis", [("freq", 1), ("bl", 2)])
def test_chunked_matches_single_shot(tmp_path, key, axis):
    vs, outdir = run_simulation_chunked(_parms(tmp_path, 2, key=key),
                                        verbose=False)
    single, _ = run_simulation(_parms(tmp_path / "s", 1), verbose=False,
                               save=False)
    assert vs.skyvis.shape == single.skyvis.shape
    scale = np.abs(single.skyvis).max()
    assert np.abs(vs.skyvis - single.skyvis).max() / scale < 5e-6
    # part files kept with cleanup=0
    assert os.path.exists(os.path.join(outdir, "simdata",
                                       "_part_0.hdf5"))


def test_resume_skips_existing_parts(tmp_path, capsys):
    parms = _parms(tmp_path, 2)
    vs1, outdir = run_simulation_chunked(parms, verbose=False)
    # corrupt nothing; re-run -> both parts skipped, same result
    vs2, _ = run_simulation_chunked(parms, outdir=outdir, verbose=True)
    out = capsys.readouterr().out
    assert out.count("resume: part") == 2
    np.testing.assert_allclose(vs2.skyvis, vs1.skyvis)


def test_cleanup_removes_parts(tmp_path):
    vs, outdir = run_simulation_chunked(_parms(tmp_path, 2, cleanup=1),
                                        verbose=False)
    assert not os.path.exists(os.path.join(outdir, "simdata",
                                           "_part_0.hdf5"))
    assert os.path.exists(os.path.join(outdir, "simdata",
                                       "simvis.hdf5"))

def test_chunked_noise_independent_per_chunk(tmp_path):
    """Equal-size chunks must NOT repeat the same thermal-noise block
    (round-1 bug: same PRNGKey in every chunk). The chunk index is
    folded into the key, so the two frequency halves draw independent
    noise."""
    parms = _parms(tmp_path, 2)
    parms["telescope"]["Tsys"] = 200.0
    vs, _ = run_simulation_chunked(parms, verbose=False)
    n = np.asarray(vs.vis_noise)
    half = n.shape[1] // 2
    a, b = n[:, :half, :], n[:, half:, :]
    assert np.abs(a - b).max() > 1e-6 * np.abs(a).max()


def test_chunked_bandpass_global_flags(tmp_path):
    """flags.flag_chan indices are FULL-BAND channel indices; edge flags
    apply to the full band only (run_prisim.py:898-981). A 2-chunk run
    must flag the same channels as the single-shot run."""
    def with_flags(p):
        p["flags"]["flag_chan"] = [9]       # inside chunk 1 (chans 8-15)
        p["flags"]["n_edge_flag"] = [2, 1]
        p["processing"]["bpass_shape"] = "bhw"
        return p
    vs, _ = run_simulation_chunked(with_flags(_parms(tmp_path, 2)),
                                   verbose=False)
    single, _ = run_simulation(with_flags(_parms(tmp_path / "s", 1)),
                               verbose=False, save=False)
    np.testing.assert_allclose(vs.bp, single.bp)
    np.testing.assert_allclose(vs.bp_wts, single.bp_wts, rtol=1e-12)
    # sanity: chunk-local edges were NOT flagged (chans 6,7 stay alive)
    assert vs.bp[0, 6, 0] == 1.0 and vs.bp[0, 7, 0] == 1.0
    assert vs.bp[0, 9, 0] == 0.0
    assert vs.bp[0, 0, 0] == 0.0 and vs.bp[0, 15, 0] == 0.0


def test_chunked_delay_transform_recomputed(tmp_path):
    """Merged chunked runs recompute the delay transform over the full
    band (concatenate drops partial-band lag products)."""
    from prisim_tpu.vis import delay_transform
    parms = _parms(tmp_path, 2)
    parms["processing"]["delay_transform"] = True
    vs, _ = run_simulation_chunked(parms, verbose=False)
    assert vs.lags is not None and vs.skyvis_lag is not None
    assert vs.lags.size == 16
    golden = delay_transform(vs)
    np.testing.assert_allclose(np.asarray(vs.skyvis_lag),
                               np.asarray(golden.skyvis_lag),
                               rtol=1e-5, atol=1e-8)
