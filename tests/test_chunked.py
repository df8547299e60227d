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
