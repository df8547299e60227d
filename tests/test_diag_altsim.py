"""Diagnostics (resource monitor, phase timer) and pyuvsim interop."""

import json
import os
import time

import numpy as np

from prisim_tpu.diagnostics import ResourceMonitor, phase_timer
from prisim_tpu.altsim import pyuvsim_to_parms, parms_to_pyuvsim
from prisim_tpu.config import load_parms


def test_resource_monitor(tmp_path):
    path = str(tmp_path / "mon.jsonl")
    with ResourceMonitor(path, interval=0.05):
        x = np.random.randn(200, 200) @ np.random.randn(200, 200)
        # a loaded machine can starve the sampler thread: wait until it
        # has produced the two samples the assertions need (bounded)
        deadline = time.time() + 10.0
        while time.time() < deadline:
            try:
                if sum(1 for _ in open(path)) >= 2:
                    break
            except OSError:
                pass
            time.sleep(0.05)
    rows = [json.loads(l) for l in open(path)]
    assert len(rows) >= 2
    assert all("rss_bytes" in r and r["rss_bytes"] > 0 for r in rows)


def test_phase_timer_sink():
    sink = {}
    with phase_timer("stage1", sink, verbose=False):
        time.sleep(0.01)
    assert sink["stage1"] >= 0.01


def test_resource_monitor_in_driver(tmp_path):
    from prisim_tpu.driver import run_simulation
    p = load_parms({
        "dirstruct": {"rootdir": str(tmp_path)},
        "bandpass": {"nchan": 8, "freq": 155e6,
                     "freq_resolution": 195312.5},
        "array": {"layout": "HERA-7"},
        "obsparm": {"n_acc": 1, "t_acc": 10.0},
        "skyparm": {"model": "random", "nsrc": 8},
        "diagnosis": {"resource_monitor": True,
                      "refresh_interval": 0.05}})
    run_simulation(p, verbose=False, save=False)
    assert os.path.exists(str(tmp_path / "resource_monitor.jsonl"))


def test_pyuvsim_roundtrip(tmp_path):
    parms = load_parms({
        "telescope": {"id": "hera", "latitude": -30.72,
                      "longitude": 21.43, "altitude": 1050.0},
        "array": {"layout": "HERA-7"},
        "bandpass": {"nchan": 16, "freq": 155e6,
                     "freq_resolution": 97656.25},
        "obsparm": {"n_acc": 3, "t_acc": 11.0}})
    obs_path = parms_to_pyuvsim(parms, str(tmp_path / "uvs"))
    assert os.path.exists(obs_path)
    back = pyuvsim_to_parms(obs_path)
    assert back["bandpass"]["nchan"] == 16
    np.testing.assert_allclose(back["bandpass"]["freq_resolution"],
                               97656.25)
    assert back["obsparm"]["n_acc"] == 3
    assert back["telescope"]["latitude"] == -30.72
    assert back["array"]["file"] is not None
    # layout csv parses back to 7 antennas
    from prisim_tpu.driver import build_layout
    lay = build_layout(back)
    assert len(lay.labels) == 7


def test_jax_profile_hook(tmp_path):
    from prisim_tpu.driver import run_simulation
    prof = str(tmp_path / "trace")
    p = load_parms({
        "bandpass": {"nchan": 8, "freq": 155e6,
                     "freq_resolution": 195312.5},
        "array": {"layout": "HERA-7"},
        "obsparm": {"n_acc": 1, "t_acc": 10.0},
        "skyparm": {"model": "random", "nsrc": 8},
        "diagnosis": {"jax_profile": prof}})
    run_simulation(p, verbose=False, save=False)
    import glob
    assert glob.glob(prof + "/**/*", recursive=True), \
        "profiler wrote no trace files"
