"""Reproduce the banded cross-check gate failure seen on BASELINE
config #3 (HERA-37, 256 chan x 390.625 kHz = a full octave at 150 MHz):
the gate measured rel=2.77e-05 on the chip and demoted to the direct
engine. Runs the driver small on the CPU backend with verbose gate
output, sweeping nufft_rank / node-model / truth-amps knobs.

Usage: JAX_PLATFORMS=cpu python benchmarks/probe_cfg3_gate.py
"""
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from prisim_tpu.config import load_parms  # noqa: E402
from prisim_tpu.driver import run_simulation  # noqa: E402


def run(tag, nside=32, n_acc=2, **proc):
    root = "/tmp/probe_cfg3_gate"
    shutil.rmtree(root, ignore_errors=True)
    parms = load_parms({
        "dirstruct": {"rootdir": root, "project": "p"},
        "telescope": {"id": "hera", "latitude": -30.7224,
                      "A_eff": 154.0, "eff_Q": 0.96, "Trx": 100.0},
        "array": {"layout": "HERA-37", "redundant": True},
        "antenna": {"shape": "dish", "size": 14.0},
        "bandpass": {"freq": 150e6, "freq_resolution": 390625.0,
                     "nchan": 256},
        "obsparm": {"obs_mode": "drift", "n_acc": n_acc, "t_acc": 60.0},
        "pointing": {"lst_init": 0.0},
        "skyparm": {"model": "usm", "nside": nside},
        "processing": dict({"engine": "nufft"}, **proc),
        "save_formats": {"fmt": "HDF5", "npz": False},
    })
    print("=== %s ===" % tag, flush=True)
    vs, _ = run_simulation(parms, verbose=True, save=False)
    return vs


if __name__ == "__main__":
    run("default (auto rank, node model, truth auto)")
    run("rank 48", nufft_rank=48)
    run("node model OFF", nufft_node_model=False)
    run("truth OFF", nufft_truth_amps=False)
    run("truth OFF + node OFF", nufft_truth_amps=False,
        nufft_node_model=False)
