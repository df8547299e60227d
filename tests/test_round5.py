"""Round-5 regressions: collapsed banded plans through the cross-check
gate (ADVICE r4 high finding), node-model safety warning, multi-device
gate parity."""

import numpy as np

from prisim_tpu.config import load_parms
from prisim_tpu.driver import run_simulation


def test_banded_gate_with_collapsed_plan(capsys):
    """ADVICE r4 (high): with array.redundant=False the all-pairs
    baseline set reaches make_banded_plan uncollapsed, the plan dedups
    21 -> 9 canonical rows (HERA-7), and the gate's banded accumulator
    must run over the COLLAPSED rows while the direct-side cross-check
    accumulators run over the full set. Previously raised
    'add got incompatible shapes (21,40,16), (9,40,16)'."""
    base = {
        "bandpass": {"nchan": 16, "freq": 150e6,
                     "freq_resolution": 195312.5},
        "array": {"layout": "HERA-7", "redundant": False},
        "obsparm": {"n_acc": 1, "t_acc": 60.0},
        "skyparm": {"model": "random", "nsrc": 64, "seed": 5},
        "pp": {"key": "none"},
    }
    p = load_parms(dict(base, processing={
        "engine": "nufft", "nufft_spread": "banded"}))
    vs, _ = run_simulation(p, verbose=True, save=False)
    out = capsys.readouterr().out
    assert "shared-amps cross-check ok" in out
    assert vs.skyvis.shape[0] == 21          # full all-pairs rows out
    # against the direct engine on the same (uncollapsed) baselines
    p2 = load_parms(dict(base, processing={"engine": "direct"}))
    vs2, _ = run_simulation(p2, verbose=False, save=False)
    g = np.abs(np.asarray(vs2.skyvis)).max()
    rel = np.abs(np.asarray(vs.skyvis)
                 - np.asarray(vs2.skyvis)).max() / g
    assert rel < 2e-6


def test_mesh_banded_gate_demotes_degraded_run(capsys):
    """VERDICT r4 item 5: the multi-device banded path carries the same
    shared-amps 2e-6 gate as the single-device path. A deliberately
    degraded run (forced rank 4 over a full octave) must trip it and
    demote to the direct engine."""
    import jax
    assert len(jax.devices()) == 8
    base = {
        "bandpass": {"nchan": 32, "freq": 150e6,
                     "freq_resolution": 3.125e6},   # 100-200 MHz octave
        "array": {"layout": "HERA-7"},
        "obsparm": {"n_acc": 1, "t_acc": 60.0},
        "skyparm": {"model": "random", "nsrc": 128, "seed": 5},
        "pp": {"key": "bl"},
    }
    p = load_parms(dict(base, processing={
        "engine": "nufft", "nufft_spread": "banded", "nufft_rank": 4}))
    vs, _ = run_simulation(p, verbose=True, save=False)
    out = capsys.readouterr().out
    assert "mesh shared-amps cross-check FAILED" in out
    p2 = load_parms(dict(base, processing={"engine": "direct"}))
    vs2, _ = run_simulation(p2, verbose=False, save=False)
    np.testing.assert_allclose(np.asarray(vs.skyvis),
                               np.asarray(vs2.skyvis), rtol=0, atol=0)


def test_mesh_banded_gate_passes_good_run(capsys):
    """A healthy multi-device banded run passes the mesh shared-amps
    gate at its 2e-6 default."""
    import jax
    assert len(jax.devices()) == 8
    p = load_parms({
        "bandpass": {"nchan": 16, "freq": 155e6,
                     "freq_resolution": 195312.5},
        "array": {"layout": "HERA-7"},
        "obsparm": {"n_acc": 1, "t_acc": 60.0},
        "skyparm": {"model": "random", "nsrc": 32, "seed": 4},
        "pp": {"key": "bl"},
        "processing": {"engine": "nufft", "nufft_spread": "banded"}})
    vs, _ = run_simulation(p, verbose=True, save=False)
    out = capsys.readouterr().out
    assert "mesh shared-amps cross-check ok" in out
    assert np.isfinite(np.asarray(vs.skyvis)).all()
