"""BASELINE.json configs #2 and #5 measurements (VERDICT r2 item 6).

#2: MWA-128-scale point-source catalog sim — 128-antenna array,
    256 chans, chromatic dipole beam, 10 accumulations.
#5: SKA-low-scale closure phases — 512 antennas, redundant triads
    through the bispectrum-phase pipeline.

    python benchmarks/bench_configs.py [2|5] [--small]

Each prints one JSON line with wall-clock and shape details. --small
shrinks for CPU smoke runs (the full sizes want the chip).
"""

import argparse
import json
import time

import numpy as np


def config2(small=False):
    """MWA-128 catalog sim: the reference's config (dipole beams with
    ground plane, chromatic, point-source catalog, 10 acc). The MWA
    layout data file is not bundled (reference downloads it); a
    128-antenna random-uniform 1.5 km layout stands in — same baseline
    count and source regime."""
    import jax
    from prisim_tpu.config import load_parms
    from prisim_tpu.driver import run_simulation
    from prisim_tpu.layouts import ArrayLayout
    from prisim_tpu import layouts as lay

    nant = 32 if small else 128
    nchan = 32 if small else 256
    nsrc = 256 if small else 4096
    n_acc = 2 if small else 10
    rng = np.random.default_rng(42)
    pos = np.zeros((nant, 3))
    pos[:, :2] = rng.uniform(-750, 750, (nant, 2))
    layout = ArrayLayout(positions=pos,
                         labels=np.asarray([f"A{i}" for i in range(nant)]))
    # register as a transient preset via layout file? run_simulation
    # accepts explicit positions through array.layout_positions
    loc = np.stack([rng.uniform(0, 360, nsrc),
                    rng.uniform(-80, 20, nsrc)], axis=-1)
    flux = rng.pareto(1.8, nsrc) + 0.05
    spindex = rng.normal(-0.83, 0.1, nsrc)
    import tempfile
    cat = tempfile.NamedTemporaryFile(suffix=".txt", delete=False,
                                      mode="w")
    cat.write("ra dec flux freq spindex\n")
    for i in range(nsrc):
        cat.write(f"{loc[i,0]:.6f} {loc[i,1]:.6f} {flux[i]:.4f} "
                  f"150e6 {spindex[i]:.4f}\n")
    cat.close()
    parms = load_parms({
        "dirstruct": {"rootdir": "/tmp", "project": "bench_cfg2"},
        "telescope": {"id": "mwa_dipole", "latitude": -26.7,
                      "A_eff": 21.0, "Trx": 50.0},
        "array": {"layout_positions": pos.tolist()},
        "antenna": {"shape": "dipole", "size": 0.74},
        "beam": {"use_external": False, "chromatic": True},
        "bandpass": {"freq": 150e6, "freq_resolution": 160e3,
                     "nchan": nchan},
        "obsparm": {"obs_mode": "drift", "n_acc": n_acc, "t_acc": 112.0},
        "pointing": {"lst_init": 0.0},
        "skyparm": {"model": "custom", "custom_file": cat.name},
        "save_formats": {"fmt": "HDF5", "npz": False},
    })
    t0 = time.perf_counter()
    vs, _ = run_simulation(parms, verbose=False, save=False)
    dt = time.perf_counter() - t0
    assert np.isfinite(vs.skyvis).all()
    return dict(config="mwa128-catalog", seconds=dt, nant=nant,
                nbl=vs.skyvis.shape[0], nchan=nchan, nsrc=nsrc,
                n_acc=n_acc)


def config5(small=False):
    """512-antenna closure-phase pipeline at scale: redundant-triad
    closure phases -> NPZ layout -> day binning -> cpds FT -> xcpdps."""
    import jax
    import jax.numpy as jnp
    from prisim_tpu import layouts as lay, baselines as bls
    from prisim_tpu import twofloat as tf
    from prisim_tpu.skymodel import SkyModel
    from prisim_tpu.engine import (Instrument, SkySources,
                                   enu_rotation_from_eq)
    from prisim_tpu.engine.observe import simulate_drift
    from prisim_tpu.analysis.closure import (three_point_combinations,
                                             closure_phases)
    from prisim_tpu.analysis.bispectrum import (cpds_ft, xcpdps_full,
                                                smooth_in_tbins_arrays)
    from prisim_tpu.utils import get_complex
    from prisim_tpu.layouts import hexagon_generator

    # 512-antenna-scale hex (joined): hexagon 331 + outriggers is the
    # SKA-low analog; use HERA-briggs hex 469 + ring pad to 512? keep
    # hex 469 (closest hex number <= 512 keeps full redundancy).
    nside_hex = 13 if not small else 4     # 469 / 37 antennas
    layout = lay.preset_layout(f"HERA-{3*nside_hex*(nside_hex-1)+1}")
    bset = bls.build_baselines(layout, redundant=True)
    nchan = 16 if small else 128
    n_acc = 2 if small else 8
    freqs = 150e6 + 100e3 * np.arange(nchan)
    inst = Instrument.build(bset.vectors, freqs, latitude=-30.72)
    rng = np.random.default_rng(1)
    nsrc = 128 if small else 1024
    loc = np.stack([rng.uniform(0, 360, nsrc),
                    rng.uniform(-75, 15, nsrc)], axis=-1)
    model = SkyModel(location=loc, spec_kind="power-law", spec_parms={
        "flux-scale": rng.uniform(0.5, 3.0, nsrc),
        "freq-ref": np.full(nsrc, 150e6),
        "power-law-index": np.full(nsrc, -0.8)})
    sky = SkySources.from_skymodel(model, freqs)

    t0 = time.perf_counter()

    class Obs:
        pass

    from prisim_tpu.engine.observe import Observation
    lsts = (np.arange(n_acc) * 60.0 / 240.0) % 360.0
    obs = Observation(lst_deg=lsts, jd=np.full(n_acc, 2458000.0),
                      t_acc=np.full(n_acc, 60.0),
                      pointing_altaz=np.stack(
                          [np.full(n_acc, 90.0), np.zeros(n_acc)], -1),
                      mode="drift")
    import jax.numpy as jnp
    beam_fn = lambda s, f: jnp.ones((s.shape[0], f.shape[0]),
                                    jnp.float32)
    vis = get_complex(simulate_drift(inst, sky, obs, beam_fn,
                                     src_block=1024))
    t_sim = time.perf_counter() - t0

    # closure phases over unique redundant triads
    t0 = time.perf_counter()
    triads, blidx, conj = three_point_combinations(
        layout.positions, bset)
    vis_bct = np.ascontiguousarray(np.transpose(np.asarray(vis),
                                                (1, 2, 0)))
    cp = closure_phases(vis_bct, blidx, conj)        # (ntri, nchan, nacc)
    t_cp = time.perf_counter() - t0

    # bispectrum-phase pipeline: (nlst, ndays, ntriads, nchan)
    t0 = time.perf_counter()
    ntri = cp.shape[0]
    eicp = np.exp(1j * np.transpose(cp, (2, 0, 1)))[:, None, :, :]
    ndays = 4
    eicp = np.repeat(eicp, ndays, axis=1)
    eicp *= np.exp(1j * 0.01 * np.random.default_rng(2).normal(
        size=eicp.shape))
    wts = np.ones(eicp.shape)
    sm_e, sm_w, lst_out, days_out = smooth_in_tbins_arrays(
        eicp, wts, lst=lsts[:eicp.shape[0]] / 15.0,
        days=np.arange(ndays, dtype=float), daybinsize=2.0,
        stat="median")
    ft = cpds_ft(sm_e, sm_w, freqs, freq_center=[152e6], bw_eff=2e6,
                 pad=1.0)
    ps = xcpdps_full(ft, cohax=(2,), incohax=(1, 3),
                     collapse_axes=(3,), lst_shifts=np.arange(2))
    t_ps = time.perf_counter() - t0
    return dict(config="closure-512", nant=layout.positions.shape[0],
                nbl_unique=bset.nbl, ntriads=int(ntri), nchan=nchan,
                n_acc=n_acc, sim_seconds=t_sim, closure_seconds=t_cp,
                xcpdps_seconds=t_ps,
                P_shape=list(np.asarray(ps["P"]).shape))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["2", "5"])
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()
    rec = config2(args.small) if args.which == "2" else \
        config5(args.small)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
