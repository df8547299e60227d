"""Pallas NUDFT tile sweep on hardware (bench-size problem).

Runs nudft_pallas at several (src_tile, bl_tile) pairs on the real
chip, cross-checking each against the XLA engine, and prints one JSON
line per configuration. Used to pick kernel defaults after layout
changes (the amps staging layout constrains src_tile to multiples of
128; see pallas_nudft.py).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
           benchmarks/tile_sweep.py [--tiles 128x128 128x256 ...]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nchan", type=int, default=1024)
    ap.add_argument("--nside", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--tiles", nargs="+",
                    default=["128x128", "128x256", "256x128", "128x512"])
    ap.add_argument("--layout", default=None,
                    help="amps staging layout ('sl'/'ls'; default auto)")
    ap.add_argument("--wblock", type=int, default=None)
    ap.add_argument("--recur", default=None, choices=["df", "rot"],
                    help="grid-phasor mode: two-float sincos or anchored"
                         " rotation recurrence")
    ap.add_argument("--anchor-q", type=int, default=8)
    ap.add_argument("--anchor-w", type=int, default=None,
                    help="W re-anchor period in 'rot' (default: one "
                         "anchor per r-block)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from prisim_tpu import layouts as lay
    from prisim_tpu import baselines as bls
    from prisim_tpu import healpix as hp
    from prisim_tpu import skymodel as sm
    from prisim_tpu import twofloat as tf
    from prisim_tpu.engine import (Instrument, SkySources,
                                   enu_rotation_from_eq)
    from prisim_tpu.engine.observe import df_rotate3
    from prisim_tpu.engine.nudft import nudft_visibilities
    from prisim_tpu.engine.pallas_nudft import nudft_pallas
    from prisim_tpu.beams import airy_beam

    layout = lay.preset_layout("HERA-37")
    bset = bls.build_baselines(layout, redundant=False)
    freqs = 100e6 + 97656.25 * np.arange(args.nchan)
    inst = Instrument.build(bset.vectors, freqs, latitude=-30.72)
    rng = np.random.default_rng(0)
    theta, phi = hp.pix2ang(args.nside,
                            np.arange(hp.nside2npix(args.nside)))
    loc = np.stack([np.degrees(phi), 90.0 - np.degrees(theta)], -1)
    nsrc = loc.shape[0]
    model = sm.SkyModel(location=loc, spec_kind="power-law", spec_parms={
        "flux-scale": rng.uniform(0.1, 10.0, nsrc),
        "freq-ref": np.full(nsrc, 150e6),
        "power-law-index": np.full(nsrc, -0.8),
        "flux-offset": np.zeros(nsrc)})
    sky = SkySources.from_skymodel(model, freqs)
    freqs_f32 = jnp.asarray(freqs, jnp.float32)
    gs = inst.grid_scalars()
    nchan = args.nchan

    Mh, Ml = tf.split_f64(enu_rotation_from_eq(30.0, inst.latitude))
    pch, pcl = tf.split_f64(np.array([0.0, 0.0, 1.0]))

    @jax.jit
    def amps_fn(mh, ml):
        sh, sl = df_rotate3(mh, ml, sky.s_eq_hi, sky.s_eq_lo)
        seh, sel = tf.df_add(sh, sl, -jnp.asarray(pch)[None, :],
                             -jnp.asarray(pcl)[None, :])
        pb = airy_beam(sh, freqs_f32, 14.0)
        amps = jnp.where((sh[:, 2] > 0.0)[:, None], pb * sky.flux, 0.0)
        return seh, sel, amps

    seh, sel, amps = amps_fn(jnp.asarray(Mh), jnp.asarray(Ml))
    macs = float(nsrc) * bset.nbl * nchan

    @jax.jit
    def xla(seh, sel, amps):
        v = nudft_visibilities(seh, sel, inst.bl_hi, inst.bl_lo, amps,
                               gs, nchan, src_block=2048)
        return jnp.real(v), jnp.imag(v)

    t0 = time.perf_counter()
    xr, xi = jax.block_until_ready(xla(seh, sel, amps))
    t_xla_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(args.repeats):
        out = xla(seh, sel, amps)
    jax.block_until_ready(out)
    t_xla = (time.perf_counter() - t0) / args.repeats
    vx = np.asarray(xr) + 1j * np.asarray(xi)
    scale = np.abs(vx).max()
    print(json.dumps({"kernel": "xla", "seconds": t_xla,
                      "gmacs": macs / t_xla / 1e9}))

    for spec in args.tiles:
        if spec == "auto":
            st = bt = None
        else:
            st, bt = (int(x) for x in spec.split("x"))

        @jax.jit
        def pal(seh, sel, amps, _st=st, _bt=bt):
            v = nudft_pallas(seh, sel, inst.bl_hi, inst.bl_lo, amps, gs,
                             nchan, src_tile=_st, bl_tile=_bt,
                             amps_layout=args.layout,
                             w_block=args.wblock, recur=args.recur,
                             anchor_q=args.anchor_q,
                             anchor_w=args.anchor_w)
            return jnp.real(v), jnp.imag(v)

        try:
            pr, pi = jax.block_until_ready(pal(seh, sel, amps))
            t0 = time.perf_counter()
            for _ in range(args.repeats):
                out = pal(seh, sel, amps)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.repeats
            vp = np.asarray(pr) + 1j * np.asarray(pi)
            rel = float(np.abs(vp - vx).max() / scale)
            print(json.dumps({"kernel": "pallas", "tiles": spec,
                              "layout": args.layout,
                              "w_block": args.wblock,
                              "recur": args.recur,
                              "anchor_q": args.anchor_q,
                              "anchor_w": args.anchor_w,
                              "seconds": dt, "gmacs": macs / dt / 1e9,
                              "rel_vs_xla": rel}))
        except Exception as exc:
            print(json.dumps({"kernel": "pallas", "tiles": spec,
                              "error": str(exc)[:2000]}))


if __name__ == "__main__":
    main()
