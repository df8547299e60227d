"""TPU benchmark of the delay-space NUFFT engine vs the direct kernels.

Bench-size problem (the BENCH/BASELINE shape): HERA-37 all-pairs
666 baselines x 1024 channels x nside-64 sky (49,152 sources), Airy
beams, power-law spectra. Measures one full snapshot through:

  * direct Pallas NUDFT (the production kernel; BASELINE.md 176 GMAC/s)
  * NUFFT jit snapshot, spread='sorted'  (sort+cumsum segment sums)
  * NUFFT jit snapshot, spread='scatter' (XLA scatter-add)

and cross-checks each against the direct XLA engine at f32. Prints one
JSON line per engine: seconds/snapshot, equivalent GMAC/s (the direct
method's MAC count — the NUFFT does ~C/(K rank) times fewer ops, the
point of the algorithm), and max relative error vs direct.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
           benchmarks/bench_nufft_tpu.py [--nchan 1024] [--nside 64]
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
    ap.add_argument("--rank", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--spread", nargs="+",
                    default=["sorted", "scatter"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from prisim_tpu import layouts as lay
    from prisim_tpu import baselines as bls
    from prisim_tpu import healpix as hp
    from prisim_tpu import skymodel as sm
    from prisim_tpu import twofloat as tf
    from prisim_tpu.engine import Instrument, SkySources, \
        enu_rotation_from_eq
    from prisim_tpu.engine.observe import simulate_snapshot
    from prisim_tpu.engine.nufft_delay import (
        simulate_snapshot_nufft_jit, chebyshev_projection)
    from prisim_tpu.engine.pallas_nudft import nudft_pallas, \
        pallas_available
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
        "power-law-index": rng.uniform(-1.2, -0.5, nsrc),
        "flux-offset": np.zeros(nsrc)})
    sky = SkySources.from_skymodel(model, freqs)
    freqs_f32 = jnp.asarray(freqs, jnp.float32)

    def beam_fn(s, f):
        return airy_beam(s, f, 14.0)

    Mh, Ml = tf.split_f64(enu_rotation_from_eq(30.0, inst.latitude))
    pch, pcl = tf.split_f64(np.array([0.0, 0.0, 1.0]))
    jargs = tuple(jnp.asarray(x) for x in (Mh, Ml, pch, pcl))
    macs = float(nsrc) * bset.nbl * args.nchan

    def timed(fn, label):
        out = jax.block_until_ready(fn(*jargs))
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            out = fn(*jargs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.repeats
        return out, dt

    # reference: direct engine (XLA on CPU fallback, Pallas on TPU)
    on_tpu = pallas_available()

    @jax.jit
    def direct(mh, ml, ph, pl):
        v = simulate_snapshot(inst, sky, mh, ml, ph, pl, beam_fn,
                              src_block=4096, use_pallas=on_tpu)
        return jnp.real(v), jnp.imag(v)

    (dre, dim), dt_direct = timed(direct, "direct")
    vd = np.asarray(dre) + 1j * np.asarray(dim)
    scale = np.abs(vd).max()
    print(json.dumps({"engine": "direct_%s" %
                      ("pallas" if on_tpu else "xla"),
                      "seconds": dt_direct,
                      "gmacs": macs / dt_direct / 1e9}))

    pinvQ, Q = chebyshev_projection(freqs, args.rank)
    for spread in args.spread:
        @jax.jit
        def nufft(mh, ml, ph, pl, _s=spread):
            v = simulate_snapshot_nufft_jit(inst, sky, mh, ml, ph, pl,
                                            beam_fn, pinvQ, Q, spread=_s)
            return jnp.real(v), jnp.imag(v)

        try:
            (nre, nim), dt = timed(nufft, spread)
        except Exception as exc:
            print(json.dumps({"engine": "nufft_%s" % spread,
                              "error": str(exc)[:200]}))
            continue
        vn = np.asarray(nre) + 1j * np.asarray(nim)
        rel = float(np.abs(vn - vd).max() / scale)
        print(json.dumps({"engine": "nufft_%s" % spread, "seconds": dt,
                          "equivalent_gmacs": macs / dt / 1e9,
                          "speedup_vs_direct": dt_direct / dt,
                          "rel_err_vs_direct": rel}))


if __name__ == "__main__":
    main()
