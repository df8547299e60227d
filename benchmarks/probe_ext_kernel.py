"""Cost attribution for the extended-source Pallas kernel on the chip.

bench_gradext round 4: the ext kernel COMPILES at the 96M vmem limit
but runs 52x the plain kernel (10.3 s vs 0.197 s at the bench shape)
while the XLA ext path — which evaluates the same S*B*C gaussian-weight
exps — costs only ~7x plain. So the kernel is not transcendental-bound
at hardware limits; something in the per-q_body weight evaluation
(broadcasted_iota / (1,1,BT) reshape relayouts / Mosaic exp lowering)
is pathological. This probe times ext_mode variants to split the cost:

  none  — weight skipped entirely (pure grad-style Pr/Pi path)
  noexp — all weight arithmetic, transcendental replaced by a mul
  exact — production weight

    PYTHONPATH=/root/repo:/root/.axon_site python \
        benchmarks/probe_ext_kernel.py [--nside 64] [--nchan 1024]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nchan", type=int, default=1024)
    ap.add_argument("--nside", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--modes", nargs="*",
                    default=["none", "exact"])
    ap.add_argument("--w-block", type=int, default=None)
    ap.add_argument("--src-tile", type=int, default=None)
    ap.add_argument("--bl-tile", type=int, default=None)
    args = ap.parse_args()

    from prisim_tpu.driver import _enable_compilation_cache
    _enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from prisim_tpu import layouts as lay
    from prisim_tpu import baselines as bls
    from prisim_tpu import skymodel as sm
    from prisim_tpu import twofloat as tf
    from prisim_tpu import healpix as hp
    from prisim_tpu.engine import (Instrument, SkySources,
                                   enu_rotation_from_eq)
    from prisim_tpu.engine.observe import df_rotate3
    from prisim_tpu.engine.pallas_nudft import nudft_pallas
    from prisim_tpu.beams import airy_beam

    print(f"# {jax.devices()[0]}", flush=True)
    layout = lay.preset_layout("HERA-37")
    bset = bls.build_baselines(layout, redundant=False)
    nchan = args.nchan
    freqs = 100e6 + 97656.25 * np.arange(nchan)
    inst = Instrument.build(bset.vectors, freqs, latitude=-30.72)

    rng = np.random.default_rng(0)
    theta, phi = hp.pix2ang(args.nside,
                            np.arange(hp.nside2npix(args.nside)))
    loc = np.stack([np.degrees(phi), 90.0 - np.degrees(theta)], axis=-1)
    nsrc = loc.shape[0]
    model = sm.SkyModel(location=loc, spec_kind="power-law", spec_parms={
        "flux-scale": rng.uniform(0.1, 10.0, nsrc),
        "freq-ref": np.full(nsrc, 150e6),
        "power-law-index": np.full(nsrc, -0.8),
        "flux-offset": np.zeros(nsrc)})
    sky = SkySources.from_skymodel(model, freqs)
    sigma = rng.uniform(50.0, 500.0, nsrc).astype(np.float32)
    Mh, Ml = tf.split_f64(enu_rotation_from_eq(30.0, inst.latitude))
    pch, pcl = tf.split_f64(np.array([0.0, 0.0, 1.0]))
    freqs_f32 = jnp.asarray(freqs, dtype=jnp.float32)
    margs = tuple(jnp.asarray(a) for a in (Mh, Ml, pch, pcl))
    macs = float(nsrc) * bset.nbl * nchan

    def make(mode):
        @jax.jit
        def f(mh, ml, ph, pl_):
            sh, sl = df_rotate3(mh, ml, sky.s_eq_hi, sky.s_eq_lo)
            seh, sel = tf.df_add(sh, sl, -ph[None, :], -pl_[None, :])
            pb = airy_beam(sh, freqs_f32, 14.0)
            amps = jnp.where((sh[:, 2] > 0.0)[:, None],
                             pb * sky.flux, 0.0)
            v = nudft_pallas(seh, sel, inst.bl_hi, inst.bl_lo, amps,
                             inst.grid_scalars(), nchan, s_sky=sh,
                             src_shape_sigma=jnp.asarray(sigma),
                             ext_mode=mode, w_block=args.w_block,
                             src_tile=args.src_tile,
                             bl_tile=args.bl_tile)
            return jnp.real(v), jnp.imag(v)
        return f

    for mode in args.modes:
        f = make(mode)
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(*margs))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            out = f(*margs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.repeats
        print(json.dumps({"mode": mode, "seconds": round(dt, 4),
                          "compile_s": round(comp, 1),
                          "gmacs": round(macs / dt / 1e9, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
