"""Extended-source Pallas kernel tile/recurrence sweep on the chip
(VERDICT r4 item 7: close the ext-kernel gap from ~9x to ~2x of the
grad/point kernel).

The round-4 multiplicative-recurrence weights removed the exp wall;
the remaining gap is structural: ext defaults halve BOTH tile dims
(ST 32 vs 64, BT 128 vs 256 -> 4x more grid steps) and pin recur='df'
(vs the point kernel's 'rot', +34%). This sweep measures which of
those safety margins the round-4 kernel still needs.

    PYTHONPATH=/root/repo:/root/.axon_site python \
        benchmarks/probe_ext_sweep.py [--nchan 1024] [--nside 64]

One JSON line per config; compile failures are recorded, not fatal.
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
    ap.add_argument("--check-bl", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from prisim_tpu import layouts as lay
    from prisim_tpu import baselines as bls
    from prisim_tpu import skymodel as sm
    from prisim_tpu import twofloat as tf
    from prisim_tpu import healpix as hp
    from prisim_tpu import constants as CNST
    from prisim_tpu.engine import Instrument, SkySources, \
        enu_rotation_from_eq
    from prisim_tpu.engine.observe import df_rotate3
    from prisim_tpu.engine.nudft import nudft_visibilities
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
    loc = np.stack([np.degrees(phi), 90.0 - np.degrees(theta)],
                   axis=-1)
    nsrc = loc.shape[0]
    model = sm.SkyModel(location=loc, spec_kind="power-law",
                        spec_parms={
                            "flux-scale": rng.uniform(0.1, 10.0, nsrc),
                            "freq-ref": np.full(nsrc, 150e6),
                            "power-law-index": np.full(nsrc, -0.8),
                            "flux-offset": np.zeros(nsrc)})
    sky = SkySources.from_skymodel(model, freqs)
    Mh, Ml = tf.split_f64(enu_rotation_from_eq(30.0, inst.latitude))
    pch, pcl = tf.split_f64(np.array([0.0, 0.0, 1.0]))
    freqs_f32 = jnp.asarray(freqs, dtype=jnp.float32)
    gs = inst.grid_scalars()
    macs = float(nsrc) * bset.nbl * nchan
    sigma = rng.uniform(50.0, 500.0, nsrc)

    def make_snapshot(ext=True, xla=False, nbl=None, **pk):
        blh = inst.bl_hi[:nbl] if nbl else inst.bl_hi
        bll = inst.bl_lo[:nbl] if nbl else inst.bl_lo

        @jax.jit
        def snapshot(mh, ml, ph, pl_):
            sh, sl = df_rotate3(mh, ml, sky.s_eq_hi, sky.s_eq_lo)
            seh, sel = tf.df_add(sh, sl, -ph[None, :], -pl_[None, :])
            pb = airy_beam(sh, freqs_f32, 14.0)
            amps = jnp.where((sh[:, 2] > 0.0)[:, None],
                             pb * sky.flux, 0.0)
            kw = {}
            if ext:
                kw["src_shape_sigma"] = jnp.asarray(sigma, jnp.float32)
            if xla:
                if ext:
                    kw["inv_wl"] = jnp.asarray(freqs / CNST.c,
                                               jnp.float32)
                out = nudft_visibilities(seh, sel, blh, bll, amps,
                                         gs, nchan, src_block=2048,
                                         s_sky=sh, **kw)
            else:
                out = nudft_pallas(seh, sel, blh, bll, amps, gs,
                                   nchan, s_sky=sh, **pk, **kw)
            return jnp.real(out), jnp.imag(out)
        return snapshot

    margs = tuple(jnp.asarray(a) for a in (Mh, Ml, pch, pcl))
    nb = args.check_bl
    ref = [np.asarray(x) for x in make_snapshot(
        ext=True, xla=True, nbl=nb)(*margs)]

    def timed(**pk):
        snap = make_snapshot(ext=True, **pk)
        jax.block_until_ready(snap(*margs))
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            out = snap(*margs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.repeats
        rel = 0.0
        for g, r in zip(out, ref):
            scale = max(np.abs(r).max(), 1e-30)
            rel = max(rel, float(
                np.abs(np.asarray(g)[:nb] - r).max() / scale))
        return dt, rel

    # the point-kernel yardstick (defaults: rot, 64x256)
    snap_pt = make_snapshot(ext=False)
    jax.block_until_ready(snap_pt(*margs))
    t0 = time.perf_counter()
    for _ in range(args.repeats):
        outp = snap_pt(*margs)
    jax.block_until_ready(outp)
    t_point = (time.perf_counter() - t0) / args.repeats
    print(json.dumps({"mode": "point", "seconds": round(t_point, 4),
                      "gmacs": round(macs / t_point / 1e9, 1)}),
          flush=True)

    sweeps = [
        {},                                            # current default
        {"recur": "rot"},
        {"src_tile": 64},
        {"src_tile": 64, "recur": "rot"},
        {"bl_tile": 256},
        {"src_tile": 64, "bl_tile": 256},
        {"src_tile": 64, "bl_tile": 256, "recur": "rot"},
        {"src_tile": 64, "bl_tile": 192, "recur": "rot"},
        {"src_tile": 64, "bl_tile": 256, "w_block": 8},
        {"src_tile": 64, "bl_tile": 256, "recur": "rot",
         "w_block": 8},
        {"src_tile": 128, "bl_tile": 128, "recur": "rot"},
    ]
    for pk in sweeps:
        tag = json.dumps(pk, sort_keys=True)
        try:
            dt, rel = timed(**pk)
            print(json.dumps({"cfg": tag, "seconds": round(dt, 4),
                              "x_point": round(dt / t_point, 2),
                              "rel_vs_xla": rel}), flush=True)
        except Exception as exc:
            print(json.dumps({"cfg": tag,
                              "error": str(exc)[:160]}), flush=True)


if __name__ == "__main__":
    main()
