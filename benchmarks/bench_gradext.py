"""On-chip timing of the in-kernel gradient / extended-source Pallas
modes vs the plain kernel (VERDICT r2 item 5 'done' criterion: both
within ~2x of plain at the bench shape, matching the XLA path).

    PYTHONPATH=/root/repo:/root/.axon_site python \
        benchmarks/bench_gradext.py [--nchan 1024] [--nside 64]

Prints one JSON line per mode with seconds/snapshot and the relative
error vs the XLA engine on a baseline slice.
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
    ap.add_argument("--check-bl", type=int, default=32,
                    help="baselines in the XLA cross-check slice")
    args = ap.parse_args()

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
    loc = np.stack([np.degrees(phi), 90.0 - np.degrees(theta)], axis=-1)
    nsrc = loc.shape[0]
    model = sm.SkyModel(location=loc, spec_kind="power-law", spec_parms={
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
    sigma = rng.uniform(50.0, 500.0, nsrc)   # extended sizes, meters^-1 scale

    def make_snapshot(mode, nbl=None):
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
            if mode in ("grad", "grad_xla"):
                kw["gradient"] = True
            if mode in ("ext", "ext_xla"):
                kw["src_shape_sigma"] = jnp.asarray(sigma, jnp.float32)
            if mode.endswith("_xla"):
                if "src_shape_sigma" in kw:
                    from prisim_tpu import constants as CNST
                    kw["inv_wl"] = jnp.asarray(freqs / CNST.c,
                                               jnp.float32)
                out = nudft_visibilities(seh, sel, blh, bll, amps, gs,
                                         nchan, src_block=2048,
                                         s_sky=sh, **kw)
            else:
                out = nudft_pallas(seh, sel, blh, bll, amps, gs, nchan,
                                   s_sky=sh, **kw)
            if isinstance(out, tuple):
                v, g = out
                return (jnp.real(v), jnp.imag(v),
                        jnp.real(g), jnp.imag(g))
            return jnp.real(out), jnp.imag(out)
        return snapshot

    margs = tuple(jnp.asarray(a) for a in (Mh, Ml, pch, pcl))

    def timed(mode):
        snap = make_snapshot(mode)
        jax.block_until_ready(snap(*margs))
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            out = snap(*margs)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.repeats, out

    rows = {}
    for mode in ("plain", "grad", "ext"):
        try:
            dt, out = timed(mode)
        except Exception as exc:
            print(json.dumps({"mode": mode, "error": str(exc)[:180]}),
                  flush=True)
            continue
        # accuracy: XLA engine on a baseline slice
        nb = args.check_bl
        ref = make_snapshot(mode + "_xla", nbl=nb)(*margs)
        got = [np.asarray(x)[..., :nb, :] if x.ndim >= 2 else x
               for x in map(np.asarray, out)]
        rel = 0.0
        rel_per = []
        for g, r in zip(got, map(np.asarray, ref)):
            scale = max(np.abs(r).max(), 1e-30)
            rel_per.append(float(np.abs(g - r).max() / scale))
            rel = max(rel, rel_per[-1])
        rows[mode] = dict(mode=mode, seconds=round(dt, 4),
                          gmacs=round(macs / dt / 1e9, 2),
                          rel_vs_xla=rel, rel_per_output=rel_per)
        if "plain" in rows:
            rows[mode]["x_plain"] = round(dt / rows["plain"]["seconds"],
                                          2)
        print(json.dumps(rows[mode]), flush=True)


if __name__ == "__main__":
    main()
