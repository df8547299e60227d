"""Error-budget probe for the banded NUFFT at bench-like conditions.

Runs the banded snapshot (interpret-mode Pallas on CPU) against the
direct XLA engine on the SAME chromatic Airy + power-law sky and the
bench's full-octave 100-200 MHz band, at reduced baseline count. The
CPU backend uses the host FFT, so a small error here combined with an
unchanged ~5e-6 on the chip points at the TPU FFT; a ~5e-6 error here
points at the spectral projection (Chebyshev rank) instead.

    python benchmarks/probe_banded_error.py [--rank 24] [--nbl 48]
"""

import argparse
import os

import numpy as np


def main():
    os.environ.pop("JAX_PLATFORMS", None)
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=24)
    ap.add_argument("--nbl", type=int, default=48)
    ap.add_argument("--nchan", type=int, default=1024)
    ap.add_argument("--nside", type=int, default=32)
    ap.add_argument("--ktaps", type=int, default=13)
    ap.add_argument("--tap-degree", type=int, default=10)
    ap.add_argument("--beta", type=float, default=2.0)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--gblk", type=int, default=64)
    ap.add_argument("--layout", default="HERA-37",
                    help="preset layout (baseline-length range probe)")
    ap.add_argument("--f64-golden", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from prisim_tpu import layouts as lay
    from prisim_tpu import baselines as bls
    from prisim_tpu import skymodel as sm
    from prisim_tpu import twofloat as tf
    from prisim_tpu import healpix as hp
    from prisim_tpu.engine import (Instrument, SkySources,
                                   enu_rotation_from_eq)
    from prisim_tpu.engine.observe import simulate_snapshot
    from prisim_tpu.engine.nufft_banded import (
        make_banded_plan, make_banded_snapshot_fns)
    from prisim_tpu.engine.nufft_delay import chebyshev_projection
    from prisim_tpu.beams import airy_beam
    from prisim_tpu.utils import get_complex

    layout = lay.preset_layout(args.layout)
    bset = bls.build_baselines(layout,
                               redundant=args.layout != "HERA-37")
    # spread of short..long baselines
    lengths = np.linalg.norm(bset.vectors, axis=1)
    order = np.argsort(lengths)
    pick = order[np.unique(np.linspace(0, order.size - 1, args.nbl)
                           .astype(int))]
    vecs = np.asarray(bset.vectors)[pick]
    nchan = args.nchan
    freqs = 100e6 + (100e6 / nchan) * np.arange(nchan)
    inst = Instrument.build(vecs, freqs, latitude=-30.72)

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
    beam_fn = lambda s, f: airy_beam(s, f, 14.0)
    margs = tuple(jnp.asarray(a) for a in (Mh, Ml, pch, pcl))

    pinvQ, Q = chebyshev_projection(freqs, args.rank)
    plan = make_banded_plan(vecs, inst.nu0, inst.dnu, nchan,
                            rank=args.rank, K=args.ktaps,
                            beta=args.beta, tap_degree=args.tap_degree,
                            T_s=args.tile, G_blk=args.gblk)
    run = make_banded_snapshot_fns(inst, sky, beam_fn, plan, pinvQ, Q,
                                   interpret=True)
    vb, ok = run(*margs)
    vb = np.asarray(vb)
    print("ok:", bool(np.asarray(ok)))

    gold = np.asarray(get_complex(simulate_snapshot(
        inst, sky, *margs, beam_fn, src_block=4096)))
    scale = np.abs(gold).max()
    rel = np.abs(vb - gold).max() / scale
    print(f"banded(interpret,cpu,rank={args.rank},K={args.ktaps},"
          f"deg={args.tap_degree},beta={args.beta},T_s={args.tile},"
          f"G={args.gblk},{args.layout}) vs direct-xla "
          f"max rel: {rel:.3e}  (nbl={vecs.shape[0]}, nsrc={nsrc}, "
          f"nchan={nchan})")

    if args.f64_golden:
        # f64 host sum with the engines' own amps: separates the
        # banded error from the direct engine's own ~1e-6-class error
        from prisim_tpu import constants as CNST
        from prisim_tpu.engine.observe import df_rotate3
        from prisim_tpu.beams import airy_beam as _ab
        sh, sl = df_rotate3(margs[0], margs[1], sky.s_eq_hi,
                            sky.s_eq_lo)
        sh64 = (np.asarray(sh, np.float64)
                + np.asarray(sl, np.float64))
        pb = np.asarray(_ab(jnp.asarray(sh64, jnp.float32),
                            jnp.asarray(freqs, jnp.float32), 14.0),
                        np.float64)
        amps64 = np.where((sh64[:, 2] > 0.0)[:, None],
                          pb * np.asarray(sky.flux, np.float64), 0.0)
        se64 = sh64 - np.array([0.0, 0.0, 1.0])[None, :]
        V = np.zeros((vecs.shape[0], nchan), np.complex128)
        for i0 in range(0, nsrc, 2048):
            slc = slice(i0, min(i0 + 2048, nsrc))
            tau = se64[slc] @ vecs.T / CNST.c
            ph = 2.0 * np.pi * tau[:, :, None] * freqs[None, None, :]
            V += np.einsum("sc,sbc->bc", amps64[slc],
                           np.cos(ph) - 1j * np.sin(ph))
        sc2 = np.abs(V).max()
        print(f"banded vs f64 golden: {np.abs(vb - V).max() / sc2:.3e}")
        print(f"direct-xla vs f64 golden: "
              f"{np.abs(gold - V).max() / sc2:.3e}")


if __name__ == "__main__":
    main()
