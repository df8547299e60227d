"""On-chip benchmark of the banded-spread NUFFT at the bench shape
(HERA-37: 666 bl x 1024 chan x 49152 src), vs the direct engines.

    python benchmarks/bench_nufft_banded.py [--rank R] [--tile T]

Prints accuracy vs the XLA direct engine and seconds/snapshot for
banded NUFFT, direct Pallas, and (optionally) direct XLA. Outputs are
fetched as (re, im) pairs — complex transfers wedge the axon tunnel.
"""

import argparse
import time

import numpy as np


def _sync1(out):
    import jax
    import jax.numpy as jnp
    for leaf in jax.tree_util.tree_leaves(out):
        leaf = leaf.ravel()[:1]
        if jnp.iscomplexobj(leaf):
            # complex64 device->host transfers are UNIMPLEMENTED on the
            # axon tunnel and wedge the backend
            leaf = jnp.real(leaf)
        np.asarray(jax.device_get(leaf))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=24)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--gblk", type=int, default=64)
    ap.add_argument("--ktaps", type=int, default=13)
    ap.add_argument("--beta", type=float, default=2.0)
    ap.add_argument("--no-spatial-sort", action="store_true")
    ap.add_argument("--nchan", type=int, default=1024)
    ap.add_argument("--nside", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--skip-direct", action="store_true")
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
    from prisim_tpu.engine.observe import simulate_snapshot
    from prisim_tpu.engine.pallas_nudft import nudft_pallas
    from prisim_tpu.engine.nudft import nudft_visibilities
    from prisim_tpu.engine.observe import df_rotate3
    from prisim_tpu.engine.nufft_banded import (
        make_banded_plan, make_banded_snapshot_fns)
    from prisim_tpu.engine.nufft_delay import chebyshev_projection
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
    beam_fn = lambda s, f: airy_beam(s, f, 14.0)
    margs = tuple(jnp.asarray(a) for a in (Mh, Ml, pch, pcl))
    macs = float(nsrc) * bset.nbl * nchan

    rank = args.rank
    pinvQ, Q = chebyshev_projection(freqs, rank)
    plan = make_banded_plan(bset.vectors, inst.nu0, inst.dnu, nchan,
                            rank=rank, T_s=args.tile, G_blk=args.gblk,
                            K=args.ktaps, beta=args.beta)
    print(f"# plan: D={plan.ndir} dirs, n_blk_max={plan.n_blk_max}, "
          f"n_blk_mean={float(np.mean(plan.n_blk)):.1f}, "
          f"R={plan.R_max}, T_s={plan.T_s}, G={plan.G_blk}, "
          f"K={plan.K}, beta={plan.beta}, rank={rank}", flush=True)

    run_banded = make_banded_snapshot_fns(
        inst, sky, beam_fn, plan, pinvQ, Q,
        spatial_sort=not args.no_spatial_sort)
    assert run_banded.n_chunks == 1, (
        "this tuning bench times the three unchunked stages; pass a "
        "smaller problem or extend it for the chunked sweep "
        "(n_chunks=%d)" % run_banded.n_chunks)
    stage_prep_, stage_spread_, stage_post_ = run_banded.stages

    # jitted re/im tail: eager complex ops round-trip the tunnel and
    # poison the full-call timing (round-3 run: 0.31 s full vs 0.15 s
    # stage sum)
    post_ri = jax.jit(lambda o: (lambda v: (jnp.real(v),
                                            jnp.imag(v)))(stage_post_(o)))

    def banded(mh, ml, ph, pl_):
        u_h, u_l, P_r, ok = stage_prep_(mh, ml, ph, pl_,
                                        *run_banded.sky_args)
        re, im = post_ri(stage_spread_(u_h, u_l, P_r))
        return re, im, ok

    # first call stage-by-stage with syncs: isolates compile/upload
    # stalls per stage (tunnel uploads of the closed-over sky arrays
    # dominate the first prep call)
    stage_prep, stage_spread, stage_post = run_banded.stages
    prep_args = margs + run_banded.sky_args
    t0 = time.perf_counter()
    pre = stage_prep(*prep_args)
    _sync1(pre)
    print(f"stage prep first: {time.perf_counter()-t0:.1f} s",
          flush=True)
    u_h, u_l, P_r, ok = pre
    t0 = time.perf_counter()
    out = stage_spread(u_h, u_l, P_r)
    _sync1(out)
    print(f"stage spread first: {time.perf_counter()-t0:.1f} s",
          flush=True)
    t0 = time.perf_counter()
    vb = stage_post(out)
    _sync1(vb)
    print(f"stage post first: {time.perf_counter()-t0:.1f} s, "
          f"ok={bool(np.asarray(jax.device_get(ok)))}", flush=True)
    br, bi = jnp.real(vb), jnp.imag(vb)

    # per-stage steady-state timings
    # dispatch `repeats` back-to-back and sync ONCE: the tunnel's
    # device->host round-trip latency (hundreds of ms) amortizes out
    # 20+ repeats: at 3 the tunnel round-trip (~0.1 s) still adds
    # RTT/3 to every stage and swamps the short ones
    sreps = max(20, args.repeats)
    for name, fn, a in (("prep", stage_prep, prep_args),
                        ("spread", stage_spread, (u_h, u_l, P_r)),
                        ("post", stage_post, (out,))):
        t0 = time.perf_counter()
        for _ in range(sreps):
            o = fn(*a)
        _sync1(o)
        dt = (time.perf_counter() - t0) / sreps
        print(f"stage {name}: {dt:.4f} s", flush=True)

    times = {}
    _sync1(banded(*margs))        # warm post_ri's compile
    t0 = time.perf_counter()
    for _ in range(sreps):
        out = banded(*margs)
    _sync1(out)
    best = (time.perf_counter() - t0) / sreps
    times["banded"] = best
    print(f"banded (3-stage): {best:.4f} s/snapshot "
          f"({macs/best/1e12:.1f} TMAC-equiv/s)", flush=True)

    # fused one-jit production path (round 4): prep+spread+post in a
    # single dispatch
    split_ri = jax.jit(lambda v: (jnp.real(v), jnp.imag(v)))

    def fused(mh, ml, ph, pl_):
        v, ok = run_banded(mh, ml, ph, pl_)
        return split_ri(v) + (ok,)

    _sync1(fused(*margs))
    t0 = time.perf_counter()
    for _ in range(sreps):
        out = fused(*margs)
    _sync1(out)
    best = (time.perf_counter() - t0) / sreps
    times["banded_fused"] = best
    print(f"banded (fused): {best:.4f} s/snapshot "
          f"({macs/best/1e12:.1f} TMAC-equiv/s)", flush=True)

    # accuracy vs the exact direct XLA engine
    @jax.jit
    def direct_xla(mh, ml, ph, pl_):
        from prisim_tpu.utils import get_complex
        v = simulate_snapshot(inst, sky, mh, ml, ph, pl_, beam_fn,
                              src_block=4096)
        return jnp.real(v), jnp.imag(v)

    t0 = time.perf_counter()
    xr, xi = direct_xla(*margs)
    _sync1((xr,))
    print(f"direct xla compile+run: {time.perf_counter()-t0:.1f} s",
          flush=True)
    X = np.asarray(jax.device_get(xr)) + 1j * np.asarray(
        jax.device_get(xi))
    Bv = np.asarray(jax.device_get(br)) + 1j * np.asarray(
        jax.device_get(bi))
    scale = np.abs(X).max()
    rel = np.abs(Bv - X).max() / scale
    print(f"banded vs direct-xla max rel: {rel:.3e}", flush=True)

    if not args.skip_direct:
        @jax.jit
        def direct_pl(mh, ml, ph, pl_):
            sh, sl = df_rotate3(mh, ml, sky.s_eq_hi, sky.s_eq_lo)
            seh, sel = tf.df_add(sh, sl, -ph[None, :], -pl_[None, :])
            pb = airy_beam(sh, freqs_f32, 14.0)
            amps = jnp.where((sh[:, 2] > 0.0)[:, None],
                             pb * sky.flux, 0.0)
            v = nudft_pallas(seh, sel, inst.bl_hi, inst.bl_lo, amps,
                             inst.grid_scalars(), nchan)
            return jnp.real(v), jnp.imag(v)
        t0 = time.perf_counter()
        out = direct_pl(*margs)
        _sync1(out)
        print(f"direct pallas compile+run: {time.perf_counter()-t0:.1f}"
              " s", flush=True)
        t0 = time.perf_counter()
        for _ in range(max(10, args.repeats)):
            out = direct_pl(*margs)
        _sync1(out)
        best = (time.perf_counter() - t0) / max(10, args.repeats)
        times["direct_pallas"] = best
        print(f"direct pallas: {best:.4f} s/snapshot "
              f"({macs/best/1e12:.1f} TMAC/s)", flush=True)
        print(f"SPEEDUP banded vs direct pallas: "
              f"{times['direct_pallas']/times['banded']:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
