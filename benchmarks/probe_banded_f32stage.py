"""Stage-isolation probe for the banded engine's f32 arithmetic.

probe_banded_f64 cleared the ALGORITHM (f64 everywhere: 1.5e-7 at
nside 128 / rank 32); the engine still measures 1.67e-6 at the 786k
north star (BASELINE.md round 3). The difference is f32 arithmetic in
prep/spread/post. This probe re-runs the f64 algorithm with ONE stage
at a time emulated at the kernel's exact f32 precision (numpy
emulation of the same twofloat ops the Pallas kernel executes):

  z32       two-float u -> t -> phi chain, f32 z0 (kernel lines
            nufft_banded._sweep_kernel: df_mul chain + rint + add)
  tap32     f32 Horner tap evaluation on exact z0
  ztap32    both (the kernel's actual tap path)
  carrier32 two-float carrier cycles + df_sincos_cycles in f32
  v32       P and carrier rounded to f32, f32 product (the V operand
            the MXU consumes)
  proj32    P from the engine's spectral_project (channel-blocked
            Kahan f32) instead of the f64 projection
  all32     every stage together (should reproduce the engine's
            residual class)

    PYTHONPATH=/root/repo python benchmarks/probe_banded_f32stage.py \
        [--nside 128] [--variants z32,tap32,...]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from accuracy_northstar import (build_problem, engine_amps,
                                golden_slice, baseline_slice)


def _split64(x):
    h = np.asarray(x, np.float32)
    l = np.asarray(np.asarray(x, np.float64)
                   - h.astype(np.float64), np.float32)
    return h, l


def main():
    os.environ.pop("JAX_PLATFORMS", None)
    ap = argparse.ArgumentParser()
    ap.add_argument("--nside", type=int, default=128)
    ap.add_argument("--nchan", type=int, default=1024)
    ap.add_argument("--nbl-slice", type=int, default=8)
    ap.add_argument("--ktaps", type=int, default=9)
    ap.add_argument("--tap-degree", type=int, default=10)
    ap.add_argument("--beta", type=float, default=2.0)
    ap.add_argument("--rank", type=int, default=32)
    ap.add_argument("--variants", default=None,
                    help="comma list; default all")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from prisim_tpu import constants as CNST
    from prisim_tpu import twofloat as tf
    from prisim_tpu.engine.nufft_delay import (kb_tap_coeffs, kb_fourier,
                                               spectral_project)

    prob = build_problem(nside=args.nside, nchan=args.nchan)
    bl = np.asarray(prob["inst"].bl_hi, np.float64) + \
        np.asarray(prob["inst"].bl_lo, np.float64)
    bl_idx, _ = baseline_slice(prob, args.nbl_slice)
    sh, sl, amps_np = engine_amps(prob)
    cache = "/tmp/acc_ns_golden_%d_%d_%d.npz" % (
        args.nside, args.nchan, args.nbl_slice)
    if os.path.exists(cache):
        Vg = np.load(cache)["Vg"]
    else:
        Vg, tg, n_up = golden_slice(prob, amps_np, bl_idx)
        np.savez(cache, Vg=Vg, tg=tg, n_up=n_up)

    freqs = prob["freqs"]
    nchan = args.nchan
    K, beta = args.ktaps, args.beta
    half = K // 2
    alpha = np.pi * K * (1.0 - 0.5 / beta) - 0.01
    n = int(beta * nchan)
    dnu = freqs[1] - freqs[0]
    h = 1.0 / (n * dnu)
    numid = freqs[nchan // 2]

    # f64 Chebyshev-in-ln(nu) basis (the engine's default)
    x = np.log(freqs / freqs[freqs.size // 2])
    x = 2.0 * (x - x.min()) / (x.max() - x.min()) - 1.0
    Qb = np.polynomial.chebyshev.chebvander(x, args.rank - 1)
    pinvQ = np.linalg.pinv(Qb).T
    P64 = amps_np.astype(np.float64) @ np.asarray(pinvQ, np.float64)
    r = P64.shape[1]
    # the engine's actual f32 projection (channel-blocked Kahan)
    P32 = np.asarray(spectral_project(amps_np,
                                      np.asarray(pinvQ, np.float32)),
                     np.float64)

    s_eff = prob["s_eff64"]
    seh, sel = _split64(s_eff)
    tap_np = kb_tap_coeffs(K, alpha, degree=args.tap_degree)
    k_idx = np.arange(nchan) - nchan // 2
    deconv = 1.0 / kb_fourier(k_idx / n, K, alpha)
    Qc = np.asarray(Qb, np.float64)

    scale = np.abs(Vg).max()
    variants = (args.variants.split(",") if args.variants else
                ["base", "z32", "tap32", "ztap32", "carrier32", "v32",
                 "proj32", "all32"])

    ivh, ivl = _split64(1.0 / (CNST.c * h))
    nmh, nml = _split64(numid / CNST.c)

    def f32_chain(bvec):
        """Kernel-exact two-float u/t/phi/carrier chain (f32 numpy)."""
        blen = np.linalg.norm(bvec)
        bhat = bvec / blen
        bhh, bhl = _split64(bhat)
        th = tl = None
        for ax in range(3):
            ph_, pl_ = tf.df_mul(bhh[ax].astype(np.float32),
                                 bhl[ax].astype(np.float32),
                                 seh[:, ax], sel[:, ax])
            th, tl = (ph_, pl_) if th is None else \
                tf.df_add(th, tl, ph_, pl_)
        blh, bll = _split64(blen)
        th, tl = tf.df_mul(np.float32(blh), np.float32(bll), th, tl)
        ph_h, ph_l = tf.df_mul(th, tl, np.float32(ivh), np.float32(ivl))
        m0 = np.rint(ph_h)
        z0 = (ph_h - m0) + ph_l
        ch_, cl_ = tf.df_mul(th, tl, np.float32(nmh), np.float32(nml))
        fh, fl = tf.df_frac(ch_, cl_, xp=np)
        cosv, sinv = tf.df_sincos_cycles(fh, fl, xp=np)
        return m0.astype(np.float64), z0, cosv, sinv

    t_all = time.perf_counter()
    for variant in variants:
        V = np.empty((bl_idx.size, nchan), np.complex128)
        use_z32 = variant in ("z32", "ztap32", "all32")
        use_tap32 = variant in ("tap32", "ztap32", "all32")
        use_car32 = variant in ("carrier32", "all32")
        use_v32 = variant in ("v32", "all32")
        use_p32 = variant in ("proj32", "all32")
        P = P32 if use_p32 else P64
        for b, bi in enumerate(bl_idx):
            tau = s_eff @ bl[bi] / CNST.c
            phi64 = tau / h
            if use_z32 or use_car32:
                m0f, z0f, cosf, sinf = f32_chain(bl[bi])
            if use_z32:
                m0 = m0f
                z0 = z0f.astype(np.float64)
            else:
                m0 = np.rint(phi64)
                z0 = phi64 - m0
            if use_car32:
                carrier = cosf.astype(np.float64) \
                    - 1j * sinf.astype(np.float64)
            else:
                cyc = numid * tau
                cyc = cyc - np.round(cyc)
                carrier = np.exp(-2j * np.pi * cyc)
            if use_v32:
                # kernel builds [P*cos, P*(-sin)] in f32: with
                # carrier = cos - i sin that is exactly
                # f32(P*Re(carrier)) + i f32(P*Im(carrier))
                Pf = P.astype(np.float32)
                Vs = (Pf * carrier.real.astype(np.float32)[:, None]
                      ).astype(np.float64) \
                    + 1j * (Pf * carrier.imag.astype(np.float32)[:, None]
                            ).astype(np.float64)
            else:
                Vs = P * carrier[:, None]
            lo = int(m0.min()) - half
            R = int(m0.max()) + half - lo + 1
            rows = np.zeros((R, r), np.complex128)
            for j in range(-half, half + 1):
                if use_tap32:
                    zf = z0.astype(np.float32)
                    w32 = np.full_like(zf, np.float32(tap_np[j + half][0]))
                    for c in tap_np[j + half][1:]:
                        w32 = w32 * zf + np.float32(c)
                    w = w32.astype(np.float64)
                else:
                    w = np.polyval(tap_np[j + half], z0)
                idx = (m0 + j - lo).astype(np.int64)
                np.add.at(rows, idx, w[:, None] * Vs)
            p = np.arange(R) + lo
            E = np.exp(-2j * np.pi * np.outer(k_idx, p) / n)
            Gk = E @ rows
            V[b] = (Gk * deconv[:, None] * Qc).sum(axis=1)
        rel = float(np.abs(V - Vg).max() / scale)
        print(json.dumps({"variant": variant, "nside": args.nside,
                          "rank": args.rank, "K": K,
                          "rel_max_scaled": rel,
                          "sec": round(time.perf_counter() - t_all, 1)}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
