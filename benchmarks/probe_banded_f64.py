"""Pure-f64 re-evaluation of the banded NUFFT algorithm (no f32
anywhere) against the f64 direct golden: separates the ALGORITHM's
error floor (tap polynomial fit, KB aliasing, deconvolution choice)
from the engine's f32 arithmetic. The S-linear error seen at
nside>=128 (BASELINE.md round 3) lives in whichever variant reproduces
it here.

Variants:
  poly   — degree-`tap_degree` fitted tap weights (what the kernel runs)
  exact  — exact Kaiser-Bessel window values
Both use the continuous-FT deconvolution the plan uses.

    PYTHONPATH=/root/repo python benchmarks/probe_banded_f64.py \
        [--nside 128] [--ktaps 9]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from accuracy_northstar import (build_problem, engine_amps,
                                golden_slice, baseline_slice)


def main():
    os.environ.pop("JAX_PLATFORMS", None)
    ap = argparse.ArgumentParser()
    ap.add_argument("--nside", type=int, default=128)
    ap.add_argument("--nchan", type=int, default=1024)
    ap.add_argument("--nbl-slice", type=int, default=8)
    ap.add_argument("--ktaps", type=int, default=9)
    ap.add_argument("--tap-degree", type=int, default=10)
    ap.add_argument("--beta", type=float, default=2.0)
    ap.add_argument("--rank", type=int, default=24)
    ap.add_argument("--basis", default="ln",
                    choices=["ln", "linear", "svd"])
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from prisim_tpu import constants as CNST
    from prisim_tpu.engine.nufft_delay import (chebyshev_projection,
                                               kb_kernel, kb_tap_coeffs,
                                               kb_fourier)

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

    # f64 spectral factorization (same Chebyshev basis as the engine,
    # or a linear-in-nu variant: Airy-sidelobe oscillations are
    # periodic in nu, not ln nu)
    # both bases are built in TRUE f64 here: chebyshev_projection
    # returns f32-cast matrices whose ~1e-7 quantization would
    # contaminate a probe meant to isolate the f64 algorithm floor
    if args.basis == "svd":
        # data-adaptive basis: top right-singular vectors of the amps
        # matrix (optimal rank-r spectral subspace in Frobenius norm),
        # via the (C, C) gram matrix in f64
        A64 = amps_np.astype(np.float64)
        G = A64.T @ A64
        evals, evecs = np.linalg.eigh(G)
        Qb = evecs[:, ::-1][:, :args.rank]            # (C, r)
        tail = np.sqrt(max(evals[:-args.rank].sum(), 0.0)
                       / max(evals.sum(), 1e-300))
        print(json.dumps({"svd_tail_frac": tail}))
    elif args.basis == "linear":
        x = 2.0 * (freqs - freqs.min()) / (freqs.max() - freqs.min()) \
            - 1.0
        Qb = np.polynomial.chebyshev.chebvander(x, args.rank - 1)
    else:
        x = np.log(freqs / freqs[freqs.size // 2])
        x = 2.0 * (x - x.min()) / (x.max() - x.min()) - 1.0
        Qb = np.polynomial.chebyshev.chebvander(x, args.rank - 1)
    pinvQ, Q = np.linalg.pinv(Qb).T, Qb
    P = amps_np.astype(np.float64) @ np.asarray(pinvQ, np.float64)
    r = P.shape[1]

    s_eff = prob["s_eff64"]            # (S, 3) f64, phase-centered
    tap_np = kb_tap_coeffs(K, alpha, degree=args.tap_degree)
    k_idx = np.arange(nchan) - nchan // 2
    deconv = 1.0 / kb_fourier(k_idx / n, K, alpha)
    Qc = np.asarray(Q, np.float64)

    scale = np.abs(Vg).max()
    for variant in ("poly", "exact"):
        V = np.empty((bl_idx.size, nchan), np.complex128)
        for b, bi in enumerate(bl_idx):
            tau = s_eff @ bl[bi] / CNST.c                # (S,) seconds
            phi = tau / h
            m0 = np.rint(phi)
            z0 = phi - m0
            carrier = np.exp(-2j * np.pi * numid * tau)  # (S,)
            Vs = P * carrier[:, None]                    # (S, r) complex
            lo = int(m0.min()) - half
            R = int(m0.max()) + half - lo + 1
            rows = np.zeros((R, r), np.complex128)
            for j in range(-half, half + 1):
                if variant == "poly":
                    w = np.polyval(tap_np[j + half], z0)
                else:
                    w = kb_kernel(z0 - j, K, alpha)
                idx = (m0 + j - lo).astype(np.int64)
                np.add.at(rows, idx, w[:, None] * Vs)
            # exact DFT of the sparse row range (no wrap needed: R < n)
            p = np.arange(R) + lo
            E = np.exp(-2j * np.pi * np.outer(k_idx, p) / n)  # (C, R)
            Gk = E @ rows                                  # (C, r)
            V[b] = (Gk * deconv[:, None] * Qc).sum(axis=1)
        rel = float(np.abs(V - Vg).max() / scale)
        print(json.dumps({"variant": variant, "K": K,
                          "nside": args.nside, "rank": args.rank,
                          "basis": args.basis,
                          "rel_max_scaled": rel}))


if __name__ == "__main__":
    main()
