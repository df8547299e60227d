"""Isolate the chip-side spectral projection as an error source.

Computes P = spectral_project(amps, pinvQ) on the attached device and
on the host CPU backend, compares both to the f64 projection, then
pushes each P through the EXACT f64 banded evaluation (carrier + KB
spread + exact DFT + deconv) against the cached f64 golden. If the
chip-P f64-evaluated error reproduces the engine's full-scale residual
while the f64-P error is at the algorithm floor, the projection matmul
(MXU bf16x6 accumulation) is the dominant term.

    PYTHONPATH=/root/repo:/root/.axon_site python \
        benchmarks/probe_proj_chip.py [--nside 256] [--rank 32]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from accuracy_northstar import (build_problem, engine_amps,
                                golden_slice, baseline_slice)


def banded_f64_eval(prob, bl_idx, P, Qc, nchan, K=9, beta=2.0,
                    tap_degree=10):
    """f64 banded algorithm (exact-KB variant of probe_banded_f64)."""
    from prisim_tpu import constants as CNST
    from prisim_tpu.engine.nufft_delay import kb_kernel, kb_fourier
    bl = np.asarray(prob["inst"].bl_hi, np.float64) + \
        np.asarray(prob["inst"].bl_lo, np.float64)
    freqs = prob["freqs"]
    half = K // 2
    alpha = np.pi * K * (1.0 - 0.5 / beta) - 0.01
    n = int(beta * nchan)
    dnu = freqs[1] - freqs[0]
    h = 1.0 / (n * dnu)
    numid = freqs[nchan // 2]
    s_eff = prob["s_eff64"]
    k_idx = np.arange(nchan) - nchan // 2
    deconv = 1.0 / kb_fourier(k_idx / n, K, alpha)
    P = np.asarray(P, np.float64)
    r = P.shape[1]
    Qc = np.asarray(Qc, np.float64)
    V = np.empty((bl_idx.size, nchan), np.complex128)
    for b, bi in enumerate(bl_idx):
        tau = s_eff @ bl[bi] / CNST.c
        phi = tau / h
        m0 = np.rint(phi)
        z0 = phi - m0
        carrier = np.exp(-2j * np.pi * numid * tau)
        Vs = P * carrier[:, None]
        lo = int(m0.min()) - half
        R = int(m0.max()) + half - lo + 1
        rows = np.zeros((R, r), np.complex128)
        for j in range(-half, half + 1):
            w = kb_kernel(z0 - j, K, alpha)
            idx = (m0 + j - lo).astype(np.int64)
            np.add.at(rows, idx, w[:, None] * Vs)
        p = np.arange(R) + lo
        E = np.exp(-2j * np.pi * np.outer(k_idx, p) / n)
        Gk = E @ rows
        V[b] = (Gk * deconv[:, None] * Qc).sum(axis=1)
    return V


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nside", type=int, default=256)
    ap.add_argument("--nchan", type=int, default=1024)
    ap.add_argument("--nbl-slice", type=int, default=8)
    ap.add_argument("--rank", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from prisim_tpu.engine.nufft_delay import (chebyshev_projection,
                                               spectral_project)

    prob = build_problem(nside=args.nside, nchan=args.nchan)
    bl_idx, _ = baseline_slice(prob, args.nbl_slice)
    sh, sl, amps_np = engine_amps(prob)
    cache = "/tmp/acc_ns_golden_%d_%d_%d.npz" % (
        args.nside, args.nchan, args.nbl_slice)
    if os.path.exists(cache):
        Vg = np.load(cache)["Vg"]
    else:
        Vg, tg, n_up = golden_slice(prob, amps_np, bl_idx)
        np.savez(cache, Vg=Vg, tg=tg, n_up=int(n_up))
    scale = np.abs(Vg).max()

    pinvQ, Q = chebyshev_projection(prob["freqs"], args.rank)

    proj = jax.jit(lambda a: spectral_project(a, pinvQ))
    P_dev = np.asarray(jax.device_get(proj(jnp.asarray(amps_np))))
    cpu0 = jax.devices("cpu")[0]
    with jax.default_device(cpu0):
        P_cpu = np.asarray(spectral_project(jnp.asarray(amps_np),
                                            np.asarray(pinvQ)))
    A64 = amps_np.astype(np.float64)
    P64 = A64 @ np.asarray(pinvQ, np.float64)
    pn = np.abs(P64).max()
    print(json.dumps({
        "P_dev_vs_f64_maxrel": float(np.abs(P_dev - P64).max() / pn),
        "P_cpu_vs_f64_maxrel": float(np.abs(P_cpu - P64).max() / pn),
        "P_dev_vs_cpu_maxrel": float(np.abs(P_dev - P_cpu).max() / pn)}))

    for name, P in (("P_dev", P_dev), ("P_cpu", P_cpu), ("P_f64", P64)):
        V = banded_f64_eval(prob, bl_idx, P, Q, args.nchan)
        print(json.dumps({
            "variant": "f64eval_" + name,
            "rel_max_scaled": float(np.abs(V - Vg).max() / scale)}),
            flush=True)


if __name__ == "__main__":
    main()
