"""Accurate TPU primitive rates via in-jit repetition (cancels the
~33 ms axon-tunnel round-trip): each op runs `k` times inside one jit
with a data dependency; rate = (t(k2) - t(k1)) / (k2 - k1).

    python benchmarks/probe_tpu_rates.py [probe ...]
"""

import sys
import time

import numpy as np


def rate_of(make_fn, k1=2, k2=10, repeats=2):
    """make_fn(k) -> (jitted fn, args). Returns seconds per single op."""
    import jax

    def run(k):
        fn, args = make_fn(k)
        out = fn(*args)                      # compile + warm
        np.asarray(jax.device_get(
            jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
        best = np.inf
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(jax.device_get(
                jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
            best = min(best, time.perf_counter() - t0)
        return best
    return (run(k2) - run(k1)) / (k2 - k1)


def main(probes):
    import jax
    import jax.numpy as jnp
    from functools import partial
    S, B, C = 49152, 666, 1024
    n = 2 * C
    rng = np.random.default_rng(0)
    print(f"# {jax.devices()[0]}")

    def dep(x, out):
        """fold a scalar of out back into x to chain iterations"""
        return x + out.ravel()[0].astype(x.dtype) * 1e-30

    if not probes or "matmul" in probes:
        for prec in ("default", "highest"):
            p = (jax.lax.Precision.HIGHEST if prec == "highest"
                 else jax.lax.Precision.DEFAULT)

            def mk(k, p=p):
                A = jnp.asarray(rng.normal(size=(4096, 4096)), jnp.float32)
                Bm = jnp.asarray(rng.normal(size=(4096, 4096)),
                                 jnp.float32)

                @jax.jit
                def f(a, b):
                    for _ in range(k):
                        c = jnp.matmul(a, b, precision=p)
                        a = dep(a, c)
                    return c
                return f, (A, Bm)
            dt = rate_of(mk)
            print(f"matmul 4096^3 {prec}: {dt*1e3:.2f} ms "
                  f"({2*4096**3/dt/1e12:.1f} TFLOP/s)")

    if not probes or "smallmm" in probes:
        # the banded kernel's dot shape: (G x Ts) @ (Ts x 2r), many of them
        for (M, K_, N, nb) in ((48, 256, 32, 4096), (64, 256, 32, 4096),
                               (128, 256, 128, 4096)):
            def mk(k, M=M, K_=K_, N=N, nb=nb):
                A = jnp.asarray(rng.normal(size=(nb, M, K_)), jnp.float32)
                Bm = jnp.asarray(rng.normal(size=(nb, K_, N)), jnp.float32)

                @jax.jit
                def f(a, b):
                    for _ in range(k):
                        c = jnp.einsum("bmk,bkn->bmn", a, b,
                                       precision=jax.lax.Precision.HIGHEST)
                        a = dep(a, c)
                    return c
                return f, (A, Bm)
            dt = rate_of(mk)
            fl = 2 * nb * M * K_ * N
            print(f"batched mm {nb}x({M}x{K_}@{K_}x{N}): {dt*1e3:.2f} ms "
                  f"({fl/dt/1e12:.1f} TFLOP/s)")

    if not probes or "vpu" in probes:
        def mkv(k):
            x = jnp.asarray(rng.normal(size=(8192, 4096)), jnp.float32)

            @jax.jit
            def f(x):
                y = x
                for _ in range(k * 32):
                    y = y * 1.0000001 + 0.3
                return y
            return f, (x,)
        dt = rate_of(mkv) / 32
        print(f"VPU fma (8192,4096): {dt*1e3:.3f} ms/pass "
              f"({2*8192*4096/dt/1e12:.2f} TFLOP/s)")

        def mks(k):
            x = jnp.asarray(rng.normal(size=(8192, 4096)), jnp.float32)

            @jax.jit
            def f(x):
                y = x
                for _ in range(k):
                    y = jnp.sin(y)
                return y
            return f, (x,)
        dt = rate_of(mks)
        print(f"VPU sin (8192,4096): {dt*1e3:.3f} ms "
              f"({8192*4096/dt/1e9:.2f} Gelt/s)")

    if not probes or "sort" in probes:
        def mka(k):
            x = jnp.asarray(rng.normal(size=(S, B)).astype(np.float32))

            @jax.jit
            def f(x):
                for _ in range(k):
                    o = jnp.argsort(x, axis=0)
                    x = dep(x, o.astype(jnp.float32))
                return o
            return f, (x,)
        dt = rate_of(mka, k1=1, k2=4)
        print(f"argsort (S,B)=({S},{B}): {dt*1e3:.1f} ms "
              f"({S*B/dt/1e6:.0f} Melt/s)")

        # multi-operand sort: key + p payload columns, batched over D
        for D, pay in ((333, 4), (333, 8), (333, 18)):
            def mkm(k, D=D, pay=pay):
                key = jnp.asarray(rng.normal(size=(D, S)), jnp.float32)
                pays = [jnp.asarray(rng.normal(size=(D, S)), jnp.float32)
                        for _ in range(pay)]

                @jax.jit
                def f(key, *pays):
                    for _ in range(k):
                        out = jax.lax.sort((key,) + tuple(pays),
                                           dimension=1, num_keys=1)
                        key = dep(key, out[1])
                    return out[0]
                return f, (key, *pays)
            dt = rate_of(mkm, k1=1, k2=3)
            print(f"lax.sort D={D} S={S} payloads={pay}: {dt*1e3:.1f} ms")

    if not probes or "gather" in probes:
        def mkg(k):
            o = jnp.asarray(
                np.stack([rng.permutation(S) for _ in range(B)], 1),
                jnp.int32)
            x = jnp.asarray(rng.normal(size=(S, B)), jnp.float32)

            @jax.jit
            def f(o, x):
                for _ in range(k):
                    y = jnp.take_along_axis(x, o, axis=0)
                    x = dep(x, y)
                return y
            return f, (o, x)
        dt = rate_of(mkg, k1=1, k2=3)
        print(f"take_along_axis (S,B): {dt*1e3:.1f} ms "
              f"({S*B/dt/1e6:.0f} Melt/s)")

    if not probes or "fft" in probes:
        def mkf(k):
            gr = jnp.asarray(rng.normal(size=(32, B, n)), jnp.float32)

            @jax.jit
            def f(g):
                for _ in range(k):
                    y = jnp.fft.fft(g.astype(jnp.complex64), axis=2)
                    g = dep(g, jnp.real(y))
                return jnp.real(y)
            return f, (gr,)
        dt = rate_of(mkf, k1=1, k2=4)
        print(f"FFT (32,{B},{n}) c64: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main(sys.argv[1:])
