"""Micro-probes of TPU primitive throughput at the bench shape, to
ground the banded-NUFFT design (round 3). Run on the real chip:

    python benchmarks/probe_tpu_primitives.py [probe ...]

Each probe prints one line: name, seconds/iter, derived rate.
"""

import sys
import time

import numpy as np


def _sync(out):
    # block_until_ready is NOT sufficient on the axon tunnel (measured:
    # 4096^3 matmuls "complete" in 0.1 ms => 1256 TFLOP/s on a v5e).
    # Force a tiny device->host readback of every output leaf instead.
    import jax
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(fn, *args, repeats=3, warm=1):
    for _ in range(warm):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
        _sync(out)
    return (time.perf_counter() - t0) / repeats


def main(probes):
    import jax
    import jax.numpy as jnp
    S, B, C = 49152, 666, 1024
    n = 2 * C
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# platform={dev.platform} {dev}")

    if not probes or "sort" in probes:
        m0 = jnp.asarray(rng.integers(0, n, (S, B)), jnp.int32)
        f = jax.jit(lambda x: jnp.argsort(x, axis=0))
        dt = timeit(f, m0)
        print(f"argsort (S,B)=({S},{B}) axis0: {dt:.4f} s "
              f"({S*B/dt/1e6:.1f} Melt/s)")
        f1 = jax.jit(lambda x: jnp.argsort(x, axis=0))
        m1 = jnp.asarray(rng.integers(0, n, (S, 1)), jnp.int32)
        dt = timeit(f1, m1)
        print(f"argsort (S,1): {dt*1e3:.2f} ms")

    if not probes or "gather" in probes:
        m0 = jnp.asarray(rng.integers(0, n, (S, B)), jnp.int32)
        order = jax.jit(lambda x: jnp.argsort(x, axis=0))(m0)
        x = jnp.asarray(rng.normal(size=(S, B)), jnp.float32)
        g = jax.jit(lambda o, v: jnp.take_along_axis(v, o, axis=0))
        dt = timeit(g, order, x)
        print(f"take_along_axis (S,B): {dt:.4f} s "
              f"({S*B/dt/1e6:.1f} Melt/s)")
        # row gather: reorder rows of (S, 16) by a (S,) permutation
        P16 = jnp.asarray(rng.normal(size=(S, 16)), jnp.float32)
        o1 = jnp.asarray(rng.permutation(S), jnp.int32)
        rg = jax.jit(lambda o, v: v[o])
        dt = timeit(rg, o1, P16)
        print(f"row gather (S,16)[perm]: {dt*1e3:.3f} ms "
              f"({S*16/dt/1e6:.1f} Melt/s)")
        # batched row gather: (D, S) perms applied to (S, 16)
        D = 64
        oD = jnp.asarray(np.stack([rng.permutation(S) for _ in range(D)]),
                         jnp.int32)
        rgD = jax.jit(lambda o, v: v[o])           # (D, S, 16)
        dt = timeit(rgD, oD, P16)
        print(f"row gather x{D} dirs (S,16): {dt*1e3:.2f} ms "
              f"({D*S*16/dt/1e6:.1f} Melt/s)")

    if not probes or "matmul" in probes:
        for prec in ("default", "highest"):
            A = jnp.asarray(rng.normal(size=(4096, 4096)), jnp.float32)
            Bm = jnp.asarray(rng.normal(size=(4096, 4096)), jnp.float32)
            p = (jax.lax.Precision.HIGHEST if prec == "highest"
                 else jax.lax.Precision.DEFAULT)
            mm = jax.jit(lambda a, b: jnp.matmul(a, b, precision=p))
            dt = timeit(mm, A, Bm)
            fl = 2 * 4096**3
            print(f"matmul 4096^3 {prec}: {dt*1e3:.2f} ms "
                  f"({fl/dt/1e12:.1f} TFLOP/s)")

    if not probes or "vpu" in probes:
        x = jnp.asarray(rng.normal(size=(8192, 4096)), jnp.float32)

        def chain(x):
            for _ in range(32):
                x = x * 1.0000001 + 0.3
            return x
        f = jax.jit(chain)
        dt = timeit(f, x)
        fl = 64 * x.size
        print(f"VPU fma chain x32 (8192,4096): {dt*1e3:.2f} ms "
              f"({fl/dt/1e12:.2f} TFLOP/s)")
        g = jax.jit(lambda x: jnp.sin(x))
        dt = timeit(g, x)
        print(f"VPU sin (8192,4096): {dt*1e3:.2f} ms "
              f"({x.size/dt/1e9:.1f} Gelt/s)")

    if not probes or "fft" in probes:
        gr = jnp.asarray(rng.normal(size=(B, n)), jnp.float32)
        gi = jnp.asarray(rng.normal(size=(B, n)), jnp.float32)
        f = jax.jit(lambda a, b: jnp.real(jnp.fft.fft(a + 1j * b,
                                                      axis=1)))
        dt = timeit(f, gr, gi)
        print(f"FFT (B,n)=({B},{n}) c64: {dt*1e3:.2f} ms")
        grr = jnp.asarray(rng.normal(size=(32, B, n)), jnp.float32)
        f2 = jax.jit(lambda a: jnp.real(jnp.fft.fft(a.astype(jnp.complex64),
                                                    axis=2)))
        dt = timeit(f2, grr)
        print(f"FFT (32,B,n) c64: {dt*1e3:.2f} ms")

    if not probes or "direct" in probes:
        # the direct Pallas kernel at bench shape (round-3 reference)
        sys.path.insert(0, ".")
        from prisim_tpu.engine.pallas_nudft import nudft_pallas
        from prisim_tpu import twofloat as tf
        s = rng.normal(size=(S, 3))
        s /= np.linalg.norm(s, axis=1, keepdims=True)
        seh, sel = tf.split_f64(s)
        bl = rng.uniform(-200, 200, (B, 3))
        blh, bll = tf.split_f64(bl)
        amps = jnp.asarray(rng.uniform(0.1, 1.0, (S, C)), jnp.float32)
        nu0, dnu = 100e6, 97656.25
        c = 299792458.0
        g0 = nu0 / c
        gd = dnu / c
        gs = (*[jnp.float32(v) for v in tf.split_f64(np.float64(g0))],
              *[jnp.float32(v) for v in tf.split_f64(np.float64(gd))])
        f = jax.jit(lambda *a: jnp.real(nudft_pallas(*a, gs, C)))
        dt = timeit(f, jnp.asarray(seh), jnp.asarray(sel),
                    jnp.asarray(blh), jnp.asarray(bll), amps)
        print(f"direct pallas (S,B,C): {dt:.4f} s "
              f"({S*B*C/dt/1e12:.2f} TMAC/s)")

    if not probes or "cumsum" in probes:
        x = jnp.asarray(rng.normal(size=(S, B)), jnp.float32)
        f = jax.jit(lambda v: jnp.cumsum(v, axis=0))
        dt = timeit(f, x)
        print(f"cumsum (S,B) axis0: {dt*1e3:.2f} ms "
              f"({S*B/dt/1e6:.1f} Melt/s)")


if __name__ == "__main__":
    main(sys.argv[1:])
