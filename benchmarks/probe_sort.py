"""Bounded sort probes for the banded-NUFFT design: argsort and
multi-operand lax.sort at direction-chunk shapes. Keep shapes modest —
a terminated giant sort wedges the axon tunnel."""

import time

import numpy as np


def rate_of(make_fn, k1=1, k2=3):
    import jax

    def run(k):
        fn, args = make_fn(k)
        out = fn(*args)
        np.asarray(jax.device_get(
            jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.device_get(
            jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
        return time.perf_counter() - t0
    return (run(k2) - run(k1)) / (k2 - k1)


def main():
    import jax
    import jax.numpy as jnp
    S = 49152
    rng = np.random.default_rng(0)
    print(f"# {jax.devices()[0]}", flush=True)

    def dep(x, out):
        return x + out.ravel()[0].astype(x.dtype) * 1e-30

    for D, pay in ((32, 0), (32, 4), (32, 10), (128, 0), (128, 4)):
        def mk(k, D=D, pay=pay):
            key = jnp.asarray(rng.normal(size=(D, S)), jnp.float32)
            pays = [jnp.asarray(rng.normal(size=(D, S)), jnp.float32)
                    for _ in range(pay)]

            @jax.jit
            def f(key, *pays):
                for _ in range(k):
                    out = jax.lax.sort((key,) + tuple(pays),
                                       dimension=1, num_keys=1)
                    key = dep(key, out[0])
                return out
            return f, (key, *pays)
        dt = rate_of(mk)
        print(f"lax.sort D={D} S={S} payloads={pay}: {dt*1e3:.1f} ms",
              flush=True)

    # argsort at full (S, B)
    def mka(k):
        x = jnp.asarray(rng.normal(size=(S, 666)), jnp.float32)

        @jax.jit
        def f(x):
            for _ in range(k):
                o = jnp.argsort(x, axis=0)
                x = dep(x, o.astype(jnp.float32))
            return o
        return f, (x,)
    dt = rate_of(mka)
    print(f"argsort (S,666): {dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
