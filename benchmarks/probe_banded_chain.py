"""Bisect the banded CHAIN compile pathology (prep/spread/post compile
fast in isolation; the fused jit of all three hangs — round-3 finding).

    python benchmarks/probe_banded_chain.py <variant> [S]

variants:
  prep-spread   jit(prep -> spread)
  spread-post   jit(spread -> post) with device-made inputs
  full          jit(prep -> spread -> post)  (== nufft_banded_visibilities)
  full-nomask   full without the visited-block masking
S: padded source count (default 49152)
"""

import sys
import time

import numpy as np


def main():
    variant = sys.argv[1]
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 49152
    import jax
    import jax.numpy as jnp
    from prisim_tpu.layouts import preset_layout
    from prisim_tpu import baselines as bls
    from prisim_tpu.engine.nufft_banded import (
        make_banded_plan, _prep, _post, _banded_spread)
    from prisim_tpu.engine.nufft_delay import chebyshev_projection

    layout = preset_layout("HERA-37")
    bset = bls.build_baselines(layout, redundant=False)
    nchan, rank = 1024, 24
    plan = make_banded_plan(bset.vectors, 100e6, 97656.25, nchan,
                            rank=rank, T_s=256)
    _, Q = chebyshev_projection(100e6 + 97656.25 * np.arange(nchan), rank)
    rng = np.random.default_rng(0)
    se = rng.normal(size=(S, 3))
    se /= np.linalg.norm(se, axis=1, keepdims=True)
    seh = jnp.asarray(se, jnp.float32)
    sel = jnp.zeros_like(seh)
    P = jnp.asarray(rng.normal(size=(S, rank)), jnp.float32)
    dofb = jnp.asarray(plan.d_of_b)

    if variant == "prep-spread":
        def f(a, b, c):
            u_hs, u_ls, P_s, bk, goff, ok = _prep(plan, a, b, c)
            out = _banded_spread(plan, u_hs, u_ls, P_s, dofb, goff)
            return out.sum(), ok
        fj = jax.jit(f)
        args = (seh, sel, P)
    elif variant == "spread-post":
        n_tiles = S // plan.T_s
        D = plan.ndir
        u = jnp.asarray(np.sort(rng.uniform(-1, 1, (D, S)), axis=1)
                        .astype(np.float32))
        ul = jnp.zeros_like(u)
        P_s = jnp.asarray(rng.normal(size=(D, rank, S)), np.float32)
        goff = jnp.asarray((np.maximum.accumulate(
            rng.integers(0, plan.n_bk * plan.G_blk - 64,
                         (plan.nbl, n_tiles)), axis=1) & ~7)
            .astype(np.int32))

        def f(u_, ul_, ps_, go_):
            out = _banded_spread(plan, u_, ul_, ps_, dofb, go_)
            v = _post(plan, out, Q)
            return jnp.real(v), jnp.imag(v)
        fj = jax.jit(f)
        args = (u, ul, P_s, goff)
    elif variant in ("full", "full-nomask"):
        def f(a, b, c):
            u_hs, u_ls, P_s, bk, goff, ok = _prep(plan, a, b, c)
            out = _banded_spread(plan, u_hs, u_ls, P_s, dofb, goff)
            if variant == "full":
                visited = jnp.any(
                    bk[:, :, None] == jnp.arange(plan.n_bk)[None, None, :],
                    axis=1)
                out = jnp.where(visited[:, :, None, None], out, 0.0)
            v = _post(plan, out, Q)
            return jnp.real(v), jnp.imag(v), ok
        fj = jax.jit(f)
        args = (seh, sel, P)
    else:
        raise SystemExit("unknown variant")

    t0 = time.perf_counter()
    low = fj.lower(*args)
    print(f"{variant} S={S}: lowered {time.perf_counter()-t0:.1f} s",
          flush=True)
    t0 = time.perf_counter()
    low.compile()
    print(f"{variant} S={S}: compiled {time.perf_counter()-t0:.1f} s",
          flush=True)
    t0 = time.perf_counter()
    o = fj(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0]).ravel()[:1])
    print(f"{variant} S={S}: ran {time.perf_counter()-t0:.2f} s",
          flush=True)
    t0 = time.perf_counter()
    o = fj(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0]).ravel()[:1])
    print(f"{variant} S={S}: ran again {time.perf_counter()-t0:.2f} s",
          flush=True)


if __name__ == "__main__":
    main()
