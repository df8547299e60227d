"""Bisect the banded-kernel Mosaic compile pathology: compile reduced
variants with a wall-clock budget each and report lower/compile times.

    python benchmarks/probe_banded_compile.py <variant>

variants: tinygrid | fullgrid-trivial | tinygrid-nodyn | tinygrid-noloop
"""

import sys
import time

import numpy as np


def build(variant):
    import jax
    import jax.numpy as jnp
    from prisim_tpu.engine.nufft_banded import (_banded_spread,
                                                make_banded_plan)
    from prisim_tpu.engine import nufft_banded as NB

    # bench-shape plan but optionally a truncated grid
    from prisim_tpu.layouts import preset_layout
    from prisim_tpu import baselines as bls
    layout = preset_layout("HERA-37")
    bset = bls.build_baselines(layout, redundant=False)
    nchan = 1024
    rank = 24
    plan = make_banded_plan(bset.vectors, 100e6, 97656.25, nchan,
                            rank=rank, T_s=256)
    S_pad = 49152
    if variant.startswith("tinygrid"):
        # 8 baselines x 4 tiles
        plan.d_of_b = plan.d_of_b[:8]
        plan.blen_hi = plan.blen_hi[:8]
        plan.blen_lo = plan.blen_lo[:8]
        S_pad = 4 * plan.T_s
    D = plan.ndir
    B = plan.nbl
    n_tiles = S_pad // plan.T_s
    rng = np.random.default_rng(0)
    u = np.sort(rng.uniform(-1, 1, (D, S_pad)), axis=1).astype(np.float32)
    u_ls = np.zeros_like(u)
    P_s = rng.normal(size=(D, rank, S_pad)).astype(np.float32)
    goff = np.maximum.accumulate(
        rng.integers(0, plan.n_bk * plan.G_blk - 64,
                     (B, n_tiles)), axis=1).astype(np.int32) & ~7
    args = (jnp.asarray(u), jnp.asarray(u_ls), jnp.asarray(P_s),
            jnp.asarray(plan.d_of_b), jnp.asarray(goff))

    if variant == "fullgrid-trivial":
        # stub the kernel body with a trivial write
        def trivial(dofb_ref, goff_ref, uh_ref, ul_ref,
                    ps_ref, blh_ref, bll_ref, cst_ref, out_ref, **kw):
            out_ref[...] = jnp.zeros_like(out_ref)
        NB._banded_kernel = trivial
    f = jax.jit(lambda *a: _banded_spread(plan, *a))
    return f, args


def main():
    if sys.argv[1] == "sort26":
        probe_sort(); return
    variant = sys.argv[1]
    import jax
    f, args = build(variant)
    t0 = time.perf_counter()
    low = f.lower(*args)
    print(f"{variant}: lowered in {time.perf_counter()-t0:.1f} s",
          flush=True)
    t0 = time.perf_counter()
    comp = low.compile()
    print(f"{variant}: compiled in {time.perf_counter()-t0:.1f} s",
          flush=True)
    out = f(*args)
    np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
    print(f"{variant}: ran ok", flush=True)




def probe_sort():
    """Compile+run the 26-operand lax.sort alone on the TPU backend."""
    import jax
    import jax.numpy as jnp
    D, S, r = 69, 49152, 24
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.normal(size=(D, S)), jnp.float32)
    pays = [jnp.asarray(rng.normal(size=(D, S)), jnp.float32)
            for _ in range(r + 1)]
    f = jax.jit(lambda *o: jax.lax.sort(o, dimension=1, num_keys=1)[0])
    t0 = time.perf_counter()
    low = f.lower(key, *pays)
    print(f"sort26: lowered {time.perf_counter()-t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    low.compile()
    print(f"sort26: compiled {time.perf_counter()-t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    out = f(key, *pays)
    np.asarray(jax.device_get(out.ravel()[:1]))
    print(f"sort26: ran {time.perf_counter()-t0:.2f} s", flush=True)
    t0 = time.perf_counter()
    out = f(key, *pays)
    np.asarray(jax.device_get(out.ravel()[:1]))
    print(f"sort26: ran again {time.perf_counter()-t0:.2f} s",
          flush=True)


if __name__ == "__main__":
    main()
