"""Stage-by-stage compile bisect of the banded snapshot at bench shape.

    python benchmarks/probe_banded_stages.py <stage>

stages: vis (nufft_banded_visibilities alone) | prep | post | amps
Each prints lower/compile wall times with a readback run.
"""

import sys
import time

import numpy as np


def main():
    stage = sys.argv[1]
    import jax
    import jax.numpy as jnp
    from prisim_tpu.layouts import preset_layout
    from prisim_tpu import baselines as bls
    from prisim_tpu.engine.nufft_banded import (
        make_banded_plan, nufft_banded_visibilities, _prep, _post,
        _banded_spread)
    from prisim_tpu.engine.nufft_delay import chebyshev_projection

    layout = preset_layout("HERA-37")
    bset = bls.build_baselines(layout, redundant=False)
    nchan, rank, S = 1024, 24, 49152
    plan = make_banded_plan(bset.vectors, 100e6, 97656.25, nchan,
                            rank=rank, T_s=256)
    pinvQ, Q = chebyshev_projection(100e6 + 97656.25 * np.arange(nchan),
                                    rank)
    rng = np.random.default_rng(0)
    se = rng.normal(size=(S, 3))
    se /= np.linalg.norm(se, axis=1, keepdims=True)
    seh = jnp.asarray(se, jnp.float32)
    sel = jnp.zeros_like(seh)
    P = jnp.asarray(rng.normal(size=(S, rank)), jnp.float32)

    if stage == "vis":
        f = jax.jit(lambda a, b, c: [
            (jnp.real(x), jnp.imag(x)) if jnp.iscomplexobj(x) else x
            for x in nufft_banded_visibilities(plan, a, b, c, Q)])
        args = (seh, sel, P)
    elif stage == "prep":
        f = jax.jit(lambda a, b, c: _prep(plan, a, b, c)[:2])
        args = (seh, sel, P)
    elif stage == "post":
        out = jnp.zeros((plan.nbl, plan.n_bk, 2 * plan.G_blk,
                         2 * rank), jnp.float32)
        f = jax.jit(lambda o: (jnp.real(_post(plan, o, Q)),
                               jnp.imag(_post(plan, o, Q))))
        args = (out,)
    else:
        raise SystemExit("unknown stage")

    t0 = time.perf_counter()
    low = f.lower(*args)
    print(f"{stage}: lowered {time.perf_counter()-t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    low.compile()
    print(f"{stage}: compiled {time.perf_counter()-t0:.1f} s",
          flush=True)
    t0 = time.perf_counter()
    o = f(*args)
    np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(o)[0].ravel()[:1]))
    print(f"{stage}: ran {time.perf_counter()-t0:.2f} s", flush=True)
    t0 = time.perf_counter()
    o = f(*args)
    np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(o)[0].ravel()[:1]))
    print(f"{stage}: ran again {time.perf_counter()-t0:.2f} s",
          flush=True)


if __name__ == "__main__":
    main()
