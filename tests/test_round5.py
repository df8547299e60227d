"""Round-5 regression tests: in-dot Kahan split, gate diagnostics."""

import numpy as np
import jax.numpy as jnp
import pytest

from prisim_tpu import twofloat as tf
from prisim_tpu.engine.nufft_banded import (make_banded_plan,
                                            nufft_banded_visibilities)
from prisim_tpu.engine.nufft_delay import (chebyshev_projection,
                                           spectral_project)


def _small_problem(seed=0, S=768, B=4, C=32, r=6):
    rng = np.random.default_rng(seed)
    bl = rng.uniform(-60, 60, (B, 3))
    bl[:, 2] = 0.0
    freqs = 150e6 + 390625.0 * np.arange(C)
    th = np.arccos(rng.uniform(0.05, 1.0, S))
    ph = rng.uniform(0, 2 * np.pi, S)
    s = np.stack([np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph),
                  np.cos(th)], axis=-1)
    amps = rng.uniform(0.1, 1.0, (S, C)) * \
        (freqs[None] / 150e6) ** -0.8
    return bl, freqs, s, amps


def test_dot_split_matches_plain_spread():
    """dot_split splits the kernel MXU dot into Kahan-folded sub-dots;
    it must reproduce the dot_split=1 result to f32 accumulation noise
    (it REDUCES rounding, never changes the math)."""
    bl, freqs, s, amps = _small_problem()
    C = freqs.size
    r = 6
    sh, sl = tf.split_f64(s)
    pinvQ, Q = chebyshev_projection(freqs, r)
    P = spectral_project(jnp.asarray(amps, jnp.float32),
                         jnp.asarray(pinvQ))
    out = {}
    for ds in (1, 4):
        plan = make_banded_plan(bl, freqs[0], freqs[1] - freqs[0], C,
                                rank=r, T_s=256, dot_split=ds)
        v, ok = nufft_banded_visibilities(
            plan, jnp.asarray(sh), jnp.asarray(sl), P, Q,
            interpret=True)
        assert bool(ok)
        out[ds] = np.asarray(v)
    scale = np.abs(out[1]).max()
    assert np.abs(out[1] - out[4]).max() / scale < 2e-6


def test_dot_split_non_divisor_falls_back():
    """A dot_split that does not divide T_s silently degrades to 1
    (documented fallback, not an error)."""
    bl, freqs, s, amps = _small_problem()
    C = freqs.size
    r = 6
    sh, sl = tf.split_f64(s)
    pinvQ, Q = chebyshev_projection(freqs, r)
    P = spectral_project(jnp.asarray(amps, jnp.float32),
                         jnp.asarray(pinvQ))
    plan = make_banded_plan(bl, freqs[0], freqs[1] - freqs[0], C,
                            rank=r, T_s=256, dot_split=7)
    v, ok = nufft_banded_visibilities(
        plan, jnp.asarray(sh), jnp.asarray(sl), P, Q, interpret=True)
    assert bool(ok)
    assert np.isfinite(np.asarray(v)).all()
