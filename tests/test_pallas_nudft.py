"""Pallas NUDFT kernel vs XLA path and float64 golden (interpret mode —
runs on the CPU mesh without TPU hardware)."""

import numpy as np
import pytest
import jax.numpy as jnp

from prisim_tpu import twofloat as tf
from prisim_tpu import constants as CNST
from prisim_tpu.engine.nudft import (nudft_visibilities,
                                     nudft_reference_f64,
                                     freq_grid_scalars)
from prisim_tpu.engine.pallas_nudft import nudft_pallas


def _problem(S=100, B=37, C=48, seed=0):
    rng = np.random.RandomState(seed)
    s = rng.randn(S, 3)
    s /= np.linalg.norm(s, axis=1, keepdims=True)
    s[:, 2] = np.abs(s[:, 2])
    pc = np.asarray([0.0, 0.0, 1.0])
    se = s - pc
    bl = rng.randn(B, 3) * 200.0
    amps = rng.rand(S, C).astype(np.float32)
    nu0, dnu = 150e6, 97656.25
    freqs = nu0 + dnu * np.arange(C)
    seh, sel = tf.split_f64(se)
    blh, bll = tf.split_f64(bl)
    gs = freq_grid_scalars(nu0, dnu)
    return (jnp.asarray(seh), jnp.asarray(sel), jnp.asarray(blh),
            jnp.asarray(bll), jnp.asarray(amps), gs, C,
            se, bl, amps, freqs)


def test_pallas_matches_f64_golden():
    seh, sel, blh, bll, amps, gs, C, se, bl, a_np, freqs = _problem()
    got = np.asarray(nudft_pallas(seh, sel, blh, bll, amps, gs, C,
                                  src_tile=32, bl_tile=16,
                                  interpret=True))
    want = nudft_reference_f64(se, bl, a_np, freqs)
    scale = np.abs(want).max()
    err = np.abs(got - want).max() / scale
    assert err < 2e-6, err


def test_pallas_matches_xla_path():
    seh, sel, blh, bll, amps, gs, C, *_ = _problem(S=70, B=21, C=32,
                                                   seed=1)
    got = np.asarray(nudft_pallas(seh, sel, blh, bll, amps, gs, C,
                                  src_tile=16, bl_tile=8,
                                  interpret=True))
    ref = np.asarray(nudft_visibilities(seh, sel, blh, bll, amps, gs, C,
                                        src_block=32))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 2e-6


def test_pallas_ragged_sizes():
    # S, B not multiples of the tiles; C not a power of two
    seh, sel, blh, bll, amps, gs, C, se, bl, a_np, freqs = _problem(
        S=53, B=13, C=24, seed=2)
    got = np.asarray(nudft_pallas(seh, sel, blh, bll, amps, gs, C,
                                  src_tile=16, bl_tile=8,
                                  interpret=True))
    assert got.shape == (13, 24)
    want = nudft_reference_f64(se, bl, a_np, freqs)
    assert np.abs(got - want).max() / np.abs(want).max() < 2e-6


def test_pallas_long_baseline_phase_wraps():
    # |b| = 3 km at 200 MHz: ~2000 phase cycles — stresses frac reduction
    seh, sel, blh, bll, amps, gs, C, se, bl, a_np, freqs = _problem(
        S=40, B=8, C=16, seed=3)
    bl = bl * 15.0
    blh, bll = tf.split_f64(bl)
    got = np.asarray(nudft_pallas(seh, sel, jnp.asarray(blh),
                                  jnp.asarray(bll), amps, gs, C,
                                  src_tile=8, bl_tile=8,
                                  interpret=True))
    want = nudft_reference_f64(se, bl, a_np, freqs)
    assert np.abs(got - want).max() / np.abs(want).max() < 2e-6


def test_pallas_amps_layouts_agree():
    """Both amps staging layouts ('sl' fast / 'ls' memory-safe, chosen
    automatically by problem size) produce the same visibilities."""
    import jax.numpy as jnp
    from prisim_tpu import twofloat as tf
    from prisim_tpu.engine.nudft import (nudft_reference_f64,
                                         freq_grid_scalars)
    from prisim_tpu.engine.pallas_nudft import nudft_pallas
    rng = np.random.RandomState(2)
    S, B, C = 300, 10, 64
    se = rng.uniform(-1, 1, (S, 3))
    se /= np.linalg.norm(se, axis=1, keepdims=True)
    se = se - np.array([0.0, 0.0, 1.0])
    bl = rng.uniform(-250, 250, (B, 3))
    a_np = rng.uniform(0.1, 10, (S, C)).astype(np.float32)
    freqs = 100e6 + 97656.25 * np.arange(C)
    gs = freq_grid_scalars(freqs[0], 97656.25)
    seh, sel = tf.split_f64(se)
    blh, bll = tf.split_f64(bl)
    want = nudft_reference_f64(se, bl, a_np, freqs)
    scale = np.abs(want).max()
    outs = {}
    for layout in ("sl", "ls"):
        outs[layout] = np.asarray(nudft_pallas(
            jnp.asarray(seh), jnp.asarray(sel), jnp.asarray(blh),
            jnp.asarray(bll), jnp.asarray(a_np), gs, C,
            amps_layout=layout, interpret=True))
        assert np.abs(outs[layout] - want).max() / scale < 2e-6, layout
    # identical math either way (layout only changes staging)
    np.testing.assert_allclose(outs["sl"], outs["ls"], rtol=0,
                               atol=2e-6 * scale)


def test_pallas_gradient_matches_golden():
    """In-kernel gradient planes vs XLA path and f64 golden (round 3)."""
    rng = np.random.RandomState(5)
    S, B, C = 60, 11, 32
    s = rng.randn(S, 3)
    s /= np.linalg.norm(s, axis=1, keepdims=True)
    s[:, 2] = np.abs(s[:, 2])
    se = s - np.array([0.0, 0.0, 1.0])
    bl = rng.randn(B, 3) * 150.0
    a_np = rng.rand(S, C).astype(np.float32)
    freqs = 150e6 + 97656.25 * np.arange(C)
    gs = freq_grid_scalars(freqs[0], 97656.25)
    seh, sel = tf.split_f64(se)
    blh, bll = tf.split_f64(bl)
    args = (jnp.asarray(seh), jnp.asarray(sel), jnp.asarray(blh),
            jnp.asarray(bll), jnp.asarray(a_np), gs, C)
    vis_p, grad_p = nudft_pallas(*args, src_tile=16, bl_tile=8,
                                 interpret=True,
                                 s_sky=jnp.asarray(s, jnp.float32),
                                 gradient=True)
    vis_x, grad_x = nudft_visibilities(*args, s_sky=jnp.asarray(
        s, jnp.float32), gradient=True, src_block=16)
    want_v, want_g = nudft_reference_f64(se, bl, a_np, freqs, s_sky=s,
                                         gradient=True)
    sv = np.abs(want_v).max()
    sg = np.abs(want_g).max()
    assert np.abs(np.asarray(vis_p) - want_v).max() / sv < 2e-6
    assert np.abs(np.asarray(grad_p) - want_g).max() / sg < 5e-6
    assert np.abs(np.asarray(grad_p)
                  - np.asarray(grad_x)).max() / sg < 5e-6


def test_pallas_extended_sources_matches_golden():
    """In-kernel gaussian visibility weights vs XLA path / f64 golden."""
    rng = np.random.RandomState(7)
    S, B, C = 48, 9, 32
    s = rng.randn(S, 3)
    s /= np.linalg.norm(s, axis=1, keepdims=True)
    s[:, 2] = np.abs(s[:, 2])
    se = s - np.array([0.0, 0.0, 1.0])
    bl = rng.randn(B, 3) * 120.0
    a_np = rng.rand(S, C).astype(np.float32)
    freqs = 150e6 + 97656.25 * np.arange(C)
    gs = freq_grid_scalars(freqs[0], 97656.25)
    # a mix of extended (finite sigma) and point (inf sigma) sources
    sigma = rng.uniform(20.0, 200.0, S).astype(np.float32)
    sigma[::3] = np.inf
    seh, sel = tf.split_f64(se)
    blh, bll = tf.split_f64(bl)
    args = (jnp.asarray(seh), jnp.asarray(sel), jnp.asarray(blh),
            jnp.asarray(bll), jnp.asarray(a_np), gs, C)
    got = np.asarray(nudft_pallas(
        *args, src_tile=16, bl_tile=8, interpret=True,
        s_sky=jnp.asarray(s, jnp.float32),
        src_shape_sigma=jnp.asarray(sigma)))
    ref = np.asarray(nudft_visibilities(
        *args, s_sky=jnp.asarray(s, jnp.float32),
        src_shape_sigma=jnp.asarray(sigma),
        inv_wl=jnp.asarray(freqs / CNST.c, jnp.float32), src_block=16))
    want = nudft_reference_f64(se, bl, a_np, freqs, s_sky=s,
                               src_shape_sigma=sigma)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 3e-6
    assert np.abs(got - ref).max() / scale < 3e-6


def test_pallas_rot_recurrence_matches_golden():
    """recur='rot' (anchored rotation recurrences, the round-3
    throughput mode) stays in the engine accuracy class vs f64 and
    agrees with recur='df' — including long wrapping baselines and a
    non-divisible anchor layout (C=48 -> Q=8 with anchor_q=4)."""
    for seed, C, blscale in ((0, 48, 200.0), (5, 64, 4000.0)):
        seh, sel, blh, bll, amps, gs, C_, se, bl, a_np, freqs = \
            _problem(S=96, B=17, C=C, seed=seed)
        bl = bl * (blscale / 200.0)   # re-split AFTER scaling: scaling
        blh, bll = map(jnp.asarray, tf.split_f64(bl))  # hi/lo parts
        want = nudft_reference_f64(se, bl, a_np, freqs)  # breaks the
        # two-float invariant (the hi rounding is lost) and is NOT a
        # kernel error
        got = np.asarray(nudft_pallas(seh, sel, blh, bll, amps, gs, C,
                                      src_tile=16, bl_tile=8,
                                      interpret=True, recur="rot",
                                      anchor_q=4))
        scale = np.abs(want).max()
        assert np.abs(got - want).max() / scale < 2e-6
        # W re-anchoring (anchor_w < WB, incl. a period that does not
        # divide the r-block) changes only rounding, not values
        got_aw = np.asarray(nudft_pallas(seh, sel, blh, bll, amps, gs,
                                         C, src_tile=16, bl_tile=8,
                                         interpret=True, recur="rot",
                                         anchor_q=4, anchor_w=3))
        assert np.abs(got_aw - want).max() / scale < 2e-6
