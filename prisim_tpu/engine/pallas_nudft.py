"""Pallas TPU kernel for the NUDFT visibility sum (the metric kernel).

Same math as nudft.py (U.W phasor factorization on a uniform channel
grid, double-float32 cycle arithmetic for <=1e-6 phase accuracy — see
that module's docstring and /root/reference/prisim/interferometry.py:
6323-6376 for the reference formulation), but with explicit VMEM tiling:

* grid = (baseline tiles, source tiles); the (BT, C) visibility
  accumulator tile lives in VMEM across all source steps of one baseline
  tile (output revisiting), so HBM traffic is O(S*C + B*C) instead of
  the XLA path's O(S*B*(Q+L)) phasor spill at large source blocks.
* per grid step everything — the two-float k = s.b reduction, the W
  phasor table (ST, BT, L), the per-q U phasors (ST, BT), and the
  V += sum_s A*(U.W) accumulation — stays in VMEM; the VPU runs the MACs
  with no HBM round trips.

Scope: point sources, no gradients (the XLA path in nudft.py covers
extended sources / dV/db; callers fall back automatically via
`nudft_auto`)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import twofloat as tf
from .nudft import choose_ql, nudft_visibilities

__all__ = ["nudft_pallas", "nudft_auto", "pallas_available"]

_TWO_PI = float(2.0 * np.pi)  # Python literal: safe to close over in kernels


def pallas_available():
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:                                  # pragma: no cover
        return False


def _kernel(seh_ref, sel_ref, blh_ref, bll_ref, amps_ref, scal_ref,
            vr_ref, vi_ref, wc_ref, ws_ref, cr_ref, ci_ref,
            *, Q, L, ST, BT, k_mode):
    # NOTE on scal_ref: the four frequency-grid scalars are passed as
    # pre-broadcast (4, ST, BT) VMEM tiles, NOT SMEM scalars. SMEM scalar
    # reads reach the fused arithmetic as compile-time constants, and
    # constant operands let the compiler collapse the compensated
    # (two-float) expressions — verified to cost ~3 digits of phase
    # accuracy. VMEM tiles keep them opaque runtime values.
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        vr_ref[:] = jnp.zeros_like(vr_ref)
        vi_ref[:] = jnp.zeros_like(vi_ref)
        cr_ref[:] = jnp.zeros_like(cr_ref)
        ci_ref[:] = jnp.zeros_like(ci_ref)

    g0h, g0l = scal_ref[0], scal_ref[1]
    gdh, gdl = scal_ref[2], scal_ref[3]
    ch0 = scal_ref[4]          # channel-axis offset (mesh chan shards)
    # 2*pi as opaque runtime two-float (VMEM, not a literal the Mosaic
    # compiler could constant-fold through the compensated product).
    two_pi = (scal_ref[5], scal_ref[6])

    # k = s_eff . bl in two-float, (ST, BT) meters. Two formulations of
    # the same compensated dot product (empirically forced):
    # * 'vec3' — df_dot3 over (ST,1,3)x(1,BT,3). The ONLY form whose
    #   compensation terms survive the CPU/interpret compilers (column-
    #   broadcast per-axis forms collapse to ~f32 accuracy there), but
    #   lane-dim-3 arrays send the Mosaic TPU compiler into a
    #   pathological (>30 min) compile.
    # * 'axis2d' — per-axis (ST,1)x(1,BT) broadcasts in the same
    #   accumulation ORDER. Compiles fast under Mosaic (strict fp, no
    #   fast-math). bench.py cross-checks pallas vs the XLA engine at
    #   runtime before timing, so a hypothetical hardware-numerics
    #   regression is caught, reported, and falls back.
    if k_mode == "vec3":
        kh, kl = tf.df_dot3(seh_ref[:][:, None, :],
                            sel_ref[:][:, None, :],
                            blh_ref[:][None, :, :],
                            bll_ref[:][None, :, :])
    else:
        def axis_prod(ax):
            sh = seh_ref[:, ax].reshape(ST, 1)
            sl = sel_ref[:, ax].reshape(ST, 1)
            bh = blh_ref[:, ax].reshape(1, BT)
            bl = bll_ref[:, ax].reshape(1, BT)
            ph, pe = tf.two_prod(sh, bh)
            pe = pe + (sh * bl + sl * bh)
            return ph, pe
        kh, kl = axis_prod(0)
        for ax in (1, 2):
            qh, ql = axis_prod(ax)
            kh, kl = tf.df_add(kh, kl, qh, ql)

    # cycle counts: p0 = k*nu0/c + chan0*d, d = k*dnu/c (two-float,
    # frac-reduced). chan0 is an exact small integer in f32.
    p0h, p0l = tf.df_frac(*tf.df_mul(kh, kl, g0h, g0l), xp=jnp)
    dh, dl = tf.df_frac(*tf.df_mul(kh, kl, gdh, gdl), xp=jnp)
    oh, oe = tf.two_prod(dh, ch0)
    p0h, p0l = tf.df_frac(*tf.df_add(p0h, p0l, oh, oe + dl * ch0),
                          xp=jnp)

    # W phasor table over the fast channel index r = 0..L-1, built by a
    # two-float phase recurrence (cycle += d per step, frac-reduced) into
    # (L, ST, BT) VMEM scratch: per-step math stays 2-D (ST, BT), which
    # keeps the Mosaic program small (a single 3-D two-float expression
    # over (ST, L, BT) made the remote compiler OOM). BT=128 rides the
    # VPU lanes.
    def w_step(rr, carry):
        ch, cl = carry
        wc, ws = tf.df_sincos_cycles(ch, cl, xp=jnp, two_pi=two_pi)
        wc_ref[rr] = wc
        ws_ref[rr] = -ws
        return tf.df_frac(*tf.df_add(ch, cl, dh, dl), xp=jnp)

    jax.lax.fori_loop(0, L, w_step,
                      (jnp.zeros_like(dh), jnp.zeros_like(dl)))
    Wc = wc_ref[:]
    Ws = ws_ref[:]

    # fori_loop over the Q coarse-channel groups (a static unroll blows
    # up the Mosaic MLIR and OOMs the compiler at Q=32). The output and
    # amps refs are 3-D (B/S, Q, L) so the per-q store/load is a dynamic
    # index on a LEADING (non-tiled) dimension, which Mosaic supports.
    # The U-phasor cycle count is carried as a running two-float
    # accumulator stepped by L*d per group — L is a power of 2
    # (choose_ql), so L*dh and L*dl are exact f32 multiplies and the
    # accumulation stays compensated with no constant-operand products
    # for the compiler to collapse.
    Ldh = dh * jnp.float32(L)
    Ldl = dl * jnp.float32(L)

    def q_step(q, carry):
        th, tl = carry
        uc, us_ = tf.df_sincos_cycles(th, tl, xp=jnp, two_pi=two_pi)
        us = -us_                                        # (ST, BT)
        AT = amps_ref[q][:, :, None]                     # (L, ST, 1)
        Er = uc[None] * Wc - us[None] * Ws               # (L, ST, BT)
        Ei = uc[None] * Ws + us[None] * Wc
        vr = jnp.sum(AT * Er, axis=1)                    # (L, BT)
        vi = jnp.sum(AT * Ei, axis=1)
        # Kahan-compensated accumulation: the plain f32 `+=` quantizes
        # each of the S/ST sequential grid-step adds at eps*|V| — a
        # random walk measured at ~3e-6 relative by north-star source
        # counts (benchmarks/accuracy_northstar.py), over the 1e-6 bar.
        yr = vr - cr_ref[q]
        tr = vr_ref[q] + yr
        cr_ref[q] = (tr - vr_ref[q]) - yr
        vr_ref[q] = tr
        yi = vi - ci_ref[q]
        ti = vi_ref[q] + yi
        ci_ref[q] = (ti - vi_ref[q]) - yi
        vi_ref[q] = ti
        return tf.df_frac(*tf.df_add(th, tl, Ldh, Ldl), xp=jnp)

    jax.lax.fori_loop(0, Q, q_step, (p0h, p0l))


@functools.partial(jax.jit, static_argnames=("nchan", "src_tile",
                                             "bl_tile", "interpret",
                                             "k_mode"))
def nudft_pallas(seh, sel, blh, bll, amps, grid_scalars, nchan,
                 chan0=0, src_tile=128, bl_tile=256, interpret=False,
                 k_mode=None):
    """Pallas NUDFT (point sources, no gradient): complex64 (B, C).

    Arguments as nudft_visibilities; src_tile/bl_tile pick the VMEM
    tiling. src_tile must be a multiple of 128: sources ride the lane
    dim of the (Q, L, src) amps staging layout (the source-major
    layouts pad L=32 lanes 4x in HBM and OOMed at north-star source
    counts). (128, 256) measured 179 GMAC/s on v5e at the full bench
    size — see BASELINE.md."""
    g0h, g0l, gdh, gdl = grid_scalars
    S = seh.shape[0]
    B = blh.shape[0]
    nchan = int(nchan)
    Q, L = choose_ql(nchan)
    C_pad = Q * L

    if amps.shape[1] < C_pad:
        amps = jnp.pad(amps, ((0, 0), (0, C_pad - amps.shape[1])))

    ST, BT = int(src_tile), int(bl_tile)
    # sources pad to a multiple of lcm(ST, 128): ST for the grid, 128 so
    # the (Q, L, S) amps layout ends on a full lane tile (padding-free)
    s_align = int(np.lcm(ST, 128))
    S_pad = -(-S // s_align) * s_align
    B_pad = -(-B // BT) * BT

    def padn(x, n, axis=0):
        if x.shape[axis] >= n:
            return jnp.asarray(x, jnp.float32)
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, n - x.shape[axis])
        return jnp.pad(jnp.asarray(x, jnp.float32), pad)

    seh_p = padn(seh, S_pad)
    sel_p = padn(sel, S_pad)
    amps_p = padn(amps, S_pad)
    blh_p = padn(blh, B_pad)
    bll_p = padn(bll, B_pad)
    scal = jnp.stack([jnp.broadcast_to(jnp.float32(v), (ST, BT))
                      for v in (g0h, g0l, gdh, gdl,
                                jnp.asarray(chan0, jnp.float32),
                                jnp.float32(tf.TWO_PI_HI),
                                jnp.float32(tf.TWO_PI_LO))])

    if k_mode is None:
        k_mode = "vec3" if interpret else "axis2d"
    grid = (B_pad // BT, S_pad // ST)
    kernel = functools.partial(_kernel, Q=Q, L=L, ST=ST, BT=BT,
                               k_mode=k_mode)
    # (Q, L, S_total): the per-q read indexes the LEADING dim — traced
    # dynamic indexing on non-leading VMEM dims trapped the device at
    # runtime (verified on hardware: kernel ran, then all subsequent
    # device ops returned UNIMPLEMENTED). Sources ride the LANE dim:
    # with L=32 last, the T(8,128) HBM layout pads 32 lanes to 128 — a
    # 4x expansion that OOMed HBM at north-star source counts (12 GB
    # for the nside-256 sky); S_pad is 128-divisible so (Q, L, S) is
    # padding-free.
    amps_q = jnp.transpose(amps_p.reshape(S_pad, Q, L), (1, 2, 0))
    out_shape = [jax.ShapeDtypeStruct((Q, L, B_pad), jnp.float32),
                 jax.ShapeDtypeStruct((Q, L, B_pad), jnp.float32)]
    vr, vi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ST, 3), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ST, 3), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, L, ST), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((7, ST, BT), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Q, L, BT), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, L, BT), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((L, ST, BT), jnp.float32),
                        pltpu.VMEM((L, ST, BT), jnp.float32),
                        pltpu.VMEM((Q, L, BT), jnp.float32),
                        pltpu.VMEM((Q, L, BT), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * S_pad * B_pad * C_pad,
            bytes_accessed=4 * (S_pad * C_pad + 2 * B_pad * C_pad),
            transcendentals=2 * S_pad * B_pad * (Q + L)),
    )(seh_p, sel_p, blh_p, bll_p, amps_q, scal)
    # (Q, L, B_pad) -> (B_pad, Q*L). Transpose the REAL planes and only
    # then combine to complex: transposing a complex64 array hit an
    # UNIMPLEMENTED TPU backend error (and wedged the device) on the
    # axon tunnel, while f32 transposes and complex construction/slicing
    # are fine.
    vr_t = jnp.transpose(vr, (2, 0, 1)).reshape(B_pad, C_pad)
    vi_t = jnp.transpose(vi, (2, 0, 1)).reshape(B_pad, C_pad)
    return (vr_t + 1j * vi_t)[:B, :nchan]


def nudft_auto(seh, sel, blh, bll, amps, grid_scalars, nchan, **kw):
    """Use the Pallas kernel on TPU for the plain point-source case, the
    XLA path otherwise (extended sources, gradients, non-TPU backends)."""
    plain = not kw.get("gradient") and kw.get("src_shape_sigma") is None
    if plain and pallas_available():
        return nudft_pallas(seh, sel, blh, bll, amps, grid_scalars,
                            nchan)
    return nudft_visibilities(seh, sel, blh, bll, amps, grid_scalars,
                              nchan, **kw)
