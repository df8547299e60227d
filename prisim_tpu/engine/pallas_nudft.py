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

Round 3: gradients and extended sources run IN-KERNEL (VERDICT r2 #5,
cf. /root/reference/prisim/interferometry.py:6257-6343). Both share one
extra (ST, 8) VMEM input [s_sky xyz, sigma_uv, pad]:

* gradient — 3 extra accumulator plane pairs G[k] = sum_s s_k A E share
  the U.W phasors with the main sum (4 kernel calls would recompute the
  transcendentals); plain f32 accumulation like the XLA path.
* extended sources — the per-(s,b,c) gaussian visibility weight
  w = exp(-0.5 (u_proj/sigma)^2) is evaluated on the VPU per r-block
  from alpha_sb = proj^2/(2 sigma^2) (hoisted per grid step) and the
  f32 channel scale (nu_c/c)^2 (weights are amplitudes: f32 suffices)."""

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


def _kernel(*refs, Q, L, WB, ST, BT, k_mode, layout, grad, ext, recur,
            aq, aw, ext_mode="exact"):
    (seh_ref, sel_ref, blh_ref, bll_ref, amps_ref, scal_ref) = refs[:6]
    idx = 6
    ssk_ref = kc2_ref = None
    if grad or ext:
        ssk_ref = refs[idx]
        idx += 1
    if ext and ext_mode == "exact3d":
        kc2_ref = refs[idx]
        idx += 1
    vr_ref, vi_ref = refs[idx], refs[idx + 1]
    idx += 2
    g_refs = None
    if grad:
        # six (Q, L, BT) planes — re/im per baseline-vector axis —
        # indexed [q, r-slice] exactly like vr_ref. The previous
        # (3Q, L, BT) pair indexed at a DERIVED dynamic leading index
        # (k3*Q + q) read back corrupted data on hardware (gradient
        # planes 5.6e-3 vs XLA while the identically-accumulated vis
        # planes were 1e-6-clean; interpret mode exact — measured
        # round 3, bench_gradext). Plain [q] dynamic indexing is the
        # pattern verified correct on the chip.
        g_refs = refs[idx:idx + 6]
        idx += 6
    wc_ref, ws_ref, cr_ref, ci_ref = refs[idx:idx + 4]
    we_ref = mq_ref = None
    if ext:
        we_ref, mq_ref = refs[idx + 4], refs[idx + 5]
    # NOTE on scal_ref: the frequency-grid scalars are passed as
    # pre-broadcast (7, ST, BT) VMEM tiles, NOT SMEM scalars (and not
    # (1, 1) VMEM values either). SMEM scalar reads reach the fused
    # arithmetic as compile-time constants, and constant operands let
    # the compiler collapse the compensated (two-float) expressions —
    # verified to cost ~3 digits of phase accuracy; (1, 1) VMEM values
    # broadcasting against (ST, BT) operands lose ~1 digit the same way
    # (measured in interpret mode). Full tiles stay opaque runtime
    # values.
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        vr_ref[:] = jnp.zeros_like(vr_ref)
        vi_ref[:] = jnp.zeros_like(vi_ref)
        cr_ref[:] = jnp.zeros_like(cr_ref)
        ci_ref[:] = jnp.zeros_like(ci_ref)
        if grad:
            for g in g_refs:
                g[:] = jnp.zeros_like(g)

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

    alpha = None
    g0f = gdf = mmj = mqj = M2 = None
    if ext:
        # extended-source weight precompute (per grid step, f32):
        # u_proj = sqrt(|b|^2 - (s_sky.b)^2)/lambda_c;
        # alpha = proj^2 / (2 sigma^2) so w_c = exp(-alpha (nu_c/c)^2).
        # sigma = inf (point sources in a mixed sky) -> alpha = 0, w = 1.
        blf = [blh_ref[:, ax].reshape(1, BT) + bll_ref[:, ax].reshape(1, BT)
               for ax in range(3)]
        bl2 = blf[0] * blf[0] + blf[1] * blf[1] + blf[2] * blf[2]
        ksky = (ssk_ref[:, 0].reshape(ST, 1) * blf[0]
                + ssk_ref[:, 1].reshape(ST, 1) * blf[1]
                + ssk_ref[:, 2].reshape(ST, 1) * blf[2])       # (ST, BT)
        proj2 = jnp.maximum(bl2 - ksky * ksky, 0.0)
        sig = ssk_ref[:, 3].reshape(ST, 1)
        alpha = 0.5 * proj2 / (sig * sig)                      # (ST, BT)
        # Multiplicative-recurrence constants (ext_mode 'exact'): the
        # exponent E(c) = alpha * (g0 + gd*c)^2 is an EXACT quadratic
        # in the channel index, so the per-channel gaussian weight
        # follows the same anchored-recurrence design as the phasors:
        # w(c+t) = w(c) * m(c); m(c+t) = m(c) * exp(-2 alpha gd^2 t^2)
        # with the second-difference factor CONSTANT per (s, b). One
        # exp per (s, b, c) — the naive form every earlier variant
        # evaluated — is the hardware exp-throughput wall: ~3.2e9
        # exp/s on v5e puts S*B*C exps at 10.2-10.4 s at the bench
        # shape however they are arranged (3-D, per-j 2-D, XLA engine
        # alike; probe_ext_kernel round 4). The recurrence needs 3
        # grid-step exps here + 3 per r-block, all (ST, BT) 2-D.
        # Amplitude-class f32 arithmetic throughout (plain adds of the
        # two-float halves): weight drift is <= ~(WB + 2Q) mult
        # roundings, random-signed across (s, b) — measured against
        # the f64 reference in tests/test_pallas_nudft.py.
        g0f = g0h + g0l                                        # (ST, BT)
        gdf = gdh + gdl
        agd2 = alpha * (gdf * gdf)
        Lf = jnp.float32(L)
        mmj = jnp.exp(-2.0 * agd2)           # j-stride 2nd difference
        mqj = jnp.exp(-2.0 * agd2 * Lf)      # Mq growth across j
        M2 = jnp.exp(-2.0 * agd2 * (Lf * Lf))  # q-stride 2nd difference

    # cycle counts: p0 = k*nu0/c + chan0*d, d = k*dnu/c (two-float,
    # frac-reduced). chan0 is an exact small integer in f32.
    p0h, p0l = tf.df_frac(*tf.df_mul(kh, kl, g0h, g0l), xp=jnp)
    dh, dl = tf.df_frac(*tf.df_mul(kh, kl, gdh, gdl), xp=jnp)
    oh, oe = tf.two_prod(dh, ch0)
    p0h, p0l = tf.df_frac(*tf.df_add(p0h, p0l, oh, oe + dl * ch0),
                          xp=jnp)

    # The fast channel index r = 0..L-1 is processed in WB-wide blocks
    # (static outer loop, L/WB iterations): the W phasor table scratch
    # is (WB, ST, BT) instead of (L, ST, BT), which is what lets
    # BT=256 lanes + ST=128 coexist in VMEM (the full-L table at those
    # tiles is 8 MB and the kernel fails to compile). The W table is
    # rebuilt per r-block by a two-float phase recurrence (cycle += d,
    # frac-reduced); per-step math stays 2-D (ST, BT), keeping the
    # Mosaic program small (a single 3-D two-float expression over
    # (ST, L, BT) made the remote compiler OOM). The U recurrence is
    # re-run per r-block: (L/WB - 1)*Q extra sincos per (s, b) — a few
    # percent of the MAC work.
    #
    # fori_loop over the Q coarse-channel groups (a static unroll blows
    # up the Mosaic MLIR and OOMs the compiler at Q=32). The output and
    # amps refs are 3-D (Q, L, ·) so per-q access is a dynamic index on
    # a LEADING (non-tiled) dimension (Mosaic-supported); the r-block
    # slice within each is static. The U-phasor cycle count is carried
    # as a running two-float accumulator stepped by L*d per group — L
    # is a power of 2 (choose_ql), so L*dh and L*dl are exact f32
    # multiplies and the accumulation stays compensated with no
    # constant-operand products for the compiler to collapse.
    Ldh = dh * jnp.float32(L)
    Ldl = dl * jnp.float32(L)

    if recur == "rot":
        # Anchored rotation recurrences (throughput mode, VERDICT r2
        # item 4): the per-step two-float sincos + frac/add machinery
        # (~96 evaluations per C=1024 output channels, each ~30-40
        # VPU flops) is replaced by a complex multiply with a
        # renormalized per-channel-step rotation factor (6 flops).
        # Exact two-float anchors bound the drift: W re-anchors at
        # every r-block start (<= WB-1 rotations), U every `aq` coarse
        # channels (<= aq rotations). Each rotation adds ~1 ulp of
        # phase/amplitude rounding with sign set by d = k*dnu/c, which
        # varies randomly across (s, b); accuracy vs the f64 golden is
        # measured at the north-star shape by
        # benchmarks/accuracy_northstar.py (BASELINE.md round 3).
        rc, rs_ = tf.df_sincos_cycles(dh, dl, xp=jnp, two_pi=two_pi)
        rn = 1.5 - 0.5 * (rc * rc + rs_ * rs_)   # |R| -> 1 + O(ulp^2)
        rc, rs = rc * rn, rs_ * rn
        Lfh, Lfl = tf.df_frac(Ldh, Ldl, xp=jnp)
        rLc_, rLs_ = tf.df_sincos_cycles(Lfh, Lfl, xp=jnp,
                                         two_pi=two_pi)
        rLn = 1.5 - 0.5 * (rLc_ * rLc_ + rLs_ * rLs_)
        rLc, rLs = rLc_ * rLn, rLs_ * rLn
        # cycles step per U anchor group: aq*L*d via two_prod (aq need
        # not be a power of 2, so the hi scaling must carry its
        # rounding error into the lo part)
        aqf = jnp.float32(aq)
        ALdh, _e = tf.two_prod(Ldh, aqf)
        ALdl = _e + Ldl * aqf

    for rb in range(L // WB):
        r0 = rb * WB

        # start cycles r0*d in two-float (r0 is a small exact integer
        # but dh*r0 can exceed the f32 mantissa, e.g. r0=24)
        r0f = jnp.float32(r0)
        s_h, s_e = tf.two_prod(dh, r0f)
        w_start = tf.df_frac(s_h, s_e + dl * r0f, xp=jnp)
        if recur == "rot":
            # W is re-anchored with an exact two-float sincos every
            # `aw` steps (<= aw-1 rotations of drift per chain; aw=WB
            # reproduces the single-anchor round-3 behavior). The
            # anchor chain count is static, so the group loop unrolls.
            def w_rot(j, ph):
                wc, wsn = ph
                wc_ref[j] = wc
                ws_ref[j] = wsn
                return (wc * rc + wsn * rs, wsn * rc - wc * rs)

            for a0 in range(0, WB, aw):
                if a0 == 0:
                    a_start = w_start
                else:
                    af = jnp.float32(r0 + a0)
                    a_h, a_e = tf.two_prod(dh, af)
                    a_start = tf.df_frac(a_h, a_e + dl * af, xp=jnp)
                wc0, ws0 = tf.df_sincos_cycles(*a_start, xp=jnp,
                                               two_pi=two_pi)
                jax.lax.fori_loop(a0, min(a0 + aw, WB), w_rot,
                                  (wc0, -ws0))
        else:
            def w_step(j, carry):
                ch_, cl_ = carry
                wc, ws = tf.df_sincos_cycles(ch_, cl_, xp=jnp,
                                             two_pi=two_pi)
                wc_ref[j] = wc
                ws_ref[j] = -ws
                return tf.df_frac(*tf.df_add(ch_, cl_, dh, dl), xp=jnp)

            jax.lax.fori_loop(0, WB, w_step, w_start)
        Wc = wc_ref[:]
        Ws = ws_ref[:]

        if ext and ext_mode == "exact":
            # r-block weight init: w at q=0 for the WB block channels
            # (j-stride recurrence) and the q-stride multipliers Mq_j
            # (their j-dependence is geometric with ratio mqj). All
            # (ST, BT) 2-D f32; 3 exps + ~3*WB mults per r-block.
            iv0 = g0f + gdf * (ch0 + jnp.float32(r0))
            w2 = jnp.exp(-alpha * (iv0 * iv0))
            mj = jnp.exp(-alpha * gdf * (2.0 * iv0 + gdf))
            Lf = jnp.float32(L)
            Mq = jnp.exp(-alpha * gdf * Lf * (2.0 * iv0 + gdf * Lf))
            for jj in range(WB):
                we_ref[jj] = w2
                mq_ref[jj] = Mq
                if jj + 1 < WB:
                    w2 = w2 * mj
                    mj = mj * mmj
                    Mq = Mq * mqj

        def q_body(q, uc, us):
            # us is the NEGATED sine plane (phasor e^{-i theta})
            if layout == "ls":                           # (Q, L, ST)
                A = amps_ref[q, r0:r0 + WB]              # (WB, ST)
            else:                                        # (Q, ST, L)
                A = jnp.transpose(amps_ref[q, :, r0:r0 + WB])
            AT = A[:, :, None]                           # (WB, ST, 1)
            Er = uc[None] * Wc - us[None] * Ws           # (WB, ST, BT)
            Ei = uc[None] * Ws + us[None] * Wc
            if grad or ext:
                Pr = AT * Er                             # (WB, ST, BT)
                Pi = AT * Ei
                if ext:
                    # channel index c = chan0 + q*L + r0 + j; weight
                    # w = exp(-alpha (nu_c/c)^2) with nu_c/c = g0 + c*d
                    # in plain f32 (amplitude-accuracy arithmetic).
                    # The channel factor is a SCALAR per (q, j): build
                    # the (WB, ST, BT) weight as WB scalar-scaled
                    # (ST, BT) exps. The first formulation derived it
                    # from a broadcasted_iota + (1, 1, BT) reshapes of
                    # the scal-tile rows per q_body — those relayouts
                    # ran 26x slower than the exp itself on hardware
                    # (10.2 s vs 0.39 s at the bench shape with the
                    # weight skipped; probe_ext_kernel round 4). Plain
                    # scalar reads are safe HERE (amplitude path): the
                    # compiler collapsing constants costs two-float
                    # PHASE accuracy only.
                    #
                    # ext_mode is the probe's diagnostic knob; the
                    # implemented set ('exact'/'exact3d'/'expnoscalar'
                    # /'const') is validated in nudft_pallas.
                    if ext_mode == "const":
                        # broadcast multiply only (cost bisect)
                        w = alpha[None, :, :]
                        Pr = Pr * w
                        Pi = Pi * w
                    elif ext_mode == "expnoscalar":
                        # exp + broadcast, no channel factor
                        w = jnp.exp(-alpha)[None, :, :]
                        Pr = Pr * w
                        Pi = Pi * w
                    elif ext_mode == "exact3d":
                        # one 3-D (WB, ST, BT) exp: measured 26x the
                        # whole remaining kernel on hardware (kept as
                        # the probe's negative control)
                        kc2 = kc2_ref[q, r0:r0 + WB]       # (WB, BT)
                        z = alpha[None, :, :] * kc2[:, None, :]
                        w = jnp.exp(-z)
                        Pr = Pr * w
                        Pi = Pi * w
                    elif ext_mode == "exact":
                        # multiplicative recurrence (see the grid-step
                        # precompute): apply the running weights, then
                        # step them by the q-stride factors. The naive
                        # exp-per-(s,b,c) alternatives all sit at the
                        # ~3.2e9 exp/s hardware wall (10.2-10.4 s at
                        # the bench shape, probe_ext_kernel round 4);
                        # here the hot path is 4 elementwise mults.
                        w3 = we_ref[:]                 # (WB, ST, BT)
                        Pr = Pr * w3
                        Pi = Pi * w3
                        mq3 = mq_ref[:]
                        we_ref[:] = w3 * mq3
                        mq_ref[:] = mq3 * M2[None]
                vr = jnp.sum(Pr, axis=1)                 # (WB, BT)
                vi = jnp.sum(Pi, axis=1)
                if grad:
                    # plain accumulation (matches the XLA path): the
                    # gradient planes are perturbation terms, not the
                    # 1e-6-bar visibility itself
                    for k3 in range(3):
                        sk = ssk_ref[:, k3].reshape(1, ST, 1)
                        g_refs[k3][q, r0:r0 + WB] = (
                            g_refs[k3][q, r0:r0 + WB]
                            + jnp.sum(sk * Pr, axis=1))
                        g_refs[3 + k3][q, r0:r0 + WB] = (
                            g_refs[3 + k3][q, r0:r0 + WB]
                            + jnp.sum(sk * Pi, axis=1))
            else:
                vr = jnp.sum(AT * Er, axis=1)            # (WB, BT)
                vi = jnp.sum(AT * Ei, axis=1)
            # Kahan-compensated accumulation: the plain f32 `+=`
            # quantizes each of the S/ST sequential grid-step adds at
            # eps*|V| — a random walk measured at ~3e-6 relative by
            # north-star source counts
            # (benchmarks/accuracy_northstar.py), over the 1e-6 bar.
            vr0 = vr_ref[q, r0:r0 + WB]
            cr0 = cr_ref[q, r0:r0 + WB]
            yr = vr - cr0
            tr = vr0 + yr
            cr_ref[q, r0:r0 + WB] = (tr - vr0) - yr
            vr_ref[q, r0:r0 + WB] = tr
            vi0 = vi_ref[q, r0:r0 + WB]
            ci0 = ci_ref[q, r0:r0 + WB]
            yi = vi - ci0
            ti = vi0 + yi
            ci_ref[q, r0:r0 + WB] = (ti - vi0) - yi
            vi_ref[q, r0:r0 + WB] = ti

        if recur == "rot":
            def qa_step(qa, carry):
                th, tl = carry
                uc0, us0 = tf.df_sincos_cycles(th, tl, xp=jnp,
                                               two_pi=two_pi)

                def q_rot(i, ph):
                    uc, usn = ph
                    q_body(qa * aq + i, uc, usn)
                    return (uc * rLc + usn * rLs,
                            usn * rLc - uc * rLs)

                jax.lax.fori_loop(0, aq, q_rot, (uc0, -us0))
                return tf.df_frac(*tf.df_add(th, tl, ALdh, ALdl),
                                  xp=jnp)

            jax.lax.fori_loop(0, Q // aq, qa_step, (p0h, p0l))
        else:
            def q_step(q, carry):
                th, tl = carry
                uc, us_ = tf.df_sincos_cycles(th, tl, xp=jnp,
                                              two_pi=two_pi)
                q_body(q, uc, -us_)
                return tf.df_frac(*tf.df_add(th, tl, Ldh, Ldl), xp=jnp)

            jax.lax.fori_loop(0, Q, q_step, (p0h, p0l))


@functools.partial(jax.jit, static_argnames=("nchan", "src_tile",
                                             "bl_tile", "w_block",
                                             "amps_layout",
                                             "interpret", "k_mode",
                                             "gradient", "recur",
                                             "anchor_q", "anchor_w",
                                             "ext_mode"))
def nudft_pallas(seh, sel, blh, bll, amps, grid_scalars, nchan,
                 chan0=0, src_tile=None, bl_tile=None, w_block=None,
                 amps_layout=None, interpret=False, k_mode=None,
                 s_sky=None, src_shape_sigma=None, gradient=False,
                 recur=None, anchor_q=4, anchor_w=4, ext_mode="exact"):
    """Pallas NUDFT: complex64 (B, C) (and (3, B, C) gradient moments
    when gradient=True; extended sources when src_shape_sigma given —
    both need s_sky (S, 3) f32 sky dircos, matching nudft_visibilities).

    Arguments as nudft_visibilities; src_tile/bl_tile pick the VMEM
    tiling, amps_layout the HBM staging layout of the beam-weighted
    fluxes:

    * 'sl' — (Q, src, L): L=32 rides the lane dim, which T(8,128) pads
      4x in HBM. Fastest tiling ((64, 256) measured best on v5e at the
      bench size; see BASELINE.md) but 4x amps memory — fine up to
      ~10^5 sources x 1024 chans, OOMs at north-star source counts.
    * 'ls' — (Q, L, src): sources ride the lane dim, padding-free in
      HBM (src_tile must then be a multiple of 128; (128, 128) measured
      best).

    Default: 'sl' when the padded amps stay under ~2 GB, else 'ls'.
    w_block (default: capped so the W scratch stays <= ~2 MB at large
    tiles) sets the r-block width of the W phasor table; see _kernel.

    recur: 'df' evaluates every grid phasor with the two-float sincos
    (round-2 behavior, 131 GMAC/s at bench size); 'rot' uses anchored
    rotation recurrences re-anchored every anchor_q U-groups /
    anchor_w W-steps. Default 'rot' with (4, 4): measured 175.9 GMAC/s
    at bench size and 8.79e-7 vs the f64 golden at the full north-star
    scale (BASELINE.md round 3) — the drift per chain is bounded by
    the anchor period, so the accuracy is scale-stable. Pass
    recur='df' for the maximum-margin mode (4.63e-7 north-star)."""
    g0h, g0l, gdh, gdl = grid_scalars
    S = seh.shape[0]
    B = blh.shape[0]
    nchan = int(nchan)
    Q, L = choose_ql(nchan)
    C_pad = Q * L
    ext = src_shape_sigma is not None
    grad = bool(gradient)
    if (ext or grad) and s_sky is None:
        raise ValueError("s_sky is required for gradient/extended mode")

    if amps.shape[1] < C_pad:
        amps = jnp.pad(amps, ((0, 0), (0, C_pad - amps.shape[1])))

    if amps_layout is None:
        # 4x-padded 'sl' bytes: S * C_pad * 4 B * (128 / L)
        padded = float(S) * C_pad * 4.0 * max(128 // L, 1)
        amps_layout = "sl" if padded < 2e9 else "ls"
    if amps_layout not in ("sl", "ls"):
        raise ValueError("amps_layout must be 'sl' or 'ls'")
    if ext and ext_mode not in ("exact", "exact3d", "expnoscalar",
                                "const"):
        # An unknown mode would silently fall through every weight
        # branch in the kernel and apply NO gaussian weight.
        raise ValueError("ext_mode must be one of "
                         "'exact'/'exact3d'/'expnoscalar'/'const', "
                         "got %r" % (ext_mode,))
    if src_tile is None:
        # ext halves the source tile: its per-(r, s, b) weight tensor
        # pushed the Mosaic stack to 18.1M at ST=64/BT=128 (16M limit;
        # measured round 3, bench_gradext)
        src_tile = (32 if ext else 64) if amps_layout == "sl" else 128
    if bl_tile is None:
        # gradient mode carries 3 extra (Q, L, BT) plane pairs and ext
        # mode a per-(r, s, b) weight tensor: halve the baseline tile
        # so the accumulators stay inside VMEM (ext at BT=256 measured
        # 27.2M vs the 16M scoped-vmem limit, bench_gradext round 3)
        bl_tile = (128 if (grad or ext) else 256) \
            if amps_layout == "sl" else 128
    ST, BT = int(src_tile), int(bl_tile)
    if amps_layout == "ls":
        # sources pad to a multiple of lcm(ST, 128): ST for the grid,
        # 128 so the (Q, L, S) layout ends on a full lane tile
        s_align = int(np.lcm(ST, 128))
    else:
        s_align = ST
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
    ssk_p = None
    if ext or grad:
        # (S_pad, 8): s_sky xyz, sigma_uv, zero pad. Pad-row sigma is 1
        # (a 0 would make alpha = proj^2/0 NaN-prone; pad amps are 0 so
        # any finite weight is harmless).
        cols = [jnp.asarray(s_sky, jnp.float32)]
        if ext:
            cols.append(jnp.asarray(src_shape_sigma,
                                    jnp.float32)[:, None])
        else:
            cols.append(jnp.ones((S, 1), jnp.float32))
        cols.append(jnp.zeros((S, 4), jnp.float32))
        ssk = jnp.concatenate(cols, axis=1)
        ssk_p = jnp.pad(ssk, ((0, S_pad - S), (0, 0)),
                        constant_values=0.0)
        ssk_p = ssk_p.at[S:, 3].set(1.0) if S_pad > S else ssk_p
    # (7, 1, 1) VMEM scalars: each reads as a (1, 1) array that
    # broadcasts against (ST, BT) operands (a full (ST, BT) tile per
    # scalar cost ~1.8 MB of VMEM at large tiles, incl. double
    # buffering)
    scal = jnp.stack([jnp.broadcast_to(jnp.float32(v), (ST, BT))
                      for v in (g0h, g0l, gdh, gdl,
                                jnp.asarray(chan0, jnp.float32),
                                jnp.float32(tf.TWO_PI_HI),
                                jnp.float32(tf.TWO_PI_LO))])

    if k_mode is None:
        k_mode = "vec3" if interpret else "axis2d"
    if w_block is None:
        # largest power-of-2 r-block under a ~14 MB scoped-VMEM model:
        # W tables + Er/Ei temps (16*WB*ST*BT B), output+compensation
        # accumulators (16*Q*L*BT), double-buffered amps (8*Q*L*ST),
        # scalars (56*ST*BT), plus ~4 MB of relayout temps for the 'sl'
        # in-kernel amps transpose (all coefficients fit measured
        # compile successes/failures on v5e; the 16 MB scoped limit was
        # exceeded at 16.2-17.1 MB in the failing configs).
        slack = 4 * 1024 * 1024 if amps_layout == "sl" else 0
        # temp coefficient: Wc/Ws/Er/Ei (16 B per element) plus Pr/Pi in
        # grad/ext mode (8) plus the weight tensor + iota temp in ext
        # mode (8); accumulator coefficient grows by the 3 gradient
        # plane pairs (24 B per (Q, L, BT) element)
        tmp_c = 16 + (8 if (grad or ext) else 0) + (16 if ext else 0)
        acc_c = 16 + (24 if grad else 0) + (4 if ext else 0)
        # Mode-specific budgets: the model underestimates the Mosaic
        # stack by ~2.5M in gradient mode (16.2M measured at a
        # 13.7M-modeled config) and more in ext mode (27.2M at BT=256)
        # — lower budgets force the WB halvings the hardware needs
        # (bench_gradext, round 3)
        budget = (10 if ext else 12 if grad else 14) * 1024 * 1024
        WB = L
        while WB > 1 and (tmp_c * WB * ST * BT + acc_c * Q * L * BT
                          + 8 * Q * L * ST + 56 * ST * BT + slack) \
                > budget:
            WB //= 2
    else:
        WB = int(w_block)
    if L % WB:
        raise ValueError("w_block must divide L=%d" % L)
    if recur is None:
        # rot is the throughput default for the plain kernel (measured
        # 175.9 GMAC/s at 8.79e-7 north-star, BASELINE.md round 3).
        # The gradient/extended kernels keep 'df': stacking the rot
        # rotation-factor planes on their extra accumulators blows the
        # 16M scoped-vmem stack (measured 16.2M grad / 26.3M ext,
        # bench_gradext round 3), and they are perturbation modes, not
        # the headline path.
        recur = "df" if (grad or ext) else "rot"
    if recur not in ("df", "rot"):
        raise ValueError("recur must be 'df' or 'rot'")
    # largest divisor of Q not exceeding anchor_q (Q need not be a
    # power of 2: choose_ql gives Q=6 at C=48)
    aq = min(int(anchor_q), Q)
    while Q % aq:
        aq -= 1
    # W re-anchor period: default WB (one anchor per r-block, the
    # round-3 throughput mode); smaller values trade sincos work for
    # bounded rotation drift (accuracy measured in BASELINE.md)
    aw = WB if anchor_w is None else max(1, min(int(anchor_w), WB))
    grid = (B_pad // BT, S_pad // ST)
    kernel = functools.partial(_kernel, Q=Q, L=L, WB=WB, ST=ST, BT=BT,
                               k_mode=k_mode, layout=amps_layout,
                               grad=grad, ext=ext, recur=recur, aq=aq,
                               aw=aw, ext_mode=str(ext_mode))
    # (Q, L, S_total): the per-q read indexes the LEADING dim — traced
    # dynamic indexing on non-leading VMEM dims trapped the device at
    # runtime (verified on hardware: kernel ran, then all subsequent
    # device ops returned UNIMPLEMENTED). Sources ride the LANE dim:
    # with L=32 last, the T(8,128) HBM layout pads 32 lanes to 128 — a
    # 4x expansion that OOMed HBM at north-star source counts (12 GB
    # for the nside-256 sky); S_pad is 128-divisible so (Q, L, S) is
    # padding-free.
    if amps_layout == "ls":
        amps_q = jnp.transpose(amps_p.reshape(S_pad, Q, L), (1, 2, 0))
        amps_spec = pl.BlockSpec((Q, L, ST), lambda i, j: (0, 0, j),
                                 memory_space=pltpu.VMEM)
    else:
        amps_q = jnp.transpose(amps_p.reshape(S_pad, Q, L), (1, 0, 2))
        amps_spec = pl.BlockSpec((Q, ST, L), lambda i, j: (0, j, 0),
                                 memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((ST, 3), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ST, 3), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BT, 3), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BT, 3), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        amps_spec,
        pl.BlockSpec((7, ST, BT), lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [seh_p, sel_p, blh_p, bll_p, amps_q, scal]
    if ext or grad:
        in_specs.append(pl.BlockSpec((ST, 8), lambda i, j: (j, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(ssk_p)
    if ext and ext_mode == "exact3d":
        # (Q, L, BT) channel factor (nu_c/c)^2 for the 3-D-exp probe
        # control only; the production 'exact' path derives weights by
        # in-kernel multiplicative recurrence and needs no table
        cidx = jnp.asarray(chan0, jnp.float32) \
            + jnp.arange(C_pad, dtype=jnp.float32)
        invwl = (jnp.asarray(g0h, jnp.float32)
                 + jnp.asarray(g0l, jnp.float32)) \
            + (jnp.asarray(gdh, jnp.float32)
               + jnp.asarray(gdl, jnp.float32)) * cidx
        kc2 = jnp.broadcast_to((invwl * invwl)
                               .reshape(Q, L, 1), (Q, L, BT))
        in_specs.append(pl.BlockSpec((Q, L, BT), lambda i, j: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(kc2)
    out_specs = [pl.BlockSpec((Q, L, BT), lambda i, j: (0, 0, i),
                              memory_space=pltpu.VMEM)] * 2
    out_shape = [jax.ShapeDtypeStruct((Q, L, B_pad), jnp.float32)] * 2
    if grad:
        out_specs += [pl.BlockSpec((Q, L, BT),
                                   lambda i, j: (0, 0, i),
                                   memory_space=pltpu.VMEM)] * 6
        out_shape += [jax.ShapeDtypeStruct((Q, L, B_pad),
                                           jnp.float32)] * 6
    # Mosaic's scoped-vmem accounting defaults to a conservative 16M;
    # the grad/ext expression trees measure 16.2-27.2M at the usable
    # tilings (round 3) while v5e has 128M of physical VMEM. Raising
    # the limit for those modes is what lets them compile on hardware
    # (round 4); the tuned plain kernel stays at the default so its
    # measured double-buffering headroom is untouched.
    cparams = None
    if (grad or ext) and not interpret:
        cparams = pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((WB, ST, BT), jnp.float32),
                        pltpu.VMEM((WB, ST, BT), jnp.float32),
                        pltpu.VMEM((Q, L, BT), jnp.float32),
                        pltpu.VMEM((Q, L, BT), jnp.float32)]
        + ([pltpu.VMEM((WB, ST, BT), jnp.float32),
            pltpu.VMEM((WB, ST, BT), jnp.float32)] if ext else []),
        interpret=interpret,
        compiler_params=cparams,
        cost_estimate=pl.CostEstimate(
            flops=(10 + (30 if grad else 0) + (4 if ext else 0))
            * S_pad * B_pad * C_pad,
            bytes_accessed=4 * (S_pad * C_pad + 2 * B_pad * C_pad
                                * (4 if grad else 1)),
            transcendentals=2 * S_pad * B_pad * (Q + L)
            + (S_pad * B_pad * C_pad if ext else 0)),
    )(*inputs)
    vr, vi = outs[0], outs[1]
    # (Q, L, B_pad) -> (B_pad, Q*L). Transpose the REAL planes and only
    # then combine to complex: transposing a complex64 array hit an
    # UNIMPLEMENTED TPU backend error (and wedged the device) on the
    # axon tunnel, while f32 transposes and complex construction/slicing
    # are fine.
    vr_t = jnp.transpose(vr, (2, 0, 1)).reshape(B_pad, C_pad)
    vi_t = jnp.transpose(vi, (2, 0, 1)).reshape(B_pad, C_pad)
    vis = (vr_t + 1j * vi_t)[:B, :nchan]
    if not grad:
        return vis
    gr_t = jnp.stack([jnp.transpose(outs[2 + k], (2, 0, 1))
                      .reshape(B_pad, C_pad) for k in range(3)])
    gi_t = jnp.stack([jnp.transpose(outs[5 + k], (2, 0, 1))
                      .reshape(B_pad, C_pad) for k in range(3)])
    return vis, (gr_t + 1j * gi_t)[:, :B, :nchan]


def nudft_auto(seh, sel, blh, bll, amps, grid_scalars, nchan, **kw):
    """Use the Pallas kernel on TPU (point sources and gradients are
    in-kernel since round 3; extended sources stay on the XLA path —
    the compiled ext kernel exceeds the 16M scoped-vmem limit at every
    tiling tried, bench_gradext round 3), the XLA path on other
    backends."""
    if pallas_available() and kw.get("src_shape_sigma") is None:
        return nudft_pallas(seh, sel, blh, bll, amps, grid_scalars,
                            nchan, s_sky=kw.get("s_sky"),
                            gradient=bool(kw.get("gradient", False)))
    return nudft_visibilities(seh, sel, blh, bll, amps, grid_scalars,
                              nchan, **kw)
