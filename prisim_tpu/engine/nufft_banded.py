"""Banded-spread NUFFT: the MXU-resident TPU spreading kernel (round 3).

The round-2 sorted segment-sum spread (nufft_delay) is exact but runs at
TPU gather/cross-lane-scan speeds on hardware — ~100x slower than the
direct Pallas kernel (BASELINE.md). This module rebuilds the delay-space
type-3 NUFFT spreading as dense banded work:

* Baselines are grouped by DIRECTION on the host: τ_sb = |b| · u_sd / c
  with u_sd = s_eff · b̂_d, so all baselines sharing a direction share
  one sorted source stream. One multi-operand `lax.sort` per direction
  delivers (u two-float, spectral coefficients P) sorted by delay — the
  ONLY cross-lane op in the pipeline; no gathers, no cumulative sums.
* A Pallas kernel walks fixed-size tiles of each direction's sorted
  stream once per baseline. Sorted sources make each tile's occupied
  delay-bin range contiguous and small, so the tile's spreading is a
  dense (G_win × T_s) window matrix — built on the VPU with per-tap
  row-match selects and Horner tap weights — applied to the (T_s × 2r)
  carrier-phased coefficients with ONE MXU dot. Window placement is
  scalar-prefetched (g_off is monotone per baseline because u is
  sorted), windows land in an expanded block-aligned output that XLA
  overlap-adds, wraps mod n, FFTs and deconvolves.

Cost per (source, baseline): ~2·K·G_win VPU ops + 2·G_win·2r MXU flops
(vs the direct engine's ~10·C VPU ops per source·baseline·channel) —
independent of channel count. Correctness guards: tile delay-bin spans
are checked in XLA against the static window capacity (`ok` flag;
sources never land silently outside a window — the kernel's row-match
drops them and the flag reports it), and the driver's nufft cross-check
gate validates snapshot 0 against the direct engine.

Algorithm reference: gridding type-3 NUFFT (Dutt & Rokhlin 1993); the
reference implementation evaluates the dense phase matrix instead
(/root/reference/prisim/interferometry.py:6323-6376).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np

from .nufft_delay import kb_fourier, kb_tap_coeffs

__all__ = ["banded_spread_available", "make_banded_plan", "BandedPlan",
           "group_directions", "nufft_banded_visibilities",
           "simulate_snapshot_nufft_banded", "make_banded_snapshot_fns"]

_PAD_U = 3.0          # sorts after any physical u (|s_eff · b̂| <= 2)


def banded_spread_available():
    """True when the banded Pallas spread can run compiled (TPU)."""
    try:
        import jax
        return jax.devices()[0].platform == "tpu"
    except Exception:                                  # pragma: no cover
        return False


# --------------------------------------------------------------------------
# host-side plan
# --------------------------------------------------------------------------

def group_directions(bl_vectors, decimals=9):
    """Group baselines by unit direction: (dirs (D, 3) f64, d_of_b (B,)
    int32). Opposite directions are distinct groups (the kernel needs
    φ = |b|·u ascending along each sorted stream)."""
    bl = np.asarray(bl_vectors, dtype=np.float64)
    norm = np.linalg.norm(bl, axis=1)
    if np.any(norm == 0):
        raise ValueError("zero-length baseline")
    unit = bl / norm[:, None]
    key = np.round(unit, decimals)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    dirs = np.empty_like(uniq)
    for g in range(uniq.shape[0]):
        dirs[g] = unit[np.argmax(inv == g)]
    return dirs, inv.astype(np.int32)


@dataclass
class BandedPlan:
    """Static per-(layout, band, rank) data for the banded NUFFT."""
    nu0: float
    dnu: float
    nchan: int
    rank: int
    beta: float
    K: int
    alpha: float
    n: int                     # oversampled FFT length
    h: float                   # delay grid step (s)
    T_s: int                   # sorted-source tile
    G_blk: int                 # output block granularity (rows)
    G_win: int                 # tile window rows (== G_blk)
    n_bk: int                  # number of output blocks (expanded grid)
    G0: int                    # shift making all bins non-negative
    dirs_hi: np.ndarray        # (D, 3) f32 two-float direction split
    dirs_lo: np.ndarray
    d_of_b: np.ndarray         # (B,) int32
    blen_hi: np.ndarray        # (B,) f32 two-float |b|
    blen_lo: np.ndarray
    tap_w: np.ndarray          # (K, deg+1) f64 per-tap poly (polyval)
    deconv: np.ndarray         # (C,) f32 1/what(k/n)
    consts: dict = field(default_factory=dict)

    @property
    def nbl(self):
        return self.d_of_b.shape[0]

    @property
    def ndir(self):
        return self.dirs_hi.shape[0]


def _split(x):
    hi = np.float32(x)
    lo = np.float32(np.float64(x) - np.float64(hi))
    return hi, lo


def make_banded_plan(bl_vectors, nu0, dnu, nchan, rank, beta=2.0, K=13,
                     T_s=256, G_blk=None):
    """Build the static plan for a set of baseline vectors (meters) and
    a uniform frequency grid. Exact for arbitrary (3-D) baselines."""
    from .. import constants as CNST
    bl = np.asarray(bl_vectors, dtype=np.float64)
    alpha = np.pi * K * (1.0 - 0.5 / beta) - 0.01
    n = int(beta * nchan)
    h = 1.0 / (n * dnu)
    dirs, d_of_b = group_directions(bl)
    blen = np.linalg.norm(bl, axis=1)
    inv_ch = 1.0 / (CNST.c * h)
    if G_blk is None:
        G_blk = 64
    if G_blk < K + 24:
        raise ValueError("G_blk too small for K=%d" % K)
    G_win = G_blk
    # expanded grid: φ' = |b| u/(c h) + G0 with |u| <= 2 (s_eff)
    phi_max = float(blen.max()) * 2.0 * inv_ch
    G0 = int(G_blk * np.ceil((phi_max + K) / G_blk))
    n_bk = int(np.ceil((G0 + phi_max + K + 16) / G_blk)) + 1
    assert (n_bk - 1) * G_blk >= G0 + phi_max + K + 8
    k = np.arange(nchan) - nchan // 2
    deconv = (1.0 / kb_fourier(k / n, K, alpha)).astype(np.float32)
    dh, dl = zip(*[_split(v) for v in dirs.ravel()])
    dirs_hi = np.asarray(dh, np.float32).reshape(dirs.shape)
    dirs_lo = np.asarray(dl, np.float32).reshape(dirs.shape)
    bh, blo = zip(*[_split(v) for v in blen])
    numid = nu0 + (nchan // 2) * dnu
    return BandedPlan(
        nu0=float(nu0), dnu=float(dnu), nchan=int(nchan), rank=int(rank),
        beta=float(beta), K=int(K), alpha=float(alpha), n=n, h=h,
        T_s=int(T_s), G_blk=int(G_blk), G_win=int(G_win), n_bk=int(n_bk),
        G0=G0, dirs_hi=dirs_hi, dirs_lo=dirs_lo, d_of_b=d_of_b,
        blen_hi=np.asarray(bh, np.float32),
        blen_lo=np.asarray(blo, np.float32),
        tap_w=kb_tap_coeffs(K, alpha, degree=10),
        deconv=deconv,
        consts=dict(inv_ch=inv_ch, numid_c=numid / CNST.c))


# --------------------------------------------------------------------------
# Pallas kernel
# --------------------------------------------------------------------------

def _banded_kernel(dofb_ref, goff_ref,
                   uh_ref, ul_ref, ps_ref, blh_ref, bll_ref, cst_ref,
                   out_ref, *, T_s, G_win, G_blk, K, r, tap_np):
    """One (baseline, sorted-source-tile) grid step — see module doc.

    Scalar-prefetch: dofb (B,), goff (B, n_tiles) int32 — bk/loc derive
    from goff arithmetically both here and in the index maps (three
    separate (B, n_tiles) prefetch tables blew the 1 MB SMEM budget at
    bench scale: 3 x 672 KB scoped). VMEM:
    uh/ul (1, T_s) sorted u two-float; ps (1, r, T_s) sorted spectral
    coefficients; blh/bll (1, T_s) |b| broadcast (two-float operands
    stay opaque VMEM tiles — SMEM scalars let the compiler collapse
    compensated products; round-2 finding, pallas_nudft.py); cst
    (8, T_s) grid constants. Output block (1, 1, 2*G_blk, 2r): the
    window accumulates at the prefetched 8-aligned local offset;
    revisits of one output block are consecutive because g_off is
    monotone per baseline (u sorted, |b| > 0)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from .. import twofloat as tf

    i = pl.program_id(0)
    j = pl.program_id(1)

    bk_cur = goff_ref[i, j] // G_blk
    prev_bk = goff_ref[i, jnp.maximum(j - 1, 0)] // G_blk
    is_new = jnp.logical_or(j == 0, bk_cur != prev_bk)

    @pl.when(is_new)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    uh = uh_ref[0]                                    # (T_s,)
    ul = ul_ref[0]
    blh = blh_ref[0]
    bll = bll_ref[0]
    inv_h, inv_l = cst_ref[0], cst_ref[1]             # 1/(c h) two-float
    nmh, nml = cst_ref[2], cst_ref[3]                 # nu_mid/c two-float
    two_pi = (cst_ref[4], cst_ref[5])
    g0f = cst_ref[6]                                  # G0 as f32

    # t = |b| * u  (two-float)
    th, tl = tf.df_mul(blh, bll, uh, ul)
    # φ' = t/(c h) + G0  (shifted grid coordinate)
    ph_h, ph_l = tf.df_mul(th, tl, inv_h, inv_l)
    ph_h, ph_l = tf.df_add(ph_h, ph_l, g0f, jnp.zeros_like(g0f))

    # carrier cycles = (nu_mid/c) * t, frac-reduced; e^{-2πi·}
    ch_, cl_ = tf.df_mul(th, tl, nmh, nml)
    fh, fl = tf.df_frac(ch_, cl_, xp=jnp)
    cosv, sinv = tf.df_sincos_cycles(fh, fl, xp=jnp, two_pi=two_pi)

    # m0 = rint(φ'), z0 = φ' - m0 in [-1/2, 1/2]
    m0 = jnp.rint(ph_h)
    z0 = (ph_h - m0) + ph_l                           # (T_s,) f32
    goff = goff_ref[i, j].astype(jnp.float32)
    mrel = m0 - goff                                  # tile-local row

    # per-source tap weights w_j(z0) (host-fit Horner, kb_tap_coeffs)
    half = K // 2
    ws = []
    for t_idx in range(K):
        co = tap_np[t_idx]
        w = jnp.full_like(z0, np.float32(co[0]))
        for c in co[1:]:
            w = w * z0 + np.float32(c)
        ws.append(w)

    # dense window W[g, s] = w_j(z0_s) at g == mrel_s + j; taps hit
    # distinct rows so plain selects chain; sources whose rows fall
    # outside [0, G_win) (pad sources, span overflow) match no row and
    # are dropped — the XLA span check reports overflow via `ok`.
    # int iota then cast: Mosaic's tpu.iota is integer-only
    rows = jax.lax.broadcasted_iota(jnp.int32, (G_win, T_s),
                                    0).astype(jnp.float32)
    W = jnp.zeros((G_win, T_s), jnp.float32)
    for t_idx in range(K):
        tgt = mrel + np.float32(t_idx - half)         # (T_s,)
        W = jnp.where(rows == tgt[None, :], ws[t_idx][None, :], W)

    # carrier-phased coefficients (2r, T_s): e^{-2πi·} = cos - i·sin
    P = ps_ref[:]                                     # (r, T_s)
    V = jnp.concatenate([P * cosv[None, :],
                         P * (-sinv)[None, :]], axis=0)

    contrib = jax.lax.dot_general(
        W, V, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)          # (G_win, 2r)

    loc = goff_ref[i, j] - bk_cur * G_blk
    cur = out_ref[0, 0, pl.dslice(loc, G_win), :]
    out_ref[0, 0, pl.dslice(loc, G_win), :] = cur + contrib


def _banded_spread(plan, u_hs, u_ls, P_s, d_of_b, goff,
                   interpret=False):
    """Run the Pallas spread. Returns (B, n_bk, 2*G_blk, 2r) f32 —
    UNVISITED blocks contain garbage; callers mask with `bk`."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .. import twofloat as tf

    B = plan.nbl
    r = plan.rank
    T_s, G_blk, G_win = plan.T_s, plan.G_blk, plan.G_win
    S_pad = u_hs.shape[1]
    n_tiles = S_pad // T_s

    # Mosaic requires the trailing two block dims to be (8k, 128k) or
    # the full array dims — single-row blocks of a (D, S) array are
    # rejected. Flatten to (1, D*S) / (r, D*S) / (1, B*T_s) so every
    # block is (full, lane-multiple).
    u_hs = u_hs.reshape(1, -1)
    u_ls = u_ls.reshape(1, -1)
    P_s = jnp.transpose(P_s, (1, 0, 2)).reshape(r, -1)  # (r, D*S)
    blh_b = jnp.broadcast_to(jnp.asarray(plan.blen_hi)[:, None],
                             (B, T_s)).reshape(1, -1)
    bll_b = jnp.broadcast_to(jnp.asarray(plan.blen_lo)[:, None],
                             (B, T_s)).reshape(1, -1)
    ivh, ivl = _split(plan.consts["inv_ch"])
    nmh, nml = _split(plan.consts["numid_c"])
    cst = jnp.stack([jnp.broadcast_to(jnp.float32(v), (T_s,))
                     for v in (ivh, ivl, nmh, nml,
                               np.float32(tf.TWO_PI_HI),
                               np.float32(tf.TWO_PI_LO),
                               np.float32(plan.G0),
                               np.float32(0.0))])

    kernel = functools.partial(
        _banded_kernel, T_s=T_s, G_win=G_win, G_blk=G_blk, K=plan.K,
        r=r, tap_np=np.asarray(plan.tap_w, np.float64))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, T_s), lambda i, j, d, go:
                         (0, d[i] * n_tiles + j)),
            pl.BlockSpec((1, T_s), lambda i, j, d, go:
                         (0, d[i] * n_tiles + j)),
            pl.BlockSpec((r, T_s), lambda i, j, d, go:
                         (0, d[i] * n_tiles + j)),
            pl.BlockSpec((1, T_s), lambda i, j, d, go: (0, i)),
            pl.BlockSpec((1, T_s), lambda i, j, d, go: (0, i)),
            pl.BlockSpec((8, T_s), lambda i, j, d, go: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 2 * G_blk, 2 * r),
            lambda i, j, d, go: (i, go[i, j] // G_blk, 0, 0)),
    )
    out_shape = jax.ShapeDtypeStruct((B, plan.n_bk, 2 * G_blk, 2 * r),
                                     jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(B * S_pad * (2 * plan.K * G_win
                                   + 2 * G_win * 2 * r)),
            bytes_accessed=int(B * S_pad * 4 * (r + 2)),
            transcendentals=int(2 * B * S_pad)),
    )(d_of_b, goff, u_hs, u_ls, P_s, blh_b, bll_b, cst)


# --------------------------------------------------------------------------
# XLA prep / post
# --------------------------------------------------------------------------

def _two_float_u(seh, sel, dirs_hi, dirs_lo):
    """u = s_eff · b̂_d in two-float: (D, S) pair."""
    from .. import twofloat as tf
    th = tl = None
    for ax in range(3):
        ph, plo = tf.df_mul(dirs_hi[:, ax:ax + 1], dirs_lo[:, ax:ax + 1],
                            seh[None, :, ax], sel[None, :, ax])
        th, tl = (ph, plo) if th is None else tf.df_add(th, tl, ph, plo)
    return th, tl


def _prep(plan, seh, sel, P):
    """Sorted streams + prefetch tables.

    Returns (u_hs, u_ls, P_s (D, r, S_pad), bk, goff (B, n_tiles)
    int32, ok). `ok` False => some tile's bin span exceeded the static
    window: results incomplete, caller must fall back."""
    import jax
    import jax.numpy as jnp
    S = seh.shape[0]
    T_s = plan.T_s
    S_pad = -(-S // T_s) * T_s
    D = plan.ndir
    r = plan.rank

    uh, ul = _two_float_u(seh, sel, jnp.asarray(plan.dirs_hi),
                          jnp.asarray(plan.dirs_lo))          # (D, S)
    if S_pad != S:
        pad = ((0, 0), (0, S_pad - S))
        uh = jnp.pad(uh, pad, constant_values=np.float32(_PAD_U))
        ul = jnp.pad(ul, pad)
        P = jnp.pad(P, ((0, S_pad - S), (0, 0)))
    P = jnp.asarray(P, jnp.float32)

    ops = (uh, ul) + tuple(
        jnp.broadcast_to(P[:, q], (D, S_pad)) for q in range(r))
    sorted_ops = jax.lax.sort(ops, dimension=1, num_keys=1)
    u_hs, u_ls = sorted_ops[0], sorted_ops[1]
    P_s = jnp.stack(sorted_ops[2:], axis=1)                   # (D, r, S)

    n_tiles = S_pad // T_s
    u0 = u_hs[:, ::T_s]                                       # (D, nt)
    u1 = u_hs[:, T_s - 1::T_s]
    # pad sources sort to the stream tail at u == _PAD_U; the true max
    # physical u is the last REAL sorted entry (static index S-1)
    u_real_max = u_hs[:, S - 1][:, None]                      # (D, 1)
    u1 = jnp.minimum(u1, u_real_max)

    blen = (plan.blen_hi.astype(np.float64)
            + plan.blen_lo.astype(np.float64))
    blen_j = jnp.asarray(blen, jnp.float32)[:, None]          # (B, 1)
    inv = np.float32(plan.consts["inv_ch"])
    K = plan.K
    dmap = jnp.asarray(plan.d_of_b)
    lo_bin = (jnp.floor(blen_j * u0[dmap] * inv)
              - (K // 2 + 1) + plan.G0)
    hi_bin = (jnp.ceil(blen_j * u1[dmap] * inv)
              + (K // 2 + 1) + plan.G0)
    goff = jnp.asarray(lo_bin, jnp.int32) & ~7                # 8-aligned
    max_goff = (plan.n_bk - 1) * plan.G_blk - 8
    goff = jnp.clip(goff, 0, max_goff)
    # span check only where the tile contains real sources
    has_real = (u0 <= np.float32(2.0))[dmap]
    span = jnp.where(has_real,
                     jnp.asarray(hi_bin, jnp.int32) - goff, 0)
    ok = jnp.max(span) < plan.G_win
    bk = goff // plan.G_blk
    return u_hs, u_ls, P_s, bk, goff, ok


def _post(plan, out, Qc):
    """Overlap-add + wrap mod n + FFT + deconvolve + rank combine.
    out: (B, n_bk, 2G, 2r) with unvisited blocks ALREADY masked;
    Qc: (C, r). Returns (B, C) complex64."""
    import jax.numpy as jnp
    B = out.shape[0]
    G = plan.G_blk
    r = plan.rank
    n = plan.n
    n_bk = plan.n_bk
    A = out[:, :, :G, :].reshape(B, n_bk * G, 2 * r)
    Bp = out[:, :, G:, :].reshape(B, n_bk * G, 2 * r)
    L = n_bk * G + G
    gu = (jnp.pad(A, ((0, 0), (0, G), (0, 0)))
          + jnp.pad(Bp, ((0, 0), (G, 0), (0, 0))))            # (B, L, 2r)
    m = -(-L // n)
    gu = jnp.pad(gu, ((0, 0), (0, m * n - L), (0, 0)))
    gw = gu.reshape(B, m, n, 2 * r).sum(axis=1)
    # expanded row p holds bin (p - G0) mod n -> roll so index == bin
    gw = jnp.roll(gw, -(plan.G0 % n), axis=1)
    grid_c = gw[..., :r] + 1j * gw[..., r:]                   # (B, n, r)
    Gf = jnp.fft.fft(grid_c, axis=1)
    C = plan.nchan
    half = C // 2
    Gk = jnp.concatenate([Gf[:, n - half:, :], Gf[:, :C - half, :]],
                         axis=1)                              # (B, C, r)
    dec = jnp.asarray(plan.deconv)[None, :, None]
    return jnp.einsum("bcr,cr->bc", Gk * dec,
                      jnp.asarray(Qc, jnp.float32))


def nufft_banded_visibilities(plan, seh, sel, P, Qc, interpret=False):
    """Full banded NUFFT evaluation.

    seh/sel : (S, 3) two-float phase-centered source vectors (s - pc)
    P       : (S, r) spectral coefficients (amps @ pinvQ)
    Qc      : (C, r) spectral basis
    Returns ((B, C) complex64, ok bool scalar). ok False => incomplete
    (pathological delay clustering overflowed a window): fall back."""
    import jax.numpy as jnp
    u_hs, u_ls, P_s, bk, goff, ok = _prep(plan, seh, sel, P)
    out = _banded_spread(plan, u_hs, u_ls, P_s,
                         jnp.asarray(plan.d_of_b), goff,
                         interpret=interpret)
    # mask blocks never visited by any tile (their HBM is undefined)
    visited = jnp.any(bk[:, :, None]
                      == jnp.arange(plan.n_bk)[None, None, :],
                      axis=1)                                 # (B, n_bk)
    # where (not multiply): unvisited blocks can hold NaN garbage
    out = jnp.where(visited[:, :, None, None], out, 0.0)
    return _post(plan, out, Qc), ok


def simulate_snapshot_nufft_banded(instrument, sky, Mh, Ml, pch, pcl,
                                   beam_fn, plan, pinvQ, Q,
                                   interpret=False):
    """Observe-level entry mirroring simulate_snapshot_nufft_jit
    (nufft_delay.py) on the banded spread. Returns ((B, C) c64, ok)."""
    import jax
    import jax.numpy as jnp
    from .. import twofloat as tf
    from .observe import df_rotate3, _beam_and_flux

    sh, sl = df_rotate3(Mh, Ml, sky.s_eq_hi, sky.s_eq_lo)
    seh, sel = tf.df_add(sh, sl, -pch[None, :], -pcl[None, :])
    freqs_f32 = jnp.asarray(instrument.freqs, dtype=jnp.float32)
    amps = _beam_and_flux(sh, sky.flux, freqs_f32, beam_fn)   # (S, C)
    P = jnp.matmul(amps, jnp.asarray(pinvQ),
                   precision=jax.lax.Precision.HIGHEST)       # (S, r)
    return nufft_banded_visibilities(plan, seh, sel, P, Q,
                                     interpret=interpret)


def make_banded_snapshot_fns(instrument, sky, beam_fn, plan, pinvQ, Q,
                             interpret=False):
    """Three separately-jitted stages for one banded snapshot.

    The FUSED jit of (prep -> Pallas spread -> post) sends the XLA TPU
    pipeline into a pathological >25 min compile at bench scale, while
    the three stages compile in ~16 s total and run at full speed with
    device-resident intermediates (measured round 3; see
    benchmarks/probe_banded_chain.py). Per-snapshot host dispatch
    overhead is three jit calls — microseconds against a >100 ms
    snapshot.

    Returns run(Mh, Ml, pch, pcl) -> ((B, C) complex64, ok) where every
    intermediate stays on device.
    """
    import jax
    import jax.numpy as jnp
    from .. import twofloat as tf
    from .observe import df_rotate3, _beam_and_flux

    freqs_f32 = jnp.asarray(instrument.freqs, dtype=jnp.float32)
    pinvQ_j = jnp.asarray(pinvQ)
    Q_j = jnp.asarray(Q, jnp.float32)
    dofb = jnp.asarray(plan.d_of_b)

    @jax.jit
    def stage_prep(Mh, Ml, pch, pcl):
        sh, sl = df_rotate3(Mh, Ml, sky.s_eq_hi, sky.s_eq_lo)
        seh, sel = tf.df_add(sh, sl, -pch[None, :], -pcl[None, :])
        amps = _beam_and_flux(sh, sky.flux, freqs_f32, beam_fn)
        P = jnp.matmul(amps, pinvQ_j,
                       precision=jax.lax.Precision.HIGHEST)
        return _prep(plan, seh, sel, P)

    @jax.jit
    def stage_spread(u_hs, u_ls, P_s, goff):
        return _banded_spread(plan, u_hs, u_ls, P_s, dofb, goff,
                              interpret=interpret)

    @jax.jit
    def stage_post(out, bk):
        visited = jnp.any(bk[:, :, None]
                          == jnp.arange(plan.n_bk)[None, None, :],
                          axis=1)
        out = jnp.where(visited[:, :, None, None], out, 0.0)
        return _post(plan, out, Q_j)

    def run(Mh, Ml, pch, pcl):
        u_hs, u_ls, P_s, bk, goff, ok = stage_prep(Mh, Ml, pch, pcl)
        out = stage_spread(u_hs, u_ls, P_s, goff)
        return stage_post(out, bk), ok

    run.stages = (stage_prep, stage_spread, stage_post)
    return run
