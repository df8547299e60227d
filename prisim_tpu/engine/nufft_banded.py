"""Banded block-sweep NUFFT: the MXU-resident TPU spreading kernel.

The round-2 sorted segment-sum spread (nufft_delay) is exact but runs at
TPU gather/cross-lane-scan speeds on hardware — ~100x slower than the
direct Pallas kernel (BASELINE.md). A first round-3 redesign sorted each
direction's source stream with a multi-operand `lax.sort` carrying the
rank-r spectral payload; measured on the chip, that sort is itself the
bottleneck (the 26-operand sort at bench scale stalls XLA's TPU
compiler for >8 minutes and would run at cross-lane speeds). This
module removes EVERY data-dependent reorder: no sort, no gather, no
scatter, no per-snapshot prefetch tables.

* Baselines are grouped by DIRECTION on the host: τ_sb = |b| · u_sd / c
  with u_sd = s_eff · b̂_d, so all baselines sharing a direction share
  one (unsorted) source stream. Per snapshot the device computes only
  elementwise two-float u and the (S, r) spectral projection.
* The grid's occupied delay-bin range per baseline is STATIC: |u| ≤ 2
  for unit sources, so bins live in ±2|b|/(c·h). The plan precomputes,
  per baseline, the first occupied G_blk-aligned block (`blk_lo`) and
  the number of blocks (`n_blk`) — host constants, scalar-prefetched.
* A Pallas kernel walks (baseline, source-tile) grid steps. Each step
  evaluates the tile's phases/carrier once, then sweeps the baseline's
  `n_blk` blocks with a dynamic-bound fori: for each block a dense
  (G_win × T_s) window matrix is built on the VPU with per-tap
  row-match selects (a source is OWNED by the block containing its
  first tap row, so no tap is double-counted), and applied to the
  (T_s × 2r) carrier-phased coefficients with ONE MXU dot accumulated
  into the baseline's VMEM-resident output rows. Unsorted tiles
  scatter across all of a baseline's blocks, so the sweep costs
  ~n_blk× the VPU work of a sorted tile — but n_blk is small (span/
  G_blk), adapts per baseline, and buys the removal of the sort whose
  cost scaled with D·S·r.
* Output rows are per-baseline contiguous (row p ↔ absolute bin
  blk_lo·G_blk + p). Post wraps rows mod n by a reshape-sum, FFTs, and
  applies the per-baseline integer bin offset as an EXACT host-computed
  FFT phase ramp (roll theorem) — no per-baseline roll/gather.

Cost per (source, baseline): ~2·K·G_win·n̄_blk/T_s... amortized per
tile: 2·K·G_win·T_s VPU ops + 2·G_win·T_s·2r MXU flops per swept
block — independent of channel count. Exactness is constructional
(every source's bin lies inside its baseline's static block range);
the `ok` flag only guards non-unit source vectors, and the driver's
nufft cross-check gate still validates snapshot 0 against the direct
engine.

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
           "simulate_snapshot_nufft_banded", "make_banded_snapshot_fns",
           "spatial_permutation", "reorder_sources"]

_PAD_U = 3.0          # outside any physical u (|s_eff · b̂| <= 2)
_VMEM_OUT_BYTES = 8 << 20


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

def spatial_permutation(s_eq, nside=512):
    """Host permutation ordering sources by HEALPix NEST index.

    Consecutive NEST indices tile compact sky patches, so a T_s-source
    kernel tile spans a narrow u = s·b̂ range for EVERY baseline
    direction at once — each (baseline, tile) step then sweeps 1-2
    delay blocks instead of the baseline's full span. Source positions
    are static across snapshots, so this costs one argsort at plan
    time and nothing per snapshot. Visibilities are sums over sources:
    any order is exact.
    """
    from .. import healpix as hp
    s = np.asarray(s_eq, dtype=np.float64)
    r = np.linalg.norm(s, axis=1)
    theta = np.arccos(np.clip(s[:, 2] / r, -1.0, 1.0))
    phi = np.mod(np.arctan2(s[:, 1], s[:, 0]), 2.0 * np.pi)
    pix = hp.ang2pix(nside, theta, phi, nest=True)
    return np.argsort(pix, kind="stable")


def reorder_sources(sky, perm):
    """SkySources with every per-source array taken along axis 0."""
    import jax.numpy as jnp
    idx = jnp.asarray(np.asarray(perm, np.int32))
    rep = {"s_eq_hi": jnp.take(sky.s_eq_hi, idx, axis=0),
           "s_eq_lo": jnp.take(sky.s_eq_lo, idx, axis=0),
           "flux": jnp.take(sky.flux, idx, axis=0)}
    if sky.src_shape_sigma is not None:
        rep["src_shape_sigma"] = jnp.take(sky.src_shape_sigma, idx,
                                          axis=0)
    import dataclasses
    return dataclasses.replace(sky, **rep)


def group_directions(bl_vectors, decimals=9):
    """Group baselines by unit direction: (dirs (D, 3) f64, d_of_b (B,)
    int32). Opposite directions are distinct groups (φ = |b|·u keeps
    one sign convention per stream)."""
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
    T_s: int                   # source tile
    G_blk: int                 # block granularity (rows, mult of 8)
    G_win: int                 # per-block window rows (G_blk + taps)
    n_blk_max: int             # max blocks over baselines
    R_max: int                 # output rows per baseline
    dirs_hi: np.ndarray        # (D, 3) f32 two-float direction split
    dirs_lo: np.ndarray
    d_of_b: np.ndarray         # (B,) int32
    blk_lo: np.ndarray         # (B,) int32 first block (bin/G_blk, signed)
    n_blk: np.ndarray          # (B,) int32 blocks to sweep
    blen_hi: np.ndarray        # (B,) f32 two-float |b|
    blen_lo: np.ndarray
    tap_w: np.ndarray          # (K, deg+1) f64 per-tap poly (polyval)
    deconv: np.ndarray         # (C,) f32 1/what(k/n)
    ramp: np.ndarray           # (B, C) c64 exact bin-offset phase ramp
    consts: dict = field(default_factory=dict)
    # redundancy collapse (round 4): the sweep runs over UNIQUE
    # canonical baseline vectors only; expand_idx/conj recover the full
    # set afterward (V(-b) = conj(V(b)) exactly — the amps are real).
    # None => identity (collapse=False or no redundancy found).
    expand_idx: np.ndarray = None   # (B_full,) int32 row of unique set
    conj: np.ndarray = None         # (B_full,) bool conjugate the row

    @property
    def nbl(self):
        return self.d_of_b.shape[0]

    @property
    def nbl_full(self):
        return (self.d_of_b.shape[0] if self.expand_idx is None
                else self.expand_idx.shape[0])

    @property
    def ndir(self):
        return self.dirs_hi.shape[0]


def _split(x):
    hi = np.float32(x)
    lo = np.float32(np.float64(x) - np.float64(hi))
    return hi, lo


def _friendly_fft_length(n0):
    """Smallest n >= n0 for which _fft_matmul finds a balanced
    Cooley-Tukey split (largest divisor n1 <= sqrt(n) with
    n/n1 <= 8*n1). Growing n only raises the effective oversampling
    ratio, so accuracy is monotone in this rounding. Keeps awkward
    nchan (primes, 2*prime) off _fft_matmul's dense-DFT / builtin-FFT
    fallback paths — the builtin TPU f32 FFT's ~1.4e-6 error is the
    thing this module exists to avoid."""
    for cand in range(int(n0), int(n0) + 512):
        n1 = 1
        for d in range(int(np.sqrt(cand)), 0, -1):
            if cand % d == 0:
                n1 = d
                break
        if n1 > 1 and cand // n1 <= 8 * n1:
            return cand
    return int(n0)  # unreachable: every 256-range has a 256-multiple


def make_banded_plan(bl_vectors, nu0, dnu, nchan, rank, beta=2.0, K=9,
                     T_s=2048, G_blk=None, tap_degree=10,
                     collapse=True, dot_split=1):
    """Build the static plan for a set of baseline vectors (meters) and
    a uniform frequency grid. Exact for arbitrary (3-D) baselines.

    ``collapse`` (default): sweep only UNIQUE canonical baseline
    vectors. Identical vectors give identical visibilities, and
    V(-b) = conj(V(b)) exactly (the beam x flux amps are real), so a
    sign-canonicalized dedup loses no accuracy — the TPU-side analog
    of the reference's redundancy compression (simulate unique
    baselines, duplicate_measurements, interferometry.py:1465,6823),
    applied transparently inside the engine. Rows are keyed at
    round(bl, 6): baselines within ~1 um share the first occurrence's
    exact f64 vector (sub-microradian phase difference — far below the
    f32 engine floor, and far tighter than the 0.01 m redundancy key
    `baselines.uniq_baselines` uses, so near-redundant rows surviving a
    redundant=False run are NOT merged). An all-pairs HERA-37 snapshot
    collapses 666 -> 63 swept rows (10.6x fewer kernel steps); a
    pre-uniqued set (the north-star 630) passes through unchanged.

    Raises ValueError when the longest baseline's per-baseline output
    rows would blow the VMEM budget (callers fall back to the sorted /
    direct engines)."""
    from .. import constants as CNST
    bl = np.asarray(bl_vectors, dtype=np.float64)
    if K % 2 == 0:
        raise ValueError("K must be odd (tap rows -half..+half)")
    expand_idx = conj_mask = None
    if collapse:
        key = np.round(bl, 6)                      # um-level identity
        neg = ((key[:, 0] < 0)
               | ((key[:, 0] == 0) & (key[:, 1] < 0))
               | ((key[:, 0] == 0) & (key[:, 1] == 0)
                  & (key[:, 2] < 0)))
        can = np.where(neg[:, None], -bl, bl)
        _, first, inv = np.unique(np.round(can, 6), axis=0,
                                  return_index=True,
                                  return_inverse=True)
        if first.shape[0] < bl.shape[0] or neg.any():
            expand_idx = inv.astype(np.int32)
            conj_mask = neg
            bl = can[first]                        # exact f64 rows
    alpha = np.pi * K * (1.0 - 0.5 / beta) - 0.01
    n = _friendly_fft_length(int(np.ceil(beta * nchan)))
    h = 1.0 / (n * dnu)
    dirs, d_of_b = group_directions(bl)
    blen = np.linalg.norm(bl, axis=1)
    inv_ch = 1.0 / (CNST.c * h)
    if G_blk is None:
        # Tuned on v5e at the bench shape (BASELINE.md round 3):
        # (K=9, G=32, T_s=2048) measured 0.0437 s/snapshot vs 0.0595
        # for (K=13, G=64, T_s=1024), at the same 7.5e-7 f64 accuracy
        # (probe_banded_error --f64-golden: the error floor is the
        # f32 spectral fit, not the tap count).
        G_blk = 32
    if G_blk % 8:
        raise ValueError("G_blk must be a multiple of 8")
    half = K // 2
    G_win = int(-(-(G_blk + K - 1) // 8) * 8)
    # static per-baseline occupied range: bins in ±(phimax + 1)
    phimax = blen * 2.0 * inv_ch
    blk_lo = np.floor((-phimax - half - 2.0) / G_blk).astype(np.int32)
    hi_own = phimax + 2.0 - half          # max first-tap (ownership) row
    n_blk = (np.floor(hi_own / G_blk).astype(np.int64)
             - blk_lo.astype(np.int64) + 1).astype(np.int32)
    n_blk_max = int(n_blk.max())
    R_max = n_blk_max * G_blk + (G_win - G_blk)
    R_max = int(-(-R_max // 8) * 8)
    if R_max * 2 * rank * 4 > _VMEM_OUT_BYTES:
        raise ValueError(
            "banded plan: per-baseline output rows (%d x %d) exceed the"
            " VMEM budget; longest baseline %.0f m spans too many delay"
            " bins at nchan=%d" % (R_max, 2 * rank, blen.max(), nchan))
    k = np.arange(nchan) - nchan // 2
    deconv = (1.0 / kb_fourier(k / n, K, alpha)).astype(np.float32)
    dh, dl = zip(*[_split(v) for v in dirs.ravel()])
    dirs_hi = np.asarray(dh, np.float32).reshape(dirs.shape)
    dirs_lo = np.asarray(dl, np.float32).reshape(dirs.shape)
    bh, blo = zip(*[_split(v) for v in blen])
    numid = nu0 + (nchan // 2) * dnu
    # exact roll-theorem ramp for the per-baseline bin offset
    # off_b = blk_lo_b * G_blk: row p holds bin off_b + p, and
    # FFT(grid)[k] = FFT(rows)[k] * e^{-2πi k off_b / n} at the kept
    # FFT indices k (f64 host trig on exact integer args)
    k_idx = np.concatenate([np.arange(n - nchan // 2, n),
                            np.arange(0, nchan - nchan // 2)])
    off = (blk_lo.astype(np.int64) * G_blk) % n
    m = (k_idx[None, :] * off[:, None]) % n
    ang = 2.0 * np.pi * m / n
    ramp = (np.cos(ang) - 1j * np.sin(ang)).astype(np.complex64)
    return BandedPlan(
        nu0=float(nu0), dnu=float(dnu), nchan=int(nchan), rank=int(rank),
        beta=float(beta), K=int(K), alpha=float(alpha), n=n, h=h,
        T_s=int(T_s), G_blk=int(G_blk), G_win=G_win,
        n_blk_max=n_blk_max, R_max=R_max,
        dirs_hi=dirs_hi, dirs_lo=dirs_lo, d_of_b=d_of_b,
        blk_lo=blk_lo, n_blk=n_blk,
        blen_hi=np.asarray(bh, np.float32),
        blen_lo=np.asarray(blo, np.float32),
        tap_w=kb_tap_coeffs(K, alpha, degree=tap_degree),
        deconv=deconv, ramp=ramp,
        consts=dict(inv_ch=inv_ch, numid_c=numid / CNST.c,
                    n_blk_mean=float(np.mean(n_blk)),
                    dot_split=int(dot_split)),
        expand_idx=expand_idx, conj=conj_mask)


# --------------------------------------------------------------------------
# Pallas kernel
# --------------------------------------------------------------------------

def _sweep_kernel(dofb_ref, blo_ref, nblk_ref,
                  uh_ref, ul_ref, ps_ref, blh_ref, bll_ref, cst_ref,
                  out_ref, carry_ref, *, T_s, G_win, G_blk, K, r,
                  tap_np, dot_split=1):
    """One (baseline, source-tile) grid step — see module doc.

    Scalar-prefetch: dofb/blk_lo/n_blk, all (B,) int32 — tiny SMEM (the
    earlier sorted design's (B, n_tiles) tables blew the 1 MB budget).
    VMEM: uh/ul (1, T_s) unsorted u two-float; ps (r, T_s) spectral
    coefficients (SHARED across baselines — no per-direction payload);
    blh/bll (1, T_s) |b| broadcast (two-float operands stay opaque VMEM
    tiles — SMEM scalars let the compiler collapse compensated
    products; round-2 finding, pallas_nudft.py); cst (8, T_s) grid
    constants. Output block (1, R_max, 2r): the whole per-baseline row
    range stays VMEM-resident while j sweeps the tiles."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from .. import twofloat as tf

    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        carry_ref[...] = jnp.zeros_like(carry_ref)

    uh = uh_ref[0]                                    # (T_s,)
    ul = ul_ref[0]
    blh = blh_ref[0]
    bll = bll_ref[0]
    inv_h, inv_l = cst_ref[0], cst_ref[1]             # 1/(c h) two-float
    nmh, nml = cst_ref[2], cst_ref[3]                 # nu_mid/c two-float
    two_pi = (cst_ref[4], cst_ref[5])

    # t = |b| * u  (two-float)
    th, tl = tf.df_mul(blh, bll, uh, ul)
    # φ = t/(c h): signed grid bin
    ph_h, ph_l = tf.df_mul(th, tl, inv_h, inv_l)

    # carrier cycles = (nu_mid/c) * t, frac-reduced; e^{-2πi·}
    ch_, cl_ = tf.df_mul(th, tl, nmh, nml)
    fh, fl = tf.df_frac(ch_, cl_, xp=jnp)
    cosv, sinv = tf.df_sincos_cycles(fh, fl, xp=jnp, two_pi=two_pi)

    # m0 = rint(φ), z0 = φ - m0 in [-1/2, 1/2]; rows relative to the
    # baseline's first block (blk_lo * G_blk, exact small-int f32)
    m0 = jnp.rint(ph_h)
    z0 = (ph_h - m0) + ph_l                           # (T_s,) f32
    half = K // 2
    base0 = (blo_ref[i] * G_blk).astype(jnp.float32)
    mown0 = m0 - np.float32(half) - base0             # first-tap row

    # per-source tap weights w_j(z0) (host-fit Horner, kb_tap_coeffs)
    ws = []
    for t_idx in range(K):
        co = tap_np[t_idx]
        w = jnp.full_like(z0, np.float32(co[0]))
        for c in co[1:]:
            w = w * z0 + np.float32(c)
        ws.append(w)

    # carrier-phased coefficients (2r, T_s): e^{-2πi·} = cos - i·sin
    P = ps_ref[:]                                     # (r, T_s)
    V = jnp.concatenate([P * cosv[None, :],
                         P * (-sinv)[None, :]], axis=0)

    rows = jax.lax.broadcasted_iota(jnp.int32, (G_win, T_s),
                                    0).astype(jnp.float32)

    def body(blk, _):
        rowbase = blk * G_blk
        mown = mown0 - rowbase.astype(jnp.float32)    # (T_s,)
        # ownership: the block containing the source's first tap row
        # (pad sources at u=_PAD_U fall past every block and drop out).
        # Non-members park at a sentinel BELOW every tap's reach
        # (tgt = sentinel + t stays < 0 for all K taps; a bare -1 would
        # still match rows 0..K-2 and leak taps into the block)
        member = jnp.logical_and(mown >= 0.0,
                                 mown < np.float32(G_blk))
        owned = jnp.where(member, mown, np.float32(-2.0 * K))
        W = jnp.zeros((G_win, T_s), jnp.float32)
        for t_idx in range(K):
            tgt = owned + np.float32(t_idx)
            W = jnp.where(rows == tgt[None, :], ws[t_idx][None, :], W)
        # Kahan-compensated row accumulation: a row collects ~S*K/R
        # tile contributions (hundreds at bench scale); the plain f32
        # `+=` random walk was the dominant term in the 4.9e-6 banded
        # error (direct-kernel finding, pallas_nudft.py round 2).
        # dot_split > 1 (round 5) additionally splits the contraction
        # into sub-dots Kahan-folded one at a time: the MXU's own f32
        # accumulation rounds at ulp(running partial sum), so keeping
        # each in-dot partial at 1/dot_split of the tile's magnitude
        # shrinks that term proportionally — same total MXU FLOPs.
        cur = out_ref[0, pl.dslice(rowbase, G_win), :]
        c0 = carry_ref[pl.dslice(rowbase, G_win), :]
        sub = T_s // dot_split
        for k_sub in range(dot_split):
            contrib = jax.lax.dot_general(
                W[:, k_sub * sub:(k_sub + 1) * sub],
                V[:, k_sub * sub:(k_sub + 1) * sub],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # (G_win, 2r)
            y = contrib - c0
            t = cur + y
            c0 = (t - cur) - y
            cur = t
        carry_ref[pl.dslice(rowbase, G_win), :] = c0
        out_ref[0, pl.dslice(rowbase, G_win), :] = cur
        return 0

    # Per-TILE dynamic block range. A spatially-ordered source stream
    # (spatial_permutation) makes each tile a compact sky patch whose
    # bins span 1-2 blocks, so sweeping only [blk_first, blk_last]
    # instead of the baseline's full n_blk blocks removes the ~n_blk x
    # redundancy that made the unsorted sweep no faster than the direct
    # kernel at bench shape (0.85x, BASELINE.md round 3). Exactness is
    # unconditional: blocks outside the tile's own row range have no
    # member sources by definition, ordered stream or not.
    valid = uh < np.float32(2.5)          # pads park at u = _PAD_U = 3
    mlo = jnp.min(jnp.where(valid, mown0, np.float32(1e9)))
    mhi = jnp.max(jnp.where(valid, mown0, np.float32(-1e9)))
    inv_g = np.float32(1.0 / G_blk)
    blk_first = jnp.maximum(
        jnp.floor(mlo * inv_g).astype(jnp.int32), 0)
    blk_last = jnp.minimum(
        jnp.floor(mhi * inv_g).astype(jnp.int32), nblk_ref[i] - 1)
    jax.lax.fori_loop(blk_first, blk_last + 1, body, 0)


def _banded_spread(plan, u_flat_h, u_flat_l, P_r, interpret=False):
    """Run the Pallas block sweep. Returns (B, R_max, 2r) f32 rows
    (row p of baseline b holds bin blk_lo_b*G_blk + p)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = plan.nbl
    r = plan.rank
    T_s, G_blk, G_win = plan.T_s, plan.G_blk, plan.G_win
    S_pad = P_r.shape[1]
    n_tiles = S_pad // T_s

    # Mosaic requires the trailing two block dims to be (8k, 128k) or
    # the full array dims — single-row blocks of a (D, S) array are
    # rejected. u stays flattened (1, D*S_pad); P is (r, S_pad) full-row.
    blh_b = jnp.broadcast_to(jnp.asarray(plan.blen_hi)[:, None],
                             (B, T_s)).reshape(1, -1)
    bll_b = jnp.broadcast_to(jnp.asarray(plan.blen_lo)[:, None],
                             (B, T_s)).reshape(1, -1)
    ivh, ivl = _split(plan.consts["inv_ch"])
    nmh, nml = _split(plan.consts["numid_c"])
    from .. import twofloat as tf
    cst = jnp.stack([jnp.broadcast_to(jnp.float32(v), (T_s,))
                     for v in (ivh, ivl, nmh, nml,
                               np.float32(tf.TWO_PI_HI),
                               np.float32(tf.TWO_PI_LO),
                               np.float32(0.0),
                               np.float32(0.0))])

    ds = int(plan.consts.get("dot_split", 1) or 1)
    if T_s % ds:
        ds = 1
    kernel = functools.partial(
        _sweep_kernel, T_s=T_s, G_win=G_win, G_blk=G_blk, K=plan.K,
        r=r, tap_np=np.asarray(plan.tap_w, np.float64), dot_split=ds)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, T_s), lambda i, j, d, bl, nb:
                         (0, d[i] * n_tiles + j)),
            pl.BlockSpec((1, T_s), lambda i, j, d, bl, nb:
                         (0, d[i] * n_tiles + j)),
            pl.BlockSpec((r, T_s), lambda i, j, d, bl, nb: (0, j)),
            pl.BlockSpec((1, T_s), lambda i, j, d, bl, nb: (0, i)),
            pl.BlockSpec((1, T_s), lambda i, j, d, bl, nb: (0, i)),
            pl.BlockSpec((8, T_s), lambda i, j, d, bl, nb: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, plan.R_max, 2 * r),
            lambda i, j, d, bl, nb: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((plan.R_max, 2 * r), jnp.float32)],
    )
    out_shape = jax.ShapeDtypeStruct((B, plan.R_max, 2 * r),
                                     jnp.float32)
    # plan-time mean (n_blk may be a traced shard slice under shard_map)
    nbar = max(1.0, float(plan.consts.get("n_blk_mean")
                          or np.mean(np.asarray(plan.n_blk))))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(B * n_tiles * nbar
                      * (2 * plan.K * G_win * T_s
                         + 2 * G_win * T_s * 2 * r)),
            bytes_accessed=int(B * S_pad * 4 * (r + 2)),
            transcendentals=int(2 * B * S_pad)),
    )(jnp.asarray(plan.d_of_b), jnp.asarray(plan.blk_lo),
      jnp.asarray(plan.n_blk), u_flat_h, u_flat_l, P_r, blh_b, bll_b,
      cst)


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
    """Unsorted streams: elementwise u per direction + the spectral
    payload transposed — NO sort, NO gather, NO prefetch tables.

    Returns (u_h (1, D*S_pad), u_l (1, D*S_pad), P_r (r, S_pad), ok).
    ok guards non-unit source vectors (|u| must stay ≤ 2 for the static
    block range to cover every bin)."""
    import jax.numpy as jnp
    S = seh.shape[0]
    T_s = plan.T_s
    S_pad = -(-S // T_s) * T_s
    r = plan.rank

    uh, ul = _two_float_u(seh, sel, jnp.asarray(plan.dirs_hi),
                          jnp.asarray(plan.dirs_lo))          # (D, S)
    ok = jnp.max(jnp.abs(uh)) <= np.float32(2.0 + 1e-4)
    if S_pad != S:
        pad = ((0, 0), (0, S_pad - S))
        uh = jnp.pad(uh, pad, constant_values=np.float32(_PAD_U))
        ul = jnp.pad(ul, pad)
        P = jnp.pad(P, ((0, S_pad - S), (0, 0)))
    P_r = jnp.transpose(jnp.asarray(P, jnp.float32))          # (r, S_pad)
    return uh.reshape(1, -1), ul.reshape(1, -1), P_r, ok


def _payload_T(plan, P):
    """Transpose (and T_s-pad) a SECOND spectral payload to ride the
    u streams `_prep` built for the first one (truth mode's lo
    payload). Must pad identically — `_banded_spread` derives S_pad
    from the payload shape, and an unpadded payload silently swept
    zero tiles."""
    import jax.numpy as jnp
    S = P.shape[0]
    S_pad = -(-S // plan.T_s) * plan.T_s
    if S_pad != S:
        P = jnp.pad(P, ((0, S_pad - S), (0, 0)))
    return jnp.transpose(jnp.asarray(P, jnp.float32))


def _fft_matmul(x):
    """FFT along axis 1 of (B, n, r) complex64 via a 4-step
    Cooley-Tukey (n = n1*n2) with dense HIGHEST-precision twiddle
    matmuls on the MXU.

    The TPU backend's built-in f32 FFT carries a ~1.4e-6 scaled error
    at north-star row norms (measured: probe_banded_post's
    device-post-vs-host-f64-post-on-identical-rows row) — it became
    the dominant term of the banded engine's error budget once the
    spread/fit/yardstick terms were fixed. Two small dense DFT matmuls
    at Precision.HIGHEST hold the plain-f32 floor instead, and at
    n<=4096 cost ~1 ms on the MXU. Matches np.fft.fft conventions."""
    import jax
    import jax.numpy as jnp
    n = x.shape[1]
    n1 = 1
    for d in range(int(np.sqrt(n)), 0, -1):
        if n % d == 0:
            n1 = d
            break
    n2 = n // n1
    if n1 == 1:
        # prime n: no split exists. A single dense (n, n) DFT matmul
        # is still cheap (and precision-safe) up to ~1k; beyond that
        # fall back to the builtin FFT. Unreachable from plan-made
        # grids (_friendly_fft_length rounds n up past primes) but a
        # direct caller should know the precision class changed.
        if n > 1024:
            import warnings
            warnings.warn(
                "_fft_matmul: prime length %d > 1024 falls back to the"
                " builtin FFT (~1.4e-6 f32 error class on TPU)" % n)
            return jnp.fft.fft(x, axis=1)
        k = np.arange(n)
        F = np.exp(-2j * np.pi * np.outer(k, k) / n).astype(
            np.complex64)
        import jax as _jax
        return jnp.einsum("bjs,kj->bks", x, jnp.asarray(F),
                          precision=_jax.lax.Precision.HIGHEST)
    hi = jax.lax.Precision.HIGHEST
    j2 = np.arange(n2)
    j1 = np.arange(n1)
    F2 = np.exp(-2j * np.pi * np.outer(j2, j2) * (n1 / n)).astype(
        np.complex64)                                   # (k2, j2)
    tw = np.exp(-2j * np.pi * np.outer(j1, j2) / n).astype(
        np.complex64)                                   # (j1, k2)
    F1 = np.exp(-2j * np.pi * np.outer(j1, j1) * (n2 / n)).astype(
        np.complex64)                                   # (k1, j1)
    B, _, r = x.shape
    xr = x.reshape(B, n2, n1, r)                        # [j2, j1]
    A = jnp.einsum("bjis,kj->biks", xr, jnp.asarray(F2),
                   precision=hi)                        # (B, j1, k2, r)
    A = A * jnp.asarray(tw)[None, :, :, None]
    X = jnp.einsum("biks,li->blks", A, jnp.asarray(F1),
                   precision=hi)                        # (B, k1, k2, r)
    return X.reshape(B, n, r)


def _post(plan, out, Qc, matmul_fft=False):
    """Wrap rows mod n (reshape-sum) + exact ramp for the per-baseline
    bin offset + FFT + deconvolve + rank combine.
    out: (B, R_max, 2r); Qc: (C, r). Returns (B, C) complex64."""
    import jax as _jax
    import jax.numpy as jnp
    B = out.shape[0]
    r = plan.rank
    n = plan.n
    R = plan.R_max
    m = -(-R // n)
    gu = jnp.pad(out, ((0, 0), (0, m * n - R), (0, 0)))
    gw = gu.reshape(B, m, n, 2 * r).sum(axis=1)               # (B, n, 2r)
    grid_c = gw[..., :r] + 1j * gw[..., r:]                   # (B, n, r)
    Gf = _fft_matmul(grid_c) if matmul_fft else \
        jnp.fft.fft(grid_c, axis=1)
    C = plan.nchan
    half = C // 2
    Gk = jnp.concatenate([Gf[:, n - half:, :], Gf[:, :C - half, :]],
                         axis=1)                              # (B, C, r)
    # deconvolution folded into the basis (one (C, r) host-size
    # multiply) and the per-baseline ramp applied AFTER the rank
    # combine on (B, C): the previous order paid two full (B, C, r)
    # elementwise passes (round-4 prep/post shave)
    Qd = jnp.asarray(Qc, jnp.float32) \
        * jnp.asarray(plan.deconv)[:, None]                   # (C, r)
    V = jnp.einsum("bcr,cr->bc", Gk, Qd,
                   precision=_jax.lax.Precision.HIGHEST)
    V = V * jnp.asarray(plan.ramp)
    if plan.expand_idx is not None:
        # redundancy expansion: gather unique rows onto the full
        # baseline list, conjugating sign-flipped vectors (exact)
        V = V[jnp.asarray(plan.expand_idx)]
        if plan.conj is not None and bool(np.any(plan.conj)):
            V = jnp.where(jnp.asarray(plan.conj)[:, None],
                          jnp.conj(V), V)
    return V


def nufft_banded_visibilities(plan, seh, sel, P, Qc, interpret=False):
    """Full banded NUFFT evaluation.

    seh/sel : (S, 3) two-float phase-centered source vectors (s - pc)
    P       : (S, r) spectral coefficients (amps @ pinvQ)
    Qc      : (C, r) spectral basis
    Returns ((B, C) complex64, ok bool scalar). ok False => a source
    vector was not unit (its bins could fall outside the static block
    range): fall back."""
    u_h, u_l, P_r, ok = _prep(plan, seh, sel, P)
    out = _banded_spread(plan, u_h, u_l, P_r, interpret=interpret)
    return _post(plan, out, Qc, matmul_fft=not interpret), ok


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
    amps = _beam_and_flux(sh, sky.flux, freqs_f32, beam_fn, pc=pch)
    from .nufft_delay import spectral_project
    P = spectral_project(amps, pinvQ)                         # (S, r)
    return nufft_banded_visibilities(plan, seh, sel, P, Q,
                                     interpret=interpret)


def make_coeff_fn(freqs, rank, pinvQ, beam_fn, node_model=True):
    """coeffs(sh, fx, pch) -> (S, rank) spectral coefficients of the
    beam-weighted fluxes, in either spectral form (round-4 node model
    or the round-3 full-channel projection) — shared by the
    single-device banded stages and the 'bl'-mesh sharded path so both
    compute identical models. The returned function carries the
    NodeModel (or None) as ``coeffs.node_model``."""
    import jax
    import jax.numpy as jnp
    from .nufft_delay import spectral_project, chebyshev_node_model
    from .observe import _beam_and_flux

    freqs_f32 = jnp.asarray(freqs, dtype=jnp.float32)
    pinvQ_j = jnp.asarray(pinvQ)
    if not node_model:
        def coeffs(sh, fx, pch):
            amps = _beam_and_flux(sh, fx, freqs_f32, beam_fn, pc=pch)
            return spectral_project(amps, pinvQ_j)

        coeffs.node_model = None
        return coeffs

    nm = chebyshev_node_model(freqs, rank)
    nodes_f32 = jnp.asarray(nm.nu_nodes, jnp.float32)
    n2c_j = jnp.asarray(nm.node2coef)                      # (r, r)
    V_j = jnp.asarray(nm.V)                                # (r, r)
    hi = jax.lax.Precision.HIGHEST

    def coeffs(sh, fx, pch):
        fluxC = spectral_project(fx, pinvQ_j)              # (S, r)
        fluxn = jnp.einsum("sr,nr->sn", fluxC, V_j,
                           precision=hi)                   # node values
        ampsn = _beam_and_flux(sh, fluxn, nodes_f32, beam_fn, pc=pch)
        return jnp.einsum("sn,nr->sr", ampsn, n2c_j, precision=hi)

    coeffs.node_model = nm
    return coeffs


def _df_matmul_rows(ah, al, M64):
    """Two-float (S, k) @ f64 (k, n) -> (S, n) two-float.

    M64 rides as exactly-split f32 pairs; the contraction runs as a
    lax.scan over k with per-step df arithmetic (an unrolled two-float
    chain of this size sends the XLA optimizer super-linear — see
    beams/analytic._df_clenshaw)."""
    import jax
    import jax.numpy as jnp
    from .. import twofloat as tf
    M64 = np.asarray(M64, np.float64)
    Mh = M64.astype(np.float32)
    Ml = (M64 - Mh.astype(np.float64)).astype(np.float32)
    z = jnp.zeros(ah.shape[:-1] + (M64.shape[1],), jnp.float32)

    def step(carry, inp):
        oh, ol = carry
        avh, avl, rh, rl = inp
        th, tl = tf.df_mul(avh[:, None], avl[:, None],
                           rh[None, :], rl[None, :])
        return tf.df_add(oh, ol, th, tl), None

    (oh, ol), _ = jax.lax.scan(
        step, (z, z),
        (jnp.transpose(ah), jnp.transpose(al),
         jnp.asarray(Mh), jnp.asarray(Ml)))
    return oh, ol


def make_coeff_fn_truth(freqs, rank, beam_df_fn):
    """Two-float node-model coefficients — the round-5 truth-amps path.

    The f32 amps chain floors EVERY engine's error vs the f64 model
    truth at ~3.5e-6 of scale at north-star source counts: per-element
    ~1e-7 evaluation/storage rounding, summed incoherently over ~4e5
    sources (benchmarks/accuracy_northstar.py --golden f64amps,
    round 5). The reference never sees this because its beam x flux
    is f64 numpy (primary_beams.py:517, run_prisim.py catalog fluxes).
    Here the whole node-amps chain is two-float32:

      beam at the r Chebyshev nodes : beam_df_fn (e.g.
                                      beams.analytic.airy_beam_df,
                                      ~1e-9 vs the f64 model)
      flux at the nodes             : HOST f64 (they are
                                      time-independent), split hi/lo
                                      and passed per call
      values -> coefficients        : two-float scan matmul with the
                                      exactly-split f64 node2coef

    Returns coeffs_df(sh, sl, fnh, fnl) -> ((S, r) hi, (S, r) lo)
    Chebyshev coefficient pairs; the caller runs the banded spread
    twice (hi + lo payloads) and sums after the linear post stage.
    Carries the NodeModel as .node_model."""
    from .. import twofloat as tf
    from .nufft_delay import chebyshev_node_model

    nm = chebyshev_node_model(freqs, rank)

    def coeffs_df(sh, sl, fnh, fnl):
        bh, bl = beam_df_fn(sh, sl, nm.nu_nodes)
        ah, al = tf.df_mul(bh, bl, fnh, fnl)
        return _df_matmul_rows(ah, al, nm.node2coef64)

    coeffs_df.node_model = nm
    return coeffs_df


def make_banded_snapshot_fns(instrument, sky, beam_fn, plan, pinvQ, Q,
                             interpret=False, spatial_sort=True,
                             src_chunk=None, gate_src_block=512,
                             node_model=True, truth=None):
    """Three separately-jitted stages for one banded snapshot.

    ``node_model`` (round 4, default): evaluate beam x flux at the
    rank Chebyshev NODES of the band and take the interpolant's
    coefficients directly (nufft_delay.chebyshev_node_model) instead
    of projecting a full (S, C) f32 amps table. The projection form's
    residual is floored at 1.2-1.8e-6 of scale at north-star source
    counts by f32 channel-jitter in the amps themselves (probe_truth,
    round 4); the node form has zero fit residual vs its model, whose
    own error vs the exact f64 beam is the smooth rank-r Chebyshev
    convergence. It also skips the full-channel beam evaluation and
    the (S, C) materialization: prep does S*r transcendentals instead
    of S*C. The flux table rides through its rank-r coefficients
    (power-law/smooth spectra fit to ~1e-9; arbitrary tabulated
    spectra are exactly what the driver's cross-check gate demotes).

    The sorted predecessor NEEDED the split because its fused compile
    was pathological; the sweep keeps it because it still isolates
    tunnel upload stalls per stage and lets the driver reuse stage
    executables. Per-snapshot host dispatch overhead is three jit
    calls — microseconds against a >100 ms snapshot.

    ``spatial_sort`` reorders the sources ONCE by HEALPix NEST index
    (spatial_permutation): exact in any order, ~n_blk x faster swept.
    Sky arrays ride as jit ARGUMENTS — closed-over device arrays become
    executable constants, and the (S, C) flux table re-serialized
    through the axon tunnel stalled the first prep call by minutes at
    bench size (measured round 3).

    Returns run(Mh, Ml, pch, pcl) -> ((B, C) complex64, ok) where every
    intermediate stays on device.
    """
    import jax
    import jax.numpy as jnp
    from .. import twofloat as tf
    from .nufft_delay import spectral_project
    from .observe import df_rotate3, _beam_and_flux

    if spatial_sort:
        perm = spatial_permutation(
            np.asarray(sky.s_eq_hi, np.float64)
            + np.asarray(sky.s_eq_lo, np.float64))
        sky = reorder_sources(sky, perm)

    freqs_f32 = jnp.asarray(instrument.freqs, dtype=jnp.float32)
    pinvQ_j = jnp.asarray(pinvQ)
    Q_j = jnp.asarray(Q, jnp.float32)

    _coeffs = make_coeff_fn(instrument.freqs, plan.rank, pinvQ,
                            beam_fn, node_model=node_model)
    nm = _coeffs.node_model
    _coeffs_df = None
    if truth is not None:
        # round-5 truth-amps path: two-float coefficient payloads,
        # dual spread. truth = {"beam_df": fn(sh, sl, freqs_f64) ->
        # (hi, lo), "flux_nodes": (S, r) HOST f64 in ORIGINAL source
        # order} — permuted/padded here alongside the sky arrays.
        _coeffs_df = make_coeff_fn_truth(instrument.freqs, plan.rank,
                                         truth["beam_df"])
        fluxn64 = np.asarray(truth["flux_nodes"], np.float64)
        if spatial_sort:
            fluxn64 = fluxn64[perm]

    # Source chunking: prep materializes a (2 x D_dirs x S_chunk) f32
    # two-float u plus several temps of the same shape — at HERA-331's
    # direction count x nside-256 the unchunked arrays alone exceed
    # HBM (ResourceExhausted on the FIRST snapshot, measured round 3).
    # Bound the u pair at ~0.75 GB and scan chunks inside ONE jit
    # (single dispatch; XLA frees each chunk's temps before the next).
    S = int(sky.s_eq_hi.shape[0])
    if src_chunk is None:
        per_src = max(1, plan.ndir) * 8
        cap = int((768 << 20) / per_src / plan.T_s) * plan.T_s
        src_chunk = min(-(-S // plan.T_s) * plan.T_s,
                        max(plan.T_s, cap))
    src_chunk = int(src_chunk)
    n_chunks = -(-S // src_chunk)
    S_pad = n_chunks * src_chunk
    seqh_a = jnp.asarray(sky.s_eq_hi)
    seql_a = jnp.asarray(sky.s_eq_lo)
    flux_a = jnp.asarray(sky.flux)
    if S_pad != S:
        # pad with zenith-direction unit rows (|s|=1 keeps the span
        # check true) at zero flux
        padrow = jnp.zeros((S_pad - S, 3), jnp.float32).at[:, 2].set(1.0)
        seqh_a = jnp.concatenate([seqh_a, padrow])
        seql_a = jnp.concatenate(
            [seql_a, jnp.zeros((S_pad - S, 3), jnp.float32)])
        flux_a = jnp.concatenate(
            [flux_a, jnp.zeros((S_pad - S, flux_a.shape[1]),
                               flux_a.dtype)])
    fnh_a = fnl_a = None
    if truth is not None:
        if S_pad != S:
            fluxn64 = np.concatenate(
                [fluxn64, np.zeros((S_pad - S, fluxn64.shape[1]))])
        fnh_np, fnl_np = tf.split_f64(fluxn64)
        fnh_a = jnp.asarray(fnh_np)
        fnl_a = jnp.asarray(fnl_np)

    def _payloads(sh, sl, fx_c, pch, fnh_c, fnl_c):
        """Chunk spectral payloads: one P in the f32 forms, (P_hi,
        P_lo) two-float pair in truth mode."""
        if truth is not None:
            return _coeffs_df(sh, sl, fnh_c, fnl_c)
        return (_coeffs(sh, fx_c, pch),)

    n_pay = 2 if truth is not None else 1

    def _chunk_sweep(Mh, Ml, pch, pcl, seqh, seql, flux, fnh, fnl):
        def chunk(carry, c):
            tots, comps, okc = carry
            s0 = c * src_chunk
            sh_c = jax.lax.dynamic_slice_in_dim(seqh, s0, src_chunk)
            sl_c = jax.lax.dynamic_slice_in_dim(seql, s0, src_chunk)
            fx_c = jax.lax.dynamic_slice_in_dim(flux, s0, src_chunk)
            fnh_c = fnl_c = None
            if truth is not None:
                fnh_c = jax.lax.dynamic_slice_in_dim(fnh, s0,
                                                     src_chunk)
                fnl_c = jax.lax.dynamic_slice_in_dim(fnl, s0,
                                                     src_chunk)
            sh, sl = df_rotate3(Mh, Ml, sh_c, sl_c)
            seh, sel = tf.df_add(sh, sl, -pch[None, :], -pcl[None, :])
            Ps = _payloads(sh, sl, fx_c, pch, fnh_c, fnl_c)
            u_h, u_l, P_r, ok = _prep(plan, seh, sel, Ps[0])
            outs = [_banded_spread(plan, u_h, u_l, P_r,
                                   interpret=interpret)]
            for P2 in Ps[1:]:
                P2_r = _payload_T(plan, P2)
                outs.append(_banded_spread(plan, u_h, u_l, P2_r,
                                           interpret=interpret))
            # Kahan across chunks: the grid bins on short baselines
            # hold near-coherent partial sums ~S/nbins in magnitude,
            # and plain f32 `t + o` re-rounds the FULL bin value once
            # per chunk — at north-star scale (~11 chunks) that
            # cross-chunk random walk reached the 1e-5 class after the
            # post's band-edge deconvolution and tripped the 2e-6 gate
            # (round 5; the unchunked path was at 1.1e-6 all along
            # because the in-kernel carry_ref already compensates
            # within one spread).
            new_t, new_c = [], []
            for t, cm, o in zip(tots, comps, outs):
                y = o - cm
                s = t + y
                new_t.append(s)
                new_c.append((s - t) - y)
            return (tuple(new_t), tuple(new_c),
                    jnp.logical_and(okc, ok)), None

        zero = jnp.zeros((plan.nbl, plan.R_max, 2 * plan.rank),
                         jnp.float32)
        init = ((zero,) * n_pay, (zero,) * n_pay, jnp.bool_(True))
        (tots, _, ok), _ = jax.lax.scan(chunk, init,
                                        jnp.arange(n_chunks))
        return tots, ok

    @jax.jit
    def stage_prep(Mh, Ml, pch, pcl, s_eq_hi, s_eq_lo, flux):
        sh, sl = df_rotate3(Mh, Ml, s_eq_hi, s_eq_lo)
        seh, sel = tf.df_add(sh, sl, -pch[None, :], -pcl[None, :])
        P = _coeffs(sh, flux, pch)
        return _prep(plan, seh, sel, P)

    @jax.jit
    def stage_spread(u_h, u_l, P_r):
        return _banded_spread(plan, u_h, u_l, P_r,
                              interpret=interpret)

    @jax.jit
    def stage_post(out):
        return _post(plan, out, Q_j, matmul_fft=not interpret)

    # ONE fused jit program per snapshot: prep -> spread -> post in a
    # single dispatch. The three-stage split remains (run.stages) for
    # the tuning bench and first-call stall isolation, but the
    # production path pays one tunnel dispatch instead of three and
    # lets XLA schedule the post's reshape/FFT immediately after the
    # Pallas sweep (measured round 4: the per-snapshot dispatch+glue
    # overhead was ~40% of the banded snapshot wall-clock,
    # bench_nufft_banded stage rows vs fused row).
    if n_chunks == 1:
        @jax.jit
        def _fused(Mh, Ml, pch, pcl, seqh, seql, flux, fnh, fnl):
            sh, sl = df_rotate3(Mh, Ml, seqh, seql)
            seh, sel = tf.df_add(sh, sl, -pch[None, :], -pcl[None, :])
            Ps = _payloads(sh, sl, flux, pch, fnh, fnl)
            u_h, u_l, P_r, ok = _prep(plan, seh, sel, Ps[0])
            v = _post(plan, _banded_spread(plan, u_h, u_l, P_r,
                                           interpret=interpret),
                      Q_j, matmul_fft=not interpret)
            for P2 in Ps[1:]:
                # truth mode: the lo payload rides the same u streams;
                # _post is linear, and the correction (~60 ulp of the
                # hi visibilities) adds cleanly in complex64
                P2_r = _payload_T(plan, P2)
                v = v + _post(plan,
                              _banded_spread(plan, u_h, u_l, P2_r,
                                             interpret=interpret),
                              Q_j, matmul_fft=not interpret)
            return v, ok

        def run(Mh, Ml, pch, pcl):
            return _fused(Mh, Ml, pch, pcl, seqh_a, seql_a, flux_a,
                          fnh_a, fnl_a)

        run.stages = (stage_prep, stage_spread, stage_post)
    else:
        @jax.jit
        def _fused_chunked(Mh, Ml, pch, pcl, seqh, seql, flux, fnh,
                           fnl):
            outs, ok = _chunk_sweep(Mh, Ml, pch, pcl, seqh, seql,
                                    flux, fnh, fnl)
            v = _post(plan, outs[0], Q_j, matmul_fft=not interpret)
            for o in outs[1:]:
                v = v + _post(plan, o, Q_j, matmul_fft=not interpret)
            return v, ok

        sweep_jit = jax.jit(_chunk_sweep)

        def run(Mh, Ml, pch, pcl):
            return _fused_chunked(Mh, Ml, pch, pcl, seqh_a, seql_a,
                                  flux_a, fnh_a, fnl_a)

        run.stages = (sweep_jit, stage_post)
    def _gate_impl(Mh, Ml, pch, pcl, seqh, seql, flux, fnh, fnl):
        """Shared-program cross-check: ONE jit program computes the
        source vectors once per chunk and feeds BOTH the exact direct
        NUDFT and the banded pipeline. Under the f32 node model the
        direct reference consumes the TRUE full-channel beam x flux
        amps while the banded side consumes the rank-r node
        interpolant, so the gate measures transform error AND model
        inadequacy (a rank too low for the band trips it —
        tests/test_round4.py demotion test). The comparison's floor is
        the per-element f32 beam-evaluation difference between the two
        paths summed over sources; with the Chebyshev J1
        (beams/analytic.py) that noise is ~1ulp incoherent rounding,
        not the old A&S cancellation jitter, so the 2e-6 default holds
        at north-star source counts (probe_truth round 4).

        In TRUTH mode the banded engine is more accurate than an f32
        direct reference (that's the point), so the direct side
        consumes the same two-float model amps, the transform
        comparison stays at the 2e-6 class, and model adequacy is
        gated separately via the amps-space residual (`resid` return;
        driver tol 1e-4 — rank-4-on-an-octave measures ~1e-1, the
        healthy floor is ~5e-7).

        Comparing engines that re-evaluate the beam in separate jit
        programs carries a ~1e-7 per-element cross-program beam
        difference that sums coherently over north-star source counts
        into a ~3e-5 floor (round-3 yardstick lesson, BASELINE.md) —
        two orders looser than the 1e-6 spec the gate should enforce.
        Returns (direct re, direct im, banded re, banded im, ok,
        resid, coherent_scale) where coherent_scale is
        max_c Σ_s |A_sc| — the denominator the driver's tolerance is
        calibrated against (see the return-site comment below)."""
        from .nudft import nudft_visibilities
        gs = instrument.grid_scalars()
        nchan = instrument.nchan
        nbl = plan.nbl_full        # direct side runs the FULL bl set

        def chunk(carry, c):
            (tots, tcomps, okc, vd, comp, vdl, rmax, amax,
             csum) = carry
            s0 = c * src_chunk
            sh_c = jax.lax.dynamic_slice_in_dim(seqh, s0, src_chunk)
            sl_c = jax.lax.dynamic_slice_in_dim(seql, s0, src_chunk)
            fx_c = jax.lax.dynamic_slice_in_dim(flux, s0, src_chunk)
            fnh_c = fnl_c = None
            if truth is not None:
                fnh_c = jax.lax.dynamic_slice_in_dim(fnh, s0,
                                                     src_chunk)
                fnl_c = jax.lax.dynamic_slice_in_dim(fnl, s0,
                                                     src_chunk)
            sh, sl = df_rotate3(Mh, Ml, sh_c, sl_c)
            seh, sel = tf.df_add(sh, sl, -pch[None, :], -pcl[None, :])
            Ps = _payloads(sh, sl, fx_c, pch, fnh_c, fnl_c)
            amps = _beam_and_flux(sh, fx_c, freqs_f32, beam_fn,
                                  pc=pch)
            u_h, u_l, P_r, ok = _prep(plan, seh, sel, Ps[0])
            outs = [_banded_spread(plan, u_h, u_l, P_r,
                                   interpret=interpret)]
            for P2 in Ps[1:]:
                P2_r = _payload_T(plan, P2)
                outs.append(_banded_spread(plan, u_h, u_l, P2_r,
                                           interpret=interpret))
            if truth is None:
                vc = nudft_visibilities(seh, sel, instrument.bl_hi,
                                        instrument.bl_lo, amps, gs,
                                        nchan,
                                        src_block=gate_src_block)
                vlo = jnp.zeros_like(vd)
                rm = ra = jnp.float32(0.0)
                cs = jnp.sum(jnp.abs(amps), axis=0)       # (C,)
            else:
                # truth mode: the direct reference consumes THE SAME
                # two-float rank-r model amps the banded side spreads
                # (expanded to channels in two-float; a single-f32
                # direct side would re-introduce its own ~3.5e-6
                # amps-rounding floor and trip the gate against a
                # MORE accurate engine). Model adequacy is gated
                # separately in amps space below.
                amh, aml = _df_matmul_rows(
                    Ps[0], Ps[1], _coeffs_df.node_model.Q64.T)
                vc = nudft_visibilities(seh, sel, instrument.bl_hi,
                                        instrument.bl_lo, amh, gs,
                                        nchan,
                                        src_block=gate_src_block)
                vlo = nudft_visibilities(seh, sel, instrument.bl_hi,
                                         instrument.bl_lo, aml, gs,
                                         nchan,
                                         src_block=gate_src_block)
                # rank-r model residual vs the true full-channel f32
                # amps: catches a rank too low for the band (or a
                # non-smooth tabulated spectrum) that the shared-model
                # transform comparison can no longer see
                rm = jnp.max(jnp.abs((amh - amps) + aml))
                ra = jnp.max(jnp.abs(amps))
                cs = jnp.sum(jnp.abs(amh), axis=0)        # (C,)
            # Kahan across chunks on BOTH sides: the direct vis
            # accumulator and the banded grid accumulators (the grid's
            # short-baseline bins re-round their full near-coherent
            # value on every plain add — the 1e-5-class cross-chunk
            # walk that spuriously tripped this gate at north-star
            # chunk counts, round 5)
            y = vc - comp
            t = vd + y
            new_t, new_c = [], []
            for tt, cm, o in zip(tots, tcomps, outs):
                yb = o - cm
                sb = tt + yb
                new_t.append(sb)
                new_c.append((sb - tt) - yb)
            return (tuple(new_t), tuple(new_c),
                    jnp.logical_and(okc, ok), t,
                    (t - vd) - y, vdl + vlo,
                    jnp.maximum(rmax, rm), jnp.maximum(amax, ra),
                    csum + cs), None

        # The banded accumulator runs over the COLLAPSED (unique
        # canonical) rows — _banded_spread returns plan.nbl rows and
        # _post re-expands to nbl_full; the direct-side vd/comp
        # accumulators run over the FULL set.
        zero = jnp.zeros((plan.nbl, plan.R_max, 2 * plan.rank),
                         jnp.float32)
        init = ((zero,) * n_pay, (zero,) * n_pay, jnp.bool_(True),
                jnp.zeros((nbl, nchan), jnp.complex64),
                jnp.zeros((nbl, nchan), jnp.complex64),
                jnp.zeros((nbl, nchan), jnp.complex64),
                jnp.float32(0.0), jnp.float32(0.0),
                jnp.zeros((nchan,), jnp.float32))
        (tots, _, ok, vd, _, vdl, rmax, amax, csum), _ = jax.lax.scan(
            chunk, init, jnp.arange(n_chunks))
        vd = vd + vdl
        vb = _post(plan, tots[0], Q_j, matmul_fft=not interpret)
        for o in tots[1:]:
            vb = vb + _post(plan, o, Q_j, matmul_fft=not interpret)
        resid = rmax / jnp.maximum(amax, jnp.float32(1e-30))
        # coherent flux scale: max over channels of Σ_s |A_sc| — the
        # largest visibility any baseline could see (attained as
        # baseline -> 0, and by aliased rows on under-resolved
        # pixelized skies). Every f32 source-summation engine's
        # ABSOLUTE error scales with this sum (per-element ~1ulp
        # rounding walks over it), while max|V| over the simulated
        # rows can cancel orders of magnitude below it — normalizing
        # the gate by max|V| would demand an f32-impossible bound on
        # cancelling skies (measured round 5: identical 1.8e-6
        # absolute error read as 2.5e-7 or 2.0e-5 depending on the
        # baseline set's |V| max; probe_pc_bisect.py).
        return (jnp.real(vd), jnp.imag(vd), jnp.real(vb),
                jnp.imag(vb), ok, resid, jnp.max(csum))

    gate_jit = jax.jit(_gate_impl)

    def gate(Mh, Ml, pch, pcl):
        dr, di, br, bi, ok, resid, csA = gate_jit(
            Mh, Ml, pch, pcl, seqh_a, seql_a, flux_a, fnh_a, fnl_a)
        direct0 = np.asarray(dr) + 1j * np.asarray(di)
        banded0 = np.asarray(br) + 1j * np.asarray(bi)
        return (direct0, banded0, bool(np.asarray(ok)),
                float(np.asarray(resid)), float(np.asarray(csA)))

    run.gate_fn = gate
    run.n_chunks = n_chunks
    run.src_chunk = src_chunk
    run.sky_args = (seqh_a, seql_a, flux_a)
    run.node_model = nm
    return run
