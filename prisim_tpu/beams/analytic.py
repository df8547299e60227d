"""Analytic primary beam models, vectorized over (nsrc, nchan) in JAX.

Rebuild of /root/reference/prisim/primary_beams.py (airy at :517, gaussian
at :629, VLA PBCOR at :445, GMRT at :734, ground plane at :812, dipole at
:975, array factor at :1482, uniform apertures at :2057/:2274) as pure
jax functions over direction cosines — no coordinate-system branching in
the hot path; hosts convert once to dircos.

All functions take:
  dircos : (nsrc, 3) direction cosines in local (E, N, U)
  freqs  : (nchan,) frequencies in Hz
and return (nsrc, nchan) float arrays (field or power patterns).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as CNST


def bessel_j1(x):
    """Bessel J1 via the Abramowitz-Stegun rational approximations
    (float32-accurate to ~1e-7; jax has no TPU-ready j1)."""
    ax = jnp.abs(x)
    # |x| < 8 branch
    y = x * x
    num = x * (72362614232.0 + y * (-7895059235.0 + y * (242396853.1
          + y * (-2972611.439 + y * (15704.48260 + y * (-30.16036606))))))
    den = 144725228442.0 + y * (2300535178.0 + y * (18583304.74
          + y * (99447.43394 + y * (376.9991397 + y))))
    small = num / den
    # |x| >= 8 asymptotic branch
    z = 8.0 / jnp.maximum(ax, 1e-20)
    y2 = z * z
    p1 = 1.0 + y2 * (0.183105e-2 + y2 * (-0.3516396496e-4
         + y2 * (0.2457520174e-5 + y2 * (-0.240337019e-6))))
    p2 = 0.04687499995 + y2 * (-0.2002690873e-3 + y2 * (0.8449199096e-5
         + y2 * (-0.88228987e-6 + y2 * 0.105787412e-6)))
    xx = ax - 2.356194491
    big = jnp.sqrt(0.636619772 / jnp.maximum(ax, 1e-20)) * \
        (jnp.cos(xx) * p1 - z * jnp.sin(xx) * p2) * jnp.sign(x)
    return jnp.where(ax < 8.0, small, big)


def _offaxis_sin(dircos, pointing_dircos=None):
    """sin(angle from beam axis) for each source; horizon mask.

    With no pointing center the axis is zenith: sin(theta) = sqrt(l^2+m^2).
    With a pointing center p, uses |s x p| = sin(angle)."""
    if pointing_dircos is None:
        sin_t = jnp.sqrt(jnp.clip(dircos[:, 0] ** 2 + dircos[:, 1] ** 2,
                                  0.0, 1.0))
        below = dircos[:, 2] < 0.0
        return sin_t, below
    p = jnp.asarray(pointing_dircos).reshape(3)
    p = p / jnp.linalg.norm(p)
    cosang = jnp.clip(dircos @ p, -1.0, 1.0)
    sinang = jnp.sqrt(jnp.clip(1.0 - cosang ** 2, 0.0, 1.0))
    below = jnp.logical_or(dircos[:, 2] < 0.0, cosang < 0.0)
    return sinang, below


def airy_beam(dircos, freqs, diameter, pointing_dircos=None, power=True):
    """Airy pattern of a uniformly illuminated dish: 2 J1(x)/x with
    x = k (D/2) sin(theta) (cf. primary_beams.py:611-626)."""
    sin_t, below = _offaxis_sin(dircos, pointing_dircos)
    k = 2.0 * jnp.pi * jnp.asarray(freqs) / CNST.c
    arg = k[None, :] * (0.5 * diameter) * sin_t[:, None]
    small = jnp.abs(arg) < 1e-6
    safe = jnp.where(small, 1.0, arg)
    pattern = jnp.where(small, 1.0 - arg * arg / 8.0,
                        2.0 * bessel_j1(safe) / safe)
    pattern = jnp.where(below[:, None], 0.0, pattern)
    return pattern ** 2 if power else pattern


def gaussian_beam(dircos, freqs, diameter, pointing_dircos=None, power=True):
    """Chromatic gaussian with FWHM aperture `diameter`
    (cf. primary_beams.py:718-728)."""
    sin_t, below = _offaxis_sin(dircos, pointing_dircos)
    wl = CNST.c / jnp.asarray(freqs)
    sigma_aprtr = diameter / (2.0 * jnp.sqrt(2.0 * jnp.log(2.0))) / wl
    sigma_dircos = 1.0 / (2.0 * jnp.pi * sigma_aprtr)
    pattern = jnp.exp(-0.5 * (sin_t[:, None] / sigma_dircos[None, :]) ** 2)
    pattern = jnp.where(below[:, None], 0.0, pattern)
    return pattern ** 2 if power else pattern


def dipole_beam(dircos, freqs, length, orientation_dircos=(1.0, 0.0, 0.0),
                short_dipole=False, half_wave=False, power=True):
    """Finite-length dipole field pattern
    (cf. primary_beams.py:1208-1237):
      E = (cos(kh cos a) - cos(kh)) / sin a, normalized by (1 - cos kh),
    where a is the angle between source and dipole axis."""
    d = jnp.asarray(np.asarray(orientation_dircos,
                               dtype=np.float32)).reshape(3)
    d = d / jnp.linalg.norm(d)
    cosa = jnp.clip(dircos @ d, -1.0, 1.0)
    sina = jnp.sqrt(jnp.clip(1.0 - cosa ** 2, 1e-12, 1.0))
    if short_dipole:
        pattern = jnp.broadcast_to(sina[:, None],
                                   (dircos.shape[0], len(np.atleast_1d(freqs))))
        return pattern ** 2 if power else pattern
    if half_wave:
        pattern = jnp.cos(0.5 * jnp.pi * cosa) / sina
        pattern = jnp.broadcast_to(pattern[:, None],
                                   (dircos.shape[0], len(np.atleast_1d(freqs))))
        return pattern ** 2 if power else pattern
    k = 2.0 * jnp.pi * jnp.asarray(freqs) / CNST.c
    kh = k * (0.5 * length)
    maxpat = 1.0 - jnp.cos(kh)
    num = jnp.cos(kh[None, :] * cosa[:, None]) - jnp.cos(kh)[None, :]
    pattern = num / sina[:, None] / maxpat[None, :]
    # L'Hopital limit as a -> 0: kh sin(kh cos a) tan(a) -> 0
    pattern = jnp.where(jnp.abs(jnp.abs(cosa) - 1.0)[:, None] < 1e-10,
                        0.0, pattern)
    return pattern ** 2 if power else pattern


def ground_plane_pattern(dircos, freqs, height, modifier=None, power=False):
    """Image-dipole ground-plane factor 2 sin(k h sin(alt)), peak-normalized
    (cf. primary_beams.py:948-970)."""
    k = 2.0 * jnp.pi * jnp.asarray(freqs) / CNST.c
    sinalt = jnp.clip(dircos[:, 2], 0.0, 1.0)
    gp = 2.0 * jnp.sin(k[None, :] * height * sinalt[:, None])
    if modifier is not None:
        val = 1.0 / jnp.sqrt(jnp.clip(jnp.abs(dircos[:, 2]), 1e-10, None))
        if "scale" in modifier:
            val = val * modifier["scale"]
        if "max" in modifier:
            val = jnp.clip(val, 0.0, modifier["max"])
        gp = gp * val[:, None]
    gp = gp / (2.0 * jnp.sin(k[None, :] * height))
    return gp ** 2 if power else gp


_VLA_FREQ_REF = np.array([0.0738, 0.3275, 1.465, 4.885, 8.435, 14.965,
                          22.485, 43.315])
_VLA_PARMS = np.array([
    [-0.897, 2.71, -0.242], [-0.935, 3.23, -0.378], [-1.343, 6.579, -1.186],
    [-1.372, 6.940, -1.309], [-1.306, 6.253, -1.100],
    [-1.305, 6.155, -1.030], [-1.417, 7.332, -1.352],
    [-1.321, 6.185, -0.983]])

_GMRT_FREQ_REF = np.array([0.235, 0.325, 0.610, 1.420])
_GMRT_PARMS = {
    "gmrt": np.array([[-3.366, 46.159, -29.963, 7.529],
                      [-3.397, 47.192, -30.931, 7.803],
                      [-3.486, 47.749, -35.203, 10.399],
                      [-2.27961, 21.4611, -9.7929, 1.80153]]),
    "ugmrt": np.array([[np.nan] * 4,
                       [-2.939, 33.312, -16.659, 3.006],
                       [-3.190, 38.642, -20.471, 3.964],
                       [-2.608, 27.357, -13.091, 2.365]]),
}


def _offaxis_deg(dircos):
    n = jnp.clip(dircos[:, 2], -1.0, 1.0)
    return jnp.degrees(jnp.arccos(n))


def vla_pbcor_beam(dircos, freqs, clip_negative=True):
    """AIPS PBCOR 3-term polynomial in (angle[arcmin] * freq[GHz])^2
    (cf. primary_beams.py:483-513). Band selected by the first frequency."""
    f_ghz = np.asarray(freqs, dtype=np.float64) / 1e9
    idx = int(np.argmin(np.abs(_VLA_FREQ_REF - f_ghz[0])))
    a1, a2, a3 = _VLA_PARMS[idx]
    ang = _offaxis_deg(dircos)
    x = (ang[:, None] * 60.0 * jnp.asarray(f_ghz)[None, :]) ** 2
    pb = 1.0 + a1 * x / 1e3 + a2 * x ** 2 / 1e7 + a3 * x ** 3 / 1e10
    if clip_negative:
        pb = jnp.clip(pb, 0.0, None)
    return pb


def gmrt_beam(dircos, freqs, instrument="gmrt", clip_negative=True):
    """GMRT/uGMRT PBCOR 4-term polynomial (cf. primary_beams.py:752-795)."""
    f_ghz = np.asarray(freqs, dtype=np.float64) / 1e9
    idx = int(np.argmin(np.abs(_GMRT_FREQ_REF - f_ghz[0])))
    a1, a2, a3, a4 = _GMRT_PARMS[instrument][idx]
    ang = _offaxis_deg(dircos)
    x = (ang[:, None] * 60.0 * jnp.asarray(f_ghz)[None, :]) ** 2
    pb = (1.0 + a1 * x / 1e3 + a2 * x ** 2 / 1e7 + a3 * x ** 3 / 1e10
          + a4 * x ** 4 / 1e13)
    if clip_negative:
        pb = jnp.clip(pb, 0.0, None)
    return pb


def _sinc(x):
    return jnp.sinc(x)  # normalized sinc sin(pi x)/(pi x)


def uniform_rect_aperture_beam(dircos, freqs, sides,
                               pointing_dircos=None, power=True):
    """sinc x sinc pattern of a uniformly illuminated rectangular aperture
    (cf. primary_beams.py:2230-2243)."""
    wl = CNST.c / jnp.asarray(freqs)
    if pointing_dircos is None:
        rel = dircos
    else:
        rel = dircos - jnp.asarray(pointing_dircos).reshape(1, 3)
    arg1 = sides[0] * rel[:, 0][:, None] / wl[None, :]
    arg2 = sides[1] * rel[:, 1][:, None] / wl[None, :]
    ab = _sinc(arg1) * _sinc(arg2)
    ab = jnp.where((dircos[:, 2] < 0.0)[:, None], 0.0, ab)
    return ab ** 2 if power else ab


def uniform_square_aperture_beam(dircos, freqs, side, pointing_dircos=None,
                                 power=True):
    return uniform_rect_aperture_beam(dircos, freqs, (side, side),
                                      pointing_dircos=pointing_dircos,
                                      power=power)


def mwa_tile_positions():
    """4x4 grid of dipoles, 1.1 m spacing (cf. primary_beams.py:289-292)."""
    x, y = np.meshgrid(1.1 * np.linspace(-1.5, 1.5, 4),
                       1.1 * np.linspace(1.5, -1.5, 4))
    return np.stack([x.ravel(), y.ravel(), np.zeros(16)], axis=-1)


def array_field_pattern(element_pos, dircos, freqs, pointing_dircos=None,
                        delays=None, gains=None, delayerr=0.0, gainerr_db=0.0,
                        nrand=1, key=None):
    """Beamformer array factor with optional random delay/gain errors.

    AF(s, nu) = (1/N) sum_a g_a exp(i 2 pi nu (delta_a - s.x_a / c))
    with delta_a = x_a . p / c delay compensation toward pointing p
    (cf. primary_beams.py:1600-1755). Returns (nsrc, nchan, nrand) complex.
    """
    element_pos = jnp.asarray(element_pos, dtype=jnp.float32)
    nant = element_pos.shape[0]
    freqs = jnp.asarray(freqs)
    if delays is None:
        if pointing_dircos is not None:
            p = jnp.asarray(pointing_dircos).reshape(3)
            delays = (element_pos @ p) / CNST.c
        else:
            delays = jnp.zeros(nant)
    else:
        delays = jnp.asarray(delays).reshape(nant)
    if gains is None:
        gains = jnp.ones(nant)
    else:
        gains = jnp.asarray(gains).reshape(nant)

    if (delayerr > 0.0 or gainerr_db > 0.0) and key is None:
        key = jax.random.PRNGKey(0)
    d = delays[:, None] + jnp.zeros((nant, nrand))
    g = gains[:, None] + jnp.zeros((nant, nrand))
    if delayerr > 0.0:
        key, sub = jax.random.split(key)
        d = d + delayerr * jax.random.normal(sub, (nant, nrand))
    if gainerr_db > 0.0:
        key, sub = jax.random.split(key)
        g = g * 10.0 ** ((gainerr_db / 10.0)
                         * jax.random.normal(sub, (nant, nrand)))

    geom_delay = -(dircos @ element_pos.T) / CNST.c        # (nsrc, nant)
    # phase: 2 pi nu (geom + delay) -> (nsrc, nant, nchan, nrand)
    tot = geom_delay[:, :, None, None] + d[None, :, None, :]
    phase = 2.0 * jnp.pi * freqs[None, None, :, None] * tot
    af = jnp.sum(g[None, :, None, :]
                 * jnp.exp(1j * phase), axis=1) / nant
    return af  # (nsrc, nchan, nrand)
