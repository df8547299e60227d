"""Antenna power: beam-weighted mean sky flux per snapshot/channel.

Rebuild of ``antenna_power()`` (/root/reference/prisim/interferometry.py:
2169-2410): for each LST, transform catalog positions to alt/az, keep the
upper hemisphere, evaluate the primary beam, and return the
beam-weighted average source flux

    P(t, nu) = sum_src pb * S / sum_src pb

used for antenna-temperature / Tsys estimation. Vectorized over
(snapshot, source, channel); host+jax."""

from __future__ import annotations

import numpy as np

from .. import geometry as geom

__all__ = ["antenna_power"]


def antenna_power(skymodel, freqs, lst_deg, latitude, beam_fn,
                  pointing_altaz=None):
    """(n_lst, nchan) beam-weighted mean flux.

    skymodel: prisim_tpu SkyModel (RA/dec degrees); beam_fn(dircos,
    freqs)->(S, C) power beam. pointing_altaz currently informs beam_fn
    via closure (pass a pointed beam_fn for steered beams)."""
    import jax.numpy as jnp
    lst_deg = np.atleast_1d(np.asarray(lst_deg, dtype=np.float64))
    freqs = np.asarray(freqs, dtype=np.float64)
    flux = skymodel.generate_spectrum(freqs)          # (S, C)
    ra = skymodel.location[:, 0]
    dec = skymodel.location[:, 1]
    out = np.empty((lst_deg.size, freqs.size))
    for i, lst in enumerate(lst_deg):
        hadec = np.stack([lst - ra, dec], axis=-1)
        altaz = geom.hadec2altaz(hadec, latitude, xp=np)
        up = altaz[:, 0] >= 0.0
        dc = geom.altaz2dircos(altaz[up], xp=np)
        pb = np.asarray(beam_fn(jnp.asarray(dc, dtype=jnp.float32),
                                jnp.asarray(freqs, dtype=jnp.float32)))
        denom = np.sum(pb, axis=0)
        out[i] = np.sum(pb * flux[up], axis=0) / np.where(denom > 0,
                                                          denom, 1.0)
    return out
