"""Telescope-dict primary beam dispatcher.

Mirrors primary_beam_generator's dispatch semantics
(/root/reference/prisim/primary_beams.py:224-443): known telescope ids
(vla/gmrt/ugmrt/hera/hirax/mwa/mwa_dipole/paper), generic element shapes
(delta/dipole/dish/gaussian/rect/square), optional phased-array beamformer
with random delay/gain error realizations, and a ground-plane multiplier.

The dict parsing happens host-side; the returned computation is pure jax
and jit-safe (power pattern, peak-normalized where the reference does so).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import analytic as AB


def _power_from_field(ep, af=None, gp=None):
    """power = mean over realizations of |ep * AF|^2, times gp^2."""
    if af is not None:
        field = ep[..., None] * af if ep.ndim == 2 else ep * af
        pb = jnp.mean(jnp.abs(field) ** 2, axis=-1)
    else:
        pb = jnp.abs(ep) ** 2
    if gp is not None:
        pb = pb * gp ** 2
    return pb


def primary_beam(dircos, freqs, telescope, pointing_info=None,
                 pointing_center_dircos=None, short_dipole=False,
                 half_wave=False, key=None, pol="X"):
    """Power pattern (nsrc, nchan) for sources at `dircos` (local ENU
    direction cosines) and frequencies `freqs` (Hz).

    telescope: dict with keys id / shape / size / orientation(dircos) /
    element_locs / groundplane / ground_modify (see reference docstring
    primary_beams.py:36-115).
    pointing_info: dict with delays / gains / delayerr / gainerr_db / nrand /
    pointing_center_dircos for the beamformer.
    pol: 'X' (default) or 'Y'. The Y feed is the X feed rotated 90 deg
    in azimuth — orientation-sensitive beams (dipole/beamformer/feed)
    change; axisymmetric dishes do not. (The reference is single-pol;
    this is the dual-pol extension.)
    """
    dircos = jnp.asarray(dircos)
    freqs = jnp.asarray(freqs)
    if pol not in ("X", "Y", "x", "y"):
        raise ValueError("pol must be 'X' or 'Y'")
    if pol in ("Y", "y"):
        # Resolve the effective orientation BEFORE rotating: the
        # orientation-sensitive branches below default to (1,0,0) when
        # orientation_dircos is absent, so a Y feed must rotate that
        # default too (else Y silently duplicates X).
        ox, oy, oz = ((telescope or {}).get("orientation_dircos")
                      or (1.0, 0.0, 0.0))
        telescope = dict(telescope or {},
                         orientation_dircos=(-oy, ox, oz))
    tid = (telescope or {}).get("id", None)

    if tid in ("vla",):
        return AB.vla_pbcor_beam(dircos, np.asarray(freqs))
    if tid in ("gmrt", "ugmrt"):
        return AB.gmrt_beam(dircos, np.asarray(freqs), instrument=tid)
    if tid in ("hera", "hirax"):
        dia = 14.0 if tid == "hera" else 6.0
        return AB.airy_beam(dircos, freqs, dia,
                            pointing_dircos=telescope.get(
                                "orientation_dircos"), power=True)
    if tid in ("mwa",):
        ep = AB.dipole_beam(dircos, freqs, 0.74,
                            orientation_dircos=telescope.get(
                                "orientation_dircos", (1.0, 0.0, 0.0)),
                            short_dipole=short_dipole, half_wave=half_wave,
                            power=False)
        element_locs = telescope.get("element_locs")
        if element_locs is None:
            element_locs = AB.mwa_tile_positions()
        pinfo = pointing_info or {}
        af = AB.array_field_pattern(
            element_locs, dircos, freqs,
            pointing_dircos=pinfo.get("pointing_center_dircos",
                                      pointing_center_dircos),
            delays=pinfo.get("delays"), gains=pinfo.get("gains"),
            delayerr=pinfo.get("delayerr", 0.0) or 0.0,
            gainerr_db=pinfo.get("gainerr", 0.0) or 0.0,
            nrand=pinfo.get("nrand", 1) or 1, key=key)
        return _power_from_field(ep, af=af,
                                 gp=_ground_plane(telescope, dircos, freqs))
    if tid in ("mwa_dipole", "paper"):
        size = 0.74 if tid == "mwa_dipole" else 2.0
        ep = AB.dipole_beam(dircos, freqs, size,
                            orientation_dircos=telescope.get(
                                "orientation_dircos", (1.0, 0.0, 0.0)),
                            short_dipole=short_dipole, half_wave=half_wave,
                            power=False)
        return _power_from_field(ep, gp=_ground_plane(telescope, dircos,
                                                      freqs))

    # Arbitrary aperture samples ------------------------------------------
    if (telescope or {}).get("aperture_locs") is not None:
        # generic aperture of isotropic radiators, optionally illuminated
        # by a feed (telescope['feedinfo']) — the reference's
        # generic_aperture_field_pattern / feed_aperture_combined path
        # (primary_beams.py:1758, 2344, 2572)
        pinfo = pointing_info or {}
        pdc = pinfo.get("pointing_center_dircos", pointing_center_dircos)
        feedinfo = telescope.get("feedinfo")
        if feedinfo:
            return AB.feed_aperture_combined_field_pattern(
                telescope["aperture_locs"], feedinfo, dircos, freqs,
                pointing_dircos=pdc, short_dipole=short_dipole,
                half_wave=half_wave, power=True)
        return AB.generic_aperture_field_pattern(
            telescope["aperture_locs"], dircos, freqs,
            pointing_dircos=pdc, delays=pinfo.get("delays"),
            gains=pinfo.get("gains"),
            delayerr=pinfo.get("delayerr", 0.0) or 0.0,
            gainerr_db=pinfo.get("gainerr", 0.0) or 0.0,
            nrand=pinfo.get("nrand", 1) or 1, key=key, power=True)

    # Generic shapes ------------------------------------------------------
    shape = (telescope or {}).get("shape", "delta")
    nsrc, nchan = dircos.shape[0], freqs.shape[0]
    if shape == "delta":
        ep = jnp.ones((nsrc, nchan))
    elif shape == "dipole":
        ep = AB.dipole_beam(dircos, freqs, telescope["size"],
                            orientation_dircos=telescope.get(
                                "orientation_dircos", (1.0, 0.0, 0.0)),
                            short_dipole=short_dipole, half_wave=half_wave,
                            power=False)
    elif shape == "dish":
        ep = AB.airy_beam(dircos, freqs, telescope["size"],
                          pointing_dircos=pointing_center_dircos,
                          power=False)
    elif shape == "gaussian":
        ep = AB.gaussian_beam(dircos, freqs, telescope["size"],
                              pointing_dircos=pointing_center_dircos,
                              power=False)
    elif shape == "rect":
        ep = AB.uniform_rect_aperture_beam(dircos, freqs, telescope["size"],
                                           pointing_dircos=pointing_center_dircos,
                                           power=False)
    elif shape == "square":
        ep = AB.uniform_square_aperture_beam(dircos, freqs,
                                             telescope["size"],
                                             pointing_dircos=pointing_center_dircos,
                                             power=False)
    else:
        raise ValueError(f"invalid telescope shape {shape!r}")

    af = None
    if pointing_info is not None and telescope.get("element_locs") is not None:
        af = AB.array_field_pattern(
            telescope["element_locs"], dircos, freqs,
            pointing_dircos=pointing_info.get("pointing_center_dircos",
                                              pointing_center_dircos),
            delays=pointing_info.get("delays"),
            gains=pointing_info.get("gains"),
            delayerr=pointing_info.get("delayerr", 0.0) or 0.0,
            gainerr_db=pointing_info.get("gainerr", 0.0) or 0.0,
            nrand=pointing_info.get("nrand", 1) or 1, key=key)

    gp = None
    if telescope.get("groundplane") is not None and shape != "dish":
        gp = _ground_plane(telescope, dircos, freqs)
    return _power_from_field(ep, af=af, gp=gp)


def _ground_plane(telescope, dircos, freqs):
    h = telescope.get("groundplane")
    if h is None:
        return None
    return AB.ground_plane_pattern(dircos, freqs, h,
                                   modifier=telescope.get("ground_modify"),
                                   power=False)
