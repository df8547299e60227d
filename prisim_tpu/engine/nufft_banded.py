"""Banded-spread NUFFT: the MXU-resident TPU spreading kernel (round 3).

The sorted segment-sum spread (nufft_delay.nufft_delay_visibilities_jax
_sorted) is exact but runs at TPU gather/cross-lane-scan speeds on
hardware — 100x slower than the direct Pallas kernel (BASELINE.md,
round 2). This module rebuilds the spreading as dense banded work over
sources sorted by delay bin, so the hot loop is VPU window evaluation +
MXU (window @ coefficients) dots with no sort/gather/scan inside the
kernel (ROADMAP.md round-3 design).

Status: under construction this round. `banded_spread_available()`
gates the driver's TPU NUFFT dispatch (driver.py) and returns False
until the kernel is validated on hardware.
"""

from __future__ import annotations

__all__ = ["banded_spread_available"]


def banded_spread_available():
    """True once the banded Pallas spread kernel is implemented and
    validated on the TPU backend."""
    return False
