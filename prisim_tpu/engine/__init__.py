"""Simulation engine: NUDFT kernels, observe drivers, noise, power."""

from .nudft import nudft_visibilities, nudft_reference_f64  # noqa: F401
from .observe import (  # noqa: F401
    Instrument, Observation, SkySources, simulate_snapshot, simulate_drift,
    enu_rotation_from_eq,
)
from .noise import thermal_noise_rms, generate_noise  # noqa: F401
from .power import antenna_power  # noqa: F401
