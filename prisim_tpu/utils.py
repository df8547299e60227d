"""Small runtime utilities."""

from __future__ import annotations

import numpy as np

__all__ = ["get_complex"]


def get_complex(x):
    """Device->host transfer of a complex array, TPU-backend-safe.

    On the axon TPU tunnel, transferring a complex64 device array to the
    host (and eager complex ops) raises UNIMPLEMENTED and wedges the
    backend, while complex math INSIDE jit and float32 transfers work.
    This splits real/imag inside a jitted function and recombines on the
    host. Pass-through for numpy inputs and CPU backends."""
    if isinstance(x, np.ndarray):
        return x
    try:
        platform = x.devices().pop().platform if hasattr(x, "devices") \
            else None
    except Exception:
        platform = None
    is_complex = hasattr(x, "dtype") and np.issubdtype(
        x.dtype, np.complexfloating)
    if platform != "tpu" or not is_complex:
        return np.asarray(x)
    import jax
    import jax.numpy as jnp
    re, im = jax.jit(lambda z: (jnp.real(z), jnp.imag(z)))(x)
    return np.asarray(re) + 1j * np.asarray(im)
