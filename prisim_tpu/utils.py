"""Small runtime utilities."""

from __future__ import annotations

import numpy as np

__all__ = ["get_complex", "put_complex"]


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


def put_complex(x):
    """Host->device transfer of a complex array, TPU-backend-safe.

    The mirror of get_complex: device_put of a complex numpy array
    raises UNIMPLEMENTED on the axon TPU tunnel (flushed out by
    BASELINE config #3's delay transform), while float32 transfers and
    complex math inside jit both work. Ships the real/imag planes as
    float32 and combines them in one tiny jitted program. Device
    arrays and real host arrays pass straight through jnp.asarray."""
    import jax
    import jax.numpy as jnp
    if isinstance(x, jax.Array):
        return x
    x = np.asarray(x)
    if (not np.issubdtype(x.dtype, np.complexfloating)
            or jax.default_backend() != "tpu"):
        return jnp.asarray(x)
    re = np.ascontiguousarray(x.real, dtype=np.float32)
    im = np.ascontiguousarray(x.imag, dtype=np.float32)
    return jax.jit(jax.lax.complex)(re, im)
