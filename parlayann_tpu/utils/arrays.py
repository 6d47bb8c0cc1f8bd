"""Small array helpers shared across the package."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def as_device(x) -> jax.Array:
    """Return ``x`` as a device array WITHOUT round-tripping it.

    ``jnp.asarray(np.asarray(x))`` on an already-device-resident array
    downloads then re-uploads it; through the axon relay (~30 MB/s both
    ways, measured) that costs ~340 ms for a 10K x 128 f32 query batch —
    more than the search itself.
    """
    if isinstance(x, jax.Array):
        return x
    return jnp.asarray(np.asarray(x))


def pow2(x: int) -> int:
    """Smallest power of two >= x (lane/sublane sizing helper)."""
    p = 1
    while p < x:
        p *= 2
    return p
