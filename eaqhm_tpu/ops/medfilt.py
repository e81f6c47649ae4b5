"""Edge-replicated median filter (reference misc.py:184-206 semantics).

The reference materializes an L x p toeplitz matrix and applies Python's
``statistics.median`` row-wise; semantically this is an order-p median filter
with edge replication.  Here: pad-replicate, gather p-wide windows, and take
the median along the window axis — one fused vector op on TPU instead of an
O(L*p) host loop.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def medfilt(x, p: int):
    """Median filter of odd order p with edge replication, along last axis."""
    if p % 2 != 1:
        raise ValueError("order must be odd")
    ad = (p - 1) // 2
    if ad == 0:
        return jnp.asarray(x)
    x = jnp.asarray(x)
    left = jnp.repeat(x[..., :1], ad, axis=-1)
    right = jnp.repeat(x[..., -1:], ad, axis=-1)
    xp = jnp.concatenate([left, x, right], axis=-1)
    n = x.shape[-1]
    idx = np.arange(n)[:, None] + np.arange(p)[None, :]
    win = xp[..., idx]                      # [..., n, p]
    return jnp.median(win, axis=-1)
