"""IIR filtering ops: elliptic design (host, setup time) + JAX lfilter/filtfilt.

The reference uses scipy 6th-order elliptic filters with zero-phase `filtfilt`
for the optional pre-analysis high-pass and all VAD filtering (reference
misc.py:167-182: ``ellip(6, .5, 60, 2*fc/fs, ftype)`` + ``filtfilt``).  Filter
*design* is a tiny host-side float64 computation done once per (fs, fc, type),
so we keep scipy for it; the *application* over the signal is a JAX scan in
transposed direct-form II, with scipy-equivalent odd-extension padding and
``lfilter_zi`` initial conditions so outputs match ``scipy.signal.filtfilt``
defaults to float64 rounding.

A block-parallel state-space formulation (for TPU wall-clock) is provided by
:func:`lfilter_blocked`: zero-state block scans run in parallel, block-boundary
states are stitched with a short scan over per-block state-transition matrices
(A^L decays fast for the filters used here, so the stitching is stable).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from scipy import signal as _ssig


@functools.lru_cache(maxsize=None)
def design_ellip(fs: float, fc: float, ftype: str = "highpass"):
    """6th-order elliptic, 0.5 dB ripple, 60 dB stopband (reference misc.py:181).

    Returns (b, a, zi) as float64 numpy arrays; ``zi`` is scipy's
    ``lfilter_zi`` steady-state initializer used by filtfilt.
    """
    b, a = _ssig.ellip(6, 0.5, 60, 2.0 * fc / fs, ftype)
    zi = _ssig.lfilter_zi(b, a)
    return b, a, zi


def lfilter(b, a, x, zi=None, dtype=jnp.float64):
    """Apply IIR filter along the last axis via transposed direct-form II.

    Matches ``scipy.signal.lfilter(b, a, x, zi=zi)`` (a[0] must be 1 after
    normalization, which scipy's designs guarantee).  ``x`` may have leading
    batch dims.  Returns filtered y (and does not return final state; use
    :func:`lfilter_with_state` if needed).
    """
    y, _ = lfilter_with_state(b, a, x, zi=zi, dtype=dtype)
    return y


def lfilter_with_state(b, a, x, zi=None, dtype=jnp.float64):
    b = jnp.asarray(b, dtype)
    a = jnp.asarray(a, dtype)
    b = b / a[0]
    a = a / a[0]
    n = b.shape[0]
    order = n - 1
    x = jnp.asarray(x, dtype)
    batch_shape = x.shape[:-1]
    if zi is None:
        z0 = jnp.zeros(batch_shape + (order,), dtype)
    else:
        z0 = jnp.broadcast_to(jnp.asarray(zi, dtype), batch_shape + (order,))

    b_tail = b[1:]
    a_tail = a[1:]

    def step(z, xt):
        # xt: [...,], z: [..., order]
        yt = b[0] * xt + z[..., 0]
        zn = b_tail * xt[..., None] + jnp.concatenate(
            [z[..., 1:], jnp.zeros(batch_shape + (1,), dtype)], axis=-1
        ) - a_tail * yt[..., None]
        return zn, yt

    zT, y = jax.lax.scan(step, z0, jnp.moveaxis(x, -1, 0))
    return jnp.moveaxis(y, 0, -1), zT


def filtfilt(b, a, zi, x, dtype=jnp.float64):
    """Zero-phase filtering matching scipy.signal.filtfilt defaults.

    Odd extension of length ``3*max(len(a), len(b))`` at both ends, forward
    and backward passes each initialized with ``zi`` scaled by the first
    sample (scipy method='pad', padtype='odd').
    """
    x = jnp.asarray(x, dtype)
    padlen = 3 * max(len(np.atleast_1d(a)), len(np.atleast_1d(b)))
    if x.shape[-1] <= padlen:
        raise ValueError("signal too short for filtfilt padlen=%d" % padlen)
    zi = jnp.asarray(zi, dtype)

    # odd extension: 2*x[0] - x[padlen:0:-1], x, 2*x[-1] - x[-2:-padlen-2:-1]
    left = 2.0 * x[..., :1] - x[..., padlen:0:-1]
    right = 2.0 * x[..., -1:] - x[..., -2:-padlen - 2:-1]
    ext = jnp.concatenate([left, x, right], axis=-1)

    y = lfilter(b, a, ext, zi=zi * ext[..., :1], dtype=dtype)
    y_rev = y[..., ::-1]
    y2 = lfilter(b, a, y_rev, zi=zi * y_rev[..., :1], dtype=dtype)
    out = y2[..., ::-1]
    return out[..., padlen:-padlen]


def ellip_filter(x, fs, fc, ftype: str = "highpass", dtype=jnp.float64):
    """Reference ``misc.ellipFilter`` equivalent (misc.py:167-182)."""
    b, a, zi = design_ellip(float(fs), float(fc), ftype)
    return filtfilt(b, a, zi, x, dtype=dtype)


# ---------------------------------------------------------------------------
# Block-parallel IIR (TPU fast path)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _state_space(b_key, a_key):
    """Transposed direct-form II state-space matrices (float64 numpy).

    z[n+1] = A z[n] + B x[n];  y[n] = C z[n] + D x[n]
    with z the TDF2 delay state, identical to :func:`lfilter_with_state`.
    """
    b = np.asarray(b_key, np.float64)
    a = np.asarray(a_key, np.float64)
    b = b / a[0]
    a = a / a[0]
    order = len(b) - 1
    A = np.zeros((order, order))
    A[:, 0] = -a[1:]
    A[:-1, 1:] = np.eye(order - 1)
    B = b[1:] - a[1:] * b[0]
    C = np.zeros(order)
    C[0] = 1.0
    D = b[0]
    return A, B, C, D


def lfilter_blocked(b, a, x, zi=None, block: int = 1024, dtype=jnp.float32):
    """Parallel-over-blocks lfilter for long 1-D signals on TPU.

    Splits x into blocks, runs zero-state scans for all blocks in parallel,
    then stitches block-boundary states with a short sequential scan using
    the per-block state-transition matrix A^L (precomputed, host float64).
    Equivalent to :func:`lfilter` in exact arithmetic.
    """
    b = np.asarray(b, np.float64)
    a = np.asarray(a, np.float64)
    order = len(b) - 1
    x = jnp.asarray(x, dtype)
    n = x.shape[-1]
    nblocks = -(-n // block)
    pad = nblocks * block - n
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    xb = xp.reshape(x.shape[:-1] + (nblocks, block))

    # zero-state pass over each block in parallel (batched scan over block axis)
    y0, z_end0 = lfilter_with_state(b, a, xb, zi=jnp.zeros(order, dtype), dtype=dtype)

    A, B, C, D = _state_space(tuple(b), tuple(a))
    AL = np.linalg.matrix_power(A, block)          # state transition over a block
    # homogeneous responses: y_h[t] = C A^t z0 ; z propagates A^t
    At = np.empty((block, order, order))
    acc = np.eye(order)
    for t in range(block):
        At[t] = acc
        acc = A @ acc
    Yh = np.einsum("j,tjk->tk", C, At)             # [block, order]

    ALj = jnp.asarray(AL, dtype)
    Yhj = jnp.asarray(Yh, dtype)

    z0 = (jnp.zeros(x.shape[:-1] + (order,), dtype) if zi is None
          else jnp.broadcast_to(jnp.asarray(zi, dtype), x.shape[:-1] + (order,)))

    # stitch: z_start[k+1] = AL @ z_start[k] + z_end0[k]
    def stitch(z, zend):
        z_next = zend + z @ ALj.T
        return z_next, z

    zend_seq = jnp.moveaxis(z_end0, -2, 0)          # [nblocks, ..., order]
    _, z_starts = jax.lax.scan(stitch, z0, zend_seq)
    z_starts = jnp.moveaxis(z_starts, 0, -2)        # [..., nblocks, order]

    y = y0 + jnp.einsum("...bo,to->...bt", z_starts, Yhj)
    y = y.reshape(x.shape[:-1] + (nblocks * block,))
    return y[..., :n]
