"""Interpolation ops: linear lerp and not-a-knot cubic splines (batched).

The reference leans on ``scipy.interpolate.interp1d``: linear for f0-grid
resampling (functions.py:644-681) and AM tracks (functions.py:364), and
``kind=3`` for FM tracks and the DC track (functions.py:340,367-371).
``interp1d(kind=3)`` is exactly the **not-a-knot cubic spline** (verified
equal to ``CubicSpline(bc_type='not-a-knot')`` to 1 ulp), and its
``fill_value='extrapolate'`` evaluates the end polynomials outside the
range.  We implement the spline in second-derivative (M) form with a
batched Thomas solve:

  interior i:  h_{i-1} M_{i-1} + 2(h_{i-1}+h_i) M_i + h_i M_{i+1} = d_i,
  d_i = 6((y_{i+1}-y_i)/h_i - (y_i-y_{i-1})/h_{i-1}),

with the not-a-knot conditions eliminated into the first/last interior rows
(M_0 and M_{m-1} recovered by linear extrapolation of M).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def lerp(xp, fp, x):
    """Piecewise-linear interpolation, batched over leading dims of fp.

    xp: [m] sorted anchor positions; fp: [..., m] values; x: [q] queries.
    Out-of-range queries extrapolate with the end segments (callers that
    need scipy bounds behavior should mask).
    """
    xp = jnp.asarray(xp)
    fp = jnp.asarray(fp)
    x = jnp.asarray(x)
    i = jnp.clip(jnp.searchsorted(xp, x, side="right") - 1, 0, xp.shape[0] - 2)
    x0 = xp[i]
    x1 = xp[i + 1]
    g = (x - x0) / (x1 - x0)
    return fp[..., i] * (1.0 - g) + fp[..., i + 1] * g


def notaknot_M(x, y):
    """Second derivatives M of the not-a-knot cubic spline through (x, y).

    x: [m] sorted anchors (m >= 4 for a true spline; m == 4 degenerates to
    the single interpolating cubic, matching scipy).  y: [..., m] batched
    values.  Returns M: [..., m].
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    m = x.shape[-1]
    h = jnp.diff(x)                                    # [m-1]
    dy = jnp.diff(y, axis=-1) / h                      # [..., m-1]
    d = 6.0 * (dy[..., 1:] - dy[..., :-1])             # [..., m-2] rhs for i=1..m-2

    n = m - 2                                          # unknowns M_1..M_{m-2}
    # tridiagonal coefficients (general rows)
    sub = h[:-1]                                       # a_i = h_{i-1}, i=1..m-2
    diag = 2.0 * (h[:-1] + h[1:])
    sup = h[1:]

    # not-a-knot eliminations into first and last rows
    h0, h1 = h[0], h[1]
    hm2, hm3 = h[-1], h[-2]
    diag = diag.at[0].set(h0 * (h0 + h1) / h1 + 2.0 * (h0 + h1))
    sup = sup.at[0].set(h1 - h0 * h0 / h1)
    diag = diag.at[-1].set(2.0 * (hm3 + hm2) + hm2 * (hm3 + hm2) / hm3)
    sub = sub.at[-1].set(hm3 - hm2 * hm2 / hm3)

    # Thomas forward sweep (scan over anchors; batched over leading dims)
    def fwd(carry, inp):
        cp_prev, dp_prev = carry
        a_i, b_i, c_i, d_i = inp
        den = b_i - a_i * cp_prev
        cp = c_i / den
        dp = (d_i - a_i * dp_prev) / den
        return (cp, dp), (cp, dp)

    d_t = jnp.moveaxis(d, -1, 0)                       # [n, ...]
    zero_row = jnp.zeros(d_t.shape[1:], d.dtype)
    a_seq = jnp.concatenate([jnp.zeros((1,), d.dtype), sub[1:]])
    (_, _), (cp, dp) = jax.lax.scan(
        fwd, (jnp.zeros((), d.dtype), zero_row),
        (a_seq, diag, sup, d_t))

    # back substitution
    def bwd(carry, inp):
        cp_i, dp_i = inp
        v = dp_i - cp_i * carry
        return v, v

    _, v_rev = jax.lax.scan(bwd, zero_row, (cp[::-1], dp[::-1]))
    Mint = jnp.moveaxis(v_rev[::-1], 0, -1)            # [..., n] = M_1..M_{m-2}

    M0 = ((h0 + h1) * Mint[..., 0] - h0 * Mint[..., 1]) / h1
    Mm1 = ((hm3 + hm2) * Mint[..., -1] - hm2 * Mint[..., -2]) / hm3
    return jnp.concatenate(
        [M0[..., None], Mint, Mm1[..., None]], axis=-1)


def spline_eval(x, y, M, q):
    """Evaluate the M-form cubic spline at queries q (extrapolates ends).

    x: [m]; y, M: [..., m]; q: [qn].  Returns [..., qn].
    """
    x = jnp.asarray(x)
    i = jnp.clip(jnp.searchsorted(x, q, side="right") - 1, 0, x.shape[0] - 2)
    h = x[i + 1] - x[i]
    A = (x[i + 1] - q) / h
    B = (q - x[i]) / h
    yi = y[..., i]
    yi1 = y[..., i + 1]
    Mi = M[..., i]
    Mi1 = M[..., i + 1]
    return (A * yi + B * yi1
            + ((A ** 3 - A) * Mi + (B ** 3 - B) * Mi1) * (h * h) / 6.0)


def notaknot_interp(x, y, q):
    """interp1d(kind=3, fill_value='extrapolate') equivalent."""
    M = notaknot_M(x, y)
    return spline_eval(x, jnp.asarray(y), M, q)


def cubic4_eval(x4, y4, q, mask=None):
    """Exact cubic through 4 points, batched — the m<4 synthetic-anchor path.

    The reference pads runs with fewer than `min_interp_size=4` anchors with
    synthetic left anchors so interp1d(kind=3) is applicable
    (functions.py:366-371, misc.py:14); with exactly 4 anchors the not-a-knot
    spline IS the unique interpolating cubic.

    x4: [..., 4]; y4: [..., 4]; q: [..., qn].  Returns [..., qn].

    Direct Lagrange evaluation: l_j(q) = prod_{m != j} (q - x_m)/(x_j - x_m).
    The synthetic-anchor node sets are extremely clustered ([0, s, s+1, s+2]
    with s up to ~4000 grid slots), where a monomial/Vandermonde solve is
    catastrophically ill-conditioned in f32 (measured ~1e2 relative error);
    the Lagrange ratios stay O(1) for queries near the cluster.
    """
    x4 = jnp.asarray(x4)
    y4 = jnp.asarray(y4)
    # normalize by the cluster spacing to keep products mid-range
    x1 = x4[..., 1:2]
    scale = jnp.maximum(jnp.abs(x4[..., 3:4] - x4[..., 1:2]), 1e-30)
    xn = (x4 - x1) / scale                             # [..., 4]
    qn = (q - x1) / scale                              # [..., qn]
    out = jnp.zeros(jnp.broadcast_shapes(qn.shape, y4[..., :1].shape),
                    y4.dtype)
    for j in range(4):
        num = jnp.ones_like(qn)
        den = jnp.ones_like(x4[..., 0:1])
        for m in range(4):
            if m == j:
                continue
            num = num * (qn - xn[..., m:m + 1])
            den = den * (xn[..., j:j + 1] - xn[..., m:m + 1])
        out = out + y4[..., j:j + 1] * (num / den)
    return out


def notaknot_interp_uniform(yv, step: int, length: int):
    """Not-a-knot cubic spline through uniformly spaced anchors, evaluated
    at every integer sample 0..length-1 (extrapolating past the last
    anchor with the end cubic) — the DC-track interpolation (reference
    functions.py:340, interp1d kind=3 over the analysis grid).

    Mathematically identical to ``notaknot_interp(arange(n)*step, yv, q)``
    but TPU-shaped: with uniform spacing the not-a-knot end conditions
    decouple (M_1 = d_1/(6h), M_{n-2} = d_{n-2}/(6h)), the interior
    tridiagonal solves with vector-carry scans (scalar-carry scans crawl on
    TPU: measured 26.7 ms vs ~0.1 ms for this path), and the per-sample
    evaluation is a repeat-reshape (no gathers, no searchsorted).

    yv: [n] anchor values at samples 0, step, 2*step, ...; returns [length].
    """
    from eaqhm_tpu.models.tracks import _segmented_notaknot_M

    dtype = yv.dtype
    n = yv.shape[0]
    h = float(step)
    y2 = yv[:, None]
    in_run = jnp.ones((n, 1), bool)
    start = jnp.zeros((n, 1), jnp.int32)
    end = jnp.full((n, 1), n - 1, jnp.int32)
    M = _segmented_notaknot_M(y2, in_run, start, end, h, dtype)[:, 0]

    r = jnp.arange(step, dtype=dtype)[None, :]          # [1, step]
    B = r / h
    A = 1.0 - B
    ys = yv[:n - 1][:, None]
    ye = yv[1:][:, None]
    Ms = M[:n - 1][:, None]
    Me = M[1:][:, None]
    seg = (A * ys + B * ye
           + ((A ** 3 - A) * Ms + (B ** 3 - B) * Me) * (h * h) / 6.0)
    main = seg.reshape(-1)                               # [(n-1)*step]
    ncov = (n - 1) * step
    if length <= ncov:
        return main[:length]
    # tail: continue the last segment's cubic (extrapolation)
    rt = jnp.arange(step, step + (length - ncov), dtype=dtype)
    Bt = rt / h
    At = 1.0 - Bt
    tail = (At * yv[n - 2] + Bt * yv[n - 1]
            + ((At ** 3 - At) * M[n - 2]
               + (Bt ** 3 - Bt) * M[n - 1]) * (h * h) / 6.0)
    return jnp.concatenate([main, tail])
