"""Pallas TPU kernel: batched Hermitian-positive-definite Cholesky solve.

STATUS (round-4 on-chip sweep, tools/out/solve_sweep.json, 2026-08-21):
NOT the production solver.  At the real SA19 production tiers this kernel
measured 365 / 244 / 90 ms per adaptation-equivalent vs 294 / 155 / 70 ms
for the best XLA path (block-inverse at M=130, batched Cholesky at
M>=160), with 2-12 minute Pallas compile times per shape.  The loss is
structural: with G=4 matrices per grid step the panel factorization's
column loop (M/nb blocks x nb unrolled columns) is sublane-serial and the
MXU trailing updates are small (<= [G*nb, nb] x [nb, M]), so the kernel is
issue-bound while XLA's alternatives amortize over bigger fused GEMMs.
Kept as the reference Pallas implementation + for the accuracy column it
contributes (rel err ~2e-6, matching XLA Cholesky).  Production selection
lives in ops.solver.default_solve_method.

The eaQHM hot path solves thousands of small (M ~ 100-260) complex HPD
normal-equation systems per adaptation (the reference uses numpy.linalg.inv,
functions.py:465,530).  XLA's batched Cholesky + triangular solves are
latency-bound on TPU (~47 us/matrix regardless of batch size: the panel
loop serializes per matrix).  This kernel factorizes G matrices per grid
step entirely in VMEM, vectorizing every algorithm step across the G batch:

- planar complex storage (separate real/imag f32 planes — Mosaic has no
  native complex type);
- right-looking blocked factorization: each nb-column panel is copied to a
  compact [G, M, nb] scratch, factored column-by-column with *static* lane
  indices (the column loop is unrolled, so only the block offset is
  dynamic), then one MXU ``dot_general`` rank-nb update hits the trailing
  matrix;
- the Hermitian dual-read trick: the conjugated row needed for each rank-1
  panel update is read as a dynamic *sublane* slice of the panel — no
  transposes anywhere in the kernel;
- blocked forward/backward substitution for one right-hand side, with the
  per-block triangular solves unrolled over static indices and the
  cross-block updates done as MXU matvecs.

Padding contract (caller, see `chol_solve`): matrices are equilibrated to
unit diagonal and identity-padded to M ≡ 0 (mod nb), so padded columns
factor to 1 and never pollute live entries.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 32          # panel width (columns per MXU trailing update)
DEFAULT_G = 4    # matrices factored per grid step (VMEM-bound)
_F32 = jnp.float32
_HI = jax.lax.Precision.HIGHEST


def _bdot(a, b, dims, G: int):
    """Batched 2D dot over the leading G dim (unrolled: Mosaic wants 2D
    MXU contractions).  a: [G, ...], b: [G, ...]; dims: 2D dot_general
    contracting dims for the per-item arrays."""
    outs = []
    for gg in range(G):
        outs.append(jax.lax.dot_general(
            a[gg], b[gg], (dims, ((), ())),
            preferred_element_type=_F32, precision=_HI))
    return jnp.stack(outs, axis=0)


def _chol_solve_kernel(rr_ref, ri_ref, br_ref, bi_ref,
                       xr_ref, xi_ref, tr, ti, pr, pi, yr, yi,
                       nb: int):
    """One grid step: factor G matrices in VMEM, solve one rhs each.

    rr/ri: [G, M, M] equilibrated HPD input (real/imag planes);
    br/bi: [G, M, 1] rhs; xr/xi: [G, M, 1] outputs.
    Scratch: tr/ti [G, M, M] (becomes L, columns on lanes);
    pr/pi [G, M, nb] compact panel; yr/yi [G, M, 1] rhs workspace.
    """
    G, M, _ = tr.shape
    n_blocks = M // nb

    tr[:] = rr_ref[:]
    ti[:] = ri_ref[:]

    lane3 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, M), 2)   # [1,1,M]
    sub3 = jax.lax.broadcasted_iota(jnp.int32, (1, M, 1), 1)    # [1,M,1]
    panlane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nb), 2)

    # ---------------------------------------------------------- factor
    # the block loops are unrolled in Python so every lane-dim slice is
    # static (Mosaic requires dynamic lane offsets to be 128-aligned)
    for b in range(n_blocks):
        jb = b * nb
        # copy panel columns jb..jb+nb into compact scratch
        pr[:] = tr[:, :, jb:jb + nb]
        pi[:] = ti[:, :, jb:jb + nb]

        for c in range(nb):            # static unroll: lane indices static
            j = jb + c
            # row j of the panel = conj of the needed L entries (Hermitian)
            prow_r = pr[:, j:j + 1, :]                           # [G,1,nb]
            prow_i = pi[:, j:j + 1, :]
            d = prow_r[:, :, c:c + 1]                            # [G,1,1]
            rd = jax.lax.rsqrt(jnp.maximum(d, 1e-30))
            # factored column c (incl. diagonal sqrt(d)); rows < j zeroed
            colr = pr[:, :, c:c + 1]                             # [G,M,1]
            coli = pi[:, :, c:c + 1]
            keep = sub3 >= j
            lcol_r = jnp.where(keep, colr * rd, 0.0)
            lcol_i = jnp.where(keep, coli * rd, 0.0)
            pr[:, :, c:c + 1] = lcol_r
            pi[:, :, c:c + 1] = lcol_i
            # rank-1 update of the remaining panel columns:
            #   P[i, c'] -= L[i, j] * conj(L[jb+c', j]),  c' > c
            # conj(L[k, j]) = prow[k] * rd  (Hermitian row read)
            strict = sub3 > j
            ur = jnp.where(panlane > c, prow_r * rd, 0.0)        # [G,1,nb]
            ui = jnp.where(panlane > c, prow_i * rd, 0.0)
            lr_u = jnp.where(strict, lcol_r, 0.0)
            li_u = jnp.where(strict, lcol_i, 0.0)
            pr[:] = pr[:] - (lr_u * ur - li_u * ui)
            pi[:] = pi[:] - (lr_u * ui + li_u * ur)

        # write factored panel back
        tr[:, :, jb:jb + nb] = pr[:]
        ti[:, :, jb:jb + nb] = pi[:]

        # MXU trailing update: T[:, :, k >= jb+nb] -= Lp @ Lp^H
        # (each dot is subtracted in place immediately: keeping all four
        # [G,M,M] products live overflows VMEM)
        if b + 1 < n_blocks:
            lr = pr[:]
            li = pi[:]
            live = lane3 >= jb + nb
            dd = ((1,), (1,))
            tr[:] = tr[:] - jnp.where(live, _bdot(lr, lr, dd, G), 0.0)
            tr[:] = tr[:] - jnp.where(live, _bdot(li, li, dd, G), 0.0)
            ti[:] = ti[:] - jnp.where(live, _bdot(li, lr, dd, G), 0.0)
            ti[:] = ti[:] + jnp.where(live, _bdot(lr, li, dd, G), 0.0)

    # ------------------------------------------- forward: L y = b
    yr[:] = br_ref[:]
    yi[:] = bi_ref[:]
    pansub = jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)

    for b in range(n_blocks):
        jb = b * nb
        Lr = tr[:, :, jb:jb + nb]                                # [G,M,nb]
        Li = ti[:, :, jb:jb + nb]
        Dr = tr[:, jb:jb + nb, jb:jb + nb]                       # [G,nb,nb]
        Di = ti[:, jb:jb + nb, jb:jb + nb]
        zr = yr[:, jb:jb + nb, :]                                # [G,nb,1]
        zi = yi[:, jb:jb + nb, :]
        for c in range(nb):
            inv = 1.0 / Dr[:, c:c + 1, c:c + 1]                  # [G,1,1]
            zcr = zr[:, c:c + 1, :] * inv
            zci = zi[:, c:c + 1, :] * inv
            below = pansub > c
            dcr = jnp.where(below, Dr[:, :, c:c + 1], 0.0)       # [G,nb,1]
            dci = jnp.where(below, Di[:, :, c:c + 1], 0.0)
            zr = zr - (dcr * zcr - dci * zci)
            zi = zi - (dcr * zci + dci * zcr)
            zr = jnp.where(pansub == c, zcr, zr)
            zi = jnp.where(pansub == c, zci, zi)
        yr[:, jb:jb + nb, :] = zr
        yi[:, jb:jb + nb, :] = zi
        if b + 1 < n_blocks:
            # y[below blocks] -= L[below, blk] @ z
            mask = sub3 >= jb + nb
            sr = (_bdot(Lr, zr, ((1,), (0,)), G)
                  - _bdot(Li, zi, ((1,), (0,)), G))
            si = (_bdot(Lr, zi, ((1,), (0,)), G)
                  + _bdot(Li, zr, ((1,), (0,)), G))
            yr[:] = yr[:] - jnp.where(mask, sr, 0.0)
            yi[:] = yi[:] - jnp.where(mask, si, 0.0)

    # ------------------------------------------- backward: L^H x = y
    # x accumulates in the output refs (zero-initialized), block b from last
    # to first; cross-block term sum_k conj(L[k, j]) x[k] needs no row mask
    # because unsolved x entries are still zero.
    xr_ref[:] = jnp.zeros_like(xr_ref)
    xi_ref[:] = jnp.zeros_like(xi_ref)

    for b in range(n_blocks - 1, -1, -1):
        jb = b * nb
        Lr = tr[:, :, jb:jb + nb]
        Li = ti[:, :, jb:jb + nb]
        Dr = tr[:, jb:jb + nb, jb:jb + nb]
        Di = ti[:, jb:jb + nb, jb:jb + nb]
        xrv = xr_ref[:]
        xiv = xi_ref[:]
        # s = L_blk^H x  (contract rows): [G,nb,1]
        sr = (_bdot(Lr, xrv, ((0,), (0,)), G)
              + _bdot(Li, xiv, ((0,), (0,)), G))
        si = (_bdot(Lr, xiv, ((0,), (0,)), G)
              - _bdot(Li, xrv, ((0,), (0,)), G))
        zr = yr[:, jb:jb + nb, :] - sr                           # [G,nb,1]
        zi = yi[:, jb:jb + nb, :] - si
        wr = jnp.zeros_like(zr)
        wi = jnp.zeros_like(zi)
        for cc in range(nb):
            c = nb - 1 - cc
            # inner tail sum: conj(D[c' > c, c]) * w[c']
            below = pansub > c
            dcr = jnp.where(below, Dr[:, :, c:c + 1], 0.0)
            dci = jnp.where(below, Di[:, :, c:c + 1], 0.0)
            tr_s = jnp.sum(dcr * wr + dci * wi, axis=1, keepdims=True)
            ti_s = jnp.sum(dcr * wi - dci * wr, axis=1, keepdims=True)
            inv = 1.0 / Dr[:, c:c + 1, c:c + 1]
            xcr = (zr[:, c:c + 1, :] - tr_s) * inv
            xci = (zi[:, c:c + 1, :] - ti_s) * inv
            wr = jnp.where(pansub == c, xcr, wr)
            wi = jnp.where(pansub == c, xci, wi)
        xr_ref[:, jb:jb + nb, :] = wr
        xi_ref[:, jb:jb + nb, :] = wi


@functools.partial(jax.jit, static_argnames=("g", "nb", "interpret"))
def chol_solve_planar(rr, ri, br, bi, g: int = DEFAULT_G, nb: int = NB,
                      interpret: bool = False):
    """Batched HPD solve, planar interface.

    rr/ri: [B, M, M] f32 real/imag planes of equilibrated HPD matrices
    (unit diagonal + identity padding); br/bi: [B, M] rhs planes.
    Returns (xr, xi): [B, M].  B is padded to a multiple of g and M to a
    multiple of nb internally (identity extension).
    """
    B, M, _ = rr.shape
    B0, M0 = B, M
    g = min(g, max(1, B))
    mpad = (-M) % nb
    if mpad:
        Mp = M + mpad
        eyetail = jnp.concatenate(
            [jnp.zeros((mpad, M), _F32),
             jnp.eye(mpad, dtype=_F32)], axis=1)                 # [mpad, Mp]
        rr = jnp.concatenate([
            jnp.concatenate([rr, jnp.zeros((B, M, mpad), _F32)], axis=2),
            jnp.broadcast_to(eyetail, (B, mpad, Mp))], axis=1)
        ri = jnp.pad(ri, ((0, 0), (0, mpad), (0, mpad)))
        br = jnp.pad(br, ((0, 0), (0, mpad)))
        bi = jnp.pad(bi, ((0, 0), (0, mpad)))
        M = Mp
    bpad = (-B) % g
    if bpad:
        eye = jnp.broadcast_to(jnp.eye(M, dtype=_F32), (bpad, M, M))
        rr = jnp.concatenate([rr, eye], axis=0)
        ri = jnp.concatenate([ri, jnp.zeros((bpad, M, M), _F32)], axis=0)
        br = jnp.concatenate([br, jnp.zeros((bpad, M), _F32)], axis=0)
        bi = jnp.concatenate([bi, jnp.zeros((bpad, M), _F32)], axis=0)
    Bp = B + bpad

    grid = (Bp // g,)
    mat_spec = pl.BlockSpec((g, M, M), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((g, M, 1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_chol_solve_kernel, nb=nb)
    xr, xi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[mat_spec, mat_spec, vec_spec, vec_spec],
        out_specs=(vec_spec, vec_spec),
        out_shape=(jax.ShapeDtypeStruct((Bp, M, 1), _F32),
                   jax.ShapeDtypeStruct((Bp, M, 1), _F32)),
        scratch_shapes=[
            pltpu.VMEM((g, M, M), _F32),
            pltpu.VMEM((g, M, M), _F32),
            pltpu.VMEM((g, M, nb), _F32),
            pltpu.VMEM((g, M, nb), _F32),
            pltpu.VMEM((g, M, 1), _F32),
            pltpu.VMEM((g, M, 1), _F32),
        ],
        interpret=interpret,
    )(rr, ri, br[..., None], bi[..., None])
    return xr[:B0, :M0, 0], xi[:B0, :M0, 0]


def chol_solve(R, rhs, g: int = DEFAULT_G, nb: int = NB,
               interpret: bool = False):
    """Complex convenience wrapper: solve R x = rhs for HPD R.

    R: [B, M, M] complex64 (equilibrated + identity-padded);
    rhs: [B, M] complex64.  Returns x: [B, M] complex64.
    """
    xr, xi = chol_solve_planar(
        jnp.real(R).astype(_F32), jnp.imag(R).astype(_F32),
        jnp.real(rhs).astype(_F32), jnp.imag(rhs).astype(_F32),
        g=g, nb=nb, interpret=interpret)
    return jax.lax.complex(xr, xi)
