"""Pallas TPU kernel for the PlaneDia SpMV (sparse/dia.py).

Why a kernel: the jnp PlaneDia path re-reads the gathered value planes from
HBM for every offset (traffic ~= full DIA), so the finest-level SpMV runs at
single-digit percent of HBM peak (artifacts/roofline_small.json: 5.7%).
After plane dedup the WHOLE value table (C classes x D offsets x P plane
dofs ~ 17 MB at the 8.8M-DOF scale) fits in v5e VMEM, so the kernel keeps it
resident across the entire grid and sweeps z-plane tiles reading only x and
writing y:

  traffic ~= vals once + 1.5x + y   instead of   ~nz/C * vals  (8-30x less)

Grid: (B bodies, ceil(nz/K) z-tiles).  x is passed FLAT per body with a
2-plane lead pad; each step reads two adjacent K*P-element blocks (the
stencil window: offsets span < 2 planes), class ids arrive via scalar
prefetch, and the D-offset loop is unrolled with static in-window slices.

Reference provenance: TPU execution of the MGPIS operator applications
(MGPIS.h:55-128) for structured-grid bodies.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the resident value table (v5e has 128 MB VMEM; leave room
# for the x window, y tile, and pipelining buffers)
VALS_VMEM_MAX = 64 * 1024 * 1024
TILE_PLANES = 8


def _kernel(offsets, K, P, kz_ref, x0_ref, x1_ref, vals_ref, y_ref):
    b = pl.program_id(0)
    i = pl.program_id(1)
    win = jnp.concatenate([x0_ref[0], x1_ref[0]], axis=0)   # (2*K*P,)
    for j in range(K):
        cls = kz_ref[b, i * K + j]
        vj = vals_ref[cls]                                  # (D, P) in VMEM
        acc = jnp.zeros((P,), vals_ref.dtype)
        base = (2 + j) * P
        for d, off in enumerate(offsets):
            acc = acc + vj[d] * jax.lax.slice_in_dim(
                win, base + off, base + off + P, axis=0
            )
        y_ref[0, j * P:(j + 1) * P] = acc


def plane_dia_mv_pallas(pd, x: jnp.ndarray, interpret: bool = False):
    """y = pd @ x with x of shape (B, n_rows); returns (B, n_rows).

    Requires max|offset| < 2*P (true for hex8 stencils and nested-grid
    transfer stencils: one node plane + one row + a few dofs).
    """
    B, nz = pd.kz.shape
    P = pd.plane
    n = pd.n_rows
    na = nz * P
    offsets = pd.offsets
    K = TILE_PLANES
    nzt = -(-nz // K)
    nz_pad = nzt * K

    xa = x[..., :na].astype(pd.dtype)
    # flat per-body padding: 2 lead planes (window margin) + tail planes so
    # the (i+1)-th K*P block read never leaves the array:
    # total planes = nz_pad + K = 2 + nz + tail
    tail_planes = nz_pad + K - 2 - nz
    xp = jnp.pad(xa, ((0, 0), (2 * P, tail_planes * P)))
    kzp = jnp.pad(pd.kz, ((0, 0), (0, nz_pad - nz)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nzt),
        in_specs=[
            pl.BlockSpec((1, K * P), lambda b, i, kz: (b, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K * P), lambda b, i, kz: (b, i + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # whole (C, D, P) table
        ],
        out_specs=pl.BlockSpec((1, K * P), lambda b, i, kz: (b, i),
                               memory_space=pltpu.VMEM),
    )
    y = pl.pallas_call(
        functools.partial(_kernel, offsets, K, P),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nz_pad * P), pd.dtype),
        interpret=interpret,
    )(kzp, xp, xp, pd.vals)
    out_dtype = jnp.promote_types(pd.dtype, x.dtype)
    y = y[:, :na].astype(out_dtype)
    if na == n:
        return y
    tail = (
        x[..., na:].astype(out_dtype)
        if pd.tail_identity
        else jnp.zeros(x.shape[:-1] + (n - na,), out_dtype)
    )
    return jnp.concatenate([y, tail], axis=-1)


def pallas_eligible(pd, x: jnp.ndarray) -> bool:
    """The kernel covers the solver's standard call shape: one batch axis
    matching the matrix batch, offsets within the 2-plane window, and a
    value table that fits the VMEM residency budget."""
    return (
        x.ndim == 2
        and x.shape[0] == pd.kz.shape[0]
        and max(abs(o) for o in pd.offsets) < 2 * pd.plane
        and pd.vals.nbytes <= VALS_VMEM_MAX
    )
