"""Pallas TPU kernel for the PlaneDia SpMV (sparse/dia.py).

Why a kernel: the jnp PlaneDia path re-reads the gathered value planes from
HBM for every offset (traffic ~= full DIA), so the finest-level SpMV runs at
single-digit percent of HBM peak (artifacts/roofline_small.json: 5.7%).
After plane dedup the WHOLE value table (C classes x D offsets x P plane
dofs ~ 17 MB at the 8.8M-DOF scale) fits in v5e VMEM, so the kernel keeps it
resident across the entire grid and sweeps z-plane tiles reading only x and
writing y:

  traffic ~= vals once + 1.5x + y   instead of   ~nz/C * vals  (8-30x less)

Layout: x and y are (B, planes, P) with the LAST dim equal to the full
plane size (Mosaic's block rule: last two dims divisible by (8, 128) or
equal to the array dims).  Grid (B bodies, ceil(nz/K) z-tiles); each step
sees two adjacent K-plane blocks (the stencil window: offsets span < 2
planes), splits every diagonal offset into (plane shift s, intra-plane
shift r) and applies it as lane rotations + a masked select — Mosaic has no
unaligned lane concat, but ``tpu.roll`` handles any plane size.

Axon-relay/x64 gotchas baked in below (each crashed the remote Mosaic
compile helper with an opaque HTTP 500 until found):
  * every index map must return int32 — bare Python ints trace as i64
    under jax_enable_x64;
  * whole-array BlockSpecs (no block shape) synthesize DEFAULT index maps
    with i64 zeros — give every operand an explicit full-shape block with
    an i32 map instead;
  * PrefetchScalarGridSpec breaks under x64 for the same reason with no
    user-side override — the class ids travel as a plain SMEM operand;
  * pltpu.roll needs a non-negative int32 shift.

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
# for the x window, y tile, per-plane class stack, and pipelining buffers)
VALS_VMEM_MAX = 48 * 1024 * 1024
TILE_PLANES = 8


def _kernel(offsets, K, P, interpret, kz_ref, x0_ref, x1_ref, vals_ref,
            y_ref):
    b = pl.program_id(0)
    i = pl.program_id(1)
    win = jnp.concatenate([x0_ref[0], x1_ref[0]], axis=0)   # (2K, P)
    # per-plane class value slabs for this tile: (K, D, P)
    V = jnp.stack(
        [vals_ref[kz_ref[b, i * K + j]] for j in range(K)], axis=0
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (K, P), dimension=1)
    roll = jnp.roll if interpret else pltpu.roll
    acc = jnp.zeros((K, P), vals_ref.dtype)
    # group offsets by intra-plane shift r: a hex8 stencil has ~3x fewer
    # distinct r than offsets (plane shifts s=-1/0/1 share each r), and one
    # rotation of the FULL (2K, P) window serves every s — the rolls were
    # the compute bottleneck (2 per offset -> ~1 per 3 offsets)
    by_r: dict[int, list[tuple[int, int]]] = {}
    for d, off in enumerate(offsets):
        s, r = divmod(off, P)          # r in [0, P)
        by_r.setdefault(r, []).append((d, s))
    for r, group in by_r.items():
        RW = win if r == 0 else roll(win, jnp.int32(P - r), axis=1)
        for d, s in group:
            R0 = jax.lax.slice_in_dim(RW, 2 + s, 2 + s + K, axis=0)
            if r == 0:
                G = R0
            else:
                # two-piece shifted window: piece select per lane
                R1 = jax.lax.slice_in_dim(RW, 3 + s, 3 + s + K, axis=0)
                G = jnp.where(lane < P - r, R0, R1)
            acc = acc + V[:, d, :] * G
    y_ref[0] = acc


def plane_dia_mv_pallas(pd, x: jnp.ndarray, interpret: bool = False):
    """y = pd @ x with x of shape (B, n_rows); returns (B, n_rows).

    Requires max|offset| < 2*P (true for hex8 stencils and nested-grid
    transfer stencils: one node plane + one row + a few dofs).

    When the (C, D, P) value table exceeds the VMEM residency budget (the
    8.8M-DOF finest level: ~134 MB), the OFFSET axis is chunked: the same
    kernel runs once per <=``VALS_VMEM_MAX`` slice of the table and the
    partial products sum.  Traffic = table once + n_chunks*(1.5x + y) —
    still table-dominated, and no (B, nz, P)-per-offset HLO temps like the
    jnp fallback (the round-5 full-BLOCK OOM came from exactly those).
    """
    B, nz = pd.kz.shape
    P = pd.plane
    n = pd.n_rows
    na = nz * P
    K = TILE_PLANES
    nzt = -(-nz // K)
    nz_pad = nzt * K

    xa = x[..., :na].astype(pd.dtype).reshape(B, nz, P)
    # 2 lead pad planes (window margin) + tail planes so the (i+1)-th
    # K-plane block read never leaves the array: 2 + nz + tail = nz_pad + 2K
    xp = jnp.pad(xa, ((0, 0), (2, nz_pad + 2 * K - 2 - nz), (0, 0)))
    kzp = jnp.pad(pd.kz, ((0, 0), (0, nz_pad - nz)))
    C, D, _ = pd.vals.shape

    i32 = jnp.int32

    def one_chunk(offsets, vals):
        Dc = vals.shape[1]
        return pl.pallas_call(
            functools.partial(_kernel, offsets, K, P, interpret),
            grid=(B, nzt),
            in_specs=[
                pl.BlockSpec((B, nz_pad),
                             lambda b, i: (i32(0), i32(0)),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, K, P),
                             lambda b, i: (i32(b), i32(i), i32(0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K, P),
                             lambda b, i: (i32(b), i32(i) + i32(1), i32(0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, Dc, P),
                             lambda b, i: (i32(0), i32(0), i32(0)),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, K, P),
                                   lambda b, i: (i32(b), i32(i), i32(0)),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, nz_pad, P), pd.dtype),
            # the resident (C,Dc,P) table + the per-tile (K,Dc,P) class
            # stack exceed the default 16 MB scoped-vmem limit at scale;
            # v5e has 128 MB physical VMEM
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024
            ),
            interpret=interpret,
        )(kzp, xp, xp, vals)

    d_max = max(1, _chunk_offsets(pd))
    y = None
    for d0 in range(0, D, d_max):
        d1 = min(D, d0 + d_max)
        yc = one_chunk(pd.offsets[d0:d1], pd.vals[:, d0:d1, :])
        y = yc if y is None else y + yc
    out_dtype = jnp.promote_types(pd.dtype, x.dtype)
    y = y[:, :nz, :].reshape(B, na).astype(out_dtype)
    if na == n:
        return y
    tail = (
        x[..., na:].astype(out_dtype)
        if pd.tail_identity
        else jnp.zeros(x.shape[:-1] + (n - na,), out_dtype)
    )
    return jnp.concatenate([y, tail], axis=-1)


def _chunk_offsets(pd) -> int:
    """Offsets per kernel launch so one (C, Dc, P) table slice fits VMEM."""
    C, D, P = pd.vals.shape
    per_offset = C * P * pd.vals.dtype.itemsize
    return min(D, max(1, VALS_VMEM_MAX // max(per_offset, 1)))


def pallas_eligible(pd, x: jnp.ndarray) -> bool:
    """The kernel covers the solver's standard call shape: one batch axis
    matching the matrix batch, offsets within the 2-plane window, and at
    least one offset's (C, P) slab fitting the VMEM residency budget (the
    offset axis chunks, so the FULL table need not fit)."""
    C, D, P = pd.vals.shape
    return (
        x.ndim == 2
        and x.shape[0] == pd.kz.shape[0]
        and max(abs(o) for o in pd.offsets) < 2 * pd.plane
        and C * P * pd.vals.dtype.itemsize <= VALS_VMEM_MAX
    )
