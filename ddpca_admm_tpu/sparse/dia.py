"""DIA (diagonal) sparse format: the gather-free SpMV for structured grids.

A hex8 stiffness on a UNIFORM Cartesian grid in coordinate-lexicographic
node order (z,y,x major, 3 dof minor) is a pure stencil: every row's
couplings sit at a fixed set of ``col - row`` offsets (measured: 99 distinct
offsets for 8M nnz — see scripts/roofline.py provenance).  Storing the
matrix as one value-vector per offset turns SpMV into

    y = sum_d  vals[d] * shift(x, offset_d)

— static slices of a padded x, no gather at all, so the kernel runs at the
HBM roofline on TPU where XLA's general gather scalarizes (~10 ns/element,
sparse/bell.py).  This is the 8.8M-DOF BLOCK path: BlockEll tiles at that
scale would need ~50 GB while DIA stores ~1.2x nnz.

``offsets`` are static (pytree aux data) so the shifts compile to
``lax.slice``; vals rows are aligned so vals[..., d, i] = A[i, i + off_d]
(zero where out of range).  Batched over a leading body axis like Ell.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


@jax.tree_util.register_pytree_node_class
class Dia:
    """Batched DIA matrix; vals (..., D, n), offsets static tuple."""

    def __init__(self, vals, offsets: tuple[int, ...], n_cols: int):
        self.vals = vals
        self.offsets = tuple(int(o) for o in offsets)
        self.n_cols = int(n_cols)

    def tree_flatten(self):
        return (self.vals,), (self.offsets, self.n_cols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1])

    @property
    def n_rows(self) -> int:
        return self.vals.shape[-1]

    @property
    def dtype(self):
        return self.vals.dtype

    def mv(self, x: jnp.ndarray) -> jnp.ndarray:
        """y = A @ x; batch axes broadcast against the matrix's batch axes.
        Square case (n_rows == n_cols) with per-offset aligned values."""
        batch = jnp.broadcast_shapes(self.vals.shape[:-2], x.shape[:-1])
        n = self.n_rows
        xb = jnp.broadcast_to(x, batch + (self.n_cols,))
        vals = jnp.broadcast_to(self.vals, batch + self.vals.shape[-2:])
        lo = min(self.offsets + (0,))
        hi = max(self.offsets + (0,))
        pad = [(0, 0)] * len(batch) + [(-lo, hi)]
        xp = jnp.pad(xb, pad)
        y = jnp.zeros(batch + (n,), jnp.promote_types(self.dtype, x.dtype))
        for d, off in enumerate(self.offsets):
            start = off - lo
            win = jax.lax.slice_in_dim(xp, start, start + n, axis=-1)
            y = y + vals[..., d, :] * win
        return y

    def nbytes(self) -> int:
        return self.vals.nbytes


def dia_offsets(mats: Sequence[sp.spmatrix]) -> np.ndarray:
    """Union of col-row offsets over a batch of square matrices."""
    offs = [np.zeros(0, np.int64)]
    for m in mats:
        c = m.tocoo()
        offs.append(np.unique(c.col.astype(np.int64) - c.row))
    return np.unique(np.concatenate(offs))


def dia_from_csr_list(
    mats: Sequence[sp.spmatrix],
    n_rows: int | None = None,
    dtype=np.float32,
    offsets: np.ndarray | None = None,
    pad_identity: bool = True,
) -> Dia:
    """Stack square matrices as a batched Dia padded to ``n_rows`` (padded
    rows are zero everywhere except a unit diagonal so they stay decoupled
    identity, matching the hierarchy's padding convention)."""
    n = n_rows or max(m.shape[0] for m in mats)
    if offsets is None:
        offsets = dia_offsets(mats)
    if 0 not in offsets:
        offsets = np.sort(np.append(offsets, 0))
    offsets = np.asarray(offsets, np.int64)
    zero_slot = int(np.searchsorted(offsets, 0))
    B = len(mats)
    vals = np.zeros((B, offsets.size, n), dtype)
    for b, m in enumerate(mats):
        c = m.tocoo()
        k = np.searchsorted(offsets, c.col.astype(np.int64) - c.row)
        np.add.at(vals[b], (k, c.row), c.data.astype(dtype))
        if pad_identity:
            # unit diagonal on padded rows (hierarchy convention)
            vals[b, zero_slot, m.shape[0]:] = 1.0
    return Dia(jnp.asarray(vals), tuple(int(o) for o in offsets), n)
