"""Coarse-space correction B: the interface-eliminated global coarse problem.

Re-design of MCONTACT::MULTISCALE_1 / DOUBLE_M_1 (MCONTACT.h:1672-2341), the
correction used by the BLOCK and TORSION examples (muscSett bit 1): a global
coarse problem on all bodies' level-``dole`` DOFs,

  globCoup_1 = blockdiag(A_c)  -  1/2 * sum_(ts,side) U_s (S_s) U_s^T
                                 -  1/2 * sum U_self C_cross U_mate^T

with U_v = (X_v F_v)^T the full->coarse projection (F_v = product of
realProl down to level dole), solved each ADMM iteration for

  globForc = globForc_1 + sum globTran_1 lam  -  sum globTran_D_1 u

and prolongated back as u_v += F_v sol_v (accuProl, MCONTACT.h:864-872).

Deviations from the reference (documented):
  * accuProl is realized as the product of realProl operators (intermediate
    Dirichlet selectors included) — identical whenever constrained fine DOFs
    have constrained parents, which holds for the face-aligned constraints of
    every example;
  * the coarse solve is a padded dense Cholesky on device (the reference uses
    sparse LDLT below 120k DOF); the DOUBLE_M_1 block-diagonal multigrid
    fallback for huge coarse spaces is not yet implemented.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np
import scipy.linalg
import scipy.sparse as sp

from ..fem.constraints import ConstrainedSystem
from ..sparse.ell import Ell, ell_from_csr, stack_ells, to_device
from .operators import RegionOps


class CoarseCorrection(NamedTuple):
    """Device-side coarse correction (consumed inside the jitted loop).

    The solve is an explicit-inverse apply plus one step of f64 iterative
    refinement (two dense matvecs — TPU-friendly; sequential triangular
    substitution is latency-bound)."""

    inv: jnp.ndarray         # (Nc, Nc) inverse of globCoup_1
    mat: jnp.ndarray         # (Nc, Nc) globCoup_1 itself (refinement)
    forc0: jnp.ndarray       # (Nc,) constant part of the coarse rhs
    tranD: Ell               # (Nc, B*n_pad): maps stacked u -> coarse rhs (-)
    accu: Ell                # (B*n_pad, Nc): coarse solution -> stacked du
    tranL: tuple[Ell, ...]   # per region group: (R,2,Nc,k) maps lam (+)


def _coarse_restriction(sysm: ConstrainedSystem, dole: int) -> sp.csr_matrix:
    """F_v: level-dole reduced space -> finest reduced space."""
    L = sysm.n_levels - 1
    F = sp.identity(sysm.cons_stif[L].shape[0], format="csr")
    for l in range(L - 1, dole - 1, -1):
        F = (F @ sysm.real_prol[l]).tocsr()
    return F


def build_coarse_correction(
    systems: Sequence[ConstrainedSystem],
    regions: Sequence[RegionOps],
    dole: Sequence[int],
    n_pad: int,
    group_region_idx: Sequence[Sequence[int]],
    m_pads: Sequence[int],
) -> CoarseCorrection:
    B = len(systems)
    F = [_coarse_restriction(s, dole[v]) for v, s in enumerate(systems)]
    nc = [F[v].shape[1] for v in range(B)]
    base = np.concatenate([[0], np.cumsum(nc)])
    Nc = int(base[-1])
    XF = [(systems[v].expand @ F[v]).tocsr() for v in range(B)]  # (3N x nc)

    # ---- globCoup_1 (MCONTACT.h:1674-1856)
    G = np.zeros((Nc, Nc))
    for v in range(B):
        A_c = (F[v].T @ systems[v].cons_stif[-1] @ F[v]).toarray()
        G[base[v] : base[v + 1], base[v] : base[v + 1]] += A_c
    for r in regions:
        for s in (0, 1):
            b_self = r.region.bodies[s]
            b_mate = r.region.bodies[1 - s]
            U_self = XF[b_self]
            U_mate = XF[b_mate]
            S = r.sides[s].self_mass_rot
            C = r.sides[s].cross_mass
            G[base[b_self] : base[b_self + 1], base[b_self] : base[b_self + 1]] += (
                -0.5 * (U_self.T @ S @ U_self).toarray()
            )
            G[base[b_self] : base[b_self + 1], base[b_mate] : base[b_mate + 1]] += (
                -0.5 * (U_self.T @ C @ U_mate).toarray()
            )
    # LU, not Cholesky: the reference factorizes with LDLT (MCONTACT.h:1858),
    # and with non-matching coarse interpolations across a curved interface
    # globCoup_1 can be (slightly) indefinite.
    lu = scipy.linalg.lu_factor(G)
    G_inv = scipy.linalg.lu_solve(lu, np.eye(Nc))

    # ---- globTran_D_1 (MCONTACT.h:1868-2055), acting on stacked reduced u
    rows_td = []
    for v in range(B):
        # part a: block row v: F^T A_L, cols in body v's slot
        blocks = [sp.csr_matrix((nc[v], n_pad)) for _ in range(B)]
        part_a = (F[v].T @ systems[v].cons_stif[-1]).tocsr()
        part_a.resize((nc[v], n_pad))
        blocks[v] = part_a
        rows_td.append(blocks)
    for r in regions:
        for s in (0, 1):
            b_self = r.region.bodies[s]
            b_mate = r.region.bodies[1 - s]
            S = r.sides[s].self_mass_rot
            C = r.sides[s].cross_mass
            X_self, X_mate = systems[b_self].expand, systems[b_mate].expand
            add_self = (-0.5 * (F[b_self].T @ (X_self.T @ S @ X_self))).tocsr()
            add_self.resize((nc[b_self], n_pad))
            rows_td[b_self][b_self] = (rows_td[b_self][b_self] + add_self).tocsr()
            add_mate = (-0.5 * (F[b_mate].T @ (X_mate.T @ C.T @ X_self))).tocsr()
            add_mate.resize((nc[b_mate], n_pad))
            rows_td[b_mate][b_self] = (rows_td[b_mate][b_self] + add_mate).tocsr()
    tranD = sp.vstack(
        [sp.hstack(rows_td[v], format="csr") for v in range(B)], format="csr"
    )

    # ---- globForc_1 (MCONTACT.h:2057-2122)
    forc0 = np.zeros(Nc)
    for v in range(B):
        forc0[base[v] : base[v + 1]] = F[v].T @ systems[v].cons_forc
    for r in regions:
        ip = r.region.ip
        w = ip.weight
        nrm = ip.basis[:, 0, :]
        for s in (0, 1):
            b_self = r.region.bodies[s]
            sgn = 0.5 if s == 0 else -0.5
            # full-space gap force: sgn * w * rho_n * N^T n^T g  (normal only)
            gf = np.zeros(3 * (systems[b_self].expand.shape[0] // 3))
            contrib = (
                sgn
                * r.region.pena_n
                * (w * ip.gap)[:, None, None]
                * ip.shape[s][:, :, None]
                * nrm[:, None, :]
            )
            dofs = 3 * ip.nodes[s][:, :, None] + np.arange(3)
            np.add.at(gf, dofs.ravel(), contrib.ravel())
            forc0[base[b_self] : base[b_self + 1]] += XF[b_self].T @ gf

    # ---- globTran_1 (MCONTACT.h:2124-2299), per region group stacked
    tranL_groups = []
    for g_i, idx in enumerate(group_region_idx):
        mats = []
        for ri in idx:
            r = regions[ri]
            for s in (0, 1):
                b_self = r.region.bodies[s]
                b_mate = r.region.bodies[1 - s]
                mdof = r.sides[s].inte_mass.shape[0]
                T_self = (-0.5 * (XF[b_self].T @ r.sides[s].syst_tran)).tocsr()
                T_mate = (0.5 * (XF[b_mate].T @ r.sides[s].cross_tran)).tocsr()
                M = sp.lil_matrix((Nc, mdof))
                M[base[b_self] : base[b_self + 1]] = T_self
                M[base[b_mate] : base[b_mate + 1]] += T_mate
                mats.append(M.tocsr())
        e = stack_ells(mats, n_rows=Nc, n_cols=m_pads[g_i])
        R = len(idx)
        tranL_groups.append(
            Ell(
                vals=jnp.asarray(e.vals.reshape(R, 2, *e.vals.shape[1:])),
                cols=jnp.asarray(e.cols.reshape(R, 2, *e.cols.shape[1:])),
                n_cols=e.n_cols,
            )
        )

    # ---- accuProl: stacked du = accu @ sol
    accu_blocks = []
    for v in range(B):
        Fv = F[v].tocsr().copy()
        Fv.resize((n_pad, nc[v]))
        accu_blocks.append(Fv)
    accu = sp.block_diag(accu_blocks, format="csr")  # (B*n_pad, Nc)

    return CoarseCorrection(
        inv=jnp.asarray(G_inv),
        mat=jnp.asarray(G),
        forc0=jnp.asarray(forc0),
        tranD=to_device(ell_from_csr(tranD)),
        accu=to_device(ell_from_csr(accu)),
        tranL=tuple(tranL_groups),
    )
