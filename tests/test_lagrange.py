"""Dual-mortar LAGRANGE solver vs the contact patch test and ADMM
(cross-solver oracle, examples/BLOCK.cpp:96-101 strategy)."""

import numpy as np

from ddpca_admm_tpu.admm.lagrange import solve_lagrange
from ddpca_admm_tpu.models.simple import stacked_boxes_problem


def test_lagrange_stacked_boxes_patch():
    from ddpca_admm_tpu.models.simple import assemble_bodies

    prob, meta, bodies = stacked_boxes_problem(div_bot=3, div_top=2, levels=0)
    # LAGRANGE uses the penalty-free stiffness (MCONTACT.h:2850-2860)
    systems = assemble_bodies(bodies, meta.regions, include_penalty=False)
    res = solve_lagrange(
        systems,
        meta.regions,
        [b.mesh for b in bodies],
        use_device=False,
    )
    meta.systems = systems
    E, nu, p = 210.0e9, 0.3, -1.0e7
    for b, (body, sysm) in enumerate(zip(bodies, meta.systems)):
        full = sysm.full_displacement(res.u[b])
        uz = full[2::3]
        expect = p * body.mesh.coords[:, 2] / E
        scale = np.abs(expect).max()
        assert np.allclose(uz, expect, atol=5e-4 * scale), (
            f"body {b}: {np.abs(uz - expect).max() / scale}"
        )
    # all nodes in contact for the patch test -> every status active
    assert all((s == 1).all() for s in res.status)
    # multiplier normal component ~ contact force (weighted): nonpositive
    # pressure transmits p over the interface; lambda_n = dual-weighted
    lam_n = res.lagr[0][0::3]
    assert (lam_n < 0).all() or (lam_n > 0).all(), "uniform-sign multipliers"


def test_lagrange_restricted_gmg_preconditioner():
    """precType=1 (restricted-GMG BiCGSTAB, MCONTACT.h:3419-3562) must give
    the same patch-test solution as the Jacobi path on a refined mesh."""
    from ddpca_admm_tpu.models.simple import assemble_bodies

    prob, meta, bodies = stacked_boxes_problem(div_bot=3, div_top=2, levels=1)
    systems = assemble_bodies(bodies, meta.regions, include_penalty=False)
    res = solve_lagrange(
        systems,
        meta.regions,
        [b.mesh for b in bodies],
        use_device=True,
        prec_type=1,
    )
    E, p = 210.0e9, -1.0e7
    for b, (body, sysm) in enumerate(zip(bodies, systems)):
        full = sysm.full_displacement(res.u[b])
        uz = full[2::3]
        expect = p * body.mesh.coords[:, 2] / E
        scale = np.abs(expect).max()
        assert np.allclose(uz, expect, atol=5e-4 * scale), (
            f"body {b}: {np.abs(uz - expect).max() / scale}"
        )
