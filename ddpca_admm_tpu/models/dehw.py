"""DEHW example: double-enveloping hourglass worm drive (flagship).

Round-1 reduced build of examples/DEHW.{h,cpp}: one worm thread-flank sector
meshed against one wheel tooth, both bodies carrying their *exact*
enveloping-theory flank surfaces (models/dehw_surf.py), assembled at a
meshing configuration, with Coulomb friction (mu = 0.2 driving / 0.08
self-locking, DEHW.h:1619) and contact-zone adaptive refinement
(ADAPTIVE_REFINE rounds with shrinking distCrit, DEHW.h:1505-1571).

The full 34-worm + 18-wheel-domain assembly, hub torque loading through
cylindrical nodeRota frames, and the four-tooth-pair engagement are round-2
work; this model exercises the flagship's distinctive machinery end to end:
exact curved tooth surfaces on both members, frictional mortar contact
between them, and AMR around the contact zone.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..admm.problem import build_problem
from ..contact.adaptive import adaptive_refine
from ..mesh.curveds import CurvedSurface
from ..mesh.hexmesh import HexMesh
from .dehw_surf import (
    DehwParams,
    singular_c2h,
    wheel_flank_grid,
    wheel_local,
    worm_flank_grid,
)
from .simple import Body, assemble_bodies, char_length, make_region, penalty


@dataclass
class DehwConfig:
    params: DehwParams = None
    n_u: int = 8            # flank grid: thread/face-width direction (base)
    n_v: int = 4            # profile direction (base)
    depth: int = 2          # radial extrusion layers
    glob_leve: int = 1      # uniform refinement rounds
    adap_rounds: int = 2    # ADAPTIVE_REFINE rounds
    dist_crit: tuple = (65.0e-6, 45.0e-6, 25.0e-6)   # DEHW.h:2229-2234
    fric: float = 0.2
    tape_coef: float = 0.025   # tangential/normal penalty ratio (DEHW.cpp:123-153)
    clearance: float = 10.0e-6  # assembly clearance after closing the patch
    # gap (the reference's full assembly meshes conjugately by construction;
    # the reduced worm window / wheel zone-1 patch pair is not exactly
    # conjugate, so the worm is translated along the approach direction
    # until the surfaces sit `clearance` apart)
    char_fact: float = 25.0
    e_worm: float = 210.0e9
    e_wheel: float = 110.0e9                          # DEHW.h:2248
    nu: float = 0.3

    def __post_init__(self):
        if self.params is None:
            self.params = DehwParams()


def _max_solved_box(ok: np.ndarray) -> tuple[slice, slice]:
    """Largest fully-solved axis-aligned sub-rectangle of a boolean grid
    (greedy shrink from the borders)."""
    i0, i1 = 0, ok.shape[0]
    j0, j1 = 0, ok.shape[1]
    while not ok[i0:i1, j0:j1].all():
        # drop the border row/col with the most failures
        sub = ok[i0:i1, j0:j1]
        scores = [
            (~sub[0]).sum(), (~sub[-1]).sum(), (~sub[:, 0]).sum(), (~sub[:, -1]).sum()
        ]
        k = int(np.argmax(scores))
        if k == 0:
            i0 += 1
        elif k == 1:
            i1 -= 1
        elif k == 2:
            j0 += 1
        else:
            j1 -= 1
        if i1 - i0 < 3 or j1 - j0 < 3:
            raise RuntimeError("no solvable wheel-flank patch found")
    return slice(i0, i1), slice(j0, j1)


def _extrude_to_mesh(surface: np.ndarray, inward: np.ndarray, depth: int,
                     thickness: float) -> HexMesh:
    """Extrude a structured surface patch (nu, nv, 3) along per-node inward
    directions into a (nu-1, nv-1, depth)-cell hex block."""
    nu, nv, _ = surface.shape
    m = HexMesh()
    layers = [
        surface + (thickness * k / depth) * inward for k in range(depth + 1)
    ]
    lat = np.stack(layers, axis=2)           # (nu, nv, depth+1, 3)
    ids = m.add_nodes(lat.reshape(-1, 3)).reshape(nu, nv, depth + 1)
    ci, cj, ck = np.meshgrid(
        np.arange(nu - 1), np.arange(nv - 1), np.arange(depth), indexing="ij"
    )
    ci, cj, ck = ci.ravel(), cj.ravel(), ck.ravel()
    corn = np.stack(
        [
            ids[ci, cj, ck], ids[ci + 1, cj, ck],
            ids[ci + 1, cj + 1, ck], ids[ci, cj + 1, ck],
            ids[ci, cj, ck + 1], ids[ci + 1, cj, ck + 1],
            ids[ci + 1, cj + 1, ck + 1], ids[ci, cj + 1, ck + 1],
        ],
        axis=-1,
    )
    # ensure positive orientation: flip extrusion if needed (majority sign —
    # a single-element check can mis-flip on strongly curved patches)
    from ..fem.elasticity import element_volumes

    vols = element_volumes(m.coords[corn])
    if np.median(vols) < 0:
        corn = corn[:, [4, 5, 6, 7, 0, 1, 2, 3]]
        vols = -vols
    if (vols <= 0).any():
        raise ValueError(
            f"extruded patch is tangled: {(vols <= 0).sum()}/{vols.size} "
            "inverted cells — reduce extrusion thickness or refine the base "
            "grid (n_u/n_v)"
        )
    m.add_elements(corn, level=0)
    return m


def worm_to_wheel_frame(p: DehwParams, pts: np.ndarray, thet_h: float) -> np.ndarray:
    """Assembly transform: worm-frame points -> wheel frame at worm rotation
    thet_h (the chain of WHEE_1H2R without the generating-plane part)."""
    thet_2 = p.i_2h * thet_h
    c, s = np.cos(thet_h), np.sin(thet_h)
    x = np.stack(
        [c * pts[..., 0] - s * pts[..., 1],
         s * pts[..., 0] + c * pts[..., 1],
         pts[..., 2]], axis=-1
    )
    x = np.stack([x[..., 0], x[..., 2], -x[..., 1]], axis=-1)
    x[..., 0] -= p.a_h2
    c, s = np.cos(thet_2), np.sin(thet_2)
    return np.stack(
        [c * x[..., 0] + s * x[..., 1],
         -s * x[..., 0] + c * x[..., 1],
         x[..., 2]], axis=-1
    )


def build_dehw_model(cfg: DehwConfig = DehwConfig()):
    p = cfg.params

    # ---- wheel flank patch (auto-shrunk to the solvable zone)
    scout, ok = wheel_flank_grid(p, 16, 10)
    su, sv = _max_solved_box(ok)
    us = np.linspace(-0.6 * p.widt_angl, 0.6 * p.widt_angl, 17)[su]
    vs = np.linspace(p.a_h2 - 0.5 * p.d_a[1], p.R_f[1], 11)[sv]
    n_u_w = cfg.n_u * (1 << cfg.glob_leve + cfg.adap_rounds)
    n_v_w = cfg.n_v * (1 << cfg.glob_leve + cfg.adap_rounds)
    whee_pts, ok2 = wheel_flank_grid(
        p, n_u_w, n_v_w, (us[0], us[-1]), (vs[0], vs[-1])
    )
    if not ok2.all():
        # fall back to nearest-solved fill (outer fringe only)
        from scipy.ndimage import distance_transform_edt

        idx = distance_transform_edt(
            ~ok2, return_distances=False, return_indices=True
        )
        whee_pts = whee_pts[idx[0], idx[1]]

    # ---- worm flank patch covering the same meshing window
    # choose the worm window around the contact with the selected wheel patch
    t1_mid = 0.5 * (p.worm_curv[0] + p.worm_curv[2])
    span = 0.35 * (p.worm_curv[2] - p.worm_curv[0])
    n_u_m = cfg.n_u * (1 << cfg.glob_leve + cfg.adap_rounds)
    n_v_m = cfg.n_v * (1 << cfg.glob_leve + cfg.adap_rounds)
    worm_pts = worm_flank_grid(
        p, n_u_m, n_v_m, (t1_mid - span, t1_mid + span)
    )

    # assembly configuration: worm rotated so its flank meshes the wheel
    # patch; thet_h such that the contact line sits mid-patch
    thet_h = t1_mid
    worm_pts_g = worm_to_wheel_frame(p, worm_pts, thet_h)

    # close the assembly gap: translate the worm along the mean approach
    # direction until the flank pair sits cfg.clearance apart (see
    # DehwConfig.clearance).  Without this the reduced patches float
    # ~200 um apart and the contact search finds no integral points.
    from scipy.spatial import cKDTree

    wf = whee_pts.reshape(-1, 3)
    tree = cKDTree(wf)
    for _ in range(8):
        wg = worm_pts_g.reshape(-1, 3)
        dist, jn = tree.query(wg)
        i0 = int(np.argmin(dist))
        gap = dist[i0] - cfg.clearance
        if abs(gap) <= 0.1 * cfg.clearance:
            break
        appr = wf[jn[i0]] - wg[i0]
        appr /= np.linalg.norm(appr)
        worm_pts_g = worm_pts_g + gap * appr

    # ---- bodies: extrude each flank inward
    # worm: inward = toward the worm axis (in wheel frame the worm axis is
    # the circle |r - wheel_axis| = a_h2... extrude along local surface
    # normal away from the mate instead (robust for both)
    def normals(grid):
        du = np.gradient(grid, axis=0)
        dv = np.gradient(grid, axis=1)
        n = np.cross(du, dv)
        return n / np.linalg.norm(n, axis=-1, keepdims=True)

    n_w = normals(worm_pts_g)
    n_h = normals(whee_pts)
    # orient: worm extrudes away from wheel surface centroid and vice versa
    c_whee = whee_pts.reshape(-1, 3).mean(0)
    c_worm = worm_pts_g.reshape(-1, 3).mean(0)
    sgn_w = np.sign(((c_worm - c_whee) * n_w.reshape(-1, 3).mean(0)).sum())
    sgn_h = -sgn_w
    thick = 1.2 * p.h_f[0]
    # base mesh at (n_u, n_v) cells; the surface grids keep the FULL
    # resolution (base << (glob_leve + adap_rounds)) so every later
    # bisection finds its exact on-surface midpoint (the reference's
    # totaDivi convention, CYLINDER.h:83)
    stride = 1 << (cfg.glob_leve + cfg.adap_rounds)
    worm_mesh = _extrude_to_mesh(
        worm_pts_g[::stride, ::stride], (sgn_w * n_w)[::stride, ::stride],
        cfg.depth, thick,
    )
    whee_mesh = _extrude_to_mesh(
        whee_pts[::stride, ::stride], (sgn_h * n_h)[::stride, ::stride],
        cfg.depth, thick,
    )

    worm_surf = CurvedSurface(worm_pts_g)
    whee_surf = CurvedSurface(whee_pts)

    # uniform refinement with exact-surface snapping
    for mesh, surf in ((worm_mesh, worm_surf), (whee_mesh, whee_surf)):
        for _ in range(cfg.glob_leve):
            leaves = mesh.leaf_elems()
            mesh.elem_patt[leaves] = 0
            plan = surf.plan_surf(mesh, leaves)
            mesh.refine(set(int(x) for x in leaves), plan_surf=plan)

    # adaptive refinement rounds around the contact zone (DEHW.h:1505-1571)
    def cart_curv(c):
        r2 = np.asarray(c)
        a, r = wheel_local(p, r2)
        return np.stack([a, r], axis=-1)

    from ..contact.search import surface_faces

    def flank_h(mesh, surf, q=50.0):
        """q-th percentile flank-face diagonal: the face-interpolation sag
        scale (q=50 over the whole flank; q=5 ~ the refined contact zone)."""
        faces = surface_faces(mesh, surf.contains)
        c = mesh.coords[faces]
        return float(
            np.percentile(np.linalg.norm(c[:, 2] - c[:, 0], axis=-1), q)
        )

    # shrinking-criterion AMR rounds (DEHW.h:1505-1571).  The reference's
    # full assembly reaches its distCrit = {65,45,25} um already at the
    # globLeve mesh; the reduced patches start coarser, so each round's
    # criterion is floored at the current face-interpolation sag scale —
    # the marking still converges to cfg.dist_crit as the mesh refines.
    for rd in range(cfg.adap_rounds):
        h = max(flank_h(worm_mesh, worm_surf), flank_h(whee_mesh, whee_surf))
        crit = max(cfg.dist_crit[rd], 0.35 * h)
        adaptive_refine(
            worm_mesh, whee_mesh, worm_surf, whee_surf,
            level=cfg.glob_leve + rd,
            dist_crit=crit,
            buck_divisions=(max(8, n_u_m // 2), max(4, n_v_m // 2)),
            cart_curv=cart_curv,
        )

    # ---- bodies, constraints, loads
    worm = Body(mesh=worm_mesh, e_mod=cfg.e_worm, nu=cfg.nu)
    whee = Body(mesh=whee_mesh, e_mod=cfg.e_wheel, nu=cfg.nu)
    # clamp the wheel back face (the extruded outer layer)
    back_w = whee_mesh.coords  # nodes on the last extrusion layer:
    # identify by distance from the flank surface
    d_whee = np.linalg.norm(
        whee_mesh.coords[:, None, :]
        - whee_pts.reshape(-1, 3)[None, :: max(1, whee_pts.size // 300), :],
        axis=-1,
    ).min(axis=1)
    for i in np.nonzero(d_whee > 0.8 * thick)[0]:
        for k in range(3):
            whee.cons_dofv[3 * i + k] = 0.0
    # press the worm toward the wheel: uniform traction on the worm back face
    d_worm = np.linalg.norm(
        worm_mesh.coords[:, None, :]
        - worm_pts_g.reshape(-1, 3)[None, :: max(1, worm_pts_g.size // 300), :],
        axis=-1,
    ).min(axis=1)
    back_nodes = np.nonzero(d_worm > 0.8 * thick)[0]
    press_dir = (c_whee - c_worm)
    press_dir /= np.linalg.norm(press_dir)
    # displacement-controlled engagement: prescribe the worm back face to
    # move toward the wheel by an interference delta (well-posed without hub
    # constraints; the full hub/torque loading via cylindrical nodeRota is
    # the round-2 assembly, DEHW.h:186-204)
    delta = 2.0e-5
    for i in back_nodes:
        for k in range(3):
            worm.cons_dofv[3 * int(i) + k] = float(delta * press_dir[k])

    bodies = [worm, whee]
    rho = penalty(cfg.char_fact, char_length(bodies), 210.0e9)
    regions = [
        make_region(
            bodies, 0, 1,
            worm_surf.contains, whee_surf.contains,
            lambda c: cart_curv(c),
            (max(8, n_u_m), max(4, n_v_m)),
            fric=cfg.fric, pena_n=rho, pena_f=cfg.tape_coef * rho,
            max_dist=max(
                3.0 * cfg.dist_crit[0],
                2.0 * cfg.clearance
                + 0.35 * max(flank_h(worm_mesh, worm_surf, q=5.0),
                             flank_h(whee_mesh, whee_surf, q=5.0)),
            ),
        )
    ]
    systems = assemble_bodies(bodies, regions)
    # the penalty factor is extreme at tooth scale (rho ~ 5e14): an f32
    # V-cycle preconditioner floors too early, so DEHW keeps it in f64
    import jax.numpy as jnp

    prob, meta = build_problem(systems, regions, precond_dtype=jnp.float64)
    return prob, meta, bodies, cfg
