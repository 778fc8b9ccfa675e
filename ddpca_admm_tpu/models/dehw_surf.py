"""DEHWSURF: double-enveloping hourglass worm drive — exact tooth surfaces.

Re-design of examples/DEHWSURF.h (planar double-enveloping theory after
Zhou, "Modification principle and manufacturing technology for hourglass worm
drives"): the worm thread surface is the first envelope of an inclined
generating plane (tangent to the wheel base circle r_b2, inclination beta_c)
as the plane frame c and the worm frame 1 rotate with ratio i_1c; the wheel
tooth surface is the second envelope of the worm surface with ratio i_h2.

Implemented here (vectorized NumPy, Newton solvers batched over grid points):
  * BASIC_PARAMETER      -> DehwParams        (DEHWSURF.h:199-248)
  * FSME                 -> fsme              first+second meshing equations
                                              (DEHWSURF.h:270-291)
  * WORM_DC2R            -> worm_dc2r         generating-plane point -> worm
                                              frame (DEHWSURF.h:349-372)
  * WHEE_1H2R            -> whee_1h2r         worm point -> wheel frame at
                                              meshing config (DEHWSURF.h:374-401)
  * WORM_CURV_2_CART     -> worm_curv_to_cart batched Newton inversion of the
                                              (xi_11, xi_12) worm
                                              parameterization (DEHWSURF.h:593-673)
  * worm/wheel flank grids for CurvedSurface construction.

The reference's additional zones (former-contact, head/rear transition,
curvature-interference bookkeeping, flank relief) are round-2 work; the
working-flank grids produced here are exact surface points of both members.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

PI = np.pi


@dataclass
class DehwParams:
    """Inputs (DEHWSURF.h:162-197) + derived quantities (BASIC_PARAMETER)."""

    z: tuple[int, int] = (1, 40)
    a_h2: float = 0.25
    modi_tran: float = 0.0
    modi_cent: float = 0.0
    r_b2: float = 0.158 / 2.0
    beta_c: float = 11.0 * PI / 180.0
    z_k: float = 4.2
    d0: float = 0.082
    h_a_s: tuple[float, float] = (0.6, 0.7)
    h_f_s: tuple[float, float] = (0.95, 1.05)
    R_a1: float = 0.0385
    offs_R_a: float = 0.003
    whee_widt: float = 0.06
    inne_radi: tuple[float, float] = (0.018, 0.15)
    inpu_torq: float = 180.0

    def __post_init__(self):
        self.a_1c = self.a_h2 + self.modi_cent
        self.i_h2 = self.z[1] / self.z[0]
        self.i_1c = self.i_h2 + self.modi_tran
        self.i_c1 = 1.0 / self.i_1c
        self.i_2h = 1.0 / self.i_h2
        self.d = [self.d0, 2.0 * self.a_h2 - self.d0]
        self.m_t = self.d[1] / self.z[1]
        self.h_a = [self.h_a_s[0] * self.m_t, self.h_a_s[1] * self.m_t]
        self.h_f = [self.h_f_s[0] * self.m_t, self.h_f_s[1] * self.m_t]
        self.d_f = [self.d[i] - 2.0 * self.h_f[i] for i in range(2)]
        self.d_a = [self.d[i] + 2.0 * self.h_a[i] for i in range(2)]
        self.R_a = [self.a_h2 - 0.5 * self.d_a[0], self.R_a1]
        self.R_f = [self.a_h2 - 0.5 * self.d_f[i] for i in range(2)]
        self.R_t = [
            self.a_h2 - 0.5 * self.d[0] + 0.8 * self.m_t,
            self.a_h2 - 0.5 * self.d[1] + 0.9 * self.m_t,
        ]
        self.alph = np.arcsin(2.0 * self.r_b2 / self.d[1])
        self.lead_angl = np.arctan(self.d[1] / self.i_h2 / self.d[0])
        self.pitc_angl = 2.0 * PI / self.z[1]
        self.toot_thic_coef = (0.45, 0.55)
        self.half_angl = 0.5 * (self.z_k - self.toot_thic_coef[0]) * self.pitc_angl
        self.star_angl = self.alph - self.half_angl
        self.term_angl = self.star_angl + self.z_k * self.pitc_angl
        self.worm_curv = [
            self.i_h2 * self.star_angl,
            0.0,
            self.i_h2 * self.term_angl,
        ]
        mid = 0.5 * (self.worm_curv[0] + self.worm_curv[2])
        while mid - 2.0 * PI >= self.worm_curv[0]:
            mid -= 2.0 * PI
        self.worm_curv[1] = mid
        self.widt_angl = np.arcsin(self.whee_widt / 2.0 / self.R_f[1])
        self.toot_thic = [
            self.toot_thic_coef[0] * PI * self.m_t,
            self.toot_thic_coef[1] * PI * self.m_t,
        ]
        self.toot_thic_angl = [t / (self.d[1] / 2.0) for t in self.toot_thic]
        self.back_angl = [
            2.0 * self.alph + self.toot_thic_angl[0],
            2.0 * self.alph - self.toot_thic_angl[1],
        ]


def fsme(p: DehwParams, thet_1, thet_h):
    """First+second meshing equations -> generating-plane coordinates
    (x_d, y_d); batched (DEHWSURF.h:270-291)."""
    thet_1 = np.asarray(thet_1, dtype=np.float64)
    thet_h = np.asarray(thet_h, dtype=np.float64)
    tc = p.i_c1 * thet_1
    sb, cb = np.sin(p.beta_c), np.cos(p.beta_c)
    st, ct = np.sin(tc), np.cos(tc)
    sh = np.sin(thet_h - thet_1)
    ch = np.cos(thet_h - thet_1)
    A11 = -sb * ct - p.i_c1 * cb
    A12 = st
    A21 = sb * ct + p.i_2h * cb * ch - p.i_2h * sb * st * sh
    A22 = -st - p.i_2h * ct * sh
    B1 = -p.r_b2 * sb * st + p.a_1c * sb
    B2 = (
        p.r_b2 * sb * st
        + p.i_2h * p.r_b2 * sb * ct * sh
        - p.a_1c * sb
        - p.i_2h * p.a_1c * cb * ct * ch
        + p.i_2h * p.a_h2 * cb * ct
    )
    det = A11 * A22 - A12 * A21
    x_d = (-B1 * A22 + A12 * B2) / det
    y_d = (-A11 * B2 + A21 * B1) / det
    return x_d, y_d


def _rot_z(th):
    """Batched rotation R_z(th) applied as matrix with columns convention of
    the reference's R_oc,c etc."""
    c, s = np.cos(th), np.sin(th)
    return c, s


def worm_dc2r(p: DehwParams, x_d, y_d, thet_c):
    """Generating-plane point -> worm frame coordinates (DEHWSURF.h:349-372).
    Batched; returns (...,3)."""
    thet_1 = p.i_1c * np.asarray(thet_c)
    sb, cb = np.sin(p.beta_c), np.cos(p.beta_c)
    x = np.stack(
        [-np.asarray(x_d),
         p.r_b2 - np.asarray(y_d) * sb,
         np.asarray(y_d) * cb], axis=-1
    )
    c, s = np.cos(thet_c), np.sin(thet_c)
    x = np.stack(
        [c * x[..., 0] - s * x[..., 1],
         s * x[..., 0] + c * x[..., 1],
         x[..., 2]], axis=-1
    )
    # R_o1,oc: (x, y, z) -> (x, -z, y)
    x = np.stack([x[..., 0], -x[..., 2], x[..., 1]], axis=-1)
    x = x.copy()
    x[..., 0] += p.a_1c
    c, s = np.cos(thet_1), np.sin(thet_1)
    return np.stack(
        [c * x[..., 0] + s * x[..., 1],
         -s * x[..., 0] + c * x[..., 1],
         x[..., 2]], axis=-1
    )


def whee_1h2r(p: DehwParams, x_d, y_d, thet_1, thet_h):
    """Worm-frame meshing point -> wheel frame (DEHWSURF.h:374-401)."""
    thet_c = p.i_c1 * np.asarray(thet_1)
    thet_2 = p.i_2h * np.asarray(thet_h)
    x = worm_dc2r(p, x_d, y_d, thet_c)
    c, s = np.cos(thet_h), np.sin(thet_h)
    x = np.stack(
        [c * x[..., 0] - s * x[..., 1],
         s * x[..., 0] + c * x[..., 1],
         x[..., 2]], axis=-1
    )
    # R_o2,oh: (x,y,z) -> (x, z, -y)
    x = np.stack([x[..., 0], x[..., 2], -x[..., 1]], axis=-1)
    x = x.copy()
    x[..., 0] -= p.a_h2
    c, s = np.cos(thet_2), np.sin(thet_2)
    return np.stack(
        [c * x[..., 0] + s * x[..., 1],
         -s * x[..., 0] + c * x[..., 1],
         x[..., 2]], axis=-1
    )


def worm_curv_to_cart(p: DehwParams, xi_11, xi_12, iters: int = 80):
    """Batched Newton inversion of the worm-flank parameterization
    (DEHWSURF.h:593-673): xi_11 = angular position of the point about the
    worm axis (relative to the thread), xi_12 = distance from the gorge
    center circle in the axial section.  Returns points (...,3) in the worm
    frame and thet_c."""
    xi_11 = np.asarray(xi_11, dtype=np.float64)
    xi_12 = np.asarray(xi_12, dtype=np.float64)
    sb, cb = np.sin(p.beta_c), np.cos(p.beta_c)
    tc = p.i_c1 * xi_11.copy()
    x_d = np.full_like(xi_11, p.d[1] / 2.0)

    def geometry(tc, x_d):
        st, ct = np.sin(tc), np.cos(tc)
        y_d = -(( -sb * ct - p.i_c1 * cb) * x_d
                + (-p.r_b2 * sb * st + p.a_1c * sb)) / st
        th1 = p.i_1c * tc
        r_c = np.stack([-x_d, p.r_b2 - y_d * sb, y_d * cb], axis=-1)
        # to o1 frame (before the final worm rotation)
        xo = ct * r_c[..., 0] - st * r_c[..., 1]
        yo = st * r_c[..., 0] + ct * r_c[..., 1]
        zo = r_c[..., 2]
        r_o1 = np.stack([xo + 0, -zo, yo], axis=-1)
        r_o1 = r_o1.copy()
        r_o1[..., 0] += p.a_1c
        c1, s1 = np.cos(th1), np.sin(th1)
        r_1 = np.stack(
            [c1 * r_o1[..., 0] + s1 * r_o1[..., 1],
             -s1 * r_o1[..., 0] + c1 * r_o1[..., 1],
             r_o1[..., 2]], axis=-1
        )
        return y_d, th1, r_o1, r_1

    h = 1e-8
    for _ in range(iters):
        y_d, th1, r_o1, r_1 = geometry(tc, x_d)
        rad = np.hypot(r_1[..., 0], r_1[..., 1])
        f1 = th1 - np.arctan2(r_o1[..., 1], r_o1[..., 0]) - xi_11
        f2 = r_1[..., 2] ** 2 + (p.a_h2 - rad) ** 2 - xi_12**2
        # numerical Jacobian (central differences; the reference's closed
        # forms are equivalent — finite differences keep the code compact)
        out = []
        for dtc, dxd in ((h, 0.0), (0.0, h)):
            _, th1p, r_o1p, r_1p = geometry(tc + dtc, x_d + dxd)
            radp = np.hypot(r_1p[..., 0], r_1p[..., 1])
            f1p = th1p - np.arctan2(r_o1p[..., 1], r_o1p[..., 0]) - xi_11
            f2p = r_1p[..., 2] ** 2 + (p.a_h2 - radp) ** 2 - xi_12**2
            _, th1m, r_o1m, r_1m = geometry(tc - dtc, x_d - dxd)
            radm = np.hypot(r_1m[..., 0], r_1m[..., 1])
            f1m = th1m - np.arctan2(r_o1m[..., 1], r_o1m[..., 0]) - xi_11
            f2m = r_1m[..., 2] ** 2 + (p.a_h2 - radm) ** 2 - xi_12**2
            out.append(((f1p - f1m) / (2 * h), (f2p - f2m) / (2 * h)))
        J11, J21 = out[0]
        J12, J22 = out[1]
        det = J11 * J22 - J12 * J21
        det = np.where(np.abs(det) < 1e-300, 1.0, det)
        dtc = -(J22 * f1 - J12 * f2) / det
        dxd = -(J11 * f2 - J21 * f1) / det
        if max(np.abs(dtc).max(), np.abs(dxd).max()) < 1e-13:
            break
        tc = tc + dtc
        x_d = x_d + dxd
    y_d, th1, r_o1, r_1 = geometry(tc, x_d)
    return r_1, tc


def worm_flank_grid(
    p: DehwParams,
    n_u: int,
    n_v: int,
    u_range: tuple[float, float] | None = None,
    flank: int = 0,
) -> np.ndarray:
    """Exact worm working-flank grid (n_u+1, n_v+1, 3) in the worm frame.

    u = xi_11 sweep along the thread (default: the working range
    worm_curv[0]..worm_curv[2]); v = xi_12 in [R_a[0], R_f[0]] (tip to root
    of the worm, measured from the gorge circle).  flank=0 gives the surface
    of the enveloping side; flank=1 mirrors by the tooth-back angle
    (backAngl, DEHWSURF.h:246-247: z -> -z with azimuth offset)."""
    u0, u1 = u_range if u_range is not None else (p.worm_curv[0], p.worm_curv[2])
    u = np.linspace(u0, u1, n_u + 1)
    v = np.linspace(p.R_a[0], p.R_f[0], n_v + 1)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    pts, _ = worm_curv_to_cart(p, uu, vv)
    if flank == 1:
        # tooth back: reflect z and rotate by the back angle (rigid relation
        # between surface and back frames, DEHWSURF.h:60-62)
        ang = p.back_angl[0] * p.i_1c / p.i_h2  # worm azimuth offset
        c, s = np.cos(ang), np.sin(ang)
        pts = np.stack(
            [c * pts[..., 0] - s * pts[..., 1],
             s * pts[..., 0] + c * pts[..., 1],
             -pts[..., 2]], axis=-1
        )
    return pts


def wheel_local(p: DehwParams, r2: np.ndarray):
    """Wheel-flank curvilinear coordinates (WHEE_G2L, DEHWSURF.h:675-685):
    angle/radius in the axial section, measured from the gorge circle."""
    radi_xi = p.a_h2 - np.hypot(r2[..., 0], r2[..., 1])
    angl_f = np.arctan2(r2[..., 2], radi_xi)
    radi_f = np.hypot(radi_xi, r2[..., 2])
    return angl_f, radi_f


def _damped_newton_2(resid, init, in_box, iters: int = 200):
    """Shared damped 2-var Newton with box-constrained line search (the
    solver scheme of WHEE_CURV_2_CART_1/2/3, DEHWSURF.h:687-909): finite-
    difference Jacobian, halving line search accepting only residual
    decrease inside the box.  resid(a,b) -> (f(2,), payload); returns
    (payload, (a,b), f) or None on a singular Jacobian."""
    a, b = init
    f, r2 = resid(a, b)
    h = 1e-8
    for _ in range(iters):
        f1p, _ = resid(a + h, b)
        f2p, _ = resid(a, b + h)
        J = np.stack([(f1p - f) / h, (f2p - f) / h], axis=1)
        det = J[0, 0] * J[1, 1] - J[0, 1] * J[1, 0]
        if abs(det) < 1e-300:
            return None
        step = -np.linalg.solve(J, f)
        if np.linalg.norm(step) < 1e-13:
            break
        rfac, ok = 1.0, False
        while rfac > 1e-10:
            at, bt = a + rfac * step[0], b + rfac * step[1]
            if in_box(at, bt):
                ft, r2t = resid(at, bt)
                if np.linalg.norm(ft) < np.linalg.norm(f):
                    a, b, f, r2 = at, bt, ft, r2t
                    ok = True
                    break
            rfac /= 2.0
        if not ok:
            break
    return r2, (a, b), f


def wheel_point(p: DehwParams, xi_21: float, xi_22: float,
                init: tuple[float, float], iters: int = 200, f_lr: int = 1):
    """One wheel new-contact-zone point by damped Newton on (thet_c, thet_h)
    within the singular bounds (WHEE_CURV_2_CART_1, DEHWSURF.h:687-764).
    f_lr=1: left branch thet_h in (thet_hs, thet_hm); f_lr=2: right branch
    (thet_hm, thet_hs + 2*pi) (DEHWSURF.h:735-740).
    Returns (point (3,), (thet_c, thet_h)) or None."""

    def resid(tc, th):
        th1 = p.i_1c * tc
        x_d, y_d = fsme(p, th1, th)
        r2 = whee_1h2r(p, x_d, y_d, th1, th)
        a, rr = wheel_local(p, r2)
        return np.array([a - xi_21, rr * rr - xi_22 * xi_22]), r2

    def in_box(tct, tht):
        if not (0.01 * PI < tct < 0.49 * PI):
            return False
        ths, thm = singular_c2h(p, tct)
        if f_lr == 1:
            return ths + 1e-12 < tht < thm - 1e-12
        return thm + 1e-12 < tht < ths + 2.0 * PI - 1e-12

    out = _damped_newton_2(resid, init, in_box, iters)
    if out is None:
        return None
    r2, sol, f = out
    if np.linalg.norm(f * np.array([1.0, 1.0 / xi_22])) > 1e-8:
        return None
    return r2, sol


def former_point(p: DehwParams, xi_21: float, xi_22: float,
                 init: tuple[float, float], iters: int = 200):
    """One former-contact-zone point by damped Newton on (thet_c, x_d): the
    wheel surface region coinciding with the generating plane itself, which
    exists only for unmodified drives (WHEE_CURV_2_CART_2,
    DEHWSURF.h:766-845).  Returns (point (3,), (thet_c, x_d)) or None."""

    def resid(tc, xd):
        r_c, _ = plane_point_c(p, tc, xd)
        return _local_resid(p, r_c, xi_21, xi_22), r_c

    out = _damped_newton_2(
        resid, init, lambda tc, xd: 0.01 * PI < tc < 0.49 * PI, iters
    )
    if out is None:
        return None
    r2, sol, f = out
    if np.linalg.norm(f * np.array([1.0, 1.0 / xi_22])) > 1e-8:
        return None
    return r2, sol


def transition_point(p: DehwParams, xi_21: float, xi_22: float, xi_11: float,
                     init: tuple[float, float], iters: int = 200):
    """One head/rear transition-zone point by damped Newton on
    (thet_c, thet_h): the wheel region cut by the worm thread end edge at
    thread azimuth xi_11 (WHEE_CURV_2_CART_3 + WHEE_TRAN,
    DEHWSURF.h:846-978).  Returns (point (3,), (thet_c, thet_h)) or None."""

    def resid(tc, th):
        r2 = worm_edge_point(p, tc, th, xi_11)
        return _local_resid(p, r2, xi_21, xi_22), r2

    out = _damped_newton_2(
        resid, init, lambda tc, th: 0.01 * PI < tc < 0.49 * PI, iters
    )
    if out is None:
        return None
    r2, sol, f = out
    if np.linalg.norm(f * np.array([1.0, 1.0 / xi_22])) > 1e-8:
        return None
    return r2, sol


def wheel_flank_grid(
    p: DehwParams,
    n_u: int,
    n_v: int,
    u_box: tuple[float, float] | None = None,
    v_box: tuple[float, float] | None = None,
):
    """Exact wheel working-flank grid (n_u+1, n_v+1, 3) in the wheel frame.

    u = xi_21 (face-width angle), v = xi_22 (profile radius from the gorge
    circle, tip -> root).  Newton marches across the grid using neighbor
    solutions as initial guesses (the reference's WHEE_PHAS bookkeeping);
    returns (points, solved_mask)."""
    ua, ub = u_box if u_box else (-0.6 * p.widt_angl, 0.6 * p.widt_angl)
    va, vb = v_box if v_box else (p.a_h2 - 0.5 * p.d_a[1], p.R_f[1])
    us = np.linspace(ua, ub, n_u + 1)
    vs = np.linspace(va, vb, n_v + 1)
    pts = np.zeros((n_u + 1, n_v + 1, 3))
    ok = np.zeros((n_u + 1, n_v + 1), dtype=bool)
    tc_mid = 0.5 * (p.i_c1 * p.worm_curv[0] + p.i_c1 * p.worm_curv[2])
    ths, thm = singular_c2h(p, tc_mid)
    init0 = (tc_mid, 0.5 * (ths + thm))
    inits = {}
    for i, u in enumerate(us):
        for j, v in enumerate(vs):
            cand = []
            if (i, j - 1) in inits:
                cand.append(inits[(i, j - 1)])
            if (i - 1, j) in inits:
                cand.append(inits[(i - 1, j)])
            cand.append(init0)
            for init in cand:
                res = wheel_point(p, u, v, init)
                if res is not None:
                    pts[i, j] = res[0]
                    inits[(i, j)] = res[1]
                    ok[i, j] = True
                    break
    return pts, ok


def singular_c2h(p: DehwParams, thet_c: float) -> tuple[float, float]:
    """Singular thet_h bounds for a given thet_c (DEHWSURF.h:251-268)."""
    thet_1 = p.i_1c * thet_c
    cb, sb = np.cos(p.beta_c), np.sin(p.beta_c)
    C11 = -p.i_2h * cb * np.sin(thet_c)
    C12 = p.i_c1 * p.i_2h * cb * np.cos(thet_c) + p.i_2h * sb
    C13 = p.i_c1 * cb * np.sin(thet_c)
    a2 = np.arctan2(C11, C12)
    mag = np.hypot(C11, C12)
    if C13 > mag:
        ths = thet_1 - a2 - PI / 2.0
        return ths, ths
    ths = thet_1 - PI - a2 + np.arcsin(C13 / mag)
    thm = thet_1 - a2 - np.arcsin(C13 / mag)
    return ths, thm


# ---------------------------------------------------------------------------
# Wheel-flank zones beyond the zone-1 working patch (DEHWSURF.h:980-1509):
# the full wheel tooth surface is pieced together from five generator zones
#   1 left new contact, 2 right new contact (second envelope, the two
#     branches of the singular thet_h interval),
#   3 former contact (the planar region traced by the generating plane
#     itself — exists only for unmodified drives, DEHWSURF.h:1772),
#   4 head / 5 rear transition (envelope of the worm thread's end edges),
# merged per grid point by azimuth-phase priority (WHEE_PHAS,
# DEHWSURF.h:980-1001).
# ---------------------------------------------------------------------------


def wheel_bounds(p: DehwParams, angl_f):
    """(R_fmini, R_fmaxi) profile-radius box at face-width angle angl_f
    (WHEE_G2L, DEHWSURF.h:675-685)."""
    angl_f = np.asarray(angl_f, dtype=np.float64)
    angl_ai = angl_f - np.arcsin(p.offs_R_a * np.sin(angl_f) / p.R_a[1])
    r_min = (p.R_a[1] * np.cos(angl_ai) - p.offs_R_a) / np.cos(angl_f)
    return r_min, np.full_like(angl_f, p.R_t[1])


def _local_resid(p: DehwParams, r2, xi_21, xi_22):
    """Residual of the wheel-local box equations (shared by all zone
    solvers): [angle - xi_21, radius^2 - xi_22^2]."""
    coor_x = p.a_h2 - np.hypot(r2[..., 0], r2[..., 1])
    return np.stack(
        [np.arctan2(r2[..., 2], coor_x) - xi_21,
         r2[..., 2] ** 2 + coor_x**2 - xi_22**2], axis=-1,
    )


def plane_point_c(p: DehwParams, thet_c, x_d):
    """Generating-plane point in frame c with y_d eliminated by the first
    meshing equation (DEHWSURF.h:776-780); batched."""
    thet_c = np.asarray(thet_c, dtype=np.float64)
    x_d = np.asarray(x_d, dtype=np.float64)
    sb, cb = np.sin(p.beta_c), np.cos(p.beta_c)
    st, ct = np.sin(thet_c), np.cos(thet_c)
    y_d = -(((-sb * ct - p.i_c1 * cb) * x_d - p.r_b2 * sb * st
             + p.a_1c * sb) / st)
    r_c = np.stack([-x_d, p.r_b2 - y_d * sb, y_d * cb], axis=-1)
    return r_c, y_d


def worm_azimuth(p: DehwParams, r_c, thet_c):
    """Worm-thread azimuth coordinate xi_11 of a frame-c point
    (DEHWSURF.h:1356-1372): the angle about the worm axis measured from the
    rotating thread reference."""
    thet_c = np.asarray(thet_c, dtype=np.float64)
    thet_1 = p.i_1c * thet_c
    c, s = np.cos(thet_c), np.sin(thet_c)
    xo = c * r_c[..., 0] - s * r_c[..., 1]
    yo = s * r_c[..., 0] + c * r_c[..., 1]
    zo = r_c[..., 2]
    # R_o1,oc: (x, y, z) -> (x, -z, y), then translate by a_1c
    r_o1 = np.stack([xo + p.a_1c, -zo, yo], axis=-1)
    return thet_1 - np.arctan2(r_o1[..., 1], r_o1[..., 0])


def worm_frame_to_wheel(p: DehwParams, pts, thet_h):
    """Worm-frame points -> wheel frame at worm rotation thet_h
    (the R_oh,h / R_o2,oh / T / R_2,o2 chain of WHEE_1H2R without the
    generating-plane part, DEHWSURF.h:925-947)."""
    pts = np.asarray(pts, dtype=np.float64)
    thet_2 = p.i_2h * thet_h
    c, s = np.cos(thet_h), np.sin(thet_h)
    x = np.stack(
        [c * pts[..., 0] - s * pts[..., 1],
         s * pts[..., 0] + c * pts[..., 1],
         pts[..., 2]], axis=-1,
    )
    x = np.stack([x[..., 0] - p.a_h2, x[..., 2], -x[..., 1]], axis=-1)
    c, s = np.cos(thet_2), np.sin(thet_2)
    return np.stack(
        [c * x[..., 0] + s * x[..., 1],
         -s * x[..., 0] + c * x[..., 1],
         x[..., 2]], axis=-1,
    )


def worm_edge_curve(p: DehwParams, thet_c, xi_11):
    """Worm-frame point of the thread end-edge curve at thread azimuth
    xi_11, parameterized by thet_c (the edge part of WHEE_TRAN,
    DEHWSURF.h:915-926); batched."""
    thet_c = np.asarray(thet_c, dtype=np.float64)
    thet_1 = p.i_1c * thet_c
    tb = np.tan(p.beta_c)
    st, ct = np.sin(thet_c), np.cos(thet_c)
    d1 = thet_1 - xi_11
    c1 = ((tb * ct + p.i_c1) * np.cos(d1)
          + p.i_c1 * tb * st * np.sin(d1) - ct * st * np.sin(d1))
    c2 = p.i_c1 * p.r_b2 * st - p.i_c1 * p.a_1c
    x_a = -c2 / c1
    z_a = ((tb * np.sin(d1) + st * np.cos(d1)) * x_a
           + p.r_b2 - p.a_1c * st) / ct
    return np.stack(
        [x_a * np.cos(xi_11), -x_a * np.sin(xi_11),
         np.broadcast_to(z_a, x_a.shape)], axis=-1,
    )


def worm_radial(p: DehwParams, r_1):
    """Worm profile coordinate xi_12 of a worm-frame point: distance from
    the gorge center circle in the axial section (DEHWSURF.h:625-627)."""
    rad = np.hypot(r_1[..., 0], r_1[..., 1])
    return np.hypot(p.a_h2 - rad, r_1[..., 2])


def worm_edge_point(p: DehwParams, thet_c, thet_h, xi_11):
    """Point of the worm thread end-edge (at thread azimuth xi_11) in the
    wheel frame at meshing configuration thet_h (WHEE_TRAN,
    DEHWSURF.h:911-978); batched.  Returns wheel-frame points (...,3)."""
    thet_h = np.asarray(thet_h, dtype=np.float64)
    r_1 = worm_edge_curve(p, thet_c, xi_11)
    return worm_frame_to_wheel(p, r_1, thet_h)


def cilfofe(p: DehwParams, thet_1, x_d, y_d):
    """First-envelope curvature functions of the worm flank at a meshing
    point (CILFOFE, DEHWSURF.h:483-523); batched.  Returns
    (Psi_1, kappa_1x, kappa_1y, tau_1x)."""
    thet_1 = np.asarray(thet_1, dtype=np.float64)
    x_d = np.asarray(x_d, dtype=np.float64)
    y_d = np.asarray(y_d, dtype=np.float64)
    thet_c = thet_1 / p.i_1c
    sb, cb = np.sin(p.beta_c), np.cos(p.beta_c)
    st, ct = np.sin(thet_c), np.cos(thet_c)
    # plane frame directions rotated into frame oc
    i_d = np.stack([-ct, -st, np.zeros_like(ct)], axis=-1)
    j_d = np.stack([st * sb, -ct * sb, np.full_like(ct, cb)], axis=-1)
    omeg = np.stack(
        [np.zeros_like(ct), np.full_like(ct, -1.0),
         np.full_like(ct, p.i_c1)], axis=-1,
    )
    v = np.stack(
        [-y_d * cb - p.i_c1 * (-x_d * st + ct * (p.r_b2 - y_d * sb)),
         p.i_c1 * (-x_d * ct - st * (p.r_b2 - y_d * sb)),
         -x_d * ct - st * (p.r_b2 - y_d * sb) + p.a_1c], axis=-1,
    )
    v_i = (v * i_d).sum(-1)
    v_j = (v * j_d).sum(-1)
    n1x = (omeg * j_d).sum(-1)              # plane has zero curvature
    n1y = -(omeg * i_d).sum(-1)
    dphi = (x_d * sb * st + y_d * ct - p.r_b2 * sb * ct) / p.i_1c
    n_vec = n1x[..., None] * i_d + n1y[..., None] * j_d
    psi_1 = (n_vec * v).sum(-1) + dphi
    return psi_1, -n1x * n1x / psi_1, -n1y * n1y / psi_1, -n1x * n1y / psi_1


def curvature_interference(p: DehwParams, thet_1, thet_h):
    """Second-envelope curvature-interference function Psi_2 and induced
    normal curvature kappa_h2N (CILFOSE_NI, DEHWSURF.h:524-592); batched.
    Psi_2 > 0 means no curvature interference at this meshing point."""
    thet_1 = np.asarray(thet_1, dtype=np.float64)
    thet_h = np.asarray(thet_h, dtype=np.float64)
    thet_c = thet_1 / p.i_1c
    x_d, y_d = fsme(p, thet_1, thet_h)
    _, kx, ky, tx = cilfofe(p, thet_1, x_d, y_d)
    sb, cb = np.sin(p.beta_c), np.cos(p.beta_c)

    def chain(vec3):
        """frame c -> frame h at the meshing configuration (rotations only
        for directions; the caller adds the a_1c offset for positions)."""
        c, s = np.cos(thet_c), np.sin(thet_c)
        x = np.stack(
            [c * vec3[..., 0] - s * vec3[..., 1],
             s * vec3[..., 0] + c * vec3[..., 1], vec3[..., 2]], axis=-1)
        x = np.stack([x[..., 0], -x[..., 2], x[..., 1]], axis=-1)
        return x

    def rot1h(vec3, offset=0.0):
        x = vec3.copy()
        x[..., 0] += offset
        c, s = np.cos(thet_1), np.sin(thet_1)
        x = np.stack(
            [c * x[..., 0] + s * x[..., 1],
             -s * x[..., 0] + c * x[..., 1], x[..., 2]], axis=-1)
        c, s = np.cos(thet_h), np.sin(thet_h)
        return np.stack(
            [c * x[..., 0] - s * x[..., 1],
             s * x[..., 0] + c * x[..., 1], x[..., 2]], axis=-1)

    zer = np.zeros_like(thet_c)
    i_d = rot1h(chain(np.stack([-np.ones_like(thet_c), zer, zer], axis=-1)))
    j_d = rot1h(chain(np.stack([zer, np.full_like(thet_c, -sb),
                                np.full_like(thet_c, cb)], axis=-1)))
    r_c = np.stack([-x_d, p.r_b2 - y_d * sb, y_d * cb], axis=-1)
    r_h = rot1h(chain(r_c), offset=p.a_1c)
    omeg_h2 = np.stack([zer, np.full_like(thet_c, p.i_2h),
                        np.ones_like(thet_c)], axis=-1)
    omeg_2 = np.stack([zer, np.full_like(thet_c, -p.i_2h), zer], axis=-1)
    o_h2 = np.stack([np.full_like(thet_c, -p.a_h2), zer, zer], axis=-1)
    v_h2 = np.cross(omeg_h2, r_h) - np.cross(omeg_2, o_h2)
    v_i = (v_h2 * i_d).sum(-1)
    v_j = (v_h2 * j_d).sum(-1)
    n2x = kx * v_i + tx * v_j + (omeg_h2 * j_d).sum(-1)
    n2y = tx * v_i + ky * v_j - (omeg_h2 * i_d).sum(-1)
    n_vec = n2x[..., None] * i_d + n2y[..., None] * j_d
    b11 = p.i_2h * x_d * cb - p.i_2h * p.a_1c * cb * np.cos(thet_c)
    b12 = (-p.i_2h * x_d * sb * np.sin(thet_c) - p.i_2h * y_d * np.cos(thet_c)
           + p.i_2h * p.r_b2 * sb * np.cos(thet_c))
    dphi2 = -b11 * np.sin(thet_h - thet_1) + b12 * np.cos(thet_h - thet_1)
    psi_2 = (n_vec * v_h2).sum(-1) + dphi2
    kapp = (n2x * n2x + n2y * n2y) / psi_2
    return psi_2, kapp


# ---------------------------------------------------------------------------
# Flank relief (WORM_RELI / WHEE_RELI, DEHWSURF.h:1002-1116) and tooth-back
# transforms (TOOT_SURF_GRID, DEHWSURF.h:1812-1846)
# ---------------------------------------------------------------------------


def _relief_field(n_u: int, n_v: int, L: int, amounts, expo: float,
                  tip_at_j0: bool) -> np.ndarray:
    """Relief magnitude per grid index (n_u, n_v): cubic-law ramps of depth
    ``amounts[0]`` at the tooth tip border (j) and ``amounts[1]`` at both
    face-width ends (i), blended around the corners by the reference's
    cosine rule (DEHWSURF.h:1016-1034)."""
    a_tip, a_end = amounts
    ti = np.arange(n_u, dtype=np.float64)[:, None]
    tj = np.arange(n_v, dtype=np.float64)[None, :]
    d_tip = np.maximum(L - tj if tip_at_j0 else tj - (n_v - 1 - L), 0.0)
    d_end = np.maximum(np.maximum(L - ti, ti - (n_u - 1 - L)), 0.0)
    only_tip = (d_tip > 0) & (d_end == 0)
    only_end = (d_end > 0) & (d_tip == 0)
    corner = (d_tip > 0) & (d_end > 0)
    rel = np.zeros((n_u, n_v))
    rel = np.where(only_tip, (d_tip / L) ** expo * a_tip, rel)
    rel = np.where(only_end, (d_end / L) ** expo * a_end, rel)
    with np.errstate(divide="ignore", invalid="ignore"):
        rati = np.arctan2(d_tip, d_end) / (PI / 2.0)
        maxi = a_end + (np.cos(rati * PI) - 1.0) * (a_end - a_tip) / 2.0
        rad = np.hypot(d_tip, d_end)
        rel = np.where(corner, (rad / L) ** expo * maxi, rel)
    return rel


def worm_relief_grid(p: DehwParams, pts: np.ndarray, L: int = 40,
                     amounts=(14.0e-6, 18.0e-6), expo: float = 3.0,
                     tip_at_j0: bool = True) -> np.ndarray:
    """Apply worm flank relief (WORM_RELI, DEHWSURF.h:1002-1060): each
    border point is rotated by relief/R within its axial-section circle
    about the gorge-center circle (radius a_h2 from the worm axis)."""
    n_u, n_v, _ = pts.shape
    rel = _relief_field(n_u, n_v, L, amounts, expo, tip_at_j0)
    out = pts.copy()
    mask = rel > 1e-12
    x, y, z = pts[..., 0][mask], pts[..., 1][mask], pts[..., 2][mask]
    radi_0 = np.hypot(x, y)
    radi = np.hypot(p.a_h2 - radi_0, z)
    th0 = np.arcsin(z / radi)
    th1 = th0 + rel[mask] / radi
    fact = (p.a_h2 - radi * np.cos(th1)) / radi_0
    out[..., 0][mask] = fact * x
    out[..., 1][mask] = fact * y
    out[..., 2][mask] = z + radi * (np.sin(th1) - np.sin(th0))
    return out


def wheel_relief_grid(p: DehwParams, pts: np.ndarray, L: int = 40,
                      amounts=(12.0e-6, 16.0e-6), expo: float = 3.0,
                      tip_at_j0: bool = True) -> np.ndarray:
    """Apply wheel flank relief (WHEE_RELI, DEHWSURF.h:1062-1116): border
    points rotate about the wheel axis by relief/radius."""
    n_u, n_v, _ = pts.shape
    rel = _relief_field(n_u, n_v, L, amounts, expo, tip_at_j0)
    out = pts.copy()
    mask = rel > 1e-12
    x, y = pts[..., 0][mask], pts[..., 1][mask]
    ang = rel[mask] / np.hypot(x, y)
    c, s = np.cos(ang), np.sin(ang)
    out[..., 0][mask] = c * x - s * y
    out[..., 1][mask] = s * x + c * y
    return out


def worm_back_grid(p: DehwParams, pts: np.ndarray) -> np.ndarray:
    """Worm tooth-back surface from the working flank (TOOT_SURF_GRID,
    DEHWSURF.h:1815-1830): conjugate reflection about the mid-thread
    azimuth worm_curv[1], thread-direction index reversed."""
    phi = p.worm_curv[1]
    c, s = np.cos(phi), np.sin(phi)
    x = c * pts[..., 0] - s * pts[..., 1]
    y = s * pts[..., 0] + c * pts[..., 1]
    y, z = -y, -pts[..., 2]
    out = np.stack([c * x + s * y, -s * x + c * y, z], axis=-1)
    return out[::-1]


def wheel_back_grid(p: DehwParams, pts: np.ndarray) -> np.ndarray:
    """Wheel tooth-back surface (TOOT_SURF_GRID, DEHWSURF.h:1832-1846):
    half-turn about the in-plane axis at half the tooth back angle, both
    indices reversed."""
    c, s = np.cos(p.back_angl[1]), np.sin(p.back_angl[1])
    out = np.stack(
        [c * pts[..., 0] - s * pts[..., 1],
         -s * pts[..., 0] - c * pts[..., 1],
         -pts[..., 2]], axis=-1,
    )
    return out[::-1, ::-1]


# ---------------------------------------------------------------------------
# Zoned full wheel-flank grid (WHEE_TS_GRID, DEHWSURF.h:1751-1788)
# ---------------------------------------------------------------------------


def _zone_candidates_new(p: DehwParams, f_lr: int, window, n_c=48, n_h=32):
    """Coarse scan of the second-envelope branch f_lr (NEW_CONT_ZONE init
    scan, DEHWSURF.h:1125-1165): returns in-box, interference-free samples
    as (angl, radi, thet_c, thet_h) rows."""
    tcs = np.linspace(0.011 * PI, 0.489 * PI, n_c)
    bounds = np.array([singular_c2h(p, t) for t in tcs])   # (n_c, 2)
    eps = 1e-6
    if f_lr == 1:
        lo, hi = bounds[:, 0] + eps, bounds[:, 1] - eps
    else:
        lo, hi = bounds[:, 1] + eps, bounds[:, 0] + 2.0 * PI - eps
    frac = np.linspace(0.0, 1.0, n_h)
    TH = lo[:, None] + (hi - lo)[:, None] * frac[None, :]
    TC = np.broadcast_to(tcs[:, None], TH.shape)
    ok = (hi > lo)[:, None] & np.ones_like(TH, bool)
    th1 = p.i_1c * TC
    x_d, y_d = fsme(p, th1, TH)
    r2 = whee_1h2r(p, x_d, y_d, th1, TH)
    a, r = wheel_local(p, r2)
    rmin, rmax = wheel_bounds(p, np.clip(a, -p.widt_angl, p.widt_angl))
    psi, _ = curvature_interference(p, th1, TH)
    sb, cb = np.sin(p.beta_c), np.cos(p.beta_c)
    r_c = np.stack([-x_d, p.r_b2 - y_d * sb, y_d * cb], axis=-1)
    woxi = worm_azimuth(p, r_c, TC)
    ok &= (np.abs(a) <= p.widt_angl) & (rmin <= r) & (r <= rmax)
    ok &= (psi > 0.0)
    ok &= (window[0] - 1e-12 <= woxi) & (woxi <= window[1] + 1e-12)
    return np.stack([a[ok], r[ok], TC[ok], TH[ok]], axis=-1)


def _zone_candidates_former(p: DehwParams, window, n_c=48, n_d=200):
    """Coarse scan of the generating-plane family (FORMER_CONT_ZONE init
    scan, DEHWSURF.h:1273-1296)."""
    tcs = np.linspace(0.011 * PI, 0.489 * PI, n_c)
    xds = np.linspace(-2.0 * p.a_1c, 2.0 * p.a_1c, n_d)
    TC, XD = np.meshgrid(tcs, xds, indexing="ij")
    r_c, _ = plane_point_c(p, TC, XD)
    a, r = wheel_local(p, r_c)
    rmin, rmax = wheel_bounds(p, np.clip(a, -p.widt_angl, p.widt_angl))
    woxi = worm_azimuth(p, r_c, TC)
    ok = (np.abs(a) <= p.widt_angl) & (rmin <= r) & (r <= rmax)
    ok &= (window[0] - 1e-12 <= woxi) & (woxi <= window[1] + 1e-12)
    return np.stack([a[ok], r[ok], TC[ok], XD[ok]], axis=-1)


def _zone_candidates_tran(p: DehwParams, xi_11, n_c=400):
    """Coarse scan of the worm end-edge envelope at thet_h = xi_11 — the
    reference's seeding line, which selects the physically cut sheet of the
    edge envelope (TRANSITION_ZONE init scan, DEHWSURF.h:1408-1432)."""
    tcs = np.linspace(0.011 * PI, 0.489 * PI, n_c)
    TC = tcs
    TH = np.full_like(TC, xi_11)
    r2 = worm_edge_point(p, TC, TH, xi_11)
    a, r = wheel_local(p, r2)
    rmin, rmax = wheel_bounds(p, np.clip(a, -p.widt_angl, p.widt_angl))
    ok = (np.abs(a) <= p.widt_angl) & (rmin <= r) & (r <= rmax)
    ok &= np.isfinite(a) & np.isfinite(r)
    # the edge is a finite segment of the thread end face: tip..root
    xi12 = worm_radial(p, worm_edge_curve(p, TC, xi_11))
    ok &= (p.R_a[0] - 1e-9 <= xi12) & (xi12 <= p.R_f[0] + 1e-9)
    return np.stack([a[ok], r[ok], TC[ok], TH[ok]], axis=-1)


def wheel_surface_grid(p: DehwParams, n_u: int, n_v: int,
                       worm_window: tuple[float, float] | None = None,
                       relief: bool = False, modified: bool | None = None):
    """Full zoned wheel tooth-surface grid (WHEE_TS_GRID,
    DEHWSURF.h:1751-1788): rows sweep the face width (angl from +widt_angl
    down to -widt_angl), columns the profile radius from the row's tip
    radius R_fmini(angl) to R_t[1].  Each point is generated by every zone
    whose solver converges and whose generator lies in the worm window, and
    the candidates are merged by azimuth-phase priority (WHEE_PHAS,
    DEHWSURF.h:980-1001).  Returns (points (n_u+1, n_v+1, 3), fpha flags:
    1 left new / 2 right new / 3 former / 4 head / 5 rear / 0 unsolved)."""
    window = worm_window if worm_window else (p.worm_curv[0], p.worm_curv[2])
    if modified is None:
        modified = not (p.modi_tran == 0.0 and p.modi_cent == 0.0)
    us = p.widt_angl - 2.0 * p.widt_angl * np.arange(n_u + 1) / n_u
    rmin, _ = wheel_bounds(p, us)
    vs = rmin[:, None] + (p.R_t[1] - rmin)[:, None] * (
        np.arange(n_v + 1) / n_v
    )[None, :]
    pts = np.zeros((n_u + 1, n_v + 1, 3))
    fpha = np.zeros((n_u + 1, n_v + 1), dtype=np.int64)
    phase = np.full((n_u + 1, n_v + 1), -np.inf)

    def nearest_cell(a, r):
        ti = int(np.clip(round((p.widt_angl - a) / (2 * p.widt_angl) * n_u),
                         0, n_u))
        tj = int(np.clip(
            round((r - vs[ti, 0]) / (vs[ti, -1] - vs[ti, 0]) * n_v), 0, n_v
        ))
        return ti, tj

    def merge(ti, tj, r2, z):
        ph = np.arctan2(r2[1], r2[0]) % (2.0 * PI)
        if ph > phase[ti, tj]:
            pts[ti, tj] = r2
            fpha[ti, tj] = z
            phase[ti, tj] = ph

    def accept(sol, z):
        """Generator-side physicality: zones 1-3 must be cut by a point
        inside the thread azimuth window; zones 4/5 by a point on the
        finite end-edge segment (tip..root)."""
        tc = sol[0]
        if z in (4, 5):
            xi12 = worm_radial(
                p, worm_edge_curve(p, tc, window[0] if z == 4 else window[1])
            )
            return p.R_a[0] - 1e-9 <= xi12 <= p.R_f[0] + 1e-9
        if z in (1, 2):
            x_d, y_d = fsme(p, p.i_1c * tc, sol[1])
        else:
            x_d, y_d = sol[1], plane_point_c(p, tc, sol[1])[1]
        sb, cb = np.sin(p.beta_c), np.cos(p.beta_c)
        r_c = np.array([-x_d, p.r_b2 - y_d * sb, y_d * cb])
        w = worm_azimuth(p, r_c, tc)
        return window[0] - 1e-12 <= w <= window[1] + 1e-12

    zones: list[tuple[int, np.ndarray]] = [
        (1, _zone_candidates_new(p, 1, window)),
        (2, _zone_candidates_new(p, 2, window)),
    ]
    if not modified:
        zones.append((3, _zone_candidates_former(p, window)))
    zones.append((4, _zone_candidates_tran(p, window[0])))
    zones.append((5, _zone_candidates_tran(p, window[1])))

    from collections import deque

    solvers = {
        1: lambda u, v, init: wheel_point(p, u, v, init, f_lr=1),
        2: lambda u, v, init: wheel_point(p, u, v, init, f_lr=2),
        3: lambda u, v, init: former_point(p, u, v, init),
        4: lambda u, v, init: transition_point(p, u, v, window[0], init),
        5: lambda u, v, init: transition_point(p, u, v, window[1], init),
    }
    for z, cand in zones:
        if cand.size == 0:
            continue
        seen = np.zeros((n_u + 1, n_v + 1), dtype=bool)
        q = deque()
        for a, r, s0, s1 in cand:
            ti, tj = nearest_cell(a, r)
            if not seen[ti, tj]:
                seen[ti, tj] = True
                q.append((ti, tj, (s0, s1)))
        while q:
            ti, tj, init = q.popleft()
            res = solvers[z](us[ti], vs[ti, tj], init)
            if res is None:
                continue
            r2, sol = res
            if not accept(sol, z):
                continue
            merge(ti, tj, r2, z)
            for di, dj in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                ni, nj = ti + di, tj + dj
                if 0 <= ni <= n_u and 0 <= nj <= n_v and not seen[ni, nj]:
                    seen[ni, nj] = True
                    q.append((ni, nj, sol))
    if relief:
        pts = wheel_relief_grid(p, pts)
    return pts, fpha
