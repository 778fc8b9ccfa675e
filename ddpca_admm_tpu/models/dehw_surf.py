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


def wheel_point(p: DehwParams, xi_21: float, xi_22: float,
                init: tuple[float, float], iters: int = 200):
    """One wheel working-flank point by damped Newton on (thet_c, thet_h)
    within the zone-1 singular bounds (WHEE_CURV_2_CART_1,
    DEHWSURF.h:687-764).  Returns (point (3,), (thet_c, thet_h)) or None."""
    tc, th = init

    def resid(tc, th):
        th1 = p.i_1c * tc
        x_d, y_d = fsme(p, th1, th)
        r2 = whee_1h2r(p, x_d, y_d, th1, th)
        a, rr = wheel_local(p, r2)
        return np.array([a - xi_21, rr * rr - xi_22 * xi_22]), r2

    f, r2 = resid(tc, th)
    h = 1e-8
    for _ in range(iters):
        f1p, _ = resid(tc + h, th)
        f2p, _ = resid(tc, th + h)
        J = np.stack([(f1p - f) / h, (f2p - f) / h], axis=1)
        det = J[0, 0] * J[1, 1] - J[0, 1] * J[1, 0]
        if abs(det) < 1e-300:
            return None
        step = -np.linalg.solve(J, f)
        if np.linalg.norm(step) < 1e-13:
            break
        # damped line search within the valid box (DEHWSURF.h:725-761)
        rfac, ok = 1.0, False
        while rfac > 1e-10:
            tct, tht = tc + rfac * step[0], th + rfac * step[1]
            if 0.01 * PI < tct < 0.49 * PI:
                ths, thm = singular_c2h(p, tct)
                if ths + 1e-12 < tht < thm - 1e-12:
                    ft, r2t = resid(tct, tht)
                    if np.linalg.norm(ft) < np.linalg.norm(f):
                        tc, th, f, r2 = tct, tht, ft, r2t
                        ok = True
                        break
            rfac /= 2.0
        if not ok:
            break
    if np.linalg.norm(f * np.array([1.0, 1.0 / xi_22])) > 1e-8:
        return None
    return r2, (tc, th)


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
