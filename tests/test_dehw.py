"""DEHW geometry engine checks: enveloping-theory surface invariants.

Full solve convergence is a round-2 calibration item (the reference also
just reports non-convergence after 3000 iterations, MCONTACT.h:2715-2717);
these tests pin the math that everything else builds on."""

import numpy as np

from ddpca_admm_tpu.models.dehw_surf import (
    DehwParams,
    fsme,
    singular_c2h,
    whee_1h2r,
    wheel_flank_grid,
    wheel_local,
    worm_dc2r,
    worm_flank_grid,
)


def test_basic_parameters():
    p = DehwParams()
    # reference values implied by DEHWSURF.h:162-196 inputs
    assert np.isclose(p.m_t, 0.418 / 40.0)
    assert np.isclose(p.d[1], 0.418)
    assert np.isclose(p.alph, np.arcsin(2 * 0.079 / 0.418))
    assert p.worm_curv[0] < p.worm_curv[1] < p.worm_curv[2]


def test_worm_flank_invariants():
    p = DehwParams()
    grid = worm_flank_grid(p, 8, 4)
    assert np.isfinite(grid).all()
    # xi_12 invariant: distance from the gorge center circle equals the
    # prescribed profile coordinate (WORM_CURV_2_CART residual)
    v = np.linspace(p.R_a[0], p.R_f[0], 5)
    rad = np.hypot(grid[..., 0], grid[..., 1])
    xi12 = np.sqrt(grid[..., 2] ** 2 + (p.a_h2 - rad) ** 2)
    assert np.abs(xi12 - v[None, :]).max() < 1e-12
    # hourglass shape: radius from the worm axis grows away from the throat
    assert rad.min() > 0.9 * p.d_f[0] / 2
    assert rad.max() < 1.6 * p.d_a[0] / 2


def test_meshing_point_on_both_members():
    """A meshing-configuration point must lie on the worm surface (via the
    worm chain) and map into the wheel tooth band (via the wheel chain)."""
    p = DehwParams()
    th1 = p.worm_curv[1]
    tc = p.i_c1 * th1
    ths, thm = singular_c2h(p, tc)
    thh = 0.5 * (ths + thm)
    x_d, y_d = fsme(p, th1, thh)
    r1 = worm_dc2r(p, x_d, y_d, tc)
    r2 = whee_1h2r(p, x_d, y_d, th1, thh)
    # same physical point: both radii in the respective tooth bands
    assert 0.9 * p.d_f[0] / 2 < np.hypot(r1[0], r1[1]) < 1.8 * p.d_a[0] / 2
    assert 0.9 * p.d_f[1] / 2 < np.hypot(r2[0], r2[1]) < 1.2 * p.d_a[1] / 2


def test_wheel_flank_grid_in_tooth_band():
    p = DehwParams()
    pts, ok = wheel_flank_grid(p, 10, 6)
    assert ok.mean() > 0.5, "zone-1 inversion should cover most of the patch"
    rad = np.hypot(pts[ok][:, 0], pts[ok][:, 1])
    assert rad.min() >= p.d_f[1] / 2 - 1e-9
    assert rad.max() <= p.d_a[1] / 2 + 0.3 * p.m_t
    a, r = wheel_local(p, pts)
    assert np.abs(a[ok]).max() <= p.widt_angl
