"""Gauss quadrature tables for hex8 / quad4 / clipped-triangle integration.

Reference semantics: PREP.h:225-361 (TRILINEAR_QUADRATURE 3x3x3,
BILINEAR_QUADRATURE 2x2, TRIANGLE_QUADRATURE collapsed-square rule after
Rathod et al. 2004).  Tables are plain NumPy float64 constants computed once at
import; the solve phase consumes them as jnp constants baked into jitted code.

Conventions (identical to the reference so operators match):
  * hex8 corner order: (-,-,-),(+,-,-),(+,+,-),(-,+,-),(-,-,+),(+,-,+),
    (+,+,+),(-,+,+)  in natural (xi,eta,zeta).
  * quad4 corner order: (-,-),(+,-),(+,+),(-,+).
  * hex Gauss points ordered i*9+j*3+k with xi=pts[i], eta=pts[j], zeta=pts[k].
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- hex8 corners
HEX_CORNERS = np.array(
    [
        [-1.0, -1.0, -1.0],
        [1.0, -1.0, -1.0],
        [1.0, 1.0, -1.0],
        [-1.0, 1.0, -1.0],
        [-1.0, -1.0, 1.0],
        [1.0, -1.0, 1.0],
        [1.0, 1.0, 1.0],
        [-1.0, 1.0, 1.0],
    ]
)

QUAD_CORNERS = np.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])

# Hexahedron edges / faces (node indices; faces with outward normals),
# PREP.h:157-167.
HEX_EDGES = np.array(
    [
        [0, 1], [1, 2], [2, 3], [3, 0],
        [0, 4], [1, 5], [2, 6], [3, 7],
        [4, 5], [5, 6], [6, 7], [7, 4],
    ]
)
HEX_FACES = np.array(
    [
        [0, 3, 2, 1], [4, 5, 6, 7],
        [0, 4, 7, 3], [1, 2, 6, 5],
        [0, 1, 5, 4], [3, 7, 6, 2],
    ]
)


def hex8_shape(nat: np.ndarray) -> np.ndarray:
    """Trilinear shape functions N_a(xi,eta,zeta); nat (...,3) -> (...,8)."""
    nat = np.asarray(nat, dtype=np.float64)
    c = HEX_CORNERS  # (8,3)
    return np.prod(1.0 + nat[..., None, :] * c, axis=-1) / 8.0


def hex8_shape_grad(nat: np.ndarray) -> np.ndarray:
    """dN/d(xi,eta,zeta); nat (...,3) -> (...,3,8)."""
    nat = np.asarray(nat, dtype=np.float64)
    c = HEX_CORNERS
    terms = 1.0 + nat[..., None, :] * c  # (...,8,3)
    out = np.empty(nat.shape[:-1] + (3, 8))
    for d in range(3):
        prod = np.ones(nat.shape[:-1] + (8,))
        for e in range(3):
            if e == d:
                prod = prod * c[:, e]
            else:
                prod = prod * terms[..., :, e]
        out[..., d, :] = prod / 8.0
    return out


def quad4_shape(nat: np.ndarray) -> np.ndarray:
    """Bilinear shape functions; nat (...,2) -> (...,4)."""
    nat = np.asarray(nat, dtype=np.float64)
    c = QUAD_CORNERS
    return np.prod(1.0 + nat[..., None, :] * c, axis=-1) / 4.0


def quad4_shape_grad(nat: np.ndarray) -> np.ndarray:
    """dN/d(xi,eta); nat (...,2) -> (...,2,4)."""
    nat = np.asarray(nat, dtype=np.float64)
    c = QUAD_CORNERS
    terms = 1.0 + nat[..., None, :] * c  # (...,4,2)
    out = np.empty(nat.shape[:-1] + (2, 4))
    out[..., 0, :] = c[:, 0] * terms[..., :, 1] / 4.0
    out[..., 1, :] = terms[..., :, 0] * c[:, 1] / 4.0
    return out


def _gauss_1d(n: int) -> tuple[np.ndarray, np.ndarray]:
    return np.polynomial.legendre.leggauss(n)


def _tensor_rule(n: int, dim: int) -> tuple[np.ndarray, np.ndarray]:
    pts1, wts1 = _gauss_1d(n)
    grids = np.meshgrid(*([pts1] * dim), indexing="ij")
    pts = np.stack([g.ravel() for g in grids], axis=-1)
    wgrids = np.meshgrid(*([wts1] * dim), indexing="ij")
    wts = np.prod(np.stack([w.ravel() for w in wgrids], axis=-1), axis=-1)
    return pts, wts


class HexQuadrature:
    """3x3x3 Gauss rule on the hex8 element (PREP.h:225-282)."""

    def __init__(self, n: int = 3):
        self.points, self.weights = _tensor_rule(n, 3)  # (27,3), (27,)
        self.n_gp = self.points.shape[0]
        self.shape = hex8_shape(self.points)            # (27,8)
        self.shape_grad = hex8_shape_grad(self.points)  # (27,3,8)


class QuadQuadrature:
    """2x2 Gauss rule on the quad4 surface element (PREP.h:284-331)."""

    def __init__(self, n: int = 2):
        self.points, self.weights = _tensor_rule(n, 2)  # (4,2), (4,)
        self.n_gp = self.points.shape[0]
        self.shape = quad4_shape(self.points)           # (4,4)
        self.shape_grad = quad4_shape_grad(self.points)  # (4,2,4)


class TriangleQuadrature:
    """4-point rule on the unit triangle via the collapsed-square map
    (PREP.h:333-361, Rathod/Nagaraja/Venkatesudu/Ramesh 2004).

    Yields barycentric coordinates ``bary`` (4,3) and weights summing to 1/2
    (the reference triangle area); TRIANGLE_QUADRATURE in CSEARCH.h:468-483
    multiplies by 2*area of the actual triangle.
    """

    def __init__(self):
        pts1, wts1 = _gauss_1d(2)
        bary = []
        wts = []
        for i in range(2):
            for j in range(2):
                l0 = (1.0 + pts1[i]) / 2.0
                l1 = (1.0 - pts1[i]) * (1.0 + pts1[j]) / 4.0
                bary.append([l0, l1, 1.0 - l0 - l1])
                wts.append((1.0 - pts1[i]) / 8.0 * wts1[i] * wts1[j])
        self.bary = np.array(bary)     # (4,3)
        self.weights = np.array(wts)   # (4,)
        self.n_gp = 4


HEX_QUAD = HexQuadrature()
QUAD_QUAD = QuadQuadrature()
TRI_QUAD = TriangleQuadrature()


def surface_jacobian(nat: np.ndarray, corners: np.ndarray) -> np.ndarray:
    """Area Jacobian |dx/dxi x dx/deta| of a quad4 face (PREP.h:364-389).

    nat (...,2) natural coords, corners (...,4,3) -> (...,) scalar weight.
    """
    dN = quad4_shape_grad(nat)                      # (...,2,4)
    tang = dN @ np.asarray(corners, dtype=np.float64)  # (...,2,3)
    crs = np.cross(tang[..., 0, :], tang[..., 1, :])
    return np.linalg.norm(crs, axis=-1)
