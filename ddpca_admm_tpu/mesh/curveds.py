"""Exact curved surfaces as structured point grids (reference CURVEDS).

A CurvedSurface stores an (ni, nj) structured grid of points lying exactly on
the true geometry (circle, tooth flank, ...).  Its one non-obvious operation
is REFINE_SEARCH (CURVEDS.h:37-56): given the corner points of a mesh entity
(edge/face) whose nodes all lie on the surface, average their *grid indices*
and return the stored point there — so bisection nodes land ON the exact
surface instead of at the chord midpoint.  ``plan_surf`` packages this for
:meth:`HexMesh.refine`.
"""

from __future__ import annotations

import numpy as np

from ..utils.quadrature import HEX_EDGES, HEX_FACES
from .hexmesh import HexMesh, coord_keys


class CurvedSurface:
    def __init__(self, grid: np.ndarray):
        """grid: (ni, nj, 3) exact surface points."""
        self.grid = np.asarray(grid, dtype=np.float64)
        self._rebuild_map()

    def _rebuild_map(self) -> None:
        ni, nj, _ = self.grid.shape
        keys = coord_keys(self.grid.reshape(-1, 3))
        self._map: dict[tuple[int, int, int], tuple[int, int]] = {}
        for flat, row in enumerate(keys):
            self._map[tuple(int(v) for v in row)] = (flat // nj, flat % nj)

    # ------------------------------------------------------------------ query
    def contains(self, coords: np.ndarray) -> np.ndarray:
        """Boolean mask: are these points stored surface points?"""
        coords = np.asarray(coords, dtype=np.float64)
        keys = coord_keys(coords.reshape(-1, 3))
        out = np.fromiter(
            (tuple(int(v) for v in k) in self._map for k in keys),
            dtype=bool,
            count=keys.shape[0],
        )
        return out.reshape(coords.shape[:-1])

    def indices(self, coords: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(found mask, (.,2) indices) for a batch of points."""
        coords = np.asarray(coords, dtype=np.float64)
        keys = coord_keys(coords.reshape(-1, 3))
        n = keys.shape[0]
        found = np.zeros(n, dtype=bool)
        idx = np.zeros((n, 2), dtype=np.int64)
        for r, k in enumerate(keys):
            hit = self._map.get(tuple(int(v) for v in k))
            if hit is not None:
                found[r] = True
                idx[r] = hit
        return found.reshape(coords.shape[:-1]), idx.reshape(
            coords.shape[:-1] + (2,)
        )

    def refine_search(self, corner_coords: np.ndarray):
        """CURVEDS::REFINE_SEARCH: all corners on surface -> grid point at
        the integer-average index; else None."""
        found, idx = self.indices(corner_coords)
        if not found.all():
            return None
        mean = idx.sum(axis=0) // idx.shape[0]
        return self.grid[int(mean[0]), int(mean[1])]

    # ------------------------------------------------------------- refinement
    def plan_surf(
        self, mesh: HexMesh, elems: np.ndarray, plan: dict | None = None
    ) -> dict:
        """CURVEDS::REFINE (CURVEDS.h:58-101): for each marked element,
        harvest exact-surface midpoints for all 12 edges and 6 faces whose
        nodes all lie on this surface.  Accumulates into/returns ``plan``."""
        plan = {} if plan is None else plan
        elems = np.asarray(elems, dtype=np.int64)
        corn = mesh.elem_corn[elems]
        for table in (HEX_EDGES, HEX_FACES):
            nodes = corn[:, table]                     # (E, n_ent, k)
            k = table.shape[1]
            flat_nodes = nodes.reshape(-1, k)
            coords = mesh.coords[flat_nodes]           # (E*n_ent, k, 3)
            found, idx = self.indices(coords)
            all_on = found.all(axis=1)
            for r in np.nonzero(all_on)[0]:
                mean = idx[r].sum(axis=0) // k
                key = tuple(int(v) for v in np.sort(flat_nodes[r]))
                plan[key] = self.grid[int(mean[0]), int(mean[1])]
        return plan

    def rigid_transform(self, rot: np.ndarray, trans: np.ndarray) -> None:
        """CURVEDS::RIGI_ROTR (CURVEDS.h:103-119)."""
        self.grid = self.grid @ np.asarray(rot, dtype=np.float64).T + np.asarray(
            trans, dtype=np.float64
        )
        self._rebuild_map()

    def copy(self) -> "CurvedSurface":
        return CurvedSurface(self.grid.copy())
