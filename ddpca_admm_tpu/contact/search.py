"""Global contact search: bucket sort + pairwise mortar segmentation.

Host-side re-design of CSEARCH (CSEARCH.h:97-230 bucket search, :735-817
CONTACT_SEARCH / SEGMENT_INTERSECT): master element faces are hashed into a
2-D bucket grid in user-supplied curvilinear coordinates; each slave face is
clipped against the masters of its 3x3 bucket neighborhood; every clipped
sub-triangle contributes 4 mortar integration points with shape functions on
both sides, a basis triad from the master tangents, the initial normal gap,
and the quadrature weight.

Everything is array-batched: candidate pairs are enumerated with NumPy and a
single vectorized clip/projection pass processes all of them.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..mesh.hexmesh import HexMesh
from ..utils.quadrature import HEX_FACES, quad4_shape
from .geometry import (
    clip_pairs,
    project_normal_to_quads,
    project_points_to_quads,
    quad4_eval,
    quad4_tangents,
    bilinear_coeffs,
    triangle_gauss,
)


@dataclass
class IntegralPoints:
    """Structure-of-arrays mortar integration points (INTEGRAL_POINT,
    CSEARCH.h:19-32).  n = number of points."""

    nodes: np.ndarray      # (2, n, 4) master/slave face nodes
    shape: np.ndarray      # (2, n, 4) shape functions both sides
    points: np.ndarray     # (2, n, 3) contact points both sides
    basis: np.ndarray      # (n, 3, 3) rows: normal, tangent1, tangent2
    gap: np.ndarray        # (n,) initial normal gap
    weight: np.ndarray     # (n,) quadrature weight (incl. area Jacobian)
    pair: np.ndarray       # (n,) candidate-pair index (diagnostics)
    # accepted candidate pairs in SEARCH ORDER, pre point-filter: (2, P, 4)
    # master/slave face node quadruples (OUTPUT_COSE parity — the reference
    # writes every paired segment, CSEARCH.h:178-203, even when all of its
    # integration points are later dropped)
    seg_nodes: np.ndarray | None = None

    @property
    def n(self) -> int:
        return self.gap.shape[0]

    @classmethod
    def empty(cls) -> "IntegralPoints":
        return cls(
            nodes=np.zeros((2, 0, 4), dtype=np.int64),
            shape=np.zeros((2, 0, 4)),
            points=np.zeros((2, 0, 3)),
            basis=np.zeros((0, 3, 3)),
            gap=np.zeros(0),
            weight=np.zeros(0),
            pair=np.zeros(0, dtype=np.int64),
        )


def surface_faces(mesh: HexMesh, on_surface) -> np.ndarray:
    """EFACE_SURFACE (CSEARCH.h:35-81): leaf element faces whose 4 nodes all
    satisfy ``on_surface`` (a CurvedSurface.contains or coordinate predicate).

    Returns (F,4) node ids (reference face orientation, outward normal).
    """
    leaves = mesh.leaf_elems()
    faces = mesh.elem_corn[leaves][:, HEX_FACES]         # (L,6,4)
    flat = faces.reshape(-1, 4)
    mask = on_surface(mesh.coords[flat].reshape(-1, 4, 3)).all(axis=1)
    return flat[mask]


def face_curvilinear_centroids(
    mesh: HexMesh, faces: np.ndarray, cart_curv
) -> np.ndarray:
    """Average curvilinear (xi,eta) of each face's 4 nodes (ADAPTIVE_REFINE's
    CART_CURV convention, CSEARCH.h:858-882)."""
    uv = cart_curv(mesh.coords[faces.reshape(-1)])       # (F*4, 2)
    return uv.reshape(-1, 4, 2).mean(axis=1)


def face_curvilinear_boxes(
    mesh: HexMesh, faces: np.ndarray, cart_curv
) -> np.ndarray:
    """Per-face (lo,hi) bounds of the 4 corner uv coordinates -> (F,2,2)."""
    uv = cart_curv(mesh.coords[faces.reshape(-1)]).reshape(-1, 4, 2)
    return np.stack([uv.min(axis=1), uv.max(axis=1)], axis=1)


def bucket_pairs(
    mast_uv: np.ndarray,
    slav_uv: np.ndarray,
    divisions: tuple[int, int],
    mast_uv_box: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """BUCKET_SORT + 3x3 neighborhood candidate enumeration
    (CSEARCH.h:205-230, 777-807).  Returns (master_idx, slave_idx) arrays.

    ``mast_uv_box`` (M,2,2) = per-master-face (lo,hi) uv bounds.  When given,
    each master is hashed into *every* bucket its box overlaps (not just its
    centroid bucket) — required when master faces are larger than a bucket
    (non-matched mesh resolutions, e.g. a coarse worm flank vs a fine wheel
    flank); the centroid hash then misses the covering master entirely."""
    div = np.asarray(divisions, dtype=np.int64)
    lo = mast_uv.min(axis=0)
    hi = mast_uv.max(axis=0)
    inc = (hi - lo) / div
    inc = np.where(np.abs(inc) < 1e-10, 1e-10, inc)
    lo = lo - inc
    hi = hi + inc
    width = (hi - lo) / div

    if mast_uv_box is not None:
        b_lo = np.clip(
            np.floor((mast_uv_box[:, 0] - lo) / width).astype(np.int64),
            0, div - 1,
        )
        b_hi = np.clip(
            np.floor((mast_uv_box[:, 1] - lo) / width).astype(np.int64),
            0, div - 1,
        )
        span = b_hi - b_lo + 1                       # (M,2)
        counts_m = span[:, 0] * span[:, 1]
        midx = np.repeat(np.arange(mast_uv.shape[0]), counts_m)
        offs = np.arange(counts_m.sum()) - np.repeat(
            np.cumsum(counts_m) - counts_m, counts_m
        )
        bi = b_lo[midx, 0] + offs // span[midx, 1]
        bj = b_lo[midx, 1] + offs % span[midx, 1]
        mkey = bi * div[1] + bj
        master_of_entry = midx
    else:
        mb = np.floor((mast_uv - lo) / width).astype(np.int64)
        mb = np.clip(mb, 0, div - 1)
        mkey = mb[:, 0] * div[1] + mb[:, 1]
        master_of_entry = np.arange(mast_uv.shape[0])
    order = np.argsort(mkey, kind="stable")
    sorted_keys = mkey[order]

    sb = np.floor((slav_uv - lo) / width).astype(np.int64)
    in_range = ((sb >= 0) & (sb < div)).all(axis=1)

    pairs_m, pairs_s = [], []
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            nb = sb + np.array([di, dj])
            ok = in_range & ((nb >= 0) & (nb < div)).all(axis=1)
            keys = nb[:, 0] * div[1] + nb[:, 1]
            left = np.searchsorted(sorted_keys, keys, side="left")
            right = np.searchsorted(sorted_keys, keys, side="right")
            counts = np.where(ok, right - left, 0)
            total = counts.sum()
            if total == 0:
                continue
            srep = np.repeat(np.arange(slav_uv.shape[0]), counts)
            offs = np.arange(total) - np.repeat(
                np.cumsum(counts) - counts, counts
            )
            mrep = master_of_entry[order[np.repeat(left, counts) + offs]]
            pairs_m.append(mrep)
            pairs_s.append(srep)
    if not pairs_m:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    pm = np.concatenate(pairs_m)
    ps = np.concatenate(pairs_s)
    if mast_uv_box is not None:
        # box-hashed masters occupy several buckets -> dedup (m,s) pairs
        uniq = np.unique(pm * np.int64(slav_uv.shape[0]) + ps)
        pm, ps = uniq // slav_uv.shape[0], uniq % slav_uv.shape[0]
    return pm, ps


def mortar_integrate(
    mast_corners: np.ndarray,
    slav_corners: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized SEGMENT_INTERSECT over P face pairs.

    mast_corners/slav_corners: (P,4,3).
    Returns per integration point (flattened over pairs, valid masked):
    (pair_idx (I,), mast_xi (I,2), slav_xi (I,2), weight (I,), basis (I,3,3),
    gap (I,)).
    """
    P = mast_corners.shape[0]
    if P == 0:
        z = np.zeros(0)
        return (
            np.zeros(0, dtype=np.int64),
            np.zeros((0, 2)),
            np.zeros((0, 2)),
            z,
            np.zeros((0, 3, 3)),
            z,
        )
    # cheap 3-D bounding-sphere prefilter: most bucket candidates don't
    # overlap; skip the Newton projections + clipping for those entirely
    mc = mast_corners.mean(axis=1)
    sc = slav_corners.mean(axis=1)
    mr = np.linalg.norm(mast_corners - mc[:, None], axis=-1).max(axis=1)
    sr = np.linalg.norm(slav_corners - sc[:, None], axis=-1).max(axis=1)
    near = np.linalg.norm(mc - sc, axis=-1) <= 1.05 * (mr + sr)
    if not near.all():
        sub = mortar_integrate(mast_corners[near], slav_corners[near])
        remap = np.nonzero(near)[0]
        return (remap[sub[0]],) + sub[1:]
    # project slave corners into master natural plane (PROJECT_STM per corner)
    mc_rep = np.repeat(mast_corners, 4, axis=0)           # (P*4,4,3)
    sp_flat = slav_corners.reshape(-1, 3)                 # (P*4,3)
    slav_proj, _ = project_points_to_quads(mc_rep, sp_flat)
    slav_proj = slav_proj.reshape(P, 4, 2)

    tri, tri_valid, _ = clip_pairs(slav_proj)             # (P,T,3,2)
    g_xi, g_w = triangle_gauss(tri)                       # (P,T,4,2), (P,T,4)
    g_valid = np.broadcast_to(tri_valid[..., None], g_w.shape)

    pair_idx, tri_i, gp_i = np.nonzero(g_valid)
    if pair_idx.size == 0:
        z = np.zeros(0)
        return (
            np.zeros(0, dtype=np.int64),
            np.zeros((0, 2)),
            np.zeros((0, 2)),
            z,
            np.zeros((0, 3, 3)),
            z,
        )
    mast_xi = g_xi[pair_idx, tri_i, gp_i]                 # (I,2)
    w_ref = g_w[pair_idx, tri_i, gp_i]                    # (I,)

    mcoef = bilinear_coeffs(mast_corners[pair_idx])       # (I,4,3)
    mpoint = quad4_eval(mcoef, mast_xi)
    t1, t2 = quad4_tangents(mcoef, mast_xi)
    nvec = np.cross(t1, t2)
    jac = np.linalg.norm(nvec, axis=-1)
    nhat = nvec / jac[..., None]
    basis = np.stack(
        [nhat, t1 / np.linalg.norm(t1, axis=-1, keepdims=True),
         t2 / np.linalg.norm(t2, axis=-1, keepdims=True)],
        axis=1,
    )                                                      # (I,3,3)

    slav_xi, gap = project_normal_to_quads(
        t1, t2, mpoint, slav_corners[pair_idx]
    )
    weight = w_ref * jac
    return pair_idx, mast_xi, slav_xi, weight, basis, gap


def region_search(
    mast_faces: np.ndarray,
    slav_faces: np.ndarray,
    mast_mesh: HexMesh,
    slav_mesh: HexMesh,
    cart_curv,
    divisions: tuple[int, int],
    max_dist: float = 1.0e12,
) -> IntegralPoints:
    """CONTACT_SEARCH for one region (CSEARCH.h:777-817): bucket candidates,
    clip, and keep every integration point of pairs whose minimum initial gap
    is <= max_dist."""
    mast_uv = face_curvilinear_centroids(mast_mesh, mast_faces, cart_curv)
    slav_uv = face_curvilinear_centroids(slav_mesh, slav_faces, cart_curv)
    mast_box = face_curvilinear_boxes(mast_mesh, mast_faces, cart_curv)
    pm, ps = bucket_pairs(mast_uv, slav_uv, divisions, mast_uv_box=mast_box)
    if pm.size == 0:
        return IntegralPoints.empty()
    mast_c = mast_mesh.coords[mast_faces[pm]]             # (P,4,3)
    slav_c = slav_mesh.coords[slav_faces[ps]]
    pair_idx, mast_xi, slav_xi, weight, basis, gap = mortar_integrate(
        mast_c, slav_c
    )
    if pair_idx.size == 0:
        return IntegralPoints.empty()
    # pair acceptance: any point with gap <= max_dist keeps the whole pair
    # (CSEARCH.h:794-803)
    nP = pm.size
    pair_min = np.full(nP, np.inf)
    np.minimum.at(pair_min, pair_idx, gap)
    keep_pair = pair_min <= max_dist
    seg_nodes = np.stack(
        [mast_faces[pm[keep_pair]], slav_faces[ps[keep_pair]]]
    )
    keep = keep_pair[pair_idx]
    pair_idx = pair_idx[keep]
    mast_xi, slav_xi = mast_xi[keep], slav_xi[keep]
    weight, basis, gap = weight[keep], basis[keep], gap[keep]

    mshape = quad4_shape(mast_xi)                         # (I,4)
    sshape = quad4_shape(slav_xi)
    mcoef = bilinear_coeffs(mast_mesh.coords[mast_faces[pm[pair_idx]]])
    scoef = bilinear_coeffs(slav_mesh.coords[slav_faces[ps[pair_idx]]])
    mpts = quad4_eval(mcoef, mast_xi)
    spts = quad4_eval(scoef, slav_xi)
    return IntegralPoints(
        nodes=np.stack([mast_faces[pm[pair_idx]], slav_faces[ps[pair_idx]]]),
        shape=np.stack([mshape, sshape]),
        points=np.stack([mpts, spts]),
        basis=basis,
        gap=gap,
        seg_nodes=seg_nodes,
        weight=weight,
        pair=pair_idx,
    )
