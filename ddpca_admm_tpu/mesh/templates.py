"""Octree hex refinement templates, generated from first principles.

The reference hard-codes ~250 lines of index tables for its 7 refinement
patterns (MULTIGRID.h:382-478 refiTemp_1/refiTemp_2/refiElem_1, 551-614
pareLine/pareFace, 759-792 elemLine/elemFace).  Here every table is *derived*
from the bisection geometry, which both documents the meaning and guarantees
internal consistency:

  pattern encoding (PREP.h:210-212, TREE_ELEM.refiPatt):
    0 - split xi,eta,zeta   1 - xi,eta   2 - eta,zeta   3 - zeta,xi
    4 - xi   5 - eta   6 - zeta   7 - leaf (not refined)

Geometry model: the parent cell is the integer cube {0,2}^3 in (xi,eta,zeta);
splitting an axis introduces coordinate 1.  A template node at position
p in {0,1,2}^3 is defined by the corner subset of the minimal face/edge
containing p (axes with p=1 contribute both 0 and 2; others are fixed), and
its coordinate defaults to the average of those corners — exactly the
reference's planSurf/averaging rule (MULTIGRID.h:494-512).

Child ordering matches the reference (refiElem_1): children are enumerated
with the pattern's *first named axis varying fastest* (e.g. pattern 3
"zeta,xi" -> zeta fastest), which callers rely on via spliFlag.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from itertools import product

import numpy as np

from ..utils.quadrature import HEX_CORNERS, HEX_EDGES, HEX_FACES

# pattern -> ordered split axes (first = fastest-varying child index)
PATTERN_AXES: dict[int, tuple[int, ...]] = {
    0: (0, 1, 2),
    1: (0, 1),
    2: (1, 2),
    3: (2, 0),
    4: (0,),
    5: (1,),
    6: (2,),
}
LEAF_PATT = 7

# corner index <-> position in {0,2}^3
_CORNER_POS = ((HEX_CORNERS + 1.0).astype(np.int64))  # (8,3) values in {0,2}
_POS_TO_CORNER = {tuple(p): i for i, p in enumerate(_CORNER_POS)}


def _defining_corners(pos: tuple[int, int, int]) -> tuple[int, ...]:
    """Corner indices whose average gives template position ``pos``."""
    choices = [((0, 2) if c == 1 else (c,)) for c in pos]
    corners = [_POS_TO_CORNER[p] for p in product(*choices)]
    return tuple(sorted(corners))


@dataclass(frozen=True)
class NewNode:
    """A node created by bisection: template position + defining corners."""

    pos: tuple[int, int, int]
    corners: tuple[int, ...]          # parent corner indices (sorted)
    kind: str                         # 'edge' | 'face' | 'center'
    # locator: (child ordinal, corner-of-child index) that holds this node
    child: int = -1
    child_corner: int = -1


@dataclass(frozen=True)
class PatternTemplate:
    axes: tuple[int, ...]
    # children: each entry is (8,3) int array of corner template positions
    child_corner_pos: np.ndarray      # (n_children, 8, 3)
    new_nodes: tuple[NewNode, ...]    # bisection nodes (non-corner positions)
    # 2:1 rule tables: per child, parent edges / faces whose refinement forces
    # neighbor refinement (MULTIGRID.h GRLE_CHECK pareLine/pareFace semantics)
    touched_edges: tuple[tuple[int, ...], ...]   # per child: edge indices 0-11
    touched_faces: tuple[tuple[int, ...], ...]   # per child: face indices 0-5


def _child_boxes(axes: tuple[int, ...]) -> list[np.ndarray]:
    """Boxes [(lo,hi) per axis] of each child, reference child ordering."""
    n = len(axes)
    boxes = []
    for idx in range(1 << n):
        lo = np.zeros(3, dtype=np.int64)
        hi = np.full(3, 2, dtype=np.int64)
        for k, ax in enumerate(axes):           # axes[0] varies fastest
            bit = (idx >> k) & 1
            lo[ax], hi[ax] = bit, bit + 1
        boxes.append(np.stack([lo, hi]))
    return boxes


def _build_pattern(s: int) -> PatternTemplate:
    axes = PATTERN_AXES[s]
    split = set(axes)
    boxes = _child_boxes(axes)

    child_pos = []
    for box in boxes:
        lo, hi = box
        corners = []
        for c in range(8):
            base = _CORNER_POS[c]               # {0,2}^3
            pos = np.where(base == 0, lo, hi)
            corners.append(pos)
        child_pos.append(np.stack(corners))
    child_pos = np.stack(child_pos)             # (nc, 8, 3)

    # enumerate bisection nodes
    new_nodes: list[NewNode] = []
    seen: set[tuple[int, int, int]] = set()

    def add(pos: np.ndarray, kind: str) -> None:
        key = tuple(int(v) for v in pos)
        if key in seen:
            return
        seen.add(key)
        # locate inside some child
        for ci in range(child_pos.shape[0]):
            match = np.nonzero((child_pos[ci] == np.asarray(key)).all(axis=1))[0]
            if match.size:
                new_nodes.append(
                    NewNode(key, _defining_corners(key), kind, ci, int(match[0]))
                )
                return
        raise AssertionError(f"template node {key} not found in any child")

    for e in range(12):
        a, b = HEX_EDGES[e]
        d = int(np.nonzero(_CORNER_POS[a] != _CORNER_POS[b])[0][0])
        if d in split:
            add((_CORNER_POS[a] + _CORNER_POS[b]) // 2, "edge")
    for f in range(6):
        fc = _CORNER_POS[HEX_FACES[f]]
        normal = int(np.nonzero(fc.std(axis=0) == 0)[0][0])
        in_plane = [d for d in range(3) if d != normal]
        if all(d in split for d in in_plane):
            add(fc.sum(axis=0) // 4, "face")
    if len(split) == 3:
        add(np.array([1, 1, 1]), "center")

    # 2:1 tables
    touched_edges, touched_faces = [], []
    for box in boxes:
        lo, hi = box
        te, tf = [], []
        for e in range(12):
            a, b = HEX_EDGES[e]
            pa, pb = _CORNER_POS[a], _CORNER_POS[b]
            d = int(np.nonzero(pa != pb)[0][0])
            if d not in split:
                continue  # edge not bisected -> no hanging node on it
            fixed = [ax for ax in range(3) if ax != d]
            # edge touched iff its fixed coords lie within the child's box
            # (the child's boundary passes through the edge)
            if all(lo[ax] <= pa[ax] <= hi[ax] for ax in fixed):
                te.append(e)
        for f in range(6):
            fc = _CORNER_POS[HEX_FACES[f]]
            normal = int(np.nonzero(fc.std(axis=0) == 0)[0][0])
            nval = int(fc[0, normal])
            in_plane = [d for d in range(3) if d != normal]
            if not any(d in split for d in in_plane):
                continue  # face not subdivided
            if lo[normal] <= nval <= hi[normal]:
                tf.append(f)
        touched_edges.append(tuple(te))
        touched_faces.append(tuple(tf))

    return PatternTemplate(
        axes=axes,
        child_corner_pos=child_pos,
        new_nodes=tuple(new_nodes),
        touched_edges=tuple(touched_edges),
        touched_faces=tuple(touched_faces),
    )


TEMPLATES: dict[int, PatternTemplate] = {s: _build_pattern(s) for s in PATTERN_AXES}


# Convenience: per pattern, arrays for vectorized refinement --------------------
@dataclass(frozen=True)
class PatternArrays:
    n_children: int
    # for each template position used by children: is it a corner (then which)
    # or a new node (then which)?
    child_src_is_corner: np.ndarray   # (nc, 8) bool
    child_src_index: np.ndarray       # (nc, 8) corner idx or new-node idx
    new_corners_list: tuple[np.ndarray, ...]  # per new node: defining corners
    new_kinds: tuple[str, ...]
    new_child_loc: np.ndarray         # (n_new, 2) (child, corner) locator


def _build_arrays(s: int) -> PatternArrays:
    t = TEMPLATES[s]
    pos_to_new = {n.pos: i for i, n in enumerate(t.new_nodes)}
    nc = t.child_corner_pos.shape[0]
    is_corner = np.zeros((nc, 8), dtype=bool)
    src = np.zeros((nc, 8), dtype=np.int64)
    for ci in range(nc):
        for k in range(8):
            pos = tuple(int(v) for v in t.child_corner_pos[ci, k])
            if pos in _POS_TO_CORNER:
                is_corner[ci, k] = True
                src[ci, k] = _POS_TO_CORNER[pos]
            else:
                src[ci, k] = pos_to_new[pos]
    return PatternArrays(
        n_children=nc,
        child_src_is_corner=is_corner,
        child_src_index=src,
        new_corners_list=tuple(np.array(n.corners) for n in t.new_nodes),
        new_kinds=tuple(n.kind for n in t.new_nodes),
        new_child_loc=np.array([[n.child, n.child_corner] for n in t.new_nodes])
        if t.new_nodes else np.zeros((0, 2), dtype=np.int64),
    )


PATTERN_ARRAYS: dict[int, PatternArrays] = {s: _build_arrays(s) for s in PATTERN_AXES}

# edge direction axis per hex edge, and face normal axis per hex face
EDGE_AXIS = np.array(
    [int(np.nonzero(_CORNER_POS[a] != _CORNER_POS[b])[0][0]) for a, b in HEX_EDGES]
)
FACE_NORMAL_AXIS = np.array(
    [
        int(np.nonzero(_CORNER_POS[HEX_FACES[f]].std(axis=0) == 0)[0][0])
        for f in range(6)
    ]
)
