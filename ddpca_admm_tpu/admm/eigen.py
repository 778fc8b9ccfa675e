"""APPS: automatic-penalty-parameter eigen-analysis (MCONTACT.h:2343-2476).

The reference runs a Spectra Lanczos solver for the 10 smallest-magnitude
eigenpairs of the interface-eliminated global coarse operator globCoup_1
(tolerance 1e-6, MCONTACT.h:2350-2365), writes eigenvalue +
force-correlation pairs to resuFreq.txt, and prolongates every mode to each
body as a resuDisp-style file named ``resuDisp_<mode>-<body>.txt``
(MCONTACT.h:2378-2400).

Here the same matrix comes from :func:`multiscale.glob_coup_1`; below
``DENSE_EIGH_MAXI`` a dense host eigendecomposition is exact, above it
``scipy.sparse.linalg.eigsh`` in shift-invert mode plays Spectra's role
(both are host setup code — the analysis runs once, not per iteration).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Sequence

import numpy as np
import scipy.linalg
import scipy.sparse.linalg as spla

from ..fem.constraints import ConstrainedSystem
from .multiscale import glob_coup_1, glob_forc_1
from .operators import RegionOps

DENSE_EIGH_MAXI = 3000


@dataclass
class AppsResult:
    vals: np.ndarray          # (n_freq,) smallest-|.| eigenvalues
    corr: np.ndarray          # (n_freq,) correlation with normalized force
    modes: np.ndarray         # (Nc, n_freq) coarse eigenvectors
    body_modes: list          # per mode: list of per-body FULL displacements


def run_apps(
    systems: Sequence[ConstrainedSystem],
    regions: Sequence[RegionOps],
    dole: Sequence[int],
    n_freq: int = 10,
) -> AppsResult:
    """The APPS pipeline on globCoup_1 (MCONTACT.h:2343-2412)."""
    G, F, base, XF = glob_coup_1(systems, regions, list(dole))
    forc = glob_forc_1(systems, regions, F, base, XF)
    Nc = G.shape[0]
    n_freq = min(n_freq, Nc - 1)
    if Nc <= DENSE_EIGH_MAXI:
        w, V = scipy.linalg.eigh(G.toarray())
        order = np.argsort(np.abs(w))[:n_freq]
        vals, modes = w[order], V[:, order]
    else:
        # Spectra SmallestMagn equivalent: shift-invert Lanczos about 0
        # (sigma=0 factorizes G once; LM in shift-invert = smallest |w|).
        # A singular/semi-definite G (weakly constrained body) makes the
        # sigma=0 factorization fail where Spectra's plain Lanczos would
        # tolerate it — retry with a tiny diagonal-relative shift.
        Gc = G.tocsc()
        try:
            w, V = spla.eigsh(Gc, k=n_freq, sigma=0.0, which="LM",
                              tol=1.0e-6)
        except RuntimeError:
            sigma = -1.0e-12 * float(np.abs(Gc.diagonal()).max())
            w, V = spla.eigsh(Gc, k=n_freq, sigma=sigma, which="LM",
                              tol=1.0e-6)
        order = np.argsort(np.abs(w))
        vals, modes = w[order], V[:, order]
    fn = forc / (np.linalg.norm(forc) + 1e-300)
    corr = modes.T @ fn

    body_modes = []
    for f in range(n_freq):
        per_body = []
        for v, s in enumerate(systems):
            blk = modes[base[v] : base[v + 1], f]
            per_body.append(s.expand @ (F[v] @ blk))   # full 3N, no lift
        body_modes.append(per_body)
    return AppsResult(vals=vals, corr=corr, modes=modes,
                      body_modes=body_modes)


def run_apps_mpl(
    systems: Sequence[ConstrainedSystem],
    regions: Sequence[RegionOps],
    meshes: Sequence,
    dole: Sequence[int],
    n_freq: int = 10,
) -> AppsResult:
    """APPS_MPL (MCONTACT.h:2405-2474): the same smallest-|.| eigen-analysis
    on the variant-A coarse operator globCoup (body coarse DOFs + macroscopic
    interface unknowns); mode shapes prolongate the body blocks only."""
    from .multiscale import glob_coup_a

    G, F, base, fico, macro_base, XF, n_macro = glob_coup_a(
        systems, regions, meshes, list(dole)
    )
    Nc = G.shape[0]
    n_freq = min(n_freq, Nc - 1)
    if Nc <= DENSE_EIGH_MAXI:
        w, V = scipy.linalg.eigh(G.toarray())
        order = np.argsort(np.abs(w))[:n_freq]
        vals, modes = w[order], V[:, order]
    else:
        Gc = G.tocsc()
        try:
            w, V = spla.eigsh(Gc, k=n_freq, sigma=0.0, which="LM",
                              tol=1.0e-6)
        except RuntimeError:
            sigma = -1.0e-12 * float(np.abs(Gc.diagonal()).max())
            w, V = spla.eigsh(Gc, k=n_freq, sigma=sigma, which="LM",
                              tol=1.0e-6)
        order = np.argsort(np.abs(w))
        vals, modes = w[order], V[:, order]
    # force correlation against the body-block coarse force
    forc = np.zeros(Nc)
    for v, s in enumerate(systems):
        forc[base[v] : base[v + 1]] = F[v].T @ s.cons_forc
    fn = forc / (np.linalg.norm(forc) + 1e-300)
    corr = modes.T @ fn

    body_modes = []
    for f in range(n_freq):
        per_body = []
        for v, s in enumerate(systems):
            blk = modes[base[v] : base[v + 1], f]
            per_body.append(s.expand @ (F[v] @ blk))
        body_modes.append(per_body)
    return AppsResult(vals=vals, corr=corr, modes=modes,
                      body_modes=body_modes)


def write_freq(outdir: str, vals: np.ndarray, corr: np.ndarray) -> None:
    """resuFreq.txt (MCONTACT.h:2368-2376)."""
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "resuFreq.txt"), "w") as f:
        for v, c in zip(vals, corr):
            f.write(f"{v:>30.20e}{c:>30.20e}\n")


def write_modes(outdir: str, res: AppsResult, bodies) -> None:
    """Per-body mode-shape files ``resuDisp_<mode>-<body>.txt``
    (MCONTACT.h:2378-2400 OUTP_SUB2 with the "<tf+1>-<tv>" ident)."""
    from ..utils import io as rio

    for f, per_body in enumerate(res.body_modes):
        for v, (body, disp) in enumerate(zip(bodies, per_body)):
            rio.write_displacement(
                outdir, disp, f"{f + 1}-{v}", body.node_rota
            )
