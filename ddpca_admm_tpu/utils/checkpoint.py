"""ADMM state checkpoint/resume.

The reference has no resume capability (SURVEY.md section 5: state is only
written as final text files).  Here the entire solver state is one pytree
(u, z, lambda, monitors), so checkpointing is a straight serialization; the
stepwise driver can resume an interrupted run exactly.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np

from ..admm.loop import AdmmState, GroupState


def save_state(path: str, state: AdmmState) -> None:
    host = jax.tree_util.tree_map(lambda x: np.asarray(x), state)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(host, f)


def load_state(path: str) -> AdmmState:
    with open(path, "rb") as f:
        host = pickle.load(f)
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.asarray, host)
