"""Multi-chip sharding of the ADMM problem over a ``domain`` device mesh.

The reference parallelizes the ADMM x-update with OpenMP over subdomains
(MCONTACT.h:2511-2538) in shared memory.  The TPU-native equivalent: the
batched body axis (B) of every solver array is sharded over the mesh axis
``domain`` — each chip owns a slice of subdomains and runs their multigrid
V-cycles locally; the interface consensus (z/lambda updates need the
neighbor body's trace B_p^T u) crosses chips, which XLA lowers to
all-gather/reduce-scatter collectives over ICI from the sharding constraints
alone (GSPMD).  The coarse-space correction is replicated (small by
construction), mirroring the reference's sequential coarse solve.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..admm.loop import AdmmState
from ..admm.problem import AdmmProblem


def domain_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), axis_names=("domain",))


def shard_problem(prob: AdmmProblem, mesh: Mesh) -> AdmmProblem:
    """Place body-batched arrays (leading dim B) on P('domain'); replicate
    everything else (region operators, coarse correction)."""
    B = prob.cons_forc.shape[0]
    n_dev = mesh.devices.size
    sharded = NamedSharding(mesh, P("domain"))
    replicated = NamedSharding(mesh, P())

    def place(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == B and B % n_dev == 0:
            return jax.device_put(x, sharded)
        if hasattr(x, "shape"):
            return jax.device_put(x, replicated)
        return x

    return jax.tree_util.tree_map(place, prob)


def shard_state(state: AdmmState, prob: AdmmProblem, mesh: Mesh) -> AdmmState:
    B = prob.cons_forc.shape[0]
    n_dev = mesh.devices.size
    sharded = NamedSharding(mesh, P("domain"))
    replicated = NamedSharding(mesh, P())

    def place(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == B and B % n_dev == 0:
            return jax.device_put(x, sharded)
        if hasattr(x, "shape"):
            return jax.device_put(x, replicated)
        return x

    return jax.tree_util.tree_map(place, state)
