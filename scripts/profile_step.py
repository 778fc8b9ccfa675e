"""Ablation timing of one ADMM step on the bench problem: which phase of
the iteration carries the wall-clock (body MG-PCG, coarse-correction CG,
interface mass solves)?  Used to target latency-bound inner loops; writes
nothing — prints one JSON line."""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("DDPCA_BENCH_SIZE", "small")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(f, n=10):
    import jax
    import numpy as np

    r = f()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    # host-value fence: through the axon relay block_until_ready can return
    # early (scripts/roofline.py provenance)
    float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    return (time.perf_counter() - t0) / n


def main() -> None:
    import jax

    from bench import SIZE_LEVE, build
    from ddpca_admm_tpu.admm.loop import init_state, make_admm_step

    size = os.environ["DDPCA_BENCH_SIZE"]
    prob, meta = build(SIZE_LEVE[size])
    modes = tuple(meta.group_modes)

    st0 = init_state(prob)
    variants = {
        "full": dict(),
        "mass_maxiter_2": dict(mass_maxiter=2),
        "mass2_inner2": dict(mass_maxiter=2, inner_maxiter=2),
    }
    out = {"size": size}

    from functools import partial

    # prob is a jit ARGUMENT (closure constants blow the remote-compile
    # payload limit, HTTP 413 — same rule as admm_step / roofline.py)
    @partial(jax.jit, static_argnames=("mass_maxiter", "inner_maxiter"))
    def step_fn(prob, state, mass_maxiter=200, inner_maxiter=500):
        return make_admm_step(
            prob, modes, mass_maxiter=mass_maxiter,
            inner_maxiter=inner_maxiter,
        )(state)

    for name, kw in variants.items():
        f = lambda p, s, kw=kw: step_fn(p, s, **kw)
        st = f(prob, f(prob, st0))
        out[name + "_s"] = round(timeit(lambda: f(prob, st)), 4)
    st = step_fn(prob, step_fn(prob, st0))
    st_frozen = st._replace(mult_frozen=st.mult_frozen | True)
    out["coarse_frozen_s"] = round(
        timeit(lambda: step_fn(prob, st_frozen)), 4
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
