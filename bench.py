"""Benchmark: ADMM iterations/second on the BLOCK contact problem (real TPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config: the 3-block patch-test problem (9 bodies, ~55k DOF total, 8 perfect
interfaces + 2 frictionless contacts, MULTISCALE_1 coarse correction) — the
reference's BLOCK at reduced refinement.  The reference publishes no numbers
(BASELINE.md), so the baseline denominator is this framework's own
single-process CPU throughput on the identical problem (pinned below from a
measured run), standing in for the reference's shared-memory CPU execution
until the C++ reference is benchmarked directly.

Override size via DDPCA_BENCH_SIZE=small|medium (default medium).
"""

from __future__ import annotations

import json
import os
import time

# measured on this host, JAX CPU backend, identical problem + solver config
CPU_BASELINE = {"small": 22.0, "medium": 1.05}


def build(size: str):
    from ddpca_admm_tpu.admm.problem import build_problem
    from ddpca_admm_tpu.models.block import BlockConfig, build_block_model

    if size == "small":
        cfg = BlockConfig(divi=(2, 2, 2), glob_leve=1, doma_numb=(1, 1, 1))
    else:
        cfg = BlockConfig(divi=(4, 4, 4), glob_leve=2, doma_numb=(1, 1, 1))
    model = build_block_model(cfg)
    prob, meta = build_problem(
        model.meta.systems, model.regions, dole=[0] * len(model.meta.systems)
    )
    return prob, meta


def main() -> None:
    import jax

    from ddpca_admm_tpu.admm.loop import contact_analysis

    size = os.environ.get("DDPCA_BENCH_SIZE", "medium")
    prob, meta = build(size)
    modes = tuple(meta.group_modes)
    # compile (first call) then measure a fresh full convergence run — the
    # honest metric: ADMM iterations completed per second over an entire
    # solve (inner-solve cost varies across the run; converged-state step
    # timing would be degenerate).
    st = contact_analysis(prob, modes, max_iter=3000)
    jax.block_until_ready(st.u)
    t0 = time.perf_counter()
    st = contact_analysis(prob, modes, max_iter=3000)
    jax.block_until_ready(st.u)
    dt = time.perf_counter() - t0
    assert bool(st.converged), (
        f"bench run did not converge within {int(st.it)} iterations — "
        "throughput of a non-converged solve would be meaningless"
    )
    its_per_s = int(st.it) / dt

    print(
        json.dumps(
            {
                "metric": f"admm_iterations_per_second_block_{size}",
                "value": round(its_per_s, 3),
                "unit": "iter/s",
                "vs_baseline": round(its_per_s / CPU_BASELINE[size], 3),
            }
        )
    )


if __name__ == "__main__":
    main()
