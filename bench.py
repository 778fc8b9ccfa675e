"""Benchmark: ADMM iterations/second on the BLOCK contact problem (real TPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); the baseline denominator
here is this framework's own single-CPU-core throughput on the identical
problem (measured once, pinned below), standing in for the reference's
shared-memory CPU execution until the C++ reference is benchmarked directly.
"""

from __future__ import annotations

import json
import time

# measured on this repo @ small BLOCK config, CPU backend (see PROGRESS notes)
CPU_BASELINE_ITERS_PER_S = 1.46


def main() -> None:
    import jax

    from ddpca_admm_tpu.admm.loop import init_state, make_admm_step
    from ddpca_admm_tpu.models.block import BlockConfig, build_block_model
    from ddpca_admm_tpu.admm.problem import build_problem

    cfg = BlockConfig(divi=(2, 2, 2), glob_leve=1, doma_numb=(1, 1, 1))
    model = build_block_model(cfg)
    prob, meta = build_problem(model.meta.systems, model.regions)
    step = jax.jit(make_admm_step(prob, tuple(meta.group_modes)))
    state = init_state(prob)
    state = jax.block_until_ready(step(state))  # compile

    n_iter = 100
    t0 = time.perf_counter()
    for _ in range(n_iter):
        state = step(state)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    its_per_s = n_iter / dt

    print(
        json.dumps(
            {
                "metric": "admm_iterations_per_second_block",
                "value": round(its_per_s, 3),
                "unit": "iter/s",
                "vs_baseline": round(its_per_s / CPU_BASELINE_ITERS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
