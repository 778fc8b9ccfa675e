"""Per-iteration wall times of the first K ADMM steps on the bench problem,
each individually host-fenced — disambiguates the chunked-bench aggregate
from single-step ablation timings."""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("DDPCA_BENCH_SIZE", "small")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import numpy as np

    from bench import SIZE_LEVE, build
    from ddpca_admm_tpu.admm.loop import admm_step, init_state

    size = os.environ["DDPCA_BENCH_SIZE"]
    prob, meta = build(SIZE_LEVE[size])
    modes = tuple(meta.group_modes)

    out = {"size": size}

    def run(tag, mutate=None, step=None):
        import jax

        stepf = step or (lambda p, s: admm_step(p, s, modes))
        st = init_state(prob)
        if mutate:
            st = mutate(st)
        _ = stepf(prob, st)
        jax.block_until_ready(_.u)
        times = []
        for k in range(4):
            t0 = time.perf_counter()
            st = stepf(prob, st)
            it = int(st.it)   # host-value fence
            times.append(round(time.perf_counter() - t0, 4))
        out[tag] = times
        out[tag + "_converged_at"] = (
            int(st.it) if bool(st.converged) else None
        )

    run("per_step_s")
    run("frozen_coarse_s",
        mutate=lambda s: s._replace(mult_frozen=s.mult_frozen | True))

    from functools import partial

    import jax

    from ddpca_admm_tpu.admm.loop import make_admm_step

    @partial(jax.jit, static_argnames=("mass_maxiter",))
    def step_mass(p, s, mass_maxiter=2):
        return make_admm_step(p, modes, mass_maxiter=mass_maxiter)(s)

    run("mass2_s", step=lambda p, s: step_mass(p, s))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
