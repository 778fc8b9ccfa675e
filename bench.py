"""Benchmark: ADMM iterations/second on the reference's own BLOCK problem.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Problem: the reference BLOCK menu-1 configuration — 3 stacked blocks, divi
6^3 per block, 2^3 core subdomains + 2 guard slabs per block (30 bodies),
perfect interfaces + 2 frictionless contact planes, MULTISCALE_1 coarse
correction with doleMcsc=1 (examples/BLOCK.cpp:65-83, BLOCK.h:33-54) — at a
refinement level selected by DDPCA_BENCH_SIZE:

  small  -> glob_leve 1 (smoke)
  medium -> glob_leve 2 (default; matches the patched-reference measurement)
  full   -> glob_leve 4 (the reference's exact compiled-in scale)

``vs_baseline`` divides by the *measured* C++ reference throughput on the
identical problem (same geometry, domains, tolerances), recorded in
``baseline_measured.json`` by scripts/measure_reference.sh runs of the
compiled reference (g++ -O3 -fopenmp, makefile:11) on this host.  If the
matching measurement is absent the field is null — never a stand-in number.
"""

from __future__ import annotations

import json
import os
import time

BASELINE_FILE = os.path.join(os.path.dirname(__file__), "baseline_measured.json")
SIZE_LEVE = {"small": 1, "medium": 2, "full": 4}


def build(glob_leve: int):
    from ddpca_admm_tpu.admm.problem import build_problem
    from ddpca_admm_tpu.models.block import BlockConfig, build_block_model

    cfg = BlockConfig(
        divi=(6, 6, 6), glob_leve=glob_leve, doma_numb=(2, 2, 2)
    )
    model = build_block_model(cfg)
    prob, meta = build_problem(
        model.meta.systems, model.regions,
        dole=[1] * len(model.meta.systems),   # doleMcsc=1, BLOCK.cpp:69-71
        musc_sett=2,                          # muscSett=(1<<1), BLOCK.h:38
    )
    return prob, meta


def main() -> None:
    import jax

    from ddpca_admm_tpu.admm.loop import contact_analysis

    size = os.environ.get("DDPCA_BENCH_SIZE", "medium")
    glob_leve = SIZE_LEVE[size]
    prob, meta = build(glob_leve)
    modes = tuple(meta.group_modes)
    # compile (first call) then measure a fresh full convergence run — the
    # honest metric: ADMM iterations completed per second over an entire
    # solve (inner-solve cost varies across the run; converged-state step
    # timing would be degenerate).
    chunk = int(os.environ.get("DDPCA_BENCH_CHUNK", "200"))
    st = contact_analysis(prob, modes, max_iter=3000, chunk=chunk)
    jax.block_until_ready(st.u)
    t0 = time.perf_counter()
    st = contact_analysis(prob, modes, max_iter=3000, chunk=chunk)
    jax.block_until_ready(st.u)
    dt = time.perf_counter() - t0
    assert bool(st.converged), (
        f"bench run did not converge within {int(st.it)} iterations — "
        "throughput of a non-converged solve would be meaningless"
    )
    its_per_s = int(st.it) / dt

    vs = None
    key = f"block_divi6_leve{glob_leve}_doma2"
    try:
        with open(BASELINE_FILE) as f:
            ref = json.load(f).get(key)
        if ref and ref.get("it_per_s"):
            vs = round(its_per_s / ref["it_per_s"], 3)
    except (OSError, ValueError):
        pass

    print(
        json.dumps(
            {
                "metric": f"admm_iterations_per_second_{key}",
                "value": round(its_per_s, 3),
                "unit": "iter/s",
                "vs_baseline": vs,
            }
        )
    )


if __name__ == "__main__":
    main()
