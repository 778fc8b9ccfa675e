"""Staged de-risk probe for the 8.8M-DOF BLOCK device run (VERDICT r4 #1).

Stages, each committed to the artifact even if a later one dies:

  upload   put the full problem on the TPU and report device HBM use
  step1    ONE admm_step dispatch (compile + execute), timed
  step10   a 10-iteration chunk from fresh state, per-iteration seconds

Writes artifacts/stage_full_r5.json after every stage; on SIGTERM/OOM the
file holds the last completed stage — the diagnostic the round-4 attempts
never produced.

Run:  python scripts/stage_full.py  (expects artifacts/cache/block_leve4_model.pkl)
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "artifacts", "stage_full_r5.json")
RES: dict = {"stage": "start"}


def flush() -> None:
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=1)
    print(json.dumps(RES), flush=True)


def _bail(signum, frame):
    RES["interrupted_by"] = signal.Signals(signum).name
    flush()
    os._exit(0)


def main() -> None:
    signal.signal(signal.SIGTERM, _bail)
    import jax

    cache_dir = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build

    t0 = time.perf_counter()
    prob, meta = build(4)
    RES["build_s"] = round(time.perf_counter() - t0, 1)
    seen: set = set()
    RES["problem_gb"] = round(
        sum(
            (seen.add(id(x)) or x.nbytes)
            for x in jax.tree_util.tree_leaves(prob)
            if hasattr(x, "nbytes") and id(x) not in seen
        )
        / 1e9,
        3,
    )
    RES["stage"] = "built"
    flush()

    # -- upload --------------------------------------------------------
    dev = jax.devices()[0]
    t0 = time.perf_counter()
    prob = jax.device_put(prob, dev)
    jax.block_until_ready(jax.tree_util.tree_leaves(prob)[0])
    RES["upload_s"] = round(time.perf_counter() - t0, 1)
    stats = getattr(dev, "memory_stats", lambda: None)()
    if stats:
        RES["hbm_in_use_gb"] = round(stats.get("bytes_in_use", 0) / 1e9, 3)
        RES["hbm_limit_gb"] = round(stats.get("bytes_limit", 0) / 1e9, 3)
    RES["stage"] = "uploaded"
    flush()

    # -- one step (single-dispatch jitted admm_step: the exact executable
    # the chunked production loop replays; NOT the outer-while variant that
    # crashed remote workers at scale) ---------------------------------
    from ddpca_admm_tpu.admm.loop import (
        admm_step,
        contact_analysis,
        init_state,
    )

    modes = tuple(meta.group_modes)
    t0 = time.perf_counter()
    st = admm_step(prob, init_state(prob), modes)
    jax.block_until_ready(st.u)
    RES["step1_compile_plus_run_s"] = round(time.perf_counter() - t0, 1)
    stats = getattr(dev, "memory_stats", lambda: None)()
    if stats:
        RES["hbm_peak_gb"] = round(stats.get("peak_bytes_in_use", 0) / 1e9, 3)
    RES["stage"] = "step1"
    flush()

    # -- ten steps, warm ----------------------------------------------
    t0 = time.perf_counter()
    st = contact_analysis(prob, modes, max_iter=10, chunk=5)
    jax.block_until_ready(st.u)
    dt = time.perf_counter() - t0
    RES["step10_s"] = round(dt, 2)
    RES["s_per_iteration"] = round(dt / 10.0, 3)
    RES["it_per_s"] = round(10.0 / dt, 3)
    RES["vs_reference_it_per_s"] = round(10.0 / dt / 0.00885, 1)
    RES["stage"] = "done"
    flush()


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        RES["error"] = f"{type(e).__name__}: {e}"
        flush()
        sys.exit(1)
