#!/usr/bin/env python
"""Benchmark: time-to-tolerance of distributed RBCD on sphere2500.

The driver-designated metric (BASELINE.json): wall-clock time for the
multi-agent RBCD solve of sphere2500.g2o (SE(3), 2500 poses / 4949 edges,
lifted rank r=5, 8 agents, Nesterov acceleration) to reach global Riemannian
gradient norm < 1e-2, excluding one-time compilation.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no numbers and cannot be built here
(its build fetches ROPTLIB from the network; this container has zero egress),
so the committed baseline in bench_baseline.json is this same workload
measured on the host CPU (single process, JAX CPU backend) — a conservative
proxy for an optimized single-machine CPU implementation.
vs_baseline = baseline_seconds / measured_seconds (>1 means faster).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DATA = "/root/reference/data/sphere2500.g2o"
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
NUM_AGENTS = 8
RANK = 5
TOL = 1e-2
MAX_ROUNDS = 600


def _load_dataset():
    from dpgo_tpu.io.g2o import read_g2o_file

    if os.path.exists(DATA):
        return read_g2o_file(DATA)
    # fallback: synthesize a comparable graph if the dataset is missing
    from __graft_entry__ import _synthetic_se3_chain

    return _synthetic_se3_chain(2500, 2400, seed=1)


def run(verbose: bool = False):
    import jax
    import jax.numpy as jnp

    from dpgo_tpu.ops import lifted
    from dpgo_tpu.parallel import spmd
    from dpgo_tpu.solvers.pgo import chordal_initialization

    meas, n = _load_dataset()
    d = meas[0].d

    t_init0 = time.perf_counter()
    T = chordal_initialization(meas)
    t_init = time.perf_counter() - t_init0

    problem, ranges = spmd.build_spmd_problem(meas, n, num_agents=NUM_AGENTS, r=RANK)
    Y_lift = np.asarray(lifted.fixed_stiefel_variable(d, RANK))
    X0 = np.einsum("rd,nde->nre", Y_lift, T)
    state0 = spmd.initial_state(problem, X0, ranges)
    cfg = spmd.SPMDConfig(
        mode="all",
        acceleration=True,
        rtr_iterations=1,
        rtr_gradnorm_tol=TOL / (2 * np.sqrt(NUM_AGENTS)),
    )
    # The WHOLE optimization (all rounds incl. nested RTR/tCG) is one
    # compiled XLA program: zero per-round host round trips.
    run_fn = spmd.make_run_fn(problem, cfg, mesh=None)

    # warm up / compile (same program: max_rounds/tol are traced scalars)
    s_warm, _, _ = run_fn(state0, 1, TOL)
    jax.block_until_ready(s_warm.X)

    t0 = time.perf_counter()
    state, metrics, rounds = run_fn(state0, MAX_ROUNDS, TOL)
    jax.block_until_ready(state.X)
    elapsed = time.perf_counter() - t0
    rounds = int(rounds)
    gradnorm = float(metrics.gradnorm)
    final_cost = float(metrics.cost)
    return {
        "elapsed_s": elapsed,
        "rounds": rounds,
        "rounds_per_s": rounds / elapsed,
        "gradnorm": gradnorm,
        "cost": final_cost,
        "chordal_init_s": t_init,
        "converged": gradnorm < TOL,
        "platform": jax.devices()[0].platform,
    }


def main():
    result = run(verbose="-v" in sys.argv)
    baseline_s = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline_s = json.load(f).get("sphere2500_time_to_gradnorm_1e-2_s")
    vs = (baseline_s / result["elapsed_s"]) if baseline_s else 1.0
    print(
        json.dumps(
            {
                "metric": "sphere2500 RBCD (8 agents, r=5, accel) time to gradnorm<1e-2",
                "value": round(result["elapsed_s"], 3),
                "unit": "s",
                "vs_baseline": round(vs, 3),
            }
        )
    )
    print(
        json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                    for k, v in result.items()}),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
