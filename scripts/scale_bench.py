#!/usr/bin/env python
"""Scale experiment: RBCD rounds/sec at varying problem sizes.

Usage: python scripts/scale_bench.py [num_poses] [num_agents] [rounds] [dtype]
Runs on whatever platform JAX selects (TPU under the driver; set
JAX_PLATFORMS=cpu + unset PALLAS_AXON_POOL_IPS for the CPU baseline).
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    num_poses = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    num_agents = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    dtype_s = sys.argv[4] if len(sys.argv) > 4 else "f64"

    import jax
    import jax.numpy as jnp

    from dpgo_tpu.datasets import synthesize_grid3d
    from dpgo_tpu.ops import lifted
    from dpgo_tpu.parallel import spmd
    from dpgo_tpu.solvers import chordal as chordal_mod

    dtype = jnp.float64 if dtype_s == "f64" else jnp.float32
    t0 = time.perf_counter()
    edges, n, T_true = synthesize_grid3d(num_poses, seed=1)
    meas = edges.to_measurements()
    print(f"synthesize: {time.perf_counter()-t0:.1f}s, {edges.m} edges", file=sys.stderr)

    r = 5
    t0 = time.perf_counter()
    problem, ranges = spmd.build_spmd_problem(meas, n, num_agents=num_agents, r=r, dtype=dtype)
    print(f"build problem: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    # f32 CG on TPU: the f64 CG at 10k+ poses crashes the TPU worker
    mixed_init = jax.devices()[0].platform != "cpu"
    T = np.asarray(chordal_mod.chordal_initialization_arrays(
        edges, n=n,
        cg_dtype=jnp.float32 if mixed_init else None,
        tol=1e-6 if mixed_init else 1e-10,
    ))
    print(f"chordal init: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    Y_lift = np.asarray(lifted.fixed_stiefel_variable(3, r))
    X0 = np.einsum("rd,nde->nre", Y_lift, T)
    state = spmd.initial_state(problem, X0, ranges)

    mixed = jax.devices()[0].platform != "cpu"
    cfg = spmd.SPMDConfig(
        mode="all", acceleration=True, rtr_iterations=1,
        rtr_gradnorm_tol=1e-2 / (2 * np.sqrt(num_agents)),
        rtr_inner_dtype="float32" if mixed else None,
        adaptive_restart=True,
        # throughput phase configuration (the tail hand-off to exact control
        # is the two-phase driver's job; see spmd.make_two_phase_run_fn)
        rtr_inner_control_matvecs=mixed,
    )
    print(f"band_offsets={problem.band_offsets} num_band={problem.num_band} "
          f"mp_max={problem.priv_i.shape[1]}", file=sys.stderr)
    run = spmd.make_run_fn(problem, cfg, mesh=None)
    t0 = time.perf_counter()
    s1, m1, r1 = run(state, 1, 1e-9)
    jax.block_until_ready(s1.X)
    print(f"compile+1round: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    s2, m2, r2 = run(state, rounds, 1e-9)
    jax.block_until_ready(s2.X)
    dt = time.perf_counter() - t0
    print(
        f"platform={jax.devices()[0].platform} dtype={dtype_s} n={num_poses} "
        f"agents={num_agents}: {int(r2)} rounds in {dt:.2f}s = "
        f"{int(r2)/dt:.2f} rounds/s | gradnorm={float(m2.gradnorm):.4f} "
        f"cost={float(m2.cost):.1f}"
    )


if __name__ == "__main__":
    main()
