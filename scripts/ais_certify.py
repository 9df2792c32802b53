#!/usr/bin/env python
"""Offline absolute-gradnorm certification for ais2klinik (CPU f64).

ais2klinik is the bundled suite's conditioning stress case: a 15,115-pose
2D corridor graph whose connection Laplacian has many near-zero eigenvalues.
The reference's preconditioner is an exact LDL^T of (Q + 0.1*I)
(PoseGraph.cpp:598-613); with THIS spectrum the fixed 0.1 shift crushes
every mode with lambda < 0.1 and preconditioned tCG crawls — measured here:
12,000 s of RTR stalls at gradnorm ~0.34 (docs/PERF.md). Because our
banded factor (RCM + superblock cyclic reduction, ops/block_tridiag.py) is
exact for ANY SPD shift, it admits a much smaller shift: with 1e-3 the same
budget reaches a lower cost ~8x sooner. This script runs the certification:
chordal init -> blocks of exact-banded-preconditioned RTR, crash-safe
(saves the iterate each block, resumes from the save), until the global
Riemannian gradient norm is below the absolute tolerance.

Usage: python scripts/ais_certify.py [shift] [max_inner] [tol]
State: /tmp/ais_certify_state.npz (delete to restart from chordal init).
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# CPU-only: under the axon tunnel, sitecustomize registers the TPU plugin at
# interpreter BOOT whenever PALLAS_AXON_POOL_IPS is set — in-process env edits
# are too late (jax then dials the single-user tunnel worker even for "cpu"
# runs, and hangs if the worker is down). Re-exec once with the tunnel
# variables stripped, exactly like tests/conftest.py.
if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("_DPGO_AIS_REEXEC") != "1"
):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["_DPGO_AIS_REEXEC"] = "1"
    os.execve(sys.executable, [sys.executable, *sys.argv], env)
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np


def main():
    shift = float(sys.argv[1]) if len(sys.argv) > 1 else 1e-3
    max_inner = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    tol = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-2

    import jax.numpy as jnp

    from dpgo_tpu import quadratic
    from dpgo_tpu.io.g2o import read_g2o_file
    from dpgo_tpu.measurements import EdgeArrays
    from dpgo_tpu.ops import lifted
    from dpgo_tpu.solvers import chordal as chordal_mod
    from dpgo_tpu.solvers import rtr as rtr_mod

    meas, n = read_g2o_file("/root/reference/data/ais2klinik.g2o")
    d, r = meas[0].d, 5
    edges = EdgeArrays.from_measurements(meas)
    problem = quadratic.from_private_measurements(edges, n=n, d=d)

    # The round host's /tmp does not survive driver rounds; a repo-local
    # checkpoint lets the next round resume the long CPU certification run.
    state_path = os.environ.get(
        "DPGO_AIS_STATE", os.path.join(_REPO, "data", "ais_certify_state.npz")
    )
    state_dir = os.path.dirname(state_path)
    if state_dir:  # DPGO_AIS_STATE may be a bare filename (dirname '')
        os.makedirs(state_dir, exist_ok=True)
    if os.path.exists(state_path):
        X = jnp.asarray(np.load(state_path)["X"])
        print(f"resuming from {state_path}", flush=True)
    else:
        T = chordal_mod.chordal_initialization_arrays(edges, n=n)
        Y_lift = jnp.asarray(lifted.fixed_stiefel_variable(d, r))
        X = jnp.einsum("rd,nde->nre", Y_lift, T)

    import dataclasses as _dc

    qd = quadratic.build_quadratic_data(
        problem, jnp.zeros((1, r, d + 1)), r=r, precond="banded",
        precond_shift=shift,
    )
    # cancellation-free control: at gn ~1e-3 the per-block cost decrease is
    # ~1e-9·|f| — far below f64's eps·|f| resolution of the plain
    # f(X')−f(X) subtraction, so rho flips sign on rounding noise and RTR
    # rejects every step (observed: consecutive blocks bit-identical at
    # gn 2.4e-3). residual_control computes decreases from the identity
    # 0.5<step, eg+eg'> (accurate to eps·|residual|), the same machinery the
    # f32 scale path certifies with.
    qd = _dc.replace(
        qd, res=quadratic.build_residual_data(
            problem, jnp.zeros((1, r, d + 1))
        )
    )
    print(f"shift={shift} max_inner={max_inner} tol={tol} "
          f"banded={qd.btf is not None}", flush=True)
    t0 = time.time()
    for blk in range(400):
        # restart blocks with a moderate radius: re-entering at 100 makes
        # RTR spend the first iterations of every block re-shrinking (the
        # gn spikes between blocks in the logs)
        X, stats = rtr_mod.rtr_solve(
            qd, X, gradnorm_tol=tol,
            initial_radius=100.0 if blk == 0 else 1.0,
            max_iterations=25, max_inner=max_inner,
            residual_control=True,
        )
        gn = float(stats.gnorm_opt)
        # atomic checkpoint: a crash mid-write must not corrupt the very
        # resume state this file exists to protect
        np.savez(state_path + ".tmp.npz", X=np.asarray(X))
        os.replace(state_path + ".tmp.npz", state_path)
        print(f"blk {blk:3d} tcg={int(stats.tcg_iters):5d} gn={gn:.4f} "
              f"cost={2 * float(stats.f_opt):.4f} ({time.time() - t0:.0f}s)",
              flush=True)
        if gn < tol:
            print(f"CERTIFIED ais2klinik gradnorm={gn:.6f} "
                  f"cost={2 * float(stats.f_opt):.6f} "
                  f"wall={time.time() - t0:.0f}s shift={shift}", flush=True)
            break


if __name__ == "__main__":
    main()
