#!/usr/bin/env python
"""Bisect which component of the certified phase-1 program crashes the
tunneled TPU worker at 100k. Runs ONE short chunk per variant.

Usage: python scripts/bisect_100k.py <variant>
  v0: full certified cfg (expect crash)
  v1: stiefel_proj_tangent at default precision (patch)
  v2: hess_correction at default precision (patch)
  v3: adaptive_restart=False (removes team_cost from the program)
  v4: rtr_residual_control=False
  v5: rtr_tcg_precision=None
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

variant = sys.argv[1]

import jax
import jax.numpy as jnp

from dpgo_tpu import quadratic
from dpgo_tpu.ops import lifted
from dpgo_tpu.datasets import synthesize_grid3d
from dpgo_tpu.parallel import spmd

if variant == "v1":
    _orig = lifted.stiefel_proj_tangent

    def _patched(Y, V):
        YtV = jnp.einsum("...ra,...rb->...ab", Y, V)
        return V - jnp.einsum("...ra,...ab->...rb", Y, 0.5 * (YtV + jnp.swapaxes(YtV, -1, -2)))

    lifted.stiefel_proj_tangent = _patched
if variant == "v2":
    def _hc(X, eg):
        YtG = jnp.einsum("nra,nrb->nab", lifted.rotations(X), lifted.rotations(eg))
        return 0.5 * (YtG + jnp.swapaxes(YtG, -1, -2))

    quadratic.hess_correction = _hc

num_poses, num_agents, r, seed = 100_000, 10, 5, 1
edges, n, T_true = synthesize_grid3d(num_poses, seed=seed)
meas = edges.to_measurements()
coords = np.asarray(T_true)[:, :, 3].round().astype(np.int64)
order = np.lexsort((coords[:, 0], coords[:, 1], coords[:, 2]))
new_of_old = np.empty(n, np.int64)
new_of_old[order] = np.arange(n)
import dataclasses as _dc

meas = [_dc.replace(m, p1=int(new_of_old[m.p1]), p2=int(new_of_old[m.p2]))
        for m in meas]
problem, ranges = spmd.build_spmd_problem(
    meas, n, num_agents=num_agents, r=r, dtype=jnp.float32
)
cache = f"/tmp/chordal_grid3d_{num_poses}_{seed}.npz"
if os.path.exists(cache):
    T = np.load(cache)["T"]
else:
    from dpgo_tpu.solvers import chordal as chordal_mod

    T = np.asarray(chordal_mod.chordal_initialization_arrays(edges, n=n))
    np.savez(cache, T=T)
Y_lift = np.asarray(lifted.fixed_stiefel_variable(3, r))
X0 = np.einsum("rd,nde->nre", Y_lift, T)[order]
state = spmd.initial_state(problem, X0, ranges)

cfg = spmd.SPMDConfig(
    mode="all", acceleration=True, rtr_iterations=1,
    rtr_gradnorm_tol=1e-2 / (2 * np.sqrt(num_agents)),
    adaptive_restart=(variant != "v3"),
    rtr_residual_control=(variant != "v4"),
    rtr_tcg_precision=None if variant == "v5" else "highest",
)
run = spmd.make_run_fn(problem, cfg, mesh=None)
t0 = time.perf_counter()
s, m, rds = run(state, 8, 0.0)
np.asarray(s.X)
print(f"{variant}: OK — {int(rds)} rounds in {time.perf_counter()-t0:.1f}s "
      f"(incl compile), gradnorm={float(m.gradnorm):.4f}")
