#!/usr/bin/env python
"""Generate tests/dataset_costs.json: converged centralized costs for the
bundled reference datasets (VERDICT r2 #7 — committed regression anchors
asserted by tests/test_datasets_parity.py at rtol 1e-6).

Costs are SELF-recorded from the deterministic CPU f64 pipeline (chordal
init -> tridiag-preconditioned RTR); sphere2500 additionally carries the
externally-known SE-Sync global optimum 1687.0058. Cross-checking the other
3D datasets against published SE-Sync optima requires network access (the
kappa/tau conventions must match exactly) — not available in this
environment.

Run on CPU: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/gen_parity_table.py
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from dpgo_tpu import quadratic
from dpgo_tpu.io.g2o import read_g2o_file
from dpgo_tpu.measurements import EdgeArrays
from dpgo_tpu.ops import lifted
from dpgo_tpu.solvers import chordal as chordal_mod
from dpgo_tpu.solvers import rtr as rtr_mod

DATA = "/root/reference/data"
NAMES = [
    "tinyGrid3D.g2o", "smallGrid3D.g2o", "parking-garage.g2o",
    "sphere2500.g2o", "sphere_bignoise_vertex3.g2o", "torus3D.g2o",
    "cubicle.g2o", "input_INTEL_g2o.g2o", "input_M3500_g2o.g2o",
    "CSAIL.g2o", "input_MITb_g2o.g2o", "ais2klinik.g2o", "city10000.g2o",
    "kitti_00.g2o", "kitti_02.g2o", "kitti_05.g2o",
]


def main():
    out = {}
    for name in NAMES:
        t0 = time.perf_counter()
        meas, n = read_g2o_file(f"{DATA}/{name}")
        d = meas[0].d
        r = 5
        edges = EdgeArrays.from_measurements(meas)
        problem = quadratic.from_private_measurements(edges, n=n, d=d)
        T = chordal_mod.chordal_initialization_arrays(edges, n=n)
        Y_lift = jnp.asarray(lifted.fixed_stiefel_variable(d, r))
        X0 = jnp.einsum("rd,nde->nre", Y_lift, T)
        qd = quadratic.build_quadratic_data(
            problem, jnp.zeros((1, r, d + 1)), r=r, precond="tridiag"
        )
        X, stats = rtr_mod.rtr_solve(
            qd, X0, gradnorm_tol=1e-4, initial_radius=100.0,
            max_iterations=500, max_inner=500,
        )
        rec = {
            "n": n, "m": len(meas), "d": d,
            "cost": 2 * float(stats.f_opt),
            "gradnorm": float(stats.gnorm_opt),
            "iterations": int(stats.iterations),
            "seconds": round(time.perf_counter() - t0, 1),
        }
        out[name] = rec
        print(f"{name}: cost={rec['cost']:.9g} gradnorm={rec['gradnorm']:.3e} "
              f"iters={rec['iterations']} ({rec['seconds']}s)", flush=True)
    path = os.path.join(_REPO, "tests", "dataset_costs.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
