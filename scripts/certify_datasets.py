#!/usr/bin/env python
"""Offline sweep: solve each bundled dataset tightly and evaluate the
global-optimality certificate (solvers/certify.py). Produces the table in
docs/PARITY.md's certificate section. CPU f64 (re-exec strips the tunnel
env, like tests/conftest.py)."""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("_DPGO_CERT_REEXEC") != "1"
):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["_DPGO_CERT_REEXEC"] = "1"
    os.execve(sys.executable, [sys.executable, *sys.argv], env)
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

DATASETS = [
    # (file, r) — r = d+2-ish lift, the reference's example configuration
    ("tinyGrid3D.g2o", 5),
    ("smallGrid3D.g2o", 5),
    ("parking-garage.g2o", 5),
    ("sphere2500.g2o", 5),
    ("torus3D.g2o", 5),
    ("cubicle.g2o", 5),
    ("input_INTEL_g2o.g2o", 3),
    ("CSAIL.g2o", 3),
    ("input_M3500_g2o.g2o", 3),
    ("input_MITb_g2o.g2o", 3),
    ("city10000.g2o", 3),
    ("kitti_00.g2o", 3),
    ("kitti_02.g2o", 3),
    ("kitti_05.g2o", 3),
    ("kitti_06.g2o", 3),
    ("kitti_07.g2o", 3),
    ("kitti_08.g2o", 3),
    ("kitti_09.g2o", 3),
    ("sphere_bignoise_vertex3.g2o", 5),
    ("ais2klinik.g2o", 3),
]


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from dpgo_tpu import quadratic
    from dpgo_tpu.io.g2o import read_g2o_file
    from dpgo_tpu.measurements import EdgeArrays
    from dpgo_tpu.ops import lifted
    from dpgo_tpu.solvers import certify
    from dpgo_tpu.solvers import rtr as rtr_mod
    from dpgo_tpu.solvers.pgo import chordal_initialization

    only = sys.argv[1:] or None
    for name, r in DATASETS:
        if only and name not in only:
            continue
        path = f"/root/reference/data/{name}"
        if not os.path.exists(path):
            print(f"{name}: MISSING", flush=True)
            continue
        # Budget knobs (defaults reproduce the round-5 base sweep). The
        # rigorous lower bound is min(lmin(B'SB), lambda_defl - res) - |PSB|:
        # |PSB| scales with the stationarity error (push gn down via
        # DPGO_CERT_GN_TOL / more attempts) and `res` with the Lanczos +
        # refinement budget (DPGO_CERT_K / DPGO_CERT_REFINE).
        gn_tol = float(os.environ.get("DPGO_CERT_GN_TOL", "1e-6"))
        attempts = int(os.environ.get("DPGO_CERT_ATTEMPTS", "4"))
        cert_k = int(os.environ.get("DPGO_CERT_K", "64"))
        refine = int(os.environ.get("DPGO_CERT_REFINE", "400"))
        shift = float(os.environ.get("DPGO_CERT_SHIFT", "0.1"))
        t0 = time.time()
        meas, n = read_g2o_file(path)
        d = meas[0].d
        edges = EdgeArrays.from_measurements(meas)
        problem = quadratic.from_private_measurements(edges, n=n, d=d)
        qd = quadratic.build_quadratic_data(
            problem, jnp.zeros((1, r, d + 1)), r=r, precond="auto",
            precond_shift=shift,
        )
        T = chordal_initialization(meas)
        Y = np.asarray(lifted.fixed_stiefel_variable(d, r))
        X = jnp.asarray(np.einsum("rd,nde->nre", Y, T))
        gn = np.inf
        for attempt in range(attempts):
            X, stats = rtr_mod.rtr_solve(
                qd, X, gradnorm_tol=gn_tol,
                initial_radius=100.0 if attempt == 0 else 1.0,
                max_iterations=300, max_inner=500,
            )
            gn = float(stats.gnorm_opt)
            if gn < gn_tol:
                break
        t_solve = time.time() - t0
        t0 = time.time()
        res = certify.min_eig_certificate(qd, X, k=cert_k, eta=1e-5,
                                          refine_iters=refine)
        print(
            f"{name}: n={n} d={d} r={r} cost={2 * float(stats.f_opt):.4f} "
            f"gn={gn:.2e} lambda_min={res.lambda_min:.3e} "
            f"lower={res.lambda_min_lower:.3e} CERT={res.certified} "
            f"(solve {t_solve:.0f}s, cert {time.time() - t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
