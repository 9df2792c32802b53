#!/usr/bin/env python
"""Single robot GNC (robust) example.

Usage: python examples/single_robot_gnc_example.py [input .g2o file]

Counterpart of the reference's single-robot-gnc-example
(reference: examples/SingleRobotGNCExample.cpp): robust batch PGO with GNC-TLS
rejecting outlier loop closures.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dpgo_tpu.io.g2o import read_g2o_file
from dpgo_tpu.solvers.pgo import SolveRobustPGOParams, solve_robust_pgo
from dpgo_tpu.types import ROptParameters, RobustCostParameters, RobustCostType

from dpgo_tpu import log

log.enable()


def main() -> None:
    if len(sys.argv) < 2:
        print(f"Usage: {sys.argv[0]} [input .g2o file]")
        sys.exit(1)

    measurements, num_poses = read_g2o_file(sys.argv[1])
    params = SolveRobustPGOParams(
        opt_params=ROptParameters(
            gradnorm_tol=1e-1, RTR_iterations=20, RTR_tCG_iterations=100
        ),
        robust_params=RobustCostParameters(
            cost_type=RobustCostType.GNC_TLS, GNC_max_iters=50
        ),
        verbose=True,
    )
    T, out = solve_robust_pgo(measurements, params)
    num_rejected = sum(1 for m in out if not m.fixed_weight and m.weight < 1e-8)
    num_total = sum(1 for m in out if not m.fixed_weight)
    print(
        f"GNC finished: rejected {num_rejected}/{num_total} loop closures, "
        f"{T.shape[0]} poses."
    )


if __name__ == "__main__":
    main()
