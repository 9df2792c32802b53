#!/usr/bin/env python
"""Multi-robot pose graph optimization example.

Usage: python examples/multi_robot_example.py [# robots] [input .g2o file]

Counterpart of the reference's multi-robot-example executable
(reference: examples/MultiRobotExample.cpp): synchronous RBCD with Nesterov
acceleration at rank r=5, greedy block selection, stop at global Riemannian
gradient norm < 0.1 or 1000 iterations.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dpgo_tpu.io.g2o import read_g2o_file
from dpgo_tpu.parallel.simulation import run_synchronous_rbcd
from dpgo_tpu.types import PGOAgentParameters, ROptParameters

from dpgo_tpu import log

log.enable()


def main() -> None:
    if len(sys.argv) < 3:
        print("Multi-robot pose graph optimization example.")
        print(f"Usage: {sys.argv[0]} [# robots] [input .g2o file]")
        sys.exit(1)

    num_robots = int(sys.argv[1])
    if num_robots <= 0:
        print("Number of robots must be positive!")
        sys.exit(1)
    print(f"Simulating {num_robots} robots.")

    measurements, num_poses = read_g2o_file(sys.argv[2])
    print(f"Loaded dataset from file {sys.argv[2]}.")

    d = measurements[0].d
    params = PGOAgentParameters(
        d=d,
        r=5,
        num_robots=num_robots,
        acceleration=True,
        local_opt_params=ROptParameters(RTR_iterations=1),
    )
    result = run_synchronous_rbcd(
        measurements,
        num_poses,
        num_robots,
        params,
        num_iters=1000,
        gradnorm_tol=0.1,
        verbose=True,
    )
    print(
        f"Finished in {result.iterations} iterations / {result.elapsed_s:.2f}s: "
        f"cost = {result.final_cost:.6f}, gradnorm = {result.final_gradnorm:.6f}"
    )


if __name__ == "__main__":
    main()
