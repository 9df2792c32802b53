#!/usr/bin/env python
"""Single robot pose graph optimization example.

Usage: python examples/single_robot_example.py [input .g2o file]

Counterpart of the reference's single-robot-example
(reference: examples/SingleRobotExample.cpp): one agent optimizes its local
pose graph by iterating RBCD steps to convergence.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dpgo_tpu.agent import PGOAgent
from dpgo_tpu.io.g2o import read_g2o_file
from dpgo_tpu.types import PGOAgentParameters, ROptParameters


def main() -> None:
    if len(sys.argv) < 2:
        print(f"Usage: {sys.argv[0]} [input .g2o file]")
        sys.exit(1)

    measurements, num_poses = read_g2o_file(sys.argv[1])
    d = measurements[0].d
    r = 5

    odometry = [m for m in measurements if m.p1 + 1 == m.p2]
    private_lcs = [m for m in measurements if m.p1 + 1 != m.p2]

    params = PGOAgentParameters(d=d, r=r, num_robots=1)
    agent = PGOAgent(0, params)
    agent.set_measurements(odometry, private_lcs, [])
    agent.initialize()

    for it in range(100):
        agent.iterate(True)
        res = agent.local_opt_result
        print(
            f"Iter {it}: f = {res.fOpt:.6f}, gradnorm = {res.gradNormOpt:.6f} "
            f"({res.elapsedMs:.1f} ms)"
        )
        if res.gradNormOpt < 1e-2:
            break

    T = agent.get_trajectory_in_local_frame()
    print(f"Optimized trajectory with {T.shape[0]} poses.")


if __name__ == "__main__":
    main()
