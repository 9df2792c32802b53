#!/usr/bin/env python
"""Chordal initialization example.

Usage: python examples/chordal_initialization_example.py [input .g2o file]

Counterpart of the reference's chordal-initialization-example
(reference: examples/ChordalInitializationExample.cpp): computes the chordal
relaxation and reports its cost.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from dpgo_tpu import quadratic
from dpgo_tpu.io.g2o import read_g2o_file
from dpgo_tpu.measurements import EdgeArrays
from dpgo_tpu.solvers.pgo import chordal_initialization


def main() -> None:
    if len(sys.argv) < 2:
        print(f"Usage: {sys.argv[0]} [input .g2o file]")
        sys.exit(1)

    measurements, num_poses = read_g2o_file(sys.argv[1])
    d = measurements[0].d
    T = chordal_initialization(measurements)

    edges = EdgeArrays.from_measurements(measurements)
    problem = quadratic.from_private_measurements(edges, n=num_poses, d=d)
    qd = quadratic.build_quadratic_data(problem, jnp.zeros((1, d, d + 1)), r=d)
    f = float(quadratic.cost(qd, jnp.asarray(T)))
    g = float(quadratic.rie_grad_norm(qd, jnp.asarray(T)))
    print(f"Chordal initialization cost: {2 * f:.6f} (gradnorm {g:.4f})")


if __name__ == "__main__":
    main()
