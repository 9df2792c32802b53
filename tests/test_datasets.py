"""Synthetic dataset generator tests."""

import numpy as np
import pytest

from dpgo_tpu.datasets import synthesize_grid3d, write_g2o
from dpgo_tpu.ops import lifted


def test_grid3d_structure():
    edges, n, T_true = synthesize_grid3d(125, seed=3)
    assert n == 125
    assert T_true.shape == (125, 3, 4)
    assert lifted.check_rotation(T_true[:, :, :3])
    assert lifted.check_rotation(edges.R, atol=1e-8)
    # odometry chain present and flagged
    odo = edges.fixed_weight
    assert odo.sum() == n - 1
    np.testing.assert_array_equal(edges.p1[odo], np.arange(n - 1))
    # some loop closures exist
    assert (~odo).sum() > 20
    # determinism
    edges2, _, _ = synthesize_grid3d(125, seed=3)
    np.testing.assert_array_equal(edges.p1, edges2.p1)
    np.testing.assert_allclose(edges.R, edges2.R, atol=0)


def test_grid3d_solvable():
    """The synthesized graph solves to near the ground truth."""
    from dpgo_tpu.solvers.pgo import solve_pgo
    from dpgo_tpu.types import ROptParameters

    edges, n, T_true = synthesize_grid3d(27, rot_noise=0.0, tran_noise=0.0, seed=4)
    meas = edges.to_measurements()
    T, stats = solve_pgo(meas, ROptParameters(gradnorm_tol=1e-8, RTR_iterations=100))
    # align to ground truth (both anchored differently): compare relative poses
    # noiseless graph: global optimum cost 0
    assert float(stats.f_opt) < 1e-10


def test_g2o_roundtrip(tmp_path):
    from dpgo_tpu.io.g2o import read_g2o_arrays

    edges, n, _ = synthesize_grid3d(27, seed=5)
    path = str(tmp_path / "synth.g2o")
    write_g2o(edges, path)
    edges2, n2 = read_g2o_arrays(path)
    assert n2 == n
    assert edges2.m == edges.m
    np.testing.assert_array_equal(edges2.p1, edges.p1)
    np.testing.assert_allclose(edges2.R, edges.R, atol=1e-9)
    np.testing.assert_allclose(edges2.t, edges.t, atol=1e-12)
    np.testing.assert_allclose(edges2.kappa, edges.kappa, rtol=1e-9)
    np.testing.assert_allclose(edges2.tau, edges.tau, rtol=1e-9)
