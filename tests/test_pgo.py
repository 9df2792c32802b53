"""Batch solver + robust averaging tests (mirrors reference tests/testPGO.cpp)."""

import numpy as np
import pytest

from dpgo_tpu.measurements import RelativeSEMeasurement
from dpgo_tpu.robust import RobustCost
from dpgo_tpu.solvers import averaging
from dpgo_tpu.solvers import pgo as pgo_mod
from dpgo_tpu.types import (
    ROptParameters,
    RobustCostParameters,
    RobustCostType,
)


def _rand_rot(rng, d=3):
    return averaging.project_to_rotation_group(rng.standard_normal((d, d)))


def test_robust_rotation_averaging_recovers_inliers():
    """10 inliers + 40 well-separated outliers, exact inlier recovery
    (reference: testPGO.cpp:14-70, trials reduced for runtime)."""
    rng = np.random.default_rng(40)
    for _ in range(8):
        R_true = _rand_rot(rng)
        R_vec = []
        for _ in range(10):
            # small perturbation (well within the ~30 deg threshold)
            P = averaging.project_to_rotation_group(
                R_true + 0.01 * rng.standard_normal((3, 3))
            )
            R_vec.append(P)
        for _ in range(40):
            R_vec.append(_rand_rot(rng))
        R_opt, inliers = averaging.robust_single_rotation_averaging(
            R_vec, error_threshold=0.5
        )
        # every true inlier must be recovered, and R_opt close to truth
        assert set(range(10)).issubset(set(inliers))
        assert np.linalg.norm(R_opt - R_true) < 0.1


def test_robust_pose_averaging_recovers_inliers():
    """(reference: testPGO.cpp robust pose averaging section)."""
    rng = np.random.default_rng(41)
    R_true = _rand_rot(rng)
    t_true = rng.standard_normal(3)
    R_vec, t_vec = [], []
    for _ in range(10):
        R_vec.append(R_true.copy())
        t_vec.append(t_true.copy())
    for _ in range(40):
        R_vec.append(_rand_rot(rng))
        t_vec.append(t_true + 10 * rng.standard_normal(3))
    R_opt, t_opt, inliers = averaging.robust_single_pose_averaging(
        R_vec, t_vec, error_threshold=0.1
    )
    assert set(inliers) == set(range(10))
    np.testing.assert_allclose(R_opt, R_true, atol=1e-6)
    np.testing.assert_allclose(t_opt, t_true, atol=1e-6)


def test_prior_pins_solution():
    """A prior term pins the anchored pose (reference: testPGO.cpp:131-190)."""
    import jax.numpy as jnp

    from dpgo_tpu import quadratic
    from dpgo_tpu.measurements import EdgeArrays, homogeneous
    from dpgo_tpu.ops import lifted
    from dpgo_tpu.solvers import rtr as rtr_mod
    from tests import oracle

    rng = np.random.default_rng(42)
    n, d, r = 4, 3, 3
    meas, _ = oracle.random_measurements(rng, n, d, 1)
    edges = EdgeArrays.from_measurements(meas)

    # prior pinning pose 0 to a specific pose
    R0 = _rand_rot(rng)
    t0 = rng.standard_normal(3)
    P = np.hstack([R0, t0[:, None]])

    problem = quadratic.make_local_problem(
        n=n, d=d,
        priv_i=edges.p1, priv_j=edges.p2,
        priv_T=homogeneous(edges.R, edges.t),
        priv_kappa=edges.kappa, priv_tau=edges.tau, priv_weight=edges.weight,
        prior_idx=[0], prior_pose=P[None], prior_mask=[1.0],
        r=r,
    )
    qd = quadratic.build_quadratic_data(problem, jnp.zeros((1, r, d + 1)), r=r)
    Y0 = lifted.identity_lifted(n, r, d)
    Y, stats = rtr_mod.rtr_solve(qd, Y0, 1e-7, 100.0, max_iterations=500, max_inner=200)
    Yopt = np.asarray(Y)
    # with prior kappa=1e4 / tau=1e2 the anchored pose converges onto the prior
    np.testing.assert_allclose(Yopt[0, :, :d], R0, atol=1e-2)
    np.testing.assert_allclose(Yopt[0, :, d], t0, atol=1e-2)


def _four_pose_graph_with_outlier(rng):
    """4-pose square with odometry, 1 inlier LC and 1 outlier LC
    (reference: testPGO.cpp:193-272)."""
    d = 3
    Rw = [np.eye(d)]
    tw = [np.zeros(d)]
    for i in range(3):
        Rw.append(_rand_rot(rng))
        tw.append(rng.standard_normal(3))
    meas = []
    for i in range(3):
        meas.append(
            RelativeSEMeasurement(
                0, 0, i, i + 1,
                Rw[i].T @ Rw[i + 1], Rw[i].T @ (tw[i + 1] - tw[i]),
                10000.0, 100.0, fixed_weight=True,
            )
        )
    # inlier loop closure 0 -> 3
    meas.append(
        RelativeSEMeasurement(
            0, 0, 0, 3, Rw[0].T @ Rw[3], Rw[0].T @ (tw[3] - tw[0]),
            10000.0, 100.0,
        )
    )
    # outlier loop closure 1 -> 3 (random garbage)
    meas.append(
        RelativeSEMeasurement(
            0, 0, 1, 3, _rand_rot(rng), tw[3] + 10 + rng.standard_normal(3),
            10000.0, 100.0,
        )
    )
    return meas


def test_solve_robust_pgo_rejects_outlier():
    rng = np.random.default_rng(43)
    meas = _four_pose_graph_with_outlier(rng)
    params = pgo_mod.SolveRobustPGOParams(
        opt_params=ROptParameters(
            gradnorm_tol=1e-3, RTR_iterations=50, RTR_tCG_iterations=100
        ),
        robust_params=RobustCostParameters(
            cost_type=RobustCostType.GNC_TLS, GNC_max_iters=100
        ),
    )
    T, out_meas = pgo_mod.solve_robust_pgo(meas, params)
    # inlier LC weight -> 1, outlier LC weight -> 0
    assert out_meas[3].weight == pytest.approx(1.0, abs=1e-6)
    assert out_meas[4].weight == pytest.approx(0.0, abs=1e-6)


def test_solve_pgo_reaches_tolerance():
    rng = np.random.default_rng(44)
    from tests import oracle

    meas, _ = oracle.random_measurements(rng, 10, 3, 4)
    for m in meas:
        m.weight = 1.0
    T, stats = pgo_mod.solve_pgo(
        meas, ROptParameters(gradnorm_tol=1e-6, RTR_iterations=100)
    )
    assert float(stats.gnorm_opt) < 1e-6


def test_robust_cost_weights():
    """Weight kernels across all six cost types (reference: DPGO_robust.cpp:54-98)."""
    p = RobustCostParameters(cost_type=RobustCostType.L2)
    assert RobustCost(p).weight(3.0) == 1.0
    p = RobustCostParameters(cost_type=RobustCostType.L1)
    assert RobustCost(p).weight(4.0) == pytest.approx(0.25)
    p = RobustCostParameters(cost_type=RobustCostType.Huber, huber_threshold=2.0)
    c = RobustCost(p)
    assert c.weight(1.0) == 1.0
    assert c.weight(4.0) == pytest.approx(0.5)
    p = RobustCostParameters(cost_type=RobustCostType.TLS, TLS_threshold=2.0)
    c = RobustCost(p)
    assert c.weight(1.0) == 1.0 and c.weight(3.0) == 0.0
    p = RobustCostParameters(cost_type=RobustCostType.GM)
    assert RobustCost(p).weight(1.0) == pytest.approx(0.25)
    p = RobustCostParameters(
        cost_type=RobustCostType.GNC_TLS, GNC_barc=1.0, GNC_init_mu=1.0
    )
    c = RobustCost(p)
    # r^2 >= (mu+1)/mu * barc^2 = 2 -> weight 0
    assert c.weight(np.sqrt(2.0) + 1e-9) == 0.0
    # r^2 <= mu/(mu+1) * barc^2 = 0.5 -> weight 1
    assert c.weight(np.sqrt(0.5) - 1e-9) == 1.0
    # interior: sqrt(barc^2 mu (mu+1) / r^2) - mu at r=1: sqrt(2)-1
    assert c.weight(1.0) == pytest.approx(np.sqrt(2.0) - 1.0)
    # vectorized kernel agrees with scalar
    rs = np.array([0.1, 0.7072, 1.0, 1.2, 1.5])
    np.testing.assert_allclose(
        np.asarray(c.weights(rs)), [c.weight(r) for r in rs], atol=1e-12
    )


def test_chi2inv():
    """(reference: testUtils.cpp:56-71)."""
    from dpgo_tpu.robust import chi2inv

    rng = np.random.default_rng(45)
    dof, quantile = 4, 0.9
    thresh = chi2inv(quantile, dof)
    samples = rng.chisquare(dof, 100000)
    frac = np.mean(samples < thresh)
    assert abs(frac - quantile) < 0.01
