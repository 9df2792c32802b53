"""Quadratic-operator parity vs a dense numpy oracle of the reference math."""

import jax.numpy as jnp
import numpy as np

from dpgo_tpu import quadratic
from dpgo_tpu.measurements import EdgeArrays, homogeneous
from dpgo_tpu.ops import lifted
from tests import oracle


def _random_problem(rng, n=8, d=3, r=5, extra_lc=4):
    meas, _ = oracle.random_measurements(rng, n, d, extra_lc)
    edges = EdgeArrays.from_measurements(meas)
    problem = quadratic.from_private_measurements(edges, n=n, d=d)
    qd = quadratic.build_quadratic_data(problem, jnp.zeros((1, r, d + 1)), r=r)
    Qdense = oracle.dense_connection_laplacian(meas, n)
    return meas, qd, Qdense


def test_q_matvec_matches_dense():
    rng = np.random.default_rng(10)
    n, d, r = 8, 3, 5
    _, qd, Qdense = _random_problem(rng, n, d, r)
    V = rng.standard_normal((n, r, d + 1))
    out = np.asarray(quadratic.q_matvec(qd, jnp.asarray(V)))
    out_dense = oracle.unflat(oracle.flat(V) @ Qdense, n, d)
    np.testing.assert_allclose(out, out_dense, rtol=1e-12, atol=1e-10)


def test_cost_and_grad_match_dense():
    rng = np.random.default_rng(11)
    n, d, r = 10, 3, 5
    _, qd, Qdense = _random_problem(rng, n, d, r)
    X = rng.standard_normal((n, r, d + 1))
    G = np.zeros((r, (d + 1) * n))
    f = float(quadratic.cost(qd, jnp.asarray(X)))
    f_dense = oracle.dense_f(oracle.flat(X), Qdense, G)
    np.testing.assert_allclose(f, f_dense, rtol=1e-12)
    g = np.asarray(quadratic.euc_grad(qd, jnp.asarray(X)))
    g_dense = oracle.unflat(oracle.dense_euc_grad(oracle.flat(X), Qdense, G), n, d)
    np.testing.assert_allclose(g, g_dense, rtol=1e-12, atol=1e-10)


def test_q_2d():
    rng = np.random.default_rng(12)
    n, d, r = 6, 2, 3
    meas, _ = oracle.random_measurements(rng, n, d, 2)
    edges = EdgeArrays.from_measurements(meas)
    problem = quadratic.from_private_measurements(edges, n=n, d=d)
    qd = quadratic.build_quadratic_data(problem, jnp.zeros((1, r, d + 1)), r=r)
    Qdense = oracle.dense_connection_laplacian(meas, n)
    V = rng.standard_normal((n, r, d + 1))
    out = np.asarray(quadratic.q_matvec(qd, jnp.asarray(V)))
    np.testing.assert_allclose(
        out, oracle.unflat(oracle.flat(V) @ Qdense, n, d), rtol=1e-12, atol=1e-10
    )


def test_shared_edges_and_linear_term():
    """Shared-edge diagonal + G contributions vs a hand-built dense oracle
    following PoseGraph.cpp:381-580."""
    rng = np.random.default_rng(13)
    n, d, r = 5, 3, 5
    dh = d + 1
    meas, _ = oracle.random_measurements(rng, n, d, 2)
    edges = EdgeArrays.from_measurements(meas)

    # two shared edges: one outgoing (local pose 1 -> nbr), one incoming
    from dpgo_tpu.solvers.averaging import project_to_rotation_group

    def rand_T():
        R = project_to_rotation_group(rng.standard_normal((d, d)))
        t = rng.standard_normal(d)
        return R, t

    R1, t1 = rand_T()
    R2, t2 = rand_T()
    kap = [2.0, 3.0]
    tau = [1.5, 0.5]
    w = [0.7, 1.0]
    nbr_poses = rng.standard_normal((2, r, dh))

    problem = quadratic.make_local_problem(
        n=n, d=d,
        priv_i=edges.p1, priv_j=edges.p2,
        priv_T=homogeneous(edges.R, edges.t),
        priv_kappa=edges.kappa, priv_tau=edges.tau, priv_weight=edges.weight,
        shared_idx=[1, 3],
        shared_T=np.stack([homogeneous(R1, t1), homogeneous(R2, t2)]),
        shared_kappa=kap, shared_tau=tau, shared_weight=w,
        shared_outgoing=[True, False],
        shared_nbr_slot=[0, 1],
        shared_mask=[1.0, 1.0],
        r=r,
    )
    qd = quadratic.build_quadratic_data(problem, jnp.asarray(nbr_poses), r=r)

    # dense oracle
    Q = oracle.dense_connection_laplacian(meas, n)
    G = np.zeros((r, dh * n))
    for k, (R, t, idx, outgoing) in enumerate(
        [(R1, t1, 1, True), (R2, t2, 3, False)]
    ):
        T = np.zeros((dh, dh))
        T[:d, :d] = R
        T[:d, d] = t
        T[d, d] = 1.0
        Om = np.diag([w[k] * kap[k]] * d + [w[k] * tau[k]])
        if outgoing:
            Q[idx * dh : (idx + 1) * dh, idx * dh : (idx + 1) * dh] += T @ Om @ T.T
            G[:, idx * dh : (idx + 1) * dh] += -nbr_poses[k] @ Om @ T.T
        else:
            Q[idx * dh : (idx + 1) * dh, idx * dh : (idx + 1) * dh] += Om
            G[:, idx * dh : (idx + 1) * dh] += -nbr_poses[k] @ T @ Om

    X = rng.standard_normal((n, r, dh))
    f = float(quadratic.cost(qd, jnp.asarray(X)))
    f_dense = oracle.dense_f(oracle.flat(X), Q, G)
    np.testing.assert_allclose(f, f_dense, rtol=1e-12)
    g = np.asarray(quadratic.euc_grad(qd, jnp.asarray(X)))
    g_dense = oracle.unflat(oracle.dense_euc_grad(oracle.flat(X), Q, G), n, d)
    np.testing.assert_allclose(g, g_dense, rtol=1e-11, atol=1e-9)


def test_priors():
    """Prior contributions to Q and G (PoseGraph.cpp:461-469, 565-575)."""
    from dpgo_tpu.types import PRIOR_KAPPA, PRIOR_TAU

    rng = np.random.default_rng(14)
    n, d, r = 4, 3, 5
    dh = d + 1
    meas, _ = oracle.random_measurements(rng, n, d, 0)
    edges = EdgeArrays.from_measurements(meas)
    P = rng.standard_normal((r, dh))

    problem = quadratic.make_local_problem(
        n=n, d=d,
        priv_i=edges.p1, priv_j=edges.p2,
        priv_T=homogeneous(edges.R, edges.t),
        priv_kappa=edges.kappa, priv_tau=edges.tau, priv_weight=edges.weight,
        prior_idx=[0], prior_pose=P[None], prior_mask=[1.0],
        r=r,
    )
    qd = quadratic.build_quadratic_data(problem, jnp.zeros((1, r, dh)), r=r)

    Q = oracle.dense_connection_laplacian(meas, n)
    Om = np.diag([PRIOR_KAPPA] * d + [PRIOR_TAU])
    Q[:dh, :dh] += Om
    G = np.zeros((r, dh * n))
    G[:, :dh] = -P @ Om

    X = rng.standard_normal((n, r, dh))
    np.testing.assert_allclose(
        float(quadratic.cost(qd, jnp.asarray(X))),
        oracle.dense_f(oracle.flat(X), Q, G),
        rtol=1e-12,
    )


def test_rie_hess_is_symmetric():
    """The Riemannian Hessian (with Weingarten correction) must be
    self-adjoint on the tangent space."""
    rng = np.random.default_rng(15)
    n, d, r = 6, 3, 5
    _, qd, _ = _random_problem(rng, n, d, r)
    X = np.asarray(lifted.project_lifted(jnp.asarray(rng.standard_normal((n, r, d + 1)))))
    eg = quadratic.euc_grad(qd, jnp.asarray(X))
    S = quadratic.hess_correction(jnp.asarray(X), eg)
    U = np.asarray(lifted.proj_tangent(jnp.asarray(X), jnp.asarray(rng.standard_normal((n, r, d + 1)))))
    W = np.asarray(lifted.proj_tangent(jnp.asarray(X), jnp.asarray(rng.standard_normal((n, r, d + 1)))))
    HU = quadratic.rie_hess_vec(qd, jnp.asarray(X), S, jnp.asarray(U))
    HW = quadratic.rie_hess_vec(qd, jnp.asarray(X), S, jnp.asarray(W))
    lhs = float(jnp.vdot(jnp.asarray(W), HU))
    rhs = float(jnp.vdot(jnp.asarray(U), HW))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)


def test_precond_spd():
    rng = np.random.default_rng(16)
    n, d, r = 6, 3, 5
    _, qd, _ = _random_problem(rng, n, d, r)
    X = np.asarray(lifted.project_lifted(jnp.asarray(rng.standard_normal((n, r, d + 1)))))
    V = np.asarray(lifted.proj_tangent(jnp.asarray(X), jnp.asarray(rng.standard_normal((n, r, d + 1)))))
    PV = quadratic.apply_precond(qd, jnp.asarray(X), jnp.asarray(V))
    assert float(jnp.vdot(jnp.asarray(V), PV)) > 0


def test_band_split_matches_plain():
    """The (experimental) odometry-band split produces identical matvecs."""
    rng = np.random.default_rng(17)
    n, d, r = 12, 3, 5
    meas, _ = oracle.random_measurements(rng, n, d, 4)
    edges = EdgeArrays.from_measurements(meas)
    p_plain = quadratic.from_private_measurements(edges, n=n, d=d, band=False)
    p_band = quadratic.from_private_measurements(edges, n=n, d=d, band=True)
    assert p_band.num_band == n - 1
    qd_a = quadratic.build_quadratic_data(p_plain, jnp.zeros((1, r, d + 1)), r=r)
    qd_b = quadratic.build_quadratic_data(p_band, jnp.zeros((1, r, d + 1)), r=r)
    V = rng.standard_normal((n, r, d + 1))
    out_a = np.asarray(quadratic.q_matvec(qd_a, jnp.asarray(V)))
    out_b = np.asarray(quadratic.q_matvec(qd_b, jnp.asarray(V)))
    np.testing.assert_allclose(out_a, out_b, rtol=1e-12, atol=1e-12)
