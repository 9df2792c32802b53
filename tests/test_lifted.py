"""Manifold-op unit tests (mirrors reference tests/testUtils.cpp,
tests/testPoses.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpgo_tpu.ops import lifted


def test_fixed_stiefel_deterministic():
    # reference: testUtils.cpp:20-26
    A = lifted.fixed_stiefel_variable(3, 5)
    B = lifted.fixed_stiefel_variable(3, 5)
    np.testing.assert_allclose(np.asarray(A), np.asarray(B), atol=0)
    assert lifted.check_stiefel(A)


def test_project_stiefel():
    # reference: testUtils.cpp:28-54
    rng = np.random.default_rng(0)
    M = rng.standard_normal((7, 5, 3))
    Y = np.asarray(lifted.project_stiefel(jnp.asarray(M)))
    assert lifted.check_stiefel(Y)
    # projection of a Stiefel point is itself
    Y2 = np.asarray(lifted.project_stiefel(jnp.asarray(Y)))
    np.testing.assert_allclose(Y, Y2, atol=1e-12)


def test_project_rotation():
    rng = np.random.default_rng(1)
    M = rng.standard_normal((10, 3, 3))
    R = np.asarray(lifted.project_rotation(jnp.asarray(M)))
    assert lifted.check_rotation(R)
    # nearest rotation in Frobenius norm: projecting a rotation is identity
    R2 = np.asarray(lifted.project_rotation(jnp.asarray(R)))
    np.testing.assert_allclose(R, R2, atol=1e-12)


def test_proj_tangent_idempotent_and_orthogonal():
    rng = np.random.default_rng(2)
    r, d, n = 5, 3, 4
    Y = np.asarray(lifted.project_stiefel(jnp.asarray(rng.standard_normal((n, r, d)))))
    p = rng.standard_normal((n, r))
    X = np.asarray(lifted.assemble(jnp.asarray(Y), jnp.asarray(p)))
    V = rng.standard_normal((n, r, d + 1))
    PV = np.asarray(lifted.proj_tangent(jnp.asarray(X), jnp.asarray(V)))
    PPV = np.asarray(lifted.proj_tangent(jnp.asarray(X), jnp.asarray(PV)))
    np.testing.assert_allclose(PV, PPV, atol=1e-12)
    # tangency: Y^T V_rot + V_rot^T Y = 0 for each pose
    for i in range(n):
        S = Y[i].T @ PV[i, :, :d]
        np.testing.assert_allclose(S + S.T, np.zeros((d, d)), atol=1e-12)


def test_retraction_stays_on_manifold():
    rng = np.random.default_rng(3)
    r, d, n = 5, 3, 6
    X0 = np.asarray(lifted.identity_lifted(n, r, d))
    V = 0.1 * rng.standard_normal((n, r, d + 1))
    V = np.asarray(lifted.proj_tangent(jnp.asarray(X0), jnp.asarray(V)))
    X1 = np.asarray(lifted.retract(jnp.asarray(X0), jnp.asarray(V)))
    assert lifted.check_stiefel(X1[:, :, :d])
    # first-order agreement: retract(X, tV) = X + tV + O(t^2)
    t = 1e-6
    X_t = np.asarray(lifted.retract(jnp.asarray(X0), jnp.asarray(t * V)))
    np.testing.assert_allclose(X_t, X0 + t * V, atol=1e-10)


def test_flat_roundtrip():
    rng = np.random.default_rng(4)
    X = rng.standard_normal((5, 4, 4))
    Xf = lifted.to_flat(jnp.asarray(X))
    assert Xf.shape == (4, 20)
    X2 = np.asarray(lifted.from_flat(Xf, 5, 3))
    np.testing.assert_allclose(X, X2)
    # flat layout matches the reference's [X_1 ... X_n] concatenation
    np.testing.assert_allclose(np.asarray(Xf[:, 4:8]), X[1])


def test_se_ops():
    # reference: testPoses.cpp:50-82
    rng = np.random.default_rng(5)
    from dpgo_tpu.solvers.averaging import project_to_rotation_group

    R = project_to_rotation_group(rng.standard_normal((3, 3)))
    t = rng.standard_normal(3)
    T = np.hstack([R, t[:, None]])
    Tinv = np.asarray(lifted.se_inverse(jnp.asarray(T)))
    I = np.asarray(lifted.se_compose(jnp.asarray(T), jnp.asarray(Tinv)))
    np.testing.assert_allclose(I[:, :3], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(I[:, 3], np.zeros(3), atol=1e-12)


def test_translation_distances():
    X1 = np.asarray(lifted.identity_lifted(3, 5, 3))
    X2 = X1.copy()
    X2[1, 0, 3] += 2.0  # move translation of pose 1
    X2[2, 1, 3] += 1.0
    mx = float(lifted.max_translation_distance(jnp.asarray(X1), jnp.asarray(X2)))
    av = float(lifted.average_translation_distance(jnp.asarray(X1), jnp.asarray(X2)))
    assert mx == pytest.approx(2.0)
    assert av == pytest.approx(1.0)


def test_newton_schulz_matches_svd_projection():
    rng = np.random.default_rng(6)
    A = np.asarray(lifted.project_stiefel(jnp.asarray(rng.standard_normal((50, 5, 3)))))
    B = np.asarray(lifted.project_stiefel(jnp.asarray(rng.standard_normal((50, 5, 3)))))
    # convex combinations (the Nesterov Y update shape) and V-update shapes
    for M in [0.7 * A + 0.3 * B, A + 2.5 * (B - A)]:
        exact = np.asarray(lifted.project_stiefel(jnp.asarray(M)))
        approx = np.asarray(lifted.project_stiefel_ns(jnp.asarray(M)))
        np.testing.assert_allclose(approx, exact, atol=1e-9)
        assert lifted.check_stiefel(approx)
