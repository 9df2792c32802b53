"""Chordal / odometry initialization tests vs dense least-squares oracles."""

import numpy as np
import pytest

from dpgo_tpu.measurements import EdgeArrays
from dpgo_tpu.ops import lifted
from dpgo_tpu.solvers import chordal as chordal_mod
from tests import oracle


def _dense_rotation_ls(meas, n, d):
    """Dense solve of min sum kappa ||Rot_i R_e - Rot_j||^2, Rot_0 = I."""
    # unknowns: vec of Rot_1..Rot_{n-1}, each d*d (row-major here)
    m = len(meas)
    A = np.zeros((m * d * d, (n - 1) * d * d))
    b = np.zeros(m * d * d)

    def block(e, pose, coeff):
        # residual rows for edge e: coeff maps Rot_pose -> residual (d x d)
        # residual = Rot_i R_e - Rot_j ; vec by rows
        pass

    rows = 0
    for e, mm in enumerate(meas):
        i, j, R, k = mm.p1, mm.p2, mm.R, np.sqrt(mm.kappa)
        # residual(l, c) = sum_a Rot_i(l, a) R(a, c) - Rot_j(l, c)
        for l in range(d):
            for c in range(d):
                row = rows
                if i > 0:
                    for a in range(d):
                        A[row, (i - 1) * d * d + l * d + a] += k * R[a, c]
                else:
                    b[row] -= k * R[l, c]  # Rot_0 = I
                if j > 0:
                    A[row, (j - 1) * d * d + l * d + c] -= k
                else:
                    b[row] += k * (1.0 if l == c else 0.0)
                rows += 1
    # residual = A x + const with b = -const: minimize -> x = lstsq(A, b)
    x, *_ = np.linalg.lstsq(A, b, rcond=None)
    Rot = np.zeros((n, d, d))
    Rot[0] = np.eye(d)
    for p in range(1, n):
        Rot[p] = x[(p - 1) * d * d : p * d * d].reshape(d, d)
    return Rot


def test_chordal_rotations_match_dense_ls():
    rng = np.random.default_rng(20)
    n, d = 7, 3
    meas, _ = oracle.random_measurements(rng, n, d, 3)
    edges = EdgeArrays.from_measurements(meas)
    import jax.numpy as jnp

    Rot = np.asarray(
        chordal_mod._chordal_rotations(
            jnp.asarray(edges.p1, jnp.int32),
            jnp.asarray(edges.p2, jnp.int32),
            jnp.asarray(edges.R),
            jnp.asarray(edges.kappa),
            n,
        )
    )
    Rot_dense = _dense_rotation_ls(meas, n, d)
    np.testing.assert_allclose(Rot, Rot_dense, atol=1e-8)


def test_chordal_exact_on_noiseless_graph():
    """With exact measurements the chordal init recovers the trajectory."""
    rng = np.random.default_rng(21)
    from dpgo_tpu.measurements import RelativeSEMeasurement
    from dpgo_tpu.solvers.averaging import project_to_rotation_group

    n, d = 6, 3
    Rw = [np.eye(d)] + [
        project_to_rotation_group(rng.standard_normal((d, d))) for _ in range(n - 1)
    ]
    tw = [np.zeros(d)] + [rng.standard_normal(d) for _ in range(n - 1)]
    meas = []
    for i in range(n - 1):
        meas.append(
            RelativeSEMeasurement(
                0, 0, i, i + 1,
                Rw[i].T @ Rw[i + 1], Rw[i].T @ (tw[i + 1] - tw[i]), 1.0, 1.0,
            )
        )
    meas.append(
        RelativeSEMeasurement(0, 0, 0, n - 1, Rw[0].T @ Rw[n - 1],
                              Rw[0].T @ (tw[n - 1] - tw[0]), 1.0, 1.0)
    )
    edges = EdgeArrays.from_measurements(meas)
    T = np.asarray(chordal_mod.chordal_initialization_arrays(edges, n=n))
    for i in range(n):
        np.testing.assert_allclose(T[i, :, :d], Rw[i], atol=1e-7)
        np.testing.assert_allclose(T[i, :, d], tw[i], atol=1e-7)


def test_odometry_initialization():
    rng = np.random.default_rng(22)
    from dpgo_tpu.measurements import RelativeSEMeasurement
    from dpgo_tpu.solvers.averaging import project_to_rotation_group

    n, d = 5, 3
    Rw = [np.eye(d)]
    tw = [np.zeros(d)]
    meas = []
    for i in range(n - 1):
        Rw.append(project_to_rotation_group(rng.standard_normal((d, d))))
        tw.append(rng.standard_normal(d))
        meas.append(
            RelativeSEMeasurement(
                0, 0, i, i + 1,
                Rw[i].T @ Rw[i + 1], Rw[i].T @ (tw[i + 1] - tw[i]), 1.0, 1.0,
            )
        )
    edges = EdgeArrays.from_measurements(meas)
    T = np.asarray(chordal_mod.odometry_initialization_arrays(edges, n=n))
    for i in range(n):
        np.testing.assert_allclose(T[i, :, :d], Rw[i], atol=1e-10)
        np.testing.assert_allclose(T[i, :, d], tw[i], atol=1e-10)


def test_odometry_partial_trajectory_extension():
    rng = np.random.default_rng(23)
    from dpgo_tpu.measurements import RelativeSEMeasurement
    from dpgo_tpu.solvers.averaging import project_to_rotation_group

    n, d = 6, 3
    meas = []
    Rprev, tprev = np.eye(d), np.zeros(d)
    for i in range(n - 1):
        Rrel = project_to_rotation_group(rng.standard_normal((d, d)))
        trel = rng.standard_normal(d)
        meas.append(RelativeSEMeasurement(0, 0, i, i + 1, Rrel, trel, 1.0, 1.0))
    edges = EdgeArrays.from_measurements(meas)
    T_full = np.asarray(chordal_mod.odometry_initialization_arrays(edges, n=n))
    # prefix = first 3 poses of the full solution -> extension must agree
    T_ext = np.asarray(
        chordal_mod.odometry_initialization_arrays(
            edges, n=n, partial_trajectory=T_full[:3]
        )
    )
    np.testing.assert_allclose(T_ext, T_full, atol=1e-10)

    # a *translated* prefix shifts the tail rigidly
    prefix = T_full[:3].copy()
    prefix[:, :, d] += 1.0
    T_shift = np.asarray(
        chordal_mod.odometry_initialization_arrays(
            edges, n=n, partial_trajectory=prefix
        )
    )
    np.testing.assert_allclose(T_shift[:, :, :d], T_full[:, :, :d], atol=1e-10)
    np.testing.assert_allclose(T_shift[:, :, d], T_full[:, :, d] + 1.0, atol=1e-10)
