"""g2o parser tests: precision conventions and round trips."""

import os

import numpy as np
import pytest

from dpgo_tpu.io.g2o import read_g2o_arrays, read_g2o_file
from dpgo_tpu.io.logger import PGOLogger

DATA = "/root/reference/data"


def test_parse_se3():
    edges, n = read_g2o_arrays(os.path.join(DATA, "tinyGrid3D.g2o"))
    assert n == 9
    assert edges.m == 11
    assert edges.d == 3
    # rotations are valid
    RtR = np.einsum("mab,mac->mbc", edges.R, edges.R)
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (edges.m, 1, 1)), atol=1e-8)
    # odometry edges marked fixed
    np.testing.assert_array_equal(edges.fixed_weight, edges.p1 + 1 == edges.p2)
    np.testing.assert_array_equal(edges.weight, np.ones(edges.m))


def test_se3_kappa_tau_convention():
    """kappa = 3/(2 tr(RotCov^-1)), tau = 3/tr(TranCov^-1)
    (reference: DPGO_utils.cpp:219-230) — identity information matrix gives
    kappa = 0.5, tau = 1."""
    import tempfile

    line = (
        "EDGE_SE3:QUAT 0 1 1 0 0 0 0 0 1 "
        "1 0 0 0 0 0 1 0 0 0 0 1 0 0 0 1 0 0 1 0 1\n"
    )
    with tempfile.NamedTemporaryFile("w", suffix=".g2o", delete=False) as f:
        f.write(line)
        path = f.name
    edges, n = read_g2o_arrays(path)
    assert edges.kappa[0] == pytest.approx(0.5)
    assert edges.tau[0] == pytest.approx(1.0)
    os.unlink(path)


def test_parse_se2():
    edges, n = read_g2o_arrays(os.path.join(DATA, "input_INTEL_g2o.g2o"))
    assert n == 1228
    assert edges.m == 1483
    assert edges.d == 2
    RtR = np.einsum("mab,mac->mbc", edges.R, edges.R)
    np.testing.assert_allclose(RtR, np.tile(np.eye(2), (edges.m, 1, 1)), atol=1e-10)


def test_se2_kappa_tau_convention():
    """SE2: tau = 2/tr(TranCov^-1), kappa = I33
    (reference: DPGO_utils.cpp:172-176)."""
    import tempfile

    line = "EDGE_SE2 0 1 1.0 0.0 0.5 4 0 0 4 0 7\n"
    with tempfile.NamedTemporaryFile("w", suffix=".g2o", delete=False) as f:
        f.write(line)
        path = f.name
    edges, _ = read_g2o_arrays(path)
    # TranCov = diag(4, 4); inv trace = 0.5; tau = 2/0.5 = 4
    assert edges.tau[0] == pytest.approx(4.0)
    assert edges.kappa[0] == pytest.approx(7.0)
    np.testing.assert_allclose(
        edges.R[0],
        [[np.cos(0.5), -np.sin(0.5)], [np.sin(0.5), np.cos(0.5)]],
        atol=1e-12,
    )
    os.unlink(path)


def test_measurement_list_roundtrip():
    meas, n = read_g2o_file(os.path.join(DATA, "tinyGrid3D.g2o"))
    assert len(meas) == 11
    assert all(m.d == 3 for m in meas)


def test_logger_roundtrip(tmp_path):
    """Trajectory + measurement CSV round trip (checkpoint/resume parity,
    reference: PGOLogger.cpp)."""
    rng = np.random.default_rng(60)
    from dpgo_tpu.solvers.averaging import project_to_rotation_group

    n = 4
    T = np.zeros((n, 3, 4))
    for i in range(n):
        T[i, :, :3] = project_to_rotation_group(rng.standard_normal((3, 3)))
        T[i, :, 3] = rng.standard_normal(3)

    logger = PGOLogger(str(tmp_path))
    logger.log_trajectory(3, n, T, "traj.csv")
    T2 = logger.load_trajectory("traj.csv")
    np.testing.assert_allclose(T, T2, atol=1e-9)

    meas, _ = read_g2o_file(os.path.join(DATA, "tinyGrid3D.g2o"))
    for k, m in enumerate(meas):
        m.weight = 0.5 if k == 3 else 1.0
    logger.log_measurements(meas, "meas.csv")
    loaded = logger.load_measurements(str(tmp_path / "meas.csv"), load_weight=True)
    assert len(loaded) == len(meas)
    for a, b in zip(meas, loaded):
        assert (a.r1, a.p1, a.r2, a.p2) == (b.r1, b.p1, b.r2, b.p2)
        np.testing.assert_allclose(a.R, b.R, atol=1e-9)
        np.testing.assert_allclose(a.t, b.t, atol=1e-9)
        assert a.kappa == pytest.approx(b.kappa)
        assert a.tau == pytest.approx(b.tau)
        assert a.weight == pytest.approx(b.weight)
        assert a.fixed_weight == b.fixed_weight


def test_native_parser_matches_python():
    """The C++ parser (csrc/g2o_parser.cpp) must agree exactly with the
    numpy fallback on every field."""
    from dpgo_tpu.io.g2o import _load_native, _read_g2o_arrays_py, read_g2o_arrays

    if _load_native() is None:
        pytest.skip("native parser unavailable")
    for name in ["tinyGrid3D.g2o", "smallGrid3D.g2o", "input_M3500_g2o.g2o"]:
        path = os.path.join(DATA, name)
        en, nn = read_g2o_arrays(path)
        ep, np_poses = _read_g2o_arrays_py(path)
        assert nn == np_poses
        np.testing.assert_array_equal(en.p1, ep.p1)
        np.testing.assert_array_equal(en.p2, ep.p2)
        np.testing.assert_allclose(en.R, ep.R, atol=1e-14)
        np.testing.assert_allclose(en.t, ep.t, atol=1e-14)
        np.testing.assert_allclose(en.kappa, ep.kappa, rtol=1e-12)
        np.testing.assert_allclose(en.tau, ep.tau, rtol=1e-12)
        np.testing.assert_array_equal(en.fixed_weight, ep.fixed_weight)
