"""Agent lifecycle tests on tiny synthetic graphs (mirrors reference
tests/testConstruction.cpp, testLineGraph.cpp, testTriangleGraph.cpp,
testOptimizationThread.cpp)."""

import time

import numpy as np
import pytest

from dpgo_tpu import PGOAgent, PGOAgentParameters, RelativeSEMeasurement
from dpgo_tpu.types import PGOAgentState, PoseID


def _triangle_measurements():
    """The reference's hard-coded triangle graph
    (testTriangleGraph.cpp:15-49)."""
    d = 3
    Tw0 = np.eye(4)
    Tw1 = np.array(
        [
            [0.1436, 0.7406, 0.6564, 1],
            [-0.8179, -0.2845, 0.5000, 1],
            [0.5571, -0.6087, 0.5649, 1],
            [0, 0, 0, 1],
        ]
    )
    Tw2 = np.array(
        [
            [-0.4069, -0.4150, -0.8138, 2],
            [0.4049, 0.7166, -0.5679, 2],
            [0.8188, -0.5606, -0.1236, 2],
            [0, 0, 0, 1],
        ]
    )
    T_true = np.stack([Tw0[:3], Tw1[:3], Tw2[:3]])

    def rel(Ta, Tb, i, j):
        dT = np.linalg.inv(Ta) @ Tb
        return RelativeSEMeasurement(0, 0, i, j, dT[:3, :3], dT[:3, 3], 1.0, 1.0)

    odometry = [rel(Tw0, Tw1, 0, 1), rel(Tw1, Tw2, 1, 2)]
    private_lcs = [rel(Tw0, Tw2, 0, 2)]
    return odometry, private_lcs, T_true


def test_construction():
    """(reference: testConstruction.cpp)."""
    agent = PGOAgent(2, PGOAgentParameters(3, 5, 3))
    assert agent.get_id() == 2
    assert agent.num_poses() == 0
    assert agent.dimension() == 3
    assert agent.relaxation_rank() == 5
    assert agent.state == PGOAgentState.WAIT_FOR_DATA
    # robot 0 generates the lifting matrix; others don't
    assert agent.get_lifting_matrix() is None
    agent0 = PGOAgent(0, PGOAgentParameters(3, 5, 3))
    M = agent0.get_lifting_matrix()
    assert M is not None and M.shape == (5, 3)


def test_line_graph():
    """Two-pose line graph converges to the measurement
    (reference: testLineGraph.cpp)."""
    rng = np.random.default_rng(50)
    from dpgo_tpu.solvers.averaging import project_to_rotation_group

    R = project_to_rotation_group(rng.standard_normal((3, 3)))
    t = rng.standard_normal(3)
    odometry = [RelativeSEMeasurement(0, 0, 0, 1, R, t, 1.0, 1.0)]
    agent = PGOAgent(0, PGOAgentParameters(3, 3, 1))
    agent.set_measurements(odometry, [], [])
    agent.initialize()
    assert agent.state == PGOAgentState.INITIALIZED
    T = agent.get_trajectory_in_local_frame()
    np.testing.assert_allclose(T[0, :, :3], np.eye(3), atol=1e-8)
    np.testing.assert_allclose(T[1, :, :3], R, atol=1e-8)
    np.testing.assert_allclose(T[1, :, 3], t, atol=1e-8)


def test_triangle_graph():
    """(reference: testTriangleGraph.cpp:7-72)."""
    odometry, private_lcs, T_true = _triangle_measurements()
    agent = PGOAgent(0, PGOAgentParameters(3, 3, 1))
    agent.set_measurements(odometry, private_lcs, [])
    agent.initialize()

    T_local = agent.local_pose_graph_optimization()
    assert np.linalg.norm(T_true - T_local) < 1e-4

    T = agent.get_trajectory_in_local_frame()
    assert np.linalg.norm(T_true - T) < 1e-4

    agent.iterate()
    assert agent.get_id() == 0
    assert agent.num_poses() == 3
    assert agent.dimension() == 3
    assert agent.relaxation_rank() == 3

    T = agent.get_trajectory_in_local_frame()
    assert np.linalg.norm(T_true - T) < 1e-4


def test_triangle_graph_lifted():
    """Same graph at relaxation rank r=5: iterate() keeps ground truth."""
    odometry, private_lcs, T_true = _triangle_measurements()
    agent = PGOAgent(0, PGOAgentParameters(3, 5, 1))
    agent.set_measurements(odometry, private_lcs, [])
    agent.initialize()
    for _ in range(3):
        agent.iterate()
    T = agent.get_trajectory_in_local_frame()
    assert np.linalg.norm(T_true - T) < 1e-4


def test_set_x_and_shared_pose_dict():
    odometry, private_lcs, _ = _triangle_measurements()
    agent = PGOAgent(0, PGOAgentParameters(3, 5, 2))
    # shared LC with robot 1 makes pose 2 public
    shared = [
        RelativeSEMeasurement(0, 1, 2, 0, np.eye(3), np.zeros(3), 1.0, 1.0)
    ]
    agent.set_measurements(odometry, private_lcs, shared)
    agent.initialize()
    d = agent.get_shared_pose_dict()
    assert set(d.keys()) == {PoseID(0, 2)}
    dn = agent.get_shared_pose_dict_with_neighbor(1)
    assert set(dn.keys()) == {PoseID(0, 2)}
    assert agent.get_neighbors() == [1]
    assert agent.has_neighbor(1)


def test_optimization_thread():
    """Async start/stop x3 + 1s of async optimization preserves ground truth
    (reference: testOptimizationThread.cpp)."""
    odometry, private_lcs, T_true = _triangle_measurements()
    agent = PGOAgent(0, PGOAgentParameters(3, 3, 1, asynchronous=True,
                                           asynchronous_rate=20.0))
    agent.set_measurements(odometry, private_lcs, [])
    agent.initialize()
    # initialize() already started the loop in async mode; cycle it
    for _ in range(3):
        agent.end_optimization_loop()
        assert not agent.is_optimization_running()
        agent.start_optimization_loop()
        assert agent.is_optimization_running()
    time.sleep(1.0)
    agent.end_optimization_loop()
    assert agent.iteration_number > 0
    T = agent.get_trajectory_in_local_frame()
    assert np.linalg.norm(T_true - T) < 1e-3


def test_optimization_thread_lifecycle_race():
    """Stress the thread lifecycle: concurrent start/end/initialize from
    several threads must never raise (round-1 observed race: join of an
    assigned-but-unstarted thread via initialize_in_global_frame on the comm
    thread; reference join semantics: PGOAgent.cpp:475-513)."""
    import threading

    odometry, private_lcs, _ = _triangle_measurements()
    agent = PGOAgent(0, PGOAgentParameters(3, 3, 1, asynchronous=True,
                                           asynchronous_rate=100.0))
    agent.set_measurements(odometry, private_lcs, [])
    agent.initialize()

    errors = []
    stop = threading.Event()

    def cycler():
        try:
            while not stop.is_set():
                agent.start_optimization_loop()
                agent.end_optimization_loop()
        except Exception as e:  # pragma: no cover - the assertion target
            errors.append(e)

    def reinitializer():
        # initialize-from-neighbor path: halts + restarts the loop
        T = np.hstack([np.eye(3), np.zeros((3, 1))])
        try:
            while not stop.is_set():
                agent.initialize_in_global_frame(T)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=cycler) for _ in range(2)] + [
        threading.Thread(target=reinitializer)
    ]
    for t in threads:
        t.start()
    time.sleep(1.5)
    stop.set()
    for t in threads:
        t.join()
    agent.end_optimization_loop()
    assert not errors, f"lifecycle race raised: {errors[:3]}"


def test_reset():
    odometry, private_lcs, _ = _triangle_measurements()
    agent = PGOAgent(0, PGOAgentParameters(3, 3, 1))
    agent.set_measurements(odometry, private_lcs, [])
    agent.initialize()
    agent.iterate()
    agent.reset()
    assert agent.state == PGOAgentState.WAIT_FOR_DATA
    assert agent.instance_number == 1
    assert agent.iteration_number == 0


def test_agent_rgd_mode():
    """RGD local optimization path (reference: QuadraticOptimizer.cpp:110-137)."""
    from dpgo_tpu.types import ROptMethod, ROptParameters

    odometry, private_lcs, T_true = _triangle_measurements()
    params = PGOAgentParameters(
        3, 3, 1,
        local_opt_params=ROptParameters(method=ROptMethod.RGD, RGD_stepsize=5e-3),
    )
    agent = PGOAgent(0, params)
    agent.set_measurements(odometry, private_lcs, [])
    agent.initialize()
    for _ in range(5):
        agent.iterate(True)
    # RGD steps must not corrupt the (already near-optimal) estimate
    T = agent.get_trajectory_in_local_frame()
    assert np.linalg.norm(T_true - T) < 1e-3


def test_agent_warm_start_and_log(tmp_path):
    """initialize(T_init) warm start + log_data artifacts on reset
    (reference: PGOAgent.cpp:211-217, 438-452)."""
    odometry, private_lcs, T_true = _triangle_measurements()
    params = PGOAgentParameters(3, 3, 1, log_data=True, log_directory=str(tmp_path))
    agent = PGOAgent(0, params)
    agent.set_measurements(odometry, private_lcs, [])
    agent.initialize(T_init=T_true)
    T = agent.get_trajectory_in_local_frame()
    # warm start preserved (the hard-coded rotations are only 4-decimal
    # accurate, so SO(3) projection contributes ~1e-4)
    assert np.linalg.norm(T_true - T) < 1e-3
    agent.iterate(True)
    agent.set_global_anchor(agent.X[0])
    agent.reset()
    import os
    assert os.path.exists(str(tmp_path / "measurements.csv"))
    assert os.path.exists(str(tmp_path / "trajectory_optimized.csv"))
    assert os.path.exists(str(tmp_path / "X.txt"))
