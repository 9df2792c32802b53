"""Asynchronous multi-agent RBCD: per-agent Poisson-clock optimization threads.

In-process counterpart of the reference's asynchronous mode (reference:
PGOAgent.cpp:475-499 + the RA-L 2020 algorithm): each agent runs its own
optimization thread that iterates and then sleeps an Exp(rate)-distributed
interval, while a communication thread continuously moves public poses and
status packets between agents (the role the ROS layer plays in deployment).

Acceleration is not supported in asynchronous mode, matching the reference's
restriction (PGOAgent.cpp:477).
"""

from __future__ import annotations

import dataclasses
import threading
import time
from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from dpgo_tpu import log
from dpgo_tpu import quadratic
from dpgo_tpu.agent import PGOAgent
from dpgo_tpu.measurements import RelativeSEMeasurement
from dpgo_tpu.parallel.partition import partition_measurements
from dpgo_tpu.parallel.simulation import build_central_evaluation
from dpgo_tpu.solvers.pgo import chordal_initialization
from dpgo_tpu.types import PGOAgentParameters


@dataclasses.dataclass
class AsyncResult:
    elapsed_s: float
    total_iterations: int
    final_cost: float
    final_gradnorm: float
    X: np.ndarray


def run_asynchronous_rbcd(
    measurements: Sequence[RelativeSEMeasurement],
    num_poses: int,
    num_robots: int,
    params: PGOAgentParameters,
    duration_s: float = 5.0,
    comm_period_s: float = 0.01,
    chordal_init: bool = True,
    verbose: bool = False,
) -> AsyncResult:
    """Run the team asynchronously for `duration_s` seconds."""
    assert params.asynchronous and not params.acceleration
    d, r = params.d, params.r

    odometry, private_lcs, shared_lcs, ranges = partition_measurements(
        measurements, num_poses, num_robots
    )

    # Agents are constructed with asynchronous=True: initialize() spawns the
    # per-agent optimization thread (reference: PGOAgent.cpp:304-305).
    agents: List[PGOAgent] = []
    for rid in range(num_robots):
        agent = PGOAgent(rid, params)
        if rid > 0:
            agent.set_lifting_matrix(agents[0].get_lifting_matrix())
        agent.set_measurements(odometry[rid], private_lcs[rid], shared_lcs[rid])
        agents.append(agent)

    if chordal_init:
        T = chordal_initialization(measurements)
        Y_lift = agents[0].get_lifting_matrix()
        X_chordal = np.einsum("rd,nde->nre", Y_lift, T)

    stop_comm = threading.Event()

    def comm_loop() -> None:
        """Continuously move poses + status between agents (the ROS role)."""
        while not stop_comm.is_set():
            for src in agents:
                shared = src.get_shared_pose_dict()
                status = src.get_status()
                if shared is None:
                    continue
                for dst in agents:
                    if dst.get_id() == src.get_id():
                        continue
                    dst.set_neighbor_status(status)
                    if dst.has_neighbor(src.get_id()):
                        dst.update_neighbor_poses(src.get_id(), shared)
                src.publish_asynchronous_requested = False
                src.publish_public_poses_requested = False
            time.sleep(comm_period_s)

    comm_thread = threading.Thread(target=comm_loop, daemon=True)
    comm_thread.start()

    # initialize() starts each agent's optimization loop (async mode)
    for agent in agents:
        agent.initialize()
    if chordal_init:
        for rid, (start, end) in enumerate(ranges):
            agents[rid].set_X(X_chordal[start:end])

    t0 = time.perf_counter()
    time.sleep(duration_s)
    for agent in agents:
        agent.end_optimization_loop()
    elapsed = time.perf_counter() - t0
    stop_comm.set()
    comm_thread.join()

    # evaluate the final assembled iterate centrally
    qd_central = build_central_evaluation(measurements, num_poses, r)
    X_opt = np.zeros((num_poses, r, d + 1))
    for rid, (start, end) in enumerate(ranges):
        X_r = agents[rid].get_X()
        if X_r is not None:
            X_opt[start:end] = X_r
    Xj = jnp.asarray(X_opt)
    cost = 2.0 * float(quadratic.cost(qd_central, Xj))
    gradnorm = float(quadratic.rie_grad_norm(qd_central, Xj))
    total_iters = sum(a.iteration_number for a in agents)
    if verbose:
        log.info(
            "async: %d total iterations in %.2fs, cost=%.5g, gradnorm=%.5g",
            total_iters, elapsed, cost, gradnorm,
        )
    return AsyncResult(
        elapsed_s=elapsed,
        total_iterations=total_iters,
        final_cost=cost,
        final_gradnorm=gradnorm,
        X=X_opt,
    )
