"""In-process multi-robot synchronous RBCD simulation.

The host-level driver that moves PoseDicts between PGOAgent instances by
direct method calls, mirroring the reference's multi-robot example
(reference: examples/MultiRobotExample.cpp:121-255). This is the *protocol
parity* path; the mesh-parallel SPMD path (parallel/spmd.py) is the
performance path.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from dpgo_tpu import log, quadratic
from dpgo_tpu.agent import PGOAgent
from dpgo_tpu.measurements import EdgeArrays, RelativeSEMeasurement
from dpgo_tpu.ops import lifted
from dpgo_tpu.parallel.partition import partition_measurements
from dpgo_tpu.solvers.pgo import chordal_initialization
from dpgo_tpu.types import PGOAgentParameters, RobustCostType


@dataclasses.dataclass
class SyncRBCDResult:
    iterations: int
    cost_trace: List[float]
    gradnorm_trace: List[float]
    final_cost: float
    final_gradnorm: float
    elapsed_s: float
    X: np.ndarray  # (n, r, d+1) assembled global solution
    num_weight_updates: int = 0
    terminated: bool = False
    # per-agent final GNC weights of shared loop closures (robust runs)
    shared_edge_weights: List[List[float]] = dataclasses.field(default_factory=list)


def build_central_evaluation(measurements, num_poses: int, r: int):
    """Quadratic data for the full (unpartitioned) problem, used for central
    cost/gradient evaluation (reference: MultiRobotExample.cpp:60-63)."""
    edges = EdgeArrays.from_measurements(measurements)
    d = edges.d
    problem = quadratic.from_private_measurements(edges, n=num_poses, d=d)
    return quadratic.build_quadratic_data(problem, jnp.zeros((1, r, d + 1)), r=r)


def run_synchronous_rbcd(
    measurements: Sequence[RelativeSEMeasurement],
    num_poses: int,
    num_robots: int,
    params: PGOAgentParameters,
    num_iters: int = 1000,
    gradnorm_tol: float = 0.1,
    chordal_init: bool = True,
    selection: str = "greedy",
    verbose: bool = False,
    seed: int = 0,
) -> SyncRBCDResult:
    """Synchronous RBCD over an in-process team of agents
    (reference: examples/MultiRobotExample.cpp).

    selection: 'greedy' (argmax block gradient norm, the reference example's
    rule) or 'uniform' (uniform-random block selection, also covered by the
    RBCD theory).
    """
    d, r = params.d, params.r
    rng = np.random.default_rng(seed)
    robust = params.robust_cost_params.cost_type != RobustCostType.L2

    odometry, private_lcs, shared_lcs, ranges = partition_measurements(
        measurements, num_poses, num_robots
    )

    agents: List[PGOAgent] = []
    for rid in range(num_robots):
        agent = PGOAgent(rid, params)
        if rid > 0:
            agent.set_lifting_matrix(agents[0].get_lifting_matrix())
        agent.set_measurements(odometry[rid], private_lcs[rid], shared_lcs[rid])
        agent.initialize()
        agents.append(agent)

    def broadcast_poses_and_status() -> None:
        """Deliver every agent's public poses + status to every other agent —
        what the communication layer does continuously in a real deployment
        (the reference delegates this to dpgo_ros)."""
        for src in agents:
            shared = src.get_shared_pose_dict()
            if shared is None:
                continue
            for dst in agents:
                if dst.get_id() == src.get_id():
                    continue
                dst.set_neighbor_status(src.get_status())
                if dst.has_neighbor(src.get_id()):
                    dst.update_neighbor_poses(src.get_id(), shared)

    qd_central = build_central_evaluation(measurements, num_poses, r)

    if not chordal_init and params.multirobot_initialization:
        # Distributed initialization: propagate public poses until every agent
        # has aligned itself into the global frame via robust two-stage
        # transform estimation (reference: PGOAgent.cpp:550-663).
        from dpgo_tpu.types import PGOAgentState

        for _ in range(2 * num_robots):
            broadcast_poses_and_status()
            if all(a.state == PGOAgentState.INITIALIZED for a in agents):
                break

    if chordal_init:
        # centralized chordal init lifted to rank r
        # (reference: MultiRobotExample.cpp:148-160)
        T = chordal_initialization(measurements)
        Y_lift = agents[0].get_lifting_matrix()
        X_chordal = np.einsum("rd,nde->nre", Y_lift, T)
        for rid, (start, end) in enumerate(ranges):
            agents[rid].set_X(X_chordal[start:end])

    X_opt = np.zeros((num_poses, r, d + 1))
    cost_trace: List[float] = []
    gradnorm_trace: List[float] = []
    selected = 0
    t0 = time.perf_counter()
    it = 0

    for it in range(num_iters):
        sel_agent = agents[selected]

        # non-selected robots perform a no-op iteration
        for a in agents:
            if a.get_id() != selected:
                a.iterate(False)

        # selected robot pulls public (and aux) poses from the others
        for a in agents:
            if a.get_id() == selected:
                continue
            shared = a.get_shared_pose_dict()
            if shared is None:
                continue
            sel_agent.set_neighbor_status(a.get_status())
            sel_agent.update_neighbor_poses(a.get_id(), shared)
        if params.acceleration:
            for a in agents:
                if a.get_id() == selected:
                    continue
                aux = a.get_aux_shared_pose_dict()
                if aux is None:
                    continue
                sel_agent.set_neighbor_status(a.get_status())
                sel_agent.update_aux_neighbor_poses(a.get_id(), aux)

        sel_agent.iterate(True)

        # GNC: synchronized team-wide measurement weight updates
        # (reference: PGOAgent.cpp:997-1142, driven by the wrapper)
        if robust:
            broadcast_poses_and_status()
            if all(a.should_update_measurement_weights() for a in agents):
                for a in agents:
                    a.update_measurement_weights()

        # assemble the centralized iterate and evaluate
        for rid, (start, end) in enumerate(ranges):
            X_r = agents[rid].get_X()
            if X_r is not None:
                X_opt[start:end] = X_r
        Xj = jnp.asarray(X_opt)
        rgrad = quadratic.rie_grad(qd_central, Xj)
        gradnorm = float(lifted.norm(rgrad))
        cost = 2.0 * float(quadratic.cost(qd_central, Xj))
        cost_trace.append(cost)
        gradnorm_trace.append(gradnorm)
        if verbose:
            log.info(
                "Iter = %d | robot = %d | cost = %.5g | gradnorm = %.5g",
                it, selected, cost, gradnorm,
            )
        if robust:
            # distributed termination: every active agent ready + enough
            # weight updates (reference: PGOAgent.cpp:846-878)
            if agents[0].should_terminate():
                break
        elif gradnorm < gradnorm_tol:
            break

        # next robot selection
        if selection == "uniform":
            selected = int(rng.integers(num_robots))
        else:  # greedy max block gradient norm (MultiRobotExample.cpp:233-247)
            if not sel_agent.get_neighbors():
                selected = sel_agent.get_id()
            else:
                rg = np.asarray(rgrad)
                block_norms = [
                    float(np.linalg.norm(rg[start:end]))
                    for (start, end) in ranges
                ]
                selected = int(np.argmax(block_norms))

        # share the global anchor (robot 0 pose 0) for rounding
        anchor = agents[0].get_shared_pose(0)
        if anchor is not None:
            for a in agents:
                a.set_global_anchor(anchor)

    elapsed = time.perf_counter() - t0
    return SyncRBCDResult(
        iterations=it + 1,
        cost_trace=cost_trace,
        gradnorm_trace=gradnorm_trace,
        final_cost=cost_trace[-1] if cost_trace else float("nan"),
        final_gradnorm=gradnorm_trace[-1] if gradnorm_trace else float("nan"),
        elapsed_s=elapsed,
        X=X_opt,
        num_weight_updates=agents[0].weight_update_count,
        terminated=agents[0].should_terminate(),
        shared_edge_weights=[
            [m.weight for m in a.pose_graph.shared_lcs] for a in agents
        ],
    )
