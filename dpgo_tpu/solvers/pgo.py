"""Centralized batch PGO solvers: solve_pgo and GNC-robust solve_robust_pgo.

Mirrors the reference's DPGO_solver layer (src/DPGO_solver.cpp:220-412). The
variable here is at rank r = d (no lift), matching solvePGO's PoseGraph(id, d, d).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from dpgo_tpu import log
from dpgo_tpu import quadratic
from dpgo_tpu.measurements import (
    EdgeArrays,
    RelativeSEMeasurement,
    num_poses_and_dim,
)
from dpgo_tpu.ops import lifted
from dpgo_tpu.robust import RobustCost
from dpgo_tpu.solvers import chordal as chordal_mod
from dpgo_tpu.solvers import rtr as rtr_mod
from dpgo_tpu.types import (
    ROptParameters,
    RobustCostParameters,
    RobustCostType,
)

_W_TOL = 1e-8


def chordal_initialization(
    measurements: Sequence[RelativeSEMeasurement],
) -> np.ndarray:
    """Chordal initialization over a measurement list; returns T: (n, d, d+1)
    (reference: DPGO_solver.cpp:220-269)."""
    d, n = num_poses_and_dim(measurements)
    edges = EdgeArrays.from_measurements(measurements)
    return np.asarray(chordal_mod.chordal_initialization_arrays(edges, n=n))


def odometry_initialization(
    odometry: Sequence[RelativeSEMeasurement],
    partial_trajectory: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Odometry initialization; returns T: (n, d, d+1)
    (reference: DPGO_solver.cpp:271-303)."""
    d, n = num_poses_and_dim(odometry)
    edges = EdgeArrays.from_measurements(odometry)
    return np.asarray(
        chordal_mod.odometry_initialization_arrays(
            edges, n=n, partial_trajectory=partial_trajectory
        )
    )


def _poses_to_lifted(T: np.ndarray) -> jnp.ndarray:
    """SE(d) trajectory (n, d, d+1) is already in the lifted layout at r=d."""
    return jnp.asarray(T)


def solve_pgo(
    measurements: Sequence[RelativeSEMeasurement],
    params: ROptParameters = ROptParameters(),
    T0: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, rtr_mod.RTRStats]:
    """Centralized PGO at rank r = d: chordal init (unless T0 given) + RTR
    (reference: DPGO_solver.cpp:305-333). Returns (T: (n, d, d+1), stats)."""
    d, n = num_poses_and_dim(measurements)
    if T0 is None:
        T = chordal_initialization(measurements)
    else:
        T = np.asarray(T0)
    assert T.shape == (n, d, d + 1)

    edges = EdgeArrays.from_measurements(measurements)
    problem = quadratic.from_private_measurements(edges, n=n, d=d)
    qd = quadratic.build_quadratic_data(problem, jnp.zeros((1, d, d + 1)), r=d)
    X, stats = rtr_mod.optimize(qd, _poses_to_lifted(T), params)
    return np.asarray(X), stats


@dataclasses.dataclass
class SolveRobustPGOParams:
    """(reference: DPGO_solver.h solveRobustPGOParams)."""

    opt_params: ROptParameters = dataclasses.field(default_factory=ROptParameters)
    robust_params: RobustCostParameters = dataclasses.field(
        default_factory=lambda: RobustCostParameters(cost_type=RobustCostType.GNC_TLS)
    )
    verbose: bool = False


def _residuals_sq(edges: EdgeArrays, T: np.ndarray) -> np.ndarray:
    """Batched squared measurement errors
    kappa*||R1 R~ - R2||^2 + tau*||t2 - t1 - R1 t~||^2
    (reference: DPGO_utils.cpp:501-507)."""
    R1 = T[edges.p1, :, :-1]
    t1 = T[edges.p1, :, -1]
    R2 = T[edges.p2, :, :-1]
    t2 = T[edges.p2, :, -1]
    rot_err = np.sum((np.einsum("mab,mbc->mac", R1, edges.R) - R2) ** 2, axis=(-2, -1))
    tran_err = np.sum(
        (t2 - t1 - np.einsum("mab,mb->ma", R1, edges.t)) ** 2, axis=-1
    )
    return edges.kappa * rot_err + edges.tau * tran_err


def solve_robust_pgo(
    measurements: List[RelativeSEMeasurement],
    params: SolveRobustPGOParams = SolveRobustPGOParams(),
    T0: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, List[RelativeSEMeasurement]]:
    """GNC outer loop around solve_pgo (reference: DPGO_solver.cpp:335-412).

    The input measurement weights are updated in place semantically: the
    returned measurement list carries the final GNC weights (the reference
    mutates its input vector). Returns (T, measurements).
    """
    assert params.robust_params.cost_type == RobustCostType.GNC_TLS
    d, n = num_poses_and_dim(measurements)
    measurements = [m.copy() for m in measurements]
    for m in measurements:
        m.weight = 1.0

    T, _ = solve_pgo(measurements, params.opt_params, T0)
    edges = EdgeArrays.from_measurements(measurements)
    r_sq = _residuals_sq(edges, T)

    barc = params.robust_params.GNC_barc
    barc_sq = barc * barc
    mu_init = barc_sq / (2 * r_sq.max() - barc_sq)
    if params.verbose:
        log.info("[solve_robust_pgo] initial mu: %s", mu_init)

    if mu_init > 0:
        cost = RobustCost(
            dataclasses.replace(params.robust_params, GNC_init_mu=mu_init)
        )
        for it in range(params.robust_params.GNC_max_iters):
            T, _ = solve_pgo(measurements, params.opt_params, T0)
            edges = EdgeArrays.from_measurements(measurements)
            r_sq = _residuals_sq(edges, T)
            w = np.asarray(cost.weights(np.sqrt(r_sq)))
            num_in = num_out = num_und = 0
            for k, m in enumerate(measurements):
                if m.fixed_weight:
                    continue
                m.weight = float(w[k])
                if m.weight < _W_TOL:
                    num_out += 1
                elif m.weight > 1.0 - _W_TOL:
                    num_in += 1
                else:
                    num_und += 1
            if params.verbose:
                log.info(
                    f"[solve_robust_pgo] iter {it}: {num_in} inliers, "
                    f"{num_out} outliers, {num_und} undecided"
                )
            if num_und == 0:
                break
            cost.update()

    T, _ = solve_pgo(measurements, params.opt_params, T0)
    return T, measurements
