"""Closed-form and GNC-robust single rotation/translation/pose averaging.

Mirrors the reference (src/DPGO_solver.cpp:23-218). These operate on small
candidate sets (e.g. the per-loop-closure alignment candidates used in robust
inter-robot initialization, PGOAgent.cpp:550-602), so they run in numpy on the
host — dispatch overhead would dominate any device win.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from dpgo_tpu.robust import RobustCost
from dpgo_tpu.types import RobustCostParameters, RobustCostType

_W_TOL = 1e-8


def project_to_rotation_group(M: np.ndarray) -> np.ndarray:
    """SVD projection onto SO(d) with determinant fix
    (reference: DPGO_utils.cpp:464-478)."""
    U, _, Vt = np.linalg.svd(M)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        U = U.copy()
        U[:, -1] *= -1
    return U @ Vt


def single_translation_averaging(
    t_vec: Sequence[np.ndarray], tau: Optional[np.ndarray] = None
) -> np.ndarray:
    """Weighted mean of translations (reference: DPGO_solver.cpp:23-40)."""
    n = len(t_vec)
    assert n > 0
    tau_ = np.ones(n) if tau is None or len(tau) != n else np.asarray(tau)
    ts = np.stack([np.asarray(t).reshape(-1) for t in t_vec])
    return (tau_[:, None] * ts).sum(0) / tau_.sum()


def single_rotation_averaging(
    R_vec: Sequence[np.ndarray], kappa: Optional[np.ndarray] = None
) -> np.ndarray:
    """Weighted chordal mean of rotations: project the weighted sum
    (reference: DPGO_solver.cpp:42-57)."""
    n = len(R_vec)
    assert n > 0
    kappa_ = np.ones(n) if kappa is None or len(kappa) != n else np.asarray(kappa)
    M = sum(k * R for k, R in zip(kappa_, R_vec))
    return project_to_rotation_group(M)


def single_pose_averaging(
    R_vec: Sequence[np.ndarray],
    t_vec: Sequence[np.ndarray],
    kappa: Optional[np.ndarray] = None,
    tau: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(reference: DPGO_solver.cpp:59-70)."""
    return (
        single_rotation_averaging(R_vec, kappa),
        single_translation_averaging(t_vec, tau),
    )


def robust_single_rotation_averaging(
    R_vec: Sequence[np.ndarray],
    kappa: Optional[np.ndarray] = None,
    error_threshold: float = 1.0,
) -> Tuple[np.ndarray, List[int]]:
    """GNC-TLS robust rotation averaging; returns (R_opt, inlier_indices)
    (reference: DPGO_solver.cpp:72-135)."""
    n = len(R_vec)
    assert n > 0
    kappa_ = np.ones(n) if kappa is None or (kappa is not None and len(kappa) != n) else np.asarray(kappa, float)
    weights = np.ones(n)

    R_opt = single_rotation_averaging(R_vec, kappa_)
    r_sq = np.array(
        [kappa_[i] * np.sum((R_opt - R_vec[i]) ** 2) for i in range(n)]
    )
    barc_sq = error_threshold * error_threshold
    mu_init = barc_sq / (2 * r_sq.max() - barc_sq)
    mu_init = min(mu_init, 1e-5)
    # Negative initial mu means all residuals are already small: skip GNC.
    if mu_init > 0:
        params = RobustCostParameters(
            cost_type=RobustCostType.GNC_TLS,
            GNC_barc=error_threshold,
            GNC_max_iters=1000,
            GNC_init_mu=mu_init,
        )
        cost = RobustCost(params)
        for _ in range(params.GNC_max_iters):
            R_opt = single_rotation_averaging(R_vec, kappa_ * weights)
            nc = 0
            for i in range(n):
                r_sq_i = kappa_[i] * np.sum((R_opt - R_vec[i]) ** 2)
                wi = cost.weight(np.sqrt(r_sq_i))
                if wi < _W_TOL or wi > 1 - _W_TOL:
                    nc += 1
                weights[i] = wi
            if nc == n:
                break
            cost.update()

    inliers = [i for i in range(n) if weights[i] > 1 - _W_TOL]
    return R_opt, inliers


def robust_single_pose_averaging(
    R_vec: Sequence[np.ndarray],
    t_vec: Sequence[np.ndarray],
    kappa: Optional[np.ndarray] = None,
    tau: Optional[np.ndarray] = None,
    error_threshold: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray, List[int]]:
    """GNC-TLS robust pose averaging; returns (R_opt, t_opt, inlier_indices)
    (reference: DPGO_solver.cpp:137-218)."""
    n = len(R_vec)
    assert n > 0 and len(t_vec) == n
    kappa_ = 10000 * np.ones(n) if kappa is None or len(kappa) != n else np.asarray(kappa, float)
    tau_ = 100 * np.ones(n) if tau is None or len(tau) != n else np.asarray(tau, float)
    weights = np.ones(n)

    def resid_sq(R_opt, t_opt, i):
        return kappa_[i] * np.sum((R_opt - R_vec[i]) ** 2) + tau_[i] * np.sum(
            (t_opt - np.asarray(t_vec[i]).reshape(-1)) ** 2
        )

    R_opt, t_opt = single_pose_averaging(R_vec, t_vec, kappa_ * weights, tau_ * weights)
    r_sq = np.array([resid_sq(R_opt, t_opt, i) for i in range(n)])
    barc_sq = error_threshold * error_threshold
    mu_init = barc_sq / (2 * r_sq.max() - barc_sq)
    mu_init = min(mu_init, 1e-5)
    if mu_init > 0:
        params = RobustCostParameters(
            cost_type=RobustCostType.GNC_TLS,
            GNC_barc=error_threshold,
            GNC_max_iters=10000,
            GNC_init_mu=mu_init,
        )
        cost = RobustCost(params)
        for _ in range(params.GNC_max_iters):
            R_opt, t_opt = single_pose_averaging(
                R_vec, t_vec, kappa_ * weights, tau_ * weights
            )
            nc = 0
            for i in range(n):
                wi = cost.weight(np.sqrt(resid_sq(R_opt, t_opt, i)))
                if wi < _W_TOL or wi > 1 - _W_TOL:
                    nc += 1
                weights[i] = wi
            if nc == n:
                break
            cost.update()

    inliers = [i for i in range(n) if weights[i] > 1 - _W_TOL]
    return R_opt, t_opt, inliers
