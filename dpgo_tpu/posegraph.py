"""Per-agent pose graph: measurement store + compiled local problem.

Host-side mirror of the reference's PoseGraph (include/DPGO/PoseGraph.h,
src/PoseGraph.cpp): partitions measurements into odometry / private loop
closures / shared loop closures with dedup, tracks public-pose sets and
neighbor activity, and owns the priors.

Where the reference lazily constructs Eigen sparse matrices
(PoseGraph.cpp:381-613), this class lowers to a `LocalProblem` pytree of
static-shaped arrays (quadratic.py) consumed by the jitted solvers. Edge
weights and neighbor poses are array *values*, so GNC reweighting and
per-iteration neighbor updates never trigger recompilation.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

from dpgo_tpu import quadratic
from dpgo_tpu.measurements import (
    EdgeArrays,
    RelativeSEMeasurement,
    homogeneous,
)
from dpgo_tpu.types import EdgeID, PoseGraphStatistics, PoseID


class PoseGraph:
    def __init__(self, robot_id: int, r: int, d: int):
        assert r >= d
        self.id = robot_id
        self.r = r
        self.d = d
        self.n = 0
        self.use_inactive_neighbors = False
        self._empty()

    # ------------------------------------------------------------------
    # Measurement store (reference: PoseGraph.cpp:27-148)
    # ------------------------------------------------------------------

    def _empty(self) -> None:
        self.n = 0
        self.odometry: List[RelativeSEMeasurement] = []
        self.private_lcs: List[RelativeSEMeasurement] = []
        self.shared_lcs: List[RelativeSEMeasurement] = []
        self._edge_index: Dict[EdgeID, Tuple[str, int]] = {}
        self.local_shared_pose_ids: Set[PoseID] = set()
        self.nbr_shared_pose_ids: Set[PoseID] = set()
        self.nbr_robot_ids: Set[int] = set()
        self.neighbor_active: Dict[int, bool] = {}
        self.priors: Dict[int, np.ndarray] = {}
        self.neighbor_poses: Dict[PoseID, np.ndarray] = {}
        self._problem_cache: Optional[quadratic.LocalProblem] = None
        self._slot_of_nbr_pose: Dict[PoseID, int] = {}
        self.ms_build_structure = 0.0
        self.ms_build_values = 0.0

    def empty(self) -> None:
        self._empty()

    def reset(self) -> None:
        """Clear caches and re-activate all neighbors (reference:
        PoseGraph.cpp:43-50)."""
        self.clear_neighbor_poses()
        self.clear_priors()
        self._problem_cache = None
        for nid in self.nbr_robot_ids:
            self.neighbor_active[nid] = True

    def set_measurements(self, measurements: Sequence[RelativeSEMeasurement]) -> None:
        self._empty()
        for m in measurements:
            self.add_measurement(m)

    def add_measurement(self, m: RelativeSEMeasurement) -> None:
        if m.r1 != self.id and m.r2 != self.id:
            return  # irrelevant edge
        if m.r1 == self.id and m.r2 == self.id:
            if m.p1 + 1 == m.p2:
                self._add(m, "odometry")
            else:
                self._add(m, "private")
        else:
            self._add(m, "shared")

    def _add(self, m: RelativeSEMeasurement, kind: str) -> None:
        eid = EdgeID(PoseID(m.r1, m.p1), PoseID(m.r2, m.p2))
        if eid in self._edge_index:
            return  # duplicate
        m = m.copy()
        if kind == "odometry":
            self.n = max(self.n, m.p2 + 1)
            self.odometry.append(m)
            self._edge_index[eid] = (kind, len(self.odometry) - 1)
        elif kind == "private":
            self.n = max(self.n, m.p1 + 1, m.p2 + 1)
            self.private_lcs.append(m)
            self._edge_index[eid] = (kind, len(self.private_lcs) - 1)
        else:
            if m.r1 == self.id:
                self.n = max(self.n, m.p1 + 1)
                self.local_shared_pose_ids.add(PoseID(m.r1, m.p1))
                self.nbr_shared_pose_ids.add(PoseID(m.r2, m.p2))
                self.nbr_robot_ids.add(m.r2)
                self.neighbor_active[m.r2] = True
            else:
                assert m.r2 == self.id
                self.n = max(self.n, m.p2 + 1)
                self.local_shared_pose_ids.add(PoseID(m.r2, m.p2))
                self.nbr_shared_pose_ids.add(PoseID(m.r1, m.p1))
                self.nbr_robot_ids.add(m.r1)
                self.neighbor_active[m.r1] = True
            self.shared_lcs.append(m)
            self._edge_index[eid] = (kind, len(self.shared_lcs) - 1)
        self._problem_cache = None

    # ------------------------------------------------------------------
    # Queries
    # ------------------------------------------------------------------

    def num_odometry(self) -> int:
        return len(self.odometry)

    def num_private_loop_closures(self) -> int:
        return len(self.private_lcs)

    def num_shared_loop_closures(self) -> int:
        return len(self.shared_lcs)

    def num_measurements(self) -> int:
        return len(self.odometry) + len(self.private_lcs) + len(self.shared_lcs)

    def measurements(self) -> List[RelativeSEMeasurement]:
        return list(self.odometry) + list(self.private_lcs) + list(self.shared_lcs)

    def local_measurements(self) -> List[RelativeSEMeasurement]:
        return list(self.odometry) + list(self.private_lcs)

    def shared_loop_closures_with(self, neighbor_id: int) -> List[RelativeSEMeasurement]:
        return [
            m for m in self.shared_lcs if m.r1 == neighbor_id or m.r2 == neighbor_id
        ]

    def has_neighbor(self, robot_id: int) -> bool:
        return robot_id in self.nbr_robot_ids

    def neighbor_ids(self) -> List[int]:
        return sorted(self.nbr_robot_ids)

    def is_neighbor_active(self, neighbor_id: int) -> bool:
        if not self.has_neighbor(neighbor_id):
            return False
        return self.neighbor_active[neighbor_id]

    def set_neighbor_active(self, neighbor_id: int, active: bool) -> None:
        if not self.has_neighbor(neighbor_id):
            return
        self.neighbor_active[neighbor_id] = active

    def active_neighbor_ids(self) -> List[int]:
        return [nid for nid in sorted(self.nbr_robot_ids) if self.is_neighbor_active(nid)]

    def active_neighbor_public_pose_ids(self) -> Set[PoseID]:
        return {
            pid for pid in self.nbr_shared_pose_ids if self.is_neighbor_active(pid.robot_id)
        }

    def require_neighbor_pose(self, pose_id: PoseID) -> bool:
        return pose_id in self.nbr_shared_pose_ids

    def my_public_pose_ids(self) -> Set[PoseID]:
        return set(self.local_shared_pose_ids)

    def has_measurement(self, src: PoseID, dst: PoseID) -> bool:
        return EdgeID(src, dst) in self._edge_index

    def find_measurement(self, src: PoseID, dst: PoseID) -> Optional[RelativeSEMeasurement]:
        eid = EdgeID(src, dst)
        if eid not in self._edge_index:
            return None
        kind, idx = self._edge_index[eid]
        lst = {
            "odometry": self.odometry,
            "private": self.private_lcs,
            "shared": self.shared_lcs,
        }[kind]
        return lst[idx]

    def active_loop_closures(self) -> List[RelativeSEMeasurement]:
        """Private LCs + shared LCs with active neighbors
        (reference: PoseGraph.cpp:276-290)."""
        out = list(self.private_lcs)
        for m in self.shared_lcs:
            other = m.r2 if m.r1 == self.id else m.r1
            if self.is_neighbor_active(other):
                out.append(m)
        return out

    def statistics(self) -> PoseGraphStatistics:
        """GNC inlier/outlier counts (reference: PoseGraph.cpp:305-343)."""
        total = accept = reject = 0.0
        for m in self.private_lcs:
            if m.weight == 1:
                accept += 1
            elif m.weight == 0:
                reject += 1
            total += 1
        for m in self.shared_lcs:
            other = m.r2 if m.r1 == self.id else m.r1
            if not self.is_neighbor_active(other):
                continue
            if m.weight == 1:
                accept += 1
            elif m.weight == 0:
                reject += 1
            total += 1
        return PoseGraphStatistics(
            total_loop_closures=total,
            accept_loop_closures=accept,
            reject_loop_closures=reject,
            undecided_loop_closures=total - accept - reject,
        )

    # ------------------------------------------------------------------
    # Priors / neighbor poses
    # ------------------------------------------------------------------

    def set_prior(self, index: int, Xi: np.ndarray) -> None:
        """Pin pose `index` to the lifted pose Xi: (r, d+1)
        (reference: PoseGraph.cpp:176-181)."""
        assert index < self.n
        assert Xi.shape == (self.r, self.d + 1)
        self.priors[index] = np.asarray(Xi, np.float64)
        self._problem_cache = None

    def clear_priors(self) -> None:
        if self.priors:
            self._problem_cache = None
        self.priors = {}

    def set_neighbor_poses(self, pose_dict: Dict[PoseID, np.ndarray]) -> None:
        self.neighbor_poses = dict(pose_dict)

    def clear_neighbor_poses(self) -> None:
        self.neighbor_poses = {}

    def set_use_inactive_neighbors(self, use: bool) -> None:
        self.use_inactive_neighbors = use

    # ------------------------------------------------------------------
    # Compiled local problem
    # ------------------------------------------------------------------

    def neighbor_pose_slots(self) -> Dict[PoseID, int]:
        """Stable slot assignment for required neighbor poses."""
        if self._problem_cache is None or not self._slot_of_nbr_pose:
            self._slot_of_nbr_pose = {
                pid: k for k, pid in enumerate(sorted(self.nbr_shared_pose_ids))
            }
        return self._slot_of_nbr_pose

    def data_matrices_ready(self) -> bool:
        """False if a shared edge with an *active* neighbor is missing its
        cached neighbor pose — the condition under which the reference's
        constructQ/constructG bail out (PoseGraph.cpp:417-430, 517-532)."""
        for m in self.shared_lcs:
            if m.r1 == self.id:
                nid = PoseID(m.r2, m.p2)
                active = self.is_neighbor_active(m.r2)
            else:
                nid = PoseID(m.r1, m.p1)
                active = self.is_neighbor_active(m.r1)
            if active and nid not in self.neighbor_poses:
                return False
        return True

    def _build_problem_structure(self) -> quadratic.LocalProblem:
        """Structure-only arrays (indices, measurements); weights and masks
        are refreshed per call in local_problem()."""
        d, dh, r, n = self.d, self.d + 1, self.r, self.n
        priv = self.local_measurements()
        slots = self.neighbor_pose_slots()

        priv_edges = EdgeArrays.from_measurements(priv, d=d)
        priv_T = homogeneous(priv_edges.R, priv_edges.t) if priv_edges.m else np.zeros((0, dh, dh))

        ms = len(self.shared_lcs)
        shared_idx = np.zeros(ms, np.int32)
        shared_T = np.zeros((ms, dh, dh))
        shared_kappa = np.zeros(ms)
        shared_tau = np.zeros(ms)
        shared_out = np.zeros(ms, bool)
        shared_slot = np.zeros(ms, np.int32)
        for k, m in enumerate(self.shared_lcs):
            shared_T[k] = homogeneous(m.R, m.t)
            shared_kappa[k] = m.kappa
            shared_tau[k] = m.tau
            if m.r1 == self.id:
                shared_idx[k] = m.p1
                shared_out[k] = True
                shared_slot[k] = slots[PoseID(m.r2, m.p2)]
            else:
                shared_idx[k] = m.p2
                shared_out[k] = False
                shared_slot[k] = slots[PoseID(m.r1, m.p1)]

        prior_items = sorted(self.priors.items())
        prior_idx = np.array([k for k, _ in prior_items], np.int32)
        prior_pose = (
            np.stack([v for _, v in prior_items])
            if prior_items
            else np.zeros((0, r, dh))
        )

        return quadratic.make_local_problem(
            n=n,
            d=d,
            priv_i=priv_edges.p1,
            priv_j=priv_edges.p2,
            priv_T=priv_T,
            priv_kappa=priv_edges.kappa,
            priv_tau=priv_edges.tau,
            priv_weight=priv_edges.weight,
            shared_idx=shared_idx,
            shared_T=shared_T,
            shared_kappa=shared_kappa,
            shared_tau=shared_tau,
            shared_weight=np.ones(ms),
            shared_outgoing=shared_out,
            shared_nbr_slot=shared_slot,
            shared_mask=np.ones(ms),
            prior_idx=prior_idx,
            prior_pose=prior_pose,
            prior_mask=np.ones(len(prior_items)),
            r=r,
        )

    def local_problem(self) -> Tuple[quadratic.LocalProblem, np.ndarray]:
        """Return (LocalProblem with current weights/masks, neighbor pose
        buffer (p, r, dh)). Call data_matrices_ready() first.

        Timing of the assembly is recorded in ms_build_structure /
        ms_build_values (the analog of the reference's ms_construct_Q/G
        fields, PoseGraph.h:334-337; Q/G themselves are assembled inside the
        jitted local solve)."""
        import dataclasses as _dc
        import time as _time

        import jax.numpy as jnp

        t0 = _time.perf_counter()
        if self._problem_cache is None:
            self._problem_cache = self._build_problem_structure()
            self.ms_build_structure = (_time.perf_counter() - t0) * 1e3
        base = self._problem_cache

        priv = self.local_measurements()
        priv_w = np.array([m.weight for m in priv]) if priv else np.zeros(0)

        ms = len(self.shared_lcs)
        shared_w = np.zeros(ms)
        shared_mask = np.zeros(ms)
        slots = self.neighbor_pose_slots()
        p = max(len(slots), 1)
        nbr_buf = np.zeros((p, self.r, self.d + 1))
        present = np.zeros(p, bool)
        for pid, slot in slots.items():
            if pid in self.neighbor_poses:
                nbr_buf[slot] = self.neighbor_poses[pid]
                present[slot] = True
        for k, m in enumerate(self.shared_lcs):
            shared_w[k] = m.weight
            if m.r1 == self.id:
                nid, other = PoseID(m.r2, m.p2), m.r2
            else:
                nid, other = PoseID(m.r1, m.p1), m.r1
            has_pose = present[slots[nid]]
            if self.is_neighbor_active(other):
                shared_mask[k] = 1.0 if has_pose else 0.0
            else:
                shared_mask[k] = (
                    1.0 if (self.use_inactive_neighbors and has_pose) else 0.0
                )

        problem = _dc.replace(
            base,
            priv_weight=jnp.asarray(priv_w),
            shared_weight=jnp.asarray(shared_w),
            shared_mask=jnp.asarray(shared_mask),
        )
        self.ms_build_values = (_time.perf_counter() - t0) * 1e3
        return problem, nbr_buf
