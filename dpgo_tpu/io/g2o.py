"""g2o dataset parser.

Reads EDGE_SE2 / EDGE_SE3:QUAT lines with the same precision conventions as
the reference (reference: src/DPGO_utils.cpp:113-257):

  * SE2: tau = 2 / trace(TranCov^-1) with TranCov = [[I11,I12],[I12,I22]];
    kappa = I33.
  * SE3: tau = 3 / trace(TranCov^-1); kappa = 3 / (2 trace(RotCov^-1)) —
    the information-divergence-minimizing isotropic approximations.
  * odometry edges (j == i+1) get fixed_weight = True.

The numpy implementation below is vectorized (one pass to split lines, then
batched float parsing) rather than a per-line scalar loop; a C++ fast path
(csrc/) can be layered under the same API for very large files.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from dpgo_tpu.measurements import EdgeArrays, RelativeSEMeasurement


def _quat_to_rot(qx, qy, qz, qw) -> np.ndarray:
    """Batched quaternion (x, y, z, w) -> rotation matrices (m, 3, 3).

    Matches Eigen::Quaterniond(w,x,y,z).toRotationMatrix(); Eigen normalizes
    implicitly only if the quaternion is unit — g2o files store unit
    quaternions, but we normalize defensively.
    """
    q = np.stack([qx, qy, qz, qw], axis=-1)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.empty(q.shape[:-1] + (3, 3))
    R[..., 0, 0] = 1 - 2 * (y * y + z * z)
    R[..., 0, 1] = 2 * (x * y - w * z)
    R[..., 0, 2] = 2 * (x * z + w * y)
    R[..., 1, 0] = 2 * (x * y + w * z)
    R[..., 1, 1] = 1 - 2 * (x * x + z * z)
    R[..., 1, 2] = 2 * (y * z - w * x)
    R[..., 2, 0] = 2 * (x * z - w * y)
    R[..., 2, 1] = 2 * (y * z + w * x)
    R[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def read_g2o_arrays(filename: str) -> Tuple[EdgeArrays, int]:
    """Parse a .g2o file into struct-of-arrays form. Returns (edges, num_poses)."""
    se2_rows: List[str] = []
    se3_rows: List[str] = []
    with open(filename, "r") as f:
        for line in f:
            if line.startswith("EDGE_SE2 "):
                se2_rows.append(line[9:])
            elif line.startswith("EDGE_SE3:QUAT "):
                se3_rows.append(line[14:])
            elif line.startswith("VERTEX"):
                continue
            elif line.strip():
                tok = line.split(None, 1)[0]
                raise ValueError(f"unrecognized g2o record type: {tok!r}")

    if se2_rows and se3_rows:
        raise ValueError("mixed SE2/SE3 g2o files are not supported")
    if not se2_rows and not se3_rows:
        raise ValueError(f"no measurements found in {filename}")

    if se2_rows:
        # EDGE_SE2 i j dx dy dtheta I11 I12 I13 I22 I23 I33
        data = np.fromstring(" ".join(se2_rows), sep=" ").reshape(-1, 11)
        i = data[:, 0].astype(np.int64)
        j = data[:, 1].astype(np.int64)
        dx, dy, dtheta = data[:, 2], data[:, 3], data[:, 4]
        I11, I12, _, I22, _, I33 = (data[:, k] for k in range(5, 11))
        c, s = np.cos(dtheta), np.sin(dtheta)
        R = np.stack(
            [np.stack([c, -s], -1), np.stack([s, c], -1)], axis=-2
        )
        t = np.stack([dx, dy], axis=-1)
        # tau = 2 / trace(TranCov^{-1}), TranCov = [[I11, I12], [I12, I22]]
        det = I11 * I22 - I12 * I12
        tau = 2.0 / ((I11 + I22) / det)
        kappa = I33
    else:
        # EDGE_SE3:QUAT i j dx dy dz qx qy qz qw I11..I66 (upper triangle)
        data = np.fromstring(" ".join(se3_rows), sep=" ").reshape(-1, 30)
        i = data[:, 0].astype(np.int64)
        j = data[:, 1].astype(np.int64)
        t = data[:, 2:5].copy()
        R = _quat_to_rot(data[:, 5], data[:, 6], data[:, 7], data[:, 8])
        # Upper-triangular info entries, row-major: I11..I16, I22..I26, ...
        iu = np.triu_indices(6)
        info = np.zeros((data.shape[0], 6, 6))
        info[:, iu[0], iu[1]] = data[:, 9:30]
        info[:, iu[1], iu[0]] = data[:, 9:30]
        TranCov = info[:, :3, :3]
        RotCov = info[:, 3:, 3:]
        tau = 3.0 / np.trace(np.linalg.inv(TranCov), axis1=-2, axis2=-1)
        kappa = 3.0 / (2.0 * np.trace(np.linalg.inv(RotCov), axis1=-2, axis2=-1))

    m = i.shape[0]
    edges = EdgeArrays(
        r1=np.zeros(m, np.int32),
        r2=np.zeros(m, np.int32),
        p1=i.astype(np.int32),
        p2=j.astype(np.int32),
        R=R,
        t=t,
        kappa=kappa,
        tau=tau,
        weight=np.ones(m),
        fixed_weight=(i + 1 == j),
    )
    num_poses = int(max(i.max(), j.max())) + 1
    return edges, num_poses


def read_g2o_file(filename: str) -> Tuple[List[RelativeSEMeasurement], int]:
    """Parse a .g2o file into a list of measurements
    (reference: DPGO_utils.cpp:113-257). Returns (measurements, num_poses)."""
    edges, num_poses = read_g2o_arrays(filename)
    return edges.to_measurements(), num_poses
