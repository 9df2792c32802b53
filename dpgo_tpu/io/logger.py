"""CSV trajectory / measurement logging and loading (checkpoint-resume).

File-format-compatible with the reference's PGOLogger (src/PGOLogger.cpp):
  trajectory:   pose_index,qx,qy,qz,qw,tx,ty,tz
  measurements: robot_src,pose_src,robot_dst,pose_dst,qx,qy,qz,qw,tx,ty,tz,
                kappa,tau,is_known_inlier,weight
3D only (the reference returns early for d == 2; PGOLogger.cpp:26,56).
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from dpgo_tpu.measurements import RelativeSEMeasurement


def _rot_to_quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w), Eigen convention."""
    R = np.asarray(R, float)
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    return np.array([x, y, z, w])


def _quat_to_rot(q: np.ndarray) -> np.ndarray:
    x, y, z, w = np.asarray(q, float) / np.linalg.norm(q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


class PGOLogger:
    def __init__(self, log_directory: str = ""):
        self.log_directory = log_directory

    def _path(self, filename: str) -> str:
        return os.path.join(self.log_directory, filename) if self.log_directory else filename

    def log_trajectory(self, d: int, n: int, T: np.ndarray, filename: str) -> None:
        """T: (n, d, d+1) trajectory (reference: PGOLogger.cpp:55-81)."""
        if d == 2:
            return
        T = np.asarray(T)
        assert T.shape == (n, d, d + 1)
        with open(self._path(filename), "w") as f:
            f.write("pose_index,qx,qy,qz,qw,tx,ty,tz\n")
            for i in range(n):
                q = _rot_to_quat(T[i, :, :d])
                t = T[i, :, d]
                f.write(
                    f"{i},{q[0]},{q[1]},{q[2]},{q[3]},{t[0]},{t[1]},{t[2]}\n"
                )

    def log_measurements(
        self, measurements: List[RelativeSEMeasurement], filename: str
    ) -> None:
        """(reference: PGOLogger.cpp:18-53)."""
        if not measurements or measurements[0].d == 2:
            return
        with open(self._path(filename), "w") as f:
            f.write(
                "robot_src,pose_src,robot_dst,pose_dst,qx,qy,qz,qw,"
                "tx,ty,tz,kappa,tau,is_known_inlier,weight\n"
            )
            for m in measurements:
                q = _rot_to_quat(m.R)
                f.write(
                    f"{m.r1},{m.p1},{m.r2},{m.p2},"
                    f"{q[0]},{q[1]},{q[2]},{q[3]},"
                    f"{m.t[0]},{m.t[1]},{m.t[2]},"
                    f"{m.kappa},{m.tau},{int(m.fixed_weight)},{m.weight}\n"
                )

    def load_trajectory(self, filename: str) -> np.ndarray:
        """Returns (n, 3, 4) (reference: PGOLogger.cpp:83-146)."""
        rows = {}
        with open(self._path(filename)) as f:
            next(f)  # header
            for line in f:
                vals = line.strip().split(",")
                idx = int(vals[0])
                q = np.array([float(v) for v in vals[1:5]])
                t = np.array([float(v) for v in vals[5:8]])
                Ti = np.zeros((3, 4))
                Ti[:, :3] = _quat_to_rot(q)
                Ti[:, 3] = t
                rows[idx] = Ti
        return np.stack([rows[i] for i in range(len(rows))])

    def load_measurements(
        self, filename: str, load_weight: bool = False
    ) -> List[RelativeSEMeasurement]:
        """(reference: PGOLogger.cpp:148-225). `filename` is used as given
        (the reference likewise does not prepend the log dir here)."""
        out: List[RelativeSEMeasurement] = []
        with open(filename) as f:
            next(f)  # header
            for line in f:
                v = line.strip().split(",")
                m = RelativeSEMeasurement(
                    r1=int(v[0]), p1=int(v[1]), r2=int(v[2]), p2=int(v[3]),
                    R=_quat_to_rot(np.array([float(x) for x in v[4:8]])),
                    t=np.array([float(x) for x in v[8:11]]),
                    kappa=float(v[11]), tau=float(v[12]),
                )
                m.fixed_weight = bool(int(v[13]))
                if load_weight:
                    m.weight = float(v[14])
                out.append(m)
        return out
