"""Fingerprint of the numerics-critical sources behind the committed dataset
anchors (tests/dataset_costs.json).

Round-4 post-mortem (VERDICT r4): a change to quadratic.py's band-lane cost
model altered the floating-point summation order on parking-garage and the
round shipped with stale anchors — the 30-minute parity tier was the only
thing that could catch it and it wasn't re-run. This module makes the
*fast* suite catch that state: scripts/gen_parity_table.py records the
sha256 of every file that can move a converged cost at the 1e-6 anchor
tolerance, and test_datasets_parity.py::test_anchors_fresh (milliseconds,
never skipped) fails with a "regenerate the anchors" message the moment any
of them changes.
"""

import hashlib
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Every file whose numerics feed the centralized solve_case path: parser ->
# chordal init -> Q assembly / matvec / preconditioner -> RTR. A change here
# can legitimately shift converged costs past the 1e-6 anchor gate.
NUMERICS_FILES = (
    "dpgo_tpu/io/g2o.py",
    "dpgo_tpu/quadratic.py",
    "dpgo_tpu/solvers/chordal.py",
    "dpgo_tpu/solvers/rtr.py",
    "dpgo_tpu/ops/block_tridiag.py",
    "dpgo_tpu/ops/lifted.py",
    "csrc/g2o_parser.cpp",
)


def numerics_fingerprint() -> dict:
    """sha256 per numerics-critical file (repo-relative path -> hex digest)."""
    out = {}
    for rel in NUMERICS_FILES:
        path = os.path.join(_REPO, rel)
        with open(path, "rb") as f:
            out[rel] = hashlib.sha256(f.read()).hexdigest()
    return out
