"""Cross-dataset smoke/parity: the centralized and distributed solvers agree
on the bundled reference datasets (SURVEY.md §4 test plan: numerical parity
across the .g2o suite)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dpgo_tpu import quadratic
from dpgo_tpu.io.g2o import read_g2o_file
from dpgo_tpu.measurements import EdgeArrays
from dpgo_tpu.ops import lifted
from dpgo_tpu.solvers import chordal as chordal_mod
from dpgo_tpu.solvers import rtr as rtr_mod

DATA = "/root/reference/data"

# (name, known optimal cost or None). sphere2500's 1687.0058 is the
# well-known SE-Sync global optimum for this dataset at the parser's
# kappa/tau conventions — reaching it certifies the whole pipeline.
CASES = [
    ("tinyGrid3D.g2o", None),
    ("smallGrid3D.g2o", None),
    ("parking-garage.g2o", None),
    ("sphere2500.g2o", 1687.00581),
    ("input_INTEL_g2o.g2o", None),  # 2D
]


@pytest.mark.parametrize("name,known_cost", CASES)
def test_centralized_solve_dataset(name, known_cost):
    meas, n = read_g2o_file(f"{DATA}/{name}")
    d = meas[0].d
    r = 5
    edges = EdgeArrays.from_measurements(meas)
    problem = quadratic.from_private_measurements(edges, n=n, d=d)
    T = chordal_mod.chordal_initialization_arrays(edges, n=n)
    Y_lift = jnp.asarray(lifted.fixed_stiefel_variable(d, r))
    X0 = jnp.einsum("rd,nde->nre", Y_lift, T)
    qd = quadratic.build_quadratic_data(problem, jnp.zeros((1, r, d + 1)), r=r)
    X, stats = rtr_mod.rtr_solve(
        qd, X0, gradnorm_tol=1e-2, initial_radius=100.0,
        max_iterations=100, max_inner=300,
    )
    assert float(stats.gnorm_opt) < 1e-2, name
    assert float(stats.f_opt) <= float(stats.f_init)
    assert lifted.check_stiefel(np.asarray(X)[:, :, :d])
    if known_cost is not None:
        np.testing.assert_allclose(2 * float(stats.f_opt), known_cost, rtol=1e-6)


def test_mixed_precision_cost_parity_sphere2500():
    """Mixed-precision pipeline matches the f64 optimum to ~1e-9 relative on
    sphere2500 (the bench configuration)."""
    meas, n = read_g2o_file(f"{DATA}/sphere2500.g2o")
    edges = EdgeArrays.from_measurements(meas)
    problem = quadratic.from_private_measurements(edges, n=n, d=3)
    Y_lift = jnp.asarray(lifted.fixed_stiefel_variable(3, 5))
    T = chordal_mod.chordal_initialization_arrays(
        edges, n=n, cg_dtype=jnp.float32, tol=1e-6
    )
    X0 = jnp.einsum("rd,nde->nre", Y_lift, T)
    qd = quadratic.build_quadratic_data(problem, jnp.zeros((1, 5, 4)), r=5)
    X, stats = rtr_mod.rtr_solve(
        qd, X0, 1e-2, 100.0, max_iterations=100, max_inner=300,
        inner_dtype=jnp.float32,
    )
    assert float(stats.gnorm_opt) < 1e-2
    np.testing.assert_allclose(2 * float(stats.f_opt), 1687.00581, rtol=1e-6)
