"""SPMD mesh-parallel RBCD tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from dpgo_tpu import quadratic
from dpgo_tpu.io.g2o import read_g2o_file
from dpgo_tpu.ops import lifted
from dpgo_tpu.parallel import spmd
from dpgo_tpu.parallel.simulation import build_central_evaluation
from dpgo_tpu.solvers.pgo import chordal_initialization


@pytest.fixture(scope="module")
def small_setup():
    meas, n = read_g2o_file("/root/reference/data/tinyGrid3D.g2o")
    r = 5
    problem, ranges = spmd.build_spmd_problem(meas, n, num_agents=4, r=r)
    T = chordal_initialization(meas)
    Y_lift = np.asarray(lifted.fixed_stiefel_variable(3, r))
    X0 = np.einsum("rd,nde->nre", Y_lift, T)
    state = spmd.initial_state(problem, X0, ranges)
    qd_central = build_central_evaluation(meas, n, r)
    return meas, n, problem, ranges, state, qd_central


def _global_metrics(qd_central, state, ranges, n):
    X = spmd.assemble_global(state, ranges, n)
    cost = float(quadratic.cost(qd_central, jnp.asarray(X)))
    gnorm = float(quadratic.rie_grad_norm(qd_central, jnp.asarray(X)))
    return cost, gnorm


def test_metrics_match_central_evaluation(small_setup):
    """The psum'd SPMD cost/gradnorm must equal the centralized evaluation."""
    meas, n, problem, ranges, state, qd_central = small_setup
    cfg = spmd.SPMDConfig(mode="all", acceleration=False)
    step = spmd.make_step_fn(problem, cfg, mesh=None)
    _, metrics, _ = step(state, jnp.asarray(-1, jnp.int32))
    cost_c, gnorm_c = _global_metrics(qd_central, state, ranges, n)
    # SPMD cost metric = sum_e cost_e = <XQ, X> = 2 * f_central
    np.testing.assert_allclose(float(metrics.cost), 2 * cost_c, rtol=1e-10)
    np.testing.assert_allclose(float(metrics.gradnorm), gnorm_c, rtol=1e-10)


def test_all_mode_converges_single_device(small_setup):
    meas, n, problem, ranges, state, qd_central = small_setup
    cfg = spmd.SPMDConfig(mode="all", acceleration=False, rtr_iterations=1)
    state_out, trace = spmd.run_rbcd_spmd(
        problem, state, cfg, num_rounds=200, gradnorm_tol=0.1, check_every=5
    )
    assert trace["gradnorm"][-1] < 0.1
    _, gnorm_c = _global_metrics(qd_central, state_out, ranges, n)
    assert gnorm_c < 0.2  # gradnorm metric is measured at round start


def test_mixed_precision_spmd_converges(small_setup):
    """The full TPU mixed-precision configuration (f32 tCG inner loops,
    mixed Newton-Schulz projections, inner-precision control matvecs with
    the cancellation-free decrease identity, adaptive restart) reaches the
    same tolerance and cost as the f64 path."""
    meas, n, problem, ranges, state, qd_central = small_setup
    cfg = spmd.SPMDConfig(
        mode="all", acceleration=True, rtr_iterations=1,
        rtr_gradnorm_tol=1e-2 / (2 * np.sqrt(problem.num_agents)),
        rtr_inner_dtype="float32",
        adaptive_restart=True,
    )
    # the two-phase driver covers BOTH control-matvec variants
    run = spmd.make_two_phase_run_fn(problem, cfg, mesh=None)
    state_out, metrics, rounds = run(state, 200, 1e-2)
    assert float(metrics.gradnorm) < 1e-2
    # cost agrees with the f64 configuration's converged value
    cfg64 = spmd.SPMDConfig(mode="all", acceleration=True, rtr_iterations=1,
                            rtr_gradnorm_tol=1e-2 / (2 * np.sqrt(problem.num_agents)))
    run64 = spmd.make_run_fn(problem, cfg64, mesh=None)
    s64, m64, _ = run64(state, 200, 1e-2)
    np.testing.assert_allclose(
        float(metrics.cost), float(m64.cost), rtol=1e-5
    )


def test_accelerated_all_mode_converges(small_setup):
    meas, n, problem, ranges, state, qd_central = small_setup
    cfg = spmd.SPMDConfig(mode="all", acceleration=True, rtr_iterations=1)
    state_out, trace = spmd.run_rbcd_spmd(
        problem, state, cfg, num_rounds=200, gradnorm_tol=0.1, check_every=5
    )
    assert trace["gradnorm"][-1] < 0.1


def test_greedy_mode_converges(small_setup):
    meas, n, problem, ranges, state, qd_central = small_setup
    cfg = spmd.SPMDConfig(mode="greedy", acceleration=False, rtr_iterations=1)
    state_out, trace = spmd.run_rbcd_spmd(
        problem, state, cfg, num_rounds=400, gradnorm_tol=0.1, check_every=10
    )
    assert trace["gradnorm"][-1] < 0.1


def test_sharded_matches_single_device(small_setup):
    """The 4-agent problem on a 4-device mesh must produce numerically
    identical rounds to the single-device batched path."""
    meas, n, problem, ranges, state, qd_central = small_setup
    cfg = spmd.SPMDConfig(mode="all", acceleration=True, rtr_iterations=1)

    step_local = spmd.make_step_fn(problem, cfg, mesh=None)
    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("agents",))
    step_sharded = spmd.make_step_fn(problem, cfg, mesh=mesh)

    sel = jnp.asarray(-1, jnp.int32)
    s_local, s_shard = state, state
    for _ in range(3):
        s_local, m_local, _ = step_local(s_local, sel)
        s_shard, m_shard, _ = step_sharded(s_shard, sel)
    np.testing.assert_allclose(
        np.asarray(s_local.X), np.asarray(s_shard.X), atol=1e-9
    )
    np.testing.assert_allclose(
        float(m_local.cost), float(m_shard.cost), rtol=1e-10
    )
    np.testing.assert_allclose(
        float(m_local.gradnorm), float(m_shard.gradnorm), rtol=1e-8
    )


def test_greedy_sharded_matches_single_device(small_setup):
    """Greedy mode: the single-device path solves ONLY the selected agent's
    block (dynamic slice + scatter, see spmd._round_body solve_team) while
    the mesh path solves all blocks vmapped and masks — both must produce
    identical iterates, metrics, and selection sequences."""
    meas, n, problem, ranges, state, qd_central = small_setup
    cfg = spmd.SPMDConfig(mode="greedy", acceleration=False, rtr_iterations=1)

    step_local = spmd.make_step_fn(problem, cfg, mesh=None)
    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("agents",))
    step_sharded = spmd.make_step_fn(problem, cfg, mesh=mesh)

    sel_l = sel_s = jnp.asarray(0, jnp.int32)
    s_local, s_shard = state, state
    for _ in range(6):
        s_local, m_local, sel_l = step_local(s_local, sel_l)
        s_shard, m_shard, sel_s = step_sharded(s_shard, sel_s)
        assert int(sel_l) == int(sel_s)
    np.testing.assert_allclose(
        np.asarray(s_local.X), np.asarray(s_shard.X), atol=1e-9
    )
    np.testing.assert_allclose(
        float(m_local.gradnorm), float(m_shard.gradnorm), rtol=1e-8
    )


def test_sharded_8_devices_smallgrid():
    """8 agents over the full 8-device mesh on smallGrid3D."""
    meas, n = read_g2o_file("/root/reference/data/smallGrid3D.g2o")
    r = 5
    problem, ranges = spmd.build_spmd_problem(meas, n, num_agents=8, r=r)
    T = chordal_initialization(meas)
    Y_lift = np.asarray(lifted.fixed_stiefel_variable(3, r))
    X0 = np.einsum("rd,nde->nre", Y_lift, T)
    state = spmd.initial_state(problem, X0, ranges)

    mesh = Mesh(np.array(jax.devices()[:8]), ("agents",))
    cfg = spmd.SPMDConfig(mode="all", acceleration=True, rtr_iterations=1)
    state_out, trace = spmd.run_rbcd_spmd(
        problem, state, cfg, num_rounds=100, mesh=mesh,
        gradnorm_tol=0.5, check_every=5,
    )
    assert trace["gradnorm"][-1] < 0.5
    # global solution is valid (Stiefel blocks)
    X = spmd.assemble_global(state_out, ranges, n)
    assert lifted.check_stiefel(X[:, :, :3])


def test_spmd_gnc_rejects_outlier():
    """TPU-native distributed GNC: the jitted reweighting drives the outlier
    shared edge's weight to ~0 while keeping inliers high."""
    from tests.test_distributed_robust import _two_robot_world

    rng = np.random.default_rng(80)
    meas, n, _ = _two_robot_world(rng, n=8, outlier=True)
    problem, ranges = spmd.build_spmd_problem(meas, n, num_agents=2, r=5)
    T = chordal_initialization(meas)
    Y_lift = np.asarray(lifted.fixed_stiefel_variable(3, 5))
    X0 = np.einsum("rd,nde->nre", Y_lift, T)
    state = spmd.initial_state(problem, X0, ranges)
    cfg = spmd.SPMDConfig(mode="all", acceleration=False, rtr_iterations=1)
    # init_mu=None: the reference's adaptive mu0 from the max residual
    # (DPGO_solver.cpp:356-358). With the convergence-gated weight-update
    # schedule (shouldUpdateMeasurementWeights semantics) the first update
    # happens early (loose rel-change tol 5.0, PGOAgent.cpp:411-415), so the
    # annealing must start from the data-derived mu.
    problem_out, state_out, hist = spmd.run_rbcd_gnc(
        problem, state, cfg,
        barc=5.0, init_mu=None, mu_step=1.4,
        num_weight_updates=16, inner_rounds=15,
    )
    w = np.asarray(problem_out.shared_weight)
    fx = np.asarray(problem_out.shared_fixed_weight)
    real = ~fx & (np.asarray(problem_out.shared_kappa) > 0)
    weights = np.sort(w[real])
    assert weights[0] < 1e-3  # both copies of the outlier edge
    assert weights[-1] > 0.9
    # the same edge is down-weighted consistently on both agents' copies
    per_agent = [np.sort(w[a][real[a]]) for a in range(2)]
    for pa in per_agent:
        assert pa[0] < 1e-3 and pa[-1] > 0.9


def test_spmd_checkpoint_roundtrip(tmp_path, small_setup):
    meas, n, problem, ranges, state, qd_central = small_setup
    cfg = spmd.SPMDConfig(mode="all", acceleration=True, rtr_iterations=1)
    step = spmd.make_step_fn(problem, cfg, mesh=None)
    s1, _, _ = step(state, jnp.asarray(-1, jnp.int32))
    path = str(tmp_path / "ckpt.npz")
    spmd.save_state(s1, path)
    s2 = spmd.load_state(path)
    np.testing.assert_allclose(np.asarray(s1.X), np.asarray(s2.X), atol=0)
    assert int(s1.it) == int(s2.it)
    # resumed state continues identically
    a, _, _ = step(s1, jnp.asarray(-1, jnp.int32))
    b, _, _ = step(s2, jnp.asarray(-1, jnp.int32))
    np.testing.assert_allclose(np.asarray(a.X), np.asarray(b.X), atol=0)


def test_spmd_se2():
    """SE(2) problems run through the mesh path (rank r=3 over St(2,3))."""
    rng = np.random.default_rng(90)
    theta = rng.uniform(-np.pi, np.pi, 12)

    def rot(a):
        return np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])

    from dpgo_tpu.measurements import RelativeSEMeasurement

    Rw = [rot(a) for a in theta]
    tw = [rng.standard_normal(2) for _ in range(12)]

    def rel(i, j):
        return RelativeSEMeasurement(
            0, 0, i, j, Rw[i].T @ Rw[j], Rw[i].T @ (tw[j] - tw[i]), 4.0, 2.0
        )

    meas = [rel(i, i + 1) for i in range(11)] + [rel(0, 6), rel(3, 9), rel(2, 11)]
    problem, ranges = spmd.build_spmd_problem(meas, 12, num_agents=2, r=3)
    T = chordal_initialization(meas)
    Y_lift = np.asarray(lifted.fixed_stiefel_variable(2, 3))
    X0 = np.einsum("rd,nde->nre", Y_lift, T)
    state = spmd.initial_state(problem, X0, ranges)
    cfg = spmd.SPMDConfig(mode="all", acceleration=True, rtr_iterations=1)
    run = spmd.make_run_fn(problem, cfg, mesh=None)
    state, metrics, rounds = run(state, 200, 1e-4)
    # noiseless edges: optimum cost ~ 0
    assert float(metrics.cost) < 1e-6
    X = spmd.assemble_global(state, ranges, 12)
    assert lifted.check_stiefel(X[:, :, :2])


def test_sharded_two_agents_per_device():
    """8 agents over a 4-device mesh (A=2 per device): the vmapped local
    solve + collectives must agree with the single-device path."""
    meas, n = read_g2o_file("/root/reference/data/smallGrid3D.g2o")
    r = 5
    problem, ranges = spmd.build_spmd_problem(meas, n, num_agents=8, r=r)
    T = chordal_initialization(meas)
    Y_lift = np.asarray(lifted.fixed_stiefel_variable(3, r))
    X0 = np.einsum("rd,nde->nre", Y_lift, T)
    state = spmd.initial_state(problem, X0, ranges)
    cfg = spmd.SPMDConfig(mode="all", acceleration=True, rtr_iterations=1)

    step_local = spmd.make_step_fn(problem, cfg, mesh=None)
    mesh = Mesh(np.array(jax.devices()[:4]), ("agents",))
    step_sharded = spmd.make_step_fn(problem, cfg, mesh=mesh)
    sel = jnp.asarray(-1, jnp.int32)
    s_l, s_s = state, state
    for _ in range(2):
        s_l, m_l, _ = step_local(s_l, sel)
        s_s, m_s, _ = step_sharded(s_s, sel)
    np.testing.assert_allclose(np.asarray(s_l.X), np.asarray(s_s.X), atol=1e-9)
    np.testing.assert_allclose(float(m_l.gradnorm), float(m_s.gradnorm), rtol=1e-8)


def test_backward_edges_objective_matches_central():
    """Regression (ADVICE r2 high): backward private edges (p2 < p1) must not
    be flipped — the lifted translation cost is not reversal-invariant. On
    smallGrid3D (33 backward edges) the SPMD objective/gradient must equal
    the centralized evaluation exactly."""
    meas, n = read_g2o_file("/root/reference/data/smallGrid3D.g2o")
    r = 5
    problem, ranges = spmd.build_spmd_problem(meas, n, num_agents=4, r=r)
    # at least one backward private edge survives partitioning and is laneable
    deltas = (np.asarray(problem.priv_j) - np.asarray(problem.priv_i))[
        np.asarray(problem.priv_kappa) > 0
    ]
    assert (deltas < 0).any()
    T = chordal_initialization(meas)
    Y_lift = np.asarray(lifted.fixed_stiefel_variable(3, r))
    X0 = np.einsum("rd,nde->nre", Y_lift, T)
    state = spmd.initial_state(problem, X0, ranges)
    qd_central = build_central_evaluation(meas, n, r)
    cfg = spmd.SPMDConfig(mode="all", acceleration=False)
    step = spmd.make_step_fn(problem, cfg, mesh=None)
    _, metrics, _ = step(state, jnp.asarray(-1, jnp.int32))
    cost_c, gnorm_c = _global_metrics(qd_central, state, ranges, n)
    np.testing.assert_allclose(float(metrics.cost), 2 * cost_c, rtol=1e-10)
    np.testing.assert_allclose(float(metrics.gradnorm), gnorm_c, rtol=1e-9)


def test_spmd_elastic_membership():
    """SPMD-path elastic membership (VERDICT r2 #4): a robot deactivates
    mid-run on the 8-device mesh — its block freezes, its shared edges drop
    from the team objective, the remaining team keeps converging — then
    reactivates and the full team converges."""
    meas, n = read_g2o_file("/root/reference/data/smallGrid3D.g2o")
    r = 5
    problem, ranges = spmd.build_spmd_problem(meas, n, num_agents=8, r=r)
    T = chordal_initialization(meas)
    Y_lift = np.asarray(lifted.fixed_stiefel_variable(3, r))
    X0 = np.einsum("rd,nde->nre", Y_lift, T)
    state = spmd.initial_state(problem, X0, ranges)

    mesh = Mesh(np.array(jax.devices()[:8]), ("agents",))
    cfg = spmd.SPMDConfig(mode="all", acceleration=False, rtr_iterations=1)
    run = spmd.make_run_fn(problem, cfg, mesh=mesh)

    # phase 1: full team, a few rounds
    state, m1, _ = run(state, 10, 0.0)
    assert np.isfinite(float(m1.cost))

    # phase 2: robot 3 drops out (runtime array change — no recompile)
    active = np.ones(8, bool)
    active[3] = False
    pr_drop = problem.with_robot_active(active)
    X_before = np.asarray(state.X[3])
    state, m2, _ = run(state, 60, 0.0, problem=pr_drop)
    # the inactive robot's block is exactly frozen
    np.testing.assert_array_equal(np.asarray(state.X[3]), X_before)
    assert np.isfinite(float(m2.cost))
    # the reduced team's (masked) gradnorm decreases toward its own optimum
    assert float(m2.gradnorm) < float(m1.gradnorm)

    # GNC reweighting leaves edges to the inactive neighbor untouched
    pr_w = spmd.gnc_reweight(pr_drop, state, barc_sq=25.0, mu=1e-4)
    to_inactive = np.asarray(pr_drop.shared_nbr_robot) == 3
    np.testing.assert_array_equal(
        np.asarray(pr_w.shared_weight)[to_inactive],
        np.asarray(pr_drop.shared_weight)[to_inactive],
    )

    # phase 3: reactivation — the full team converges to the true optimum
    state, m3, rounds3 = run(state, 400, 0.1, problem=problem)
    assert float(m3.gradnorm) < 0.1
    X = spmd.assemble_global(state, ranges, n)
    assert lifted.check_stiefel(X[:, :, :3])


def test_spmd_async_mode():
    """Semantic-async SPMD (VERDICT r2 #5): Poisson-thinned per-agent update
    masks inside the bulk-synchronous round (RA-L 2020 update model,
    reference host-thread version PGOAgent.cpp:486-499). Converges on the
    mesh; acceleration is rejected as in the reference (:477)."""
    meas, n = read_g2o_file("/root/reference/data/tinyGrid3D.g2o")
    r = 5
    problem, ranges = spmd.build_spmd_problem(meas, n, num_agents=4, r=r)
    T = chordal_initialization(meas)
    Y_lift = np.asarray(lifted.fixed_stiefel_variable(3, r))
    X0 = np.einsum("rd,nde->nre", Y_lift, T)
    state = spmd.initial_state(problem, X0, ranges)

    with pytest.raises(ValueError):
        spmd.make_run_fn(
            problem, spmd.SPMDConfig(mode="async", acceleration=True)
        )

    cfg = spmd.SPMDConfig(mode="async", acceleration=False,
                          rtr_iterations=1, async_rate=0.7, seed=3)
    mesh = Mesh(np.array(jax.devices()[:4]), ("agents",))
    run = spmd.make_run_fn(problem, cfg, mesh=mesh)
    state_out, metrics, rounds = run(state, 400, 0.1)
    assert float(metrics.gradnorm) < 0.1
    # the thinning actually skips updates: over a few single rounds, some
    # agents' blocks move and some stay exactly frozen
    step = spmd.make_step_fn(problem, cfg, mesh=None)
    fired, skipped = False, False
    s = state
    for _ in range(6):
        s2, _, _ = step(s, jnp.asarray(-1, jnp.int32))
        moved = np.array([
            not np.array_equal(np.asarray(s2.X[a]), np.asarray(s.X[a]))
            for a in range(4)
        ])
        fired |= moved.any()
        skipped |= (~moved).any()
        s = s2
    assert fired and skipped


def test_banded_precond_selected_and_parity(small_setup):
    """The default 'auto' preconditioner selects the stacked per-agent EXACT
    banded factor (reference parity: per-agent Cholmod LDL^T,
    PoseGraph.cpp:598-613) on small problems, and the banded-preconditioned
    sharded run matches the jacobi-preconditioned run's converged objective
    (a preconditioner changes the path, never the fixed points)."""
    meas, n, problem, ranges, state, qd_central = small_setup
    cfg = spmd.SPMDConfig(mode="all", acceleration=False, rtr_iterations=1)
    splan, arrays = spmd._plan_banded_static(problem, cfg)
    assert splan is not None and len(arrays) > 0
    # s is the max over the agents' RCM bandwidths; every agent keeps all
    # coupling entries (nothing dropped)
    assert splan.s * splan.dh <= 1024

    mesh = Mesh(np.array(jax.devices()[:4]), ("agents",))
    run_b = spmd.make_run_fn(problem, cfg, mesh=mesh)
    sb, mb, rb = run_b(state, 200, 0.05)

    cfg_j = spmd.SPMDConfig(mode="all", acceleration=False,
                            rtr_iterations=1, precond="jacobi")
    run_j = spmd.make_run_fn(problem, cfg_j, mesh=mesh)
    sj, mj, rj = run_j(state, 200, 0.05)

    assert float(mb.gradnorm) < 0.05 and float(mj.gradnorm) < 0.05
    cost_b, _ = _global_metrics(qd_central, sb, ranges, n)
    cost_j, _ = _global_metrics(qd_central, sj, ranges, n)
    np.testing.assert_allclose(cost_b, cost_j, rtol=1e-4)
    # (round counts differ slightly: the preconditioner changes the inner
    # tCG path, not RBCD's outer coordination — no ordering is asserted)
