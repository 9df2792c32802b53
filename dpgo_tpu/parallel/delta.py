"""Anchored delta-state RBCD: certified f64-class accuracy at scale with
ZERO f64 tensor kernels on device.

Why this exists. A plain f32 iterate cannot certify the reference-quality
global gradient norm (< 1e-2) at 100k poses: quantizing the pose values to
f32 perturbs the iterate by ~eps_f32·|X| per entry, and the gradient at the
perturbed point differs by ~||Hess||·eps·|X|·sqrt(n·deg). Measured on the
synthetic grid3d world (scripts/f32_floor_experiment.py): the quantization
alone contributes 3.5e-3 to the global gradnorm at 10k poses — extrapolating
(sqrt(10)× poses, 2× translation extent) puts the 100k floor at ~2e-2,
above the target. f64 tensor kernels are not an option either: emulated f64
at 100k scale is both ~15-30× slower and crashes the tunneled TPU worker
(docs/PERF.md).

The fix: never materialize the pose values in f32. The iterate is stored as
X = X_ref + D where

  * X_ref is an anchor held in f64 ON THE HOST (numpy); the device sees an
    f32 cast of it plus f64-precomputed per-edge REFERENCE RESIDUALS
    Res_ref = X_ref_i·T − X_ref_j (small near convergence) and the
    orthonormality defects M_ref = Y_refᵀY_ref − I;
  * D is the f32 on-device delta — small, so f32 resolution eps·|D| applies
    to the DELTA, not to O(|X|) pose values;
  * every device-side computation touches only small quantities:
      - residuals:   Res = Res_ref + (D_i·T − D_j)            (edge-local)
      - gradient:    per-edge contributions (Res·om)Tᵀ etc.   (residual form)
      - cost change: f(X') − f(X) = ½⟨Δ, g + g'⟩              (exact for the
        quadratic objective — no difference of large costs, no extra matvec)
      - retraction/projection: the POLAR map in delta form — the
        Newton–Schulz polar iteration rewritten on the delta E = Y − Y_ref:
        E ← E − ½·(Y_ref+E)·K(E),  K(E) = M_ref + Y_refᵀE + EᵀY_ref + EᵀE,
        every term O(|E| + |M_ref|); the O(1) identity is never formed, so
        the injected rounding is eps·|W|, not eps·|X| (delta_polar). Because
        K is recomputed from M_ref and the actual E each iteration,
        approximate projections do NOT compound: the algebra never assumes
        Y is exactly orthonormal.
  * every chunk of rounds the host RE-ANCHORS in f64: X_ref += D, D → 0
    (Nesterov variables shift exactly: D_V − D_X, D_Y − D_X), and the
    reference residuals/defects are recomputed — so |D| stays at the scale
    of recent steps and the representable iterate resolution keeps
    improving as the optimization converges.

Certification is honest: the final gradient norm is evaluated in f64 on the
host at X_ref + D (run_delta_certified returns it alongside the iterate).

This engine is the tail/certification phase of the 100k-scale pipeline; the
plain f32 SPMD engine (parallel/spmd.py) handles the bulk descent where the
quantization floor is irrelevant. Deviation from the reference: the local
solver here uses the polar retraction (second-order) instead of ROPTLIB's
qf/QR retraction (LiftedSEManifold.cpp:19) — any retraction yields a valid
RTR; documented in docs/PARITY.md. Elastic membership and GNC are served by
the main engine, not this one.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dpgo_tpu import quadratic
from dpgo_tpu.ops import lifted
from dpgo_tpu.parallel import spmd as spmd_mod
from dpgo_tpu.solvers import rtr as rtr_mod

_HI = jax.lax.Precision.HIGHEST


class DeltaRef(NamedTuple):
    """Device-side (f32) anchor data, precomputed in f64 on the host."""

    X_ref: jax.Array  # (N, n_max, r, dh)
    res_ref_priv: jax.Array  # (N, mp, r, dh)
    res_ref_shared: jax.Array  # (N, ms, r, dh)
    M_ref: jax.Array  # (N, n_max, d, d)  Y_refᵀY_ref − I


class DeltaState(NamedTuple):
    D: jax.Array  # (N, n_max, r, dh) delta of X
    DY: jax.Array  # delta of the Nesterov aux Y
    DV: jax.Array  # delta of the Nesterov aux V
    gamma: jax.Array
    it: jax.Array
    prev_cost: jax.Array  # last round's objective (adaptive restart signal)
    do_restart: jax.Array  # bool: cost increased last round -> restart now


def build_delta_ref(
    problem: spmd_mod.SPMDProblem, X_ref64: np.ndarray, dtype=np.float32
) -> DeltaRef:
    """Host-side, f64: reference residuals + orthonormality defects at the
    anchor. X_ref64: (N, n_max, r, dh) float64."""
    X = np.asarray(X_ref64, np.float64)
    N, n_max, r, dh = X.shape
    d = dh - 1
    T = np.asarray(problem.priv_T, np.float64)
    i_idx = np.asarray(problem.priv_i)
    j_idx = np.asarray(problem.priv_j)
    Xi = np.take_along_axis(X, i_idx[:, :, None, None], axis=1)
    Xj = np.take_along_axis(X, j_idx[:, :, None, None], axis=1)
    res_priv = np.einsum("qmra,qmab->qmrb", Xi, T, optimize=True) - Xj

    # shared edges: resolve the neighbor's reference pose globally
    pub = np.take_along_axis(
        X, np.asarray(problem.pub_idx)[:, :, None, None], axis=1
    )  # (N, p_max, r, dh)
    nbr = pub[np.asarray(problem.shared_nbr_robot),
              np.asarray(problem.shared_nbr_slot)]  # (N, ms, r, dh)
    Xl = np.take_along_axis(
        X, np.asarray(problem.shared_idx)[:, :, None, None], axis=1
    )
    Ts = np.asarray(problem.shared_T, np.float64)
    out = np.asarray(problem.shared_outgoing)[:, :, None, None]
    tail = np.where(out, Xl, nbr)
    head = np.where(out, nbr, Xl)
    res_shared = np.einsum("qmra,qmab->qmrb", tail, Ts, optimize=True) - head

    Y = X[..., :d]
    M = np.einsum("qnra,qnrb->qnab", Y, Y, optimize=True) - np.eye(d)

    return DeltaRef(
        X_ref=jnp.asarray(X, dtype),
        res_ref_priv=jnp.asarray(res_priv, dtype),
        res_ref_shared=jnp.asarray(res_shared, dtype),
        M_ref=jnp.asarray(M, dtype),
    )


def initial_delta_state(ref: DeltaRef) -> DeltaState:
    z = jnp.zeros_like(ref.X_ref)
    return DeltaState(
        D=z, DY=z, DV=z,
        gamma=jnp.zeros((), ref.X_ref.dtype),
        it=jnp.zeros((), jnp.int32),
        prev_cost=jnp.asarray(jnp.inf, ref.X_ref.dtype),
        do_restart=jnp.asarray(False),
    )


# ---------------------------------------------------------------------------
# The delta-polar primitive
# ---------------------------------------------------------------------------

def _delta_K(Y_ref: jax.Array, M_ref: jax.Array, E: jax.Array) -> jax.Array:
    """K = (Y_ref+E)ᵀ(Y_ref+E) − I, computed CANCELLATION-FREE as
    M_ref + Y_refᵀE + EᵀY_ref + EᵀE — the O(1) identity never appears, so
    the absolute rounding is eps·(|M_ref| + |E|), not eps·1."""
    YtE = jnp.einsum("...ra,...rb->...ab", Y_ref, E, precision=_HI)
    EtE = jnp.einsum("...ra,...rb->...ab", E, E, precision=_HI)
    return M_ref + YtE + jnp.swapaxes(YtE, -1, -2) + EtE


def delta_polar(Y_ref: jax.Array, M_ref: jax.Array, W: jax.Array,
                iters: int = 16) -> jax.Array:
    """polar(Y_ref + W) − Y_ref, computed entirely in delta space.

    Newton–Schulz polar iteration Y ← Y − ½·Y·(YᵀY − I), rewritten on the
    delta E = Y − Y_ref:  E ← E − ½·(Y_ref + E)·K(E)  with K(E) recomputed
    cancellation-free each step (_delta_K). The fixed points are exactly
    E with (Y_ref+E) orthonormal; near convergence every operand is small,
    so the injected rounding is eps·(|W| + |M_ref|) — never eps·|Y|. Works
    for any anchor (M_ref carries its orthonormality defect) and does not
    assume |W| small: a delta-compatible pre-scaling
    c·A = Y_ref + ((c−1)·Y_ref + c·W) clamps σ_max(A) into NS's basin
    (σ < √3) and is the identity (c = 1, exactly) whenever W is already
    moderate — i.e. always near convergence, where delta accuracy matters.
    Shapes: Y_ref/W (..., r, d), M_ref (..., d, d)."""
    d = W.shape[-1]
    K0 = _delta_K(Y_ref, M_ref, W)
    # σ_max(A)² = 1 + λ_max(K) ≤ 1 + ||K||_F; clamp σ² to ≤ 2 (inside the
    # NS basin σ² < 3) by shrinking A when needed — c = 1 exactly otherwise
    s2 = 1.0 + jnp.sqrt(
        jnp.sum(K0 * K0, axis=(-2, -1), keepdims=True)
    )
    c = jnp.minimum(1.0, jnp.sqrt(2.0 / s2))
    E = (c - 1.0) * Y_ref + c * W
    c2 = c * c
    # K of the scaled matrix: (c²−1)·I + c²·K — still cancellation-free
    K = (c2 - 1.0) * jnp.eye(d, dtype=W.dtype) + c2 * K0

    for _ in range(iters):
        A = Y_ref + E
        E = E - 0.5 * jnp.einsum("...ra,...ab->...rb", A, K, precision=_HI)
        K = _delta_K(Y_ref, M_ref, E)
    return E


def delta_project_lifted(X_ref, M_ref, W):
    """Lifted-pose delta projection: polar on the rotation block, identity on
    the translation column (mirrors lifted.project_lifted)."""
    W_rot = delta_polar(X_ref[..., :-1], M_ref, W[..., :-1])
    return jnp.concatenate([W_rot, W[..., -1:]], axis=-1)


# ---------------------------------------------------------------------------
# Residual-form cost/gradient in delta space
# ---------------------------------------------------------------------------

def _omegas(pr_blk: spmd_mod.SPMDProblem):
    d = pr_blk.d
    om_p = quadratic._omega(
        pr_blk.priv_kappa.reshape(-1), pr_blk.priv_tau.reshape(-1),
        pr_blk.priv_weight.reshape(-1), d,
    ).reshape(*pr_blk.priv_kappa.shape, d + 1)
    om_s = quadratic._omega(
        pr_blk.shared_kappa.reshape(-1), pr_blk.shared_tau.reshape(-1),
        pr_blk.shared_weight.reshape(-1), d,
    ).reshape(*pr_blk.shared_kappa.shape, d + 1)
    return om_p, om_s


def _delta_cost_grad(
    ref_a,  # per-agent slices of DeltaRef
    priv,  # (i, j, T, om)
    shared,  # (idx, T, om, outgoing)
    D: jax.Array,  # (n, r, dh) this agent's delta
    nbrD: jax.Array,  # (ms, r, dh) neighbor deltas per shared edge
):
    """One agent's objective pieces and Euclidean gradient at X_ref + D, all
    from residuals: Res = Res_ref + ΔRes with ΔRes edge-local in the deltas.
    Returns (cost_metric, eg) where cost_metric attributes shared edges to
    the outgoing side (team psum == global objective, matching
    spmd._edge_cost_terms convention: no 0.5 factor)."""
    res_ref_p, res_ref_s = ref_a
    pi, pj, pT, om_p = priv
    sidx, sT, om_s, sout = shared
    n, r, dh = D.shape
    m = pi.shape[0]
    Df = D.reshape(n, r * dh)

    Di = Df[pi].reshape(m, r, dh)
    Dj = Df[pj].reshape(m, r, dh)
    Res = res_ref_p + jnp.einsum("mra,mab->mrb", Di, pT, precision=_HI) - Dj
    Rw = Res * om_p[:, None, :]
    cost = jnp.vdot(Res, Rw)
    gi = jnp.einsum("mrb,mab->mra", Rw, pT, precision=_HI)
    G = jnp.zeros((n, r * dh), D.dtype)
    G = G.at[pi].add(gi.reshape(m, r * dh))
    G = G.at[pj].add(-Rw.reshape(m, r * dh))

    ms = sidx.shape[0]
    if ms > 0:
        Dl = Df[sidx].reshape(ms, r, dh)
        out_f = sout[:, None, None]
        tailD = jnp.where(out_f, Dl, nbrD)
        headD = jnp.where(out_f, nbrD, Dl)
        Res_s = res_ref_s + (
            jnp.einsum("mra,mab->mrb", tailD, sT, precision=_HI) - headD
        )
        Rw_s = Res_s * om_s[:, None, :]
        cost = cost + jnp.vdot(
            Res_s * sout[:, None, None].astype(D.dtype), Rw_s
        )
        contrib = jnp.where(
            out_f,
            jnp.einsum("mrb,mab->mra", Rw_s, sT, precision=_HI),
            -Rw_s,
        )
        G = G.at[sidx].add(contrib.reshape(ms, r * dh))

    return cost, G.reshape(n, r, dh)


# ---------------------------------------------------------------------------
# Per-agent delta RTR (shrink-until-accept, the RBCD step mode)
# ---------------------------------------------------------------------------

def _delta_rtr_step(
    qd,  # QuadraticData (f32) for the tCG Hessian/preconditioner
    ref_X,  # (n, r, dh) anchor slice
    ref_M,  # (n, d, d)
    ref_res,  # (res_ref_priv_a, res_ref_shared_a)
    priv, shared,
    D0: jax.Array,
    nbrD: jax.Array,
    cfg: spmd_mod.SPMDConfig,
):
    """One shrink-until-accept RTR iteration in delta space (the reference's
    per-RBCD-step mode, QuadraticOptimizer.cpp:80-98). Returns
    (D_new, gnorm0, cost0)."""
    dtype = D0.dtype
    X0 = ref_X + D0  # f32 point: used only where relative accuracy suffices
    cost0, eg0 = _delta_cost_grad(ref_res, priv, shared, D0, nbrD)
    grad0 = lifted.proj_tangent(X0, eg0)
    gnorm0 = lifted.norm(grad0)
    S0 = quadratic.hess_correction(X0, eg0)

    def cond(c):
        accepted, attempts, _D, _radius = c
        return jnp.logical_and(
            jnp.logical_not(accepted), attempts <= rtr_mod._MAX_SHRINKS
        )

    def body(c):
        _accepted, attempts, _D, radius = c
        tcg = rtr_mod._tcg(
            qd, X0, S0, grad0, radius, cfg.rtr_tcg_iterations,
            precision=(
                jax.lax.Precision.HIGHEST
                if cfg.rtr_tcg_precision == "highest"
                else jax.lax.Precision.HIGH
                if cfg.rtr_tcg_precision == "high"
                else None
            ),
        )
        eta = lifted.proj_tangent(X0, tcg.eta)
        D_new = delta_project_lifted(ref_X, ref_M, D0 + eta)
        step = D_new - D0  # ambient step, exact in f32 (difference of deltas)
        _c1, eg1 = _delta_cost_grad(ref_res, priv, shared, D_new, nbrD)
        # exact-for-quadratics decrease: f(X′) − f(X) = ½⟨Δ, g + g′⟩ — both
        # gradients are residual-accurate, Δ is small: cancellation-free
        df = 0.5 * (jnp.vdot(step, eg0) + jnp.vdot(step, eg1))
        model_decrease = -(
            lifted.inner(grad0, tcg.eta) + 0.5 * lifted.inner(tcg.eta, tcg.Heta)
        )
        # rho WITHOUT numerator inflation: df is cancellation-free (unlike
        # the main engine's f(X')−f(X) subtraction), so a true cost increase
        # must be rejected — inflating it with a cost-scaled reg would accept
        # noise steps near convergence, which Nesterov then amplifies. The
        # denominator guard only avoids 0/0 (Steihaug model decrease >= 0).
        rho = -df / jnp.maximum(model_decrease, jnp.finfo(dtype).tiny)
        accept = rho > rtr_mod._RHO_PRIME
        return (
            accept,
            attempts + 1,
            jnp.where(accept, D_new, D0),
            jnp.where(accept, radius, 0.25 * radius),
        )

    init = (
        jnp.asarray(False), jnp.asarray(0, jnp.int32), D0,
        jnp.asarray(cfg.rtr_initial_radius, dtype),
    )
    _acc, _att, D_out, _rad = jax.lax.while_loop(cond, body, init)
    # no optimization needed if already below the local tolerance
    D_out = jnp.where(gnorm0 < cfg.rtr_gradnorm_tol, D0, D_out)
    return D_out, gnorm0, cost0


# ---------------------------------------------------------------------------
# The delta round + fused driver
# ---------------------------------------------------------------------------

def _delta_round(problem_blk, cfg, axis_name, agent_offset,
                 ref_blk: DeltaRef, state: DeltaState, qd_static):
    pr = problem_blk
    A = pr.priv_i.shape[0]
    om_p, om_s = _omegas(pr)
    a_priv = (pr.priv_i, pr.priv_j, pr.priv_T, om_p)
    a_shared = (pr.shared_idx, pr.shared_T, om_s, pr.shared_outgoing)
    a_ref = (ref_blk.res_ref_priv, ref_blk.res_ref_shared)

    def gather_nbr(D_blk):
        pub = jax.vmap(lambda Da, idx: Da[idx])(D_blk, pr.pub_idx)
        if axis_name is not None:
            pub = jax.lax.all_gather(pub, axis_name, axis=0, tiled=True)
        return pub[pr.shared_nbr_robot, pr.shared_nbr_slot]

    def project_blk(W):
        return jax.vmap(delta_project_lifted)(ref_blk.X_ref, ref_blk.M_ref, W)

    def one_agent(qd, Xr, Mr, rp, rs, pi, pj, pT, op, si, sT, os_, so, D0, nd):
        return _delta_rtr_step(
            qd, Xr, Mr, (rp, rs), (pi, pj, pT, op), (si, sT, os_, so),
            D0, nd, cfg,
        )

    def psum(x):
        return x if axis_name is None else jax.lax.psum(x, axis_name)

    if cfg.acceleration:
        N = pr.num_agents
        Nn = N if cfg.nesterov_n is None else cfg.nesterov_n
        # Restart = periodic (reference schedule, PGOAgent.cpp:880-885) OR
        # adaptive on objective increase (O'Donoghue & Candes function
        # scheme). The adaptive trigger is NOT optional here: Jacobi-parallel
        # 'all'-mode + Nesterov with periodic-only restarts provably can
        # diverge (measured: the f64 engine itself stalls at g~0.37 then
        # blows up on the 216-pose grid world; with the adaptive trigger it
        # converges to 2.4e-3 in 50 rounds). The signal is free: the round
        # objective is already computed.
        periodic = (state.it + 1) % cfg.restart_interval == 0
        restart = jnp.logical_or(periodic, state.do_restart)
        gamma = (1.0 + jnp.sqrt(1.0 + 4.0 * Nn**2 * state.gamma**2)) / (2.0 * Nn)
        alpha = 1.0 / (gamma * Nn)
        DY_acc = project_blk((1.0 - alpha) * state.D + alpha * state.DV)
        DY = jnp.where(restart, state.D, DY_acc)
        nbrD = gather_nbr(DY)
        D_opt, gnorm_a, cost_a = jax.vmap(one_agent)(
            qd_static, ref_blk.X_ref, ref_blk.M_ref, *a_ref,
            *a_priv, *a_shared, DY, nbrD,
        )
        DV = jnp.where(
            restart, D_opt, project_blk(state.DV + gamma * (D_opt - DY))
        )
        cost_now = psum(jnp.sum(cost_a))
        new_state = DeltaState(
            D=D_opt,
            DY=jnp.where(restart, D_opt, DY),
            DV=DV,
            gamma=jnp.where(restart, 0.0, gamma).astype(state.gamma.dtype),
            it=state.it + 1,
            prev_cost=cost_now,
            do_restart=cost_now > state.prev_cost,
        )
    else:
        nbrD = gather_nbr(state.D)
        D_opt, gnorm_a, cost_a = jax.vmap(one_agent)(
            qd_static, ref_blk.X_ref, ref_blk.M_ref, *a_ref,
            *a_priv, *a_shared, state.D, nbrD,
        )
        new_state = DeltaState(
            D=D_opt, DY=D_opt, DV=D_opt,
            gamma=state.gamma, it=state.it + 1,
            prev_cost=psum(jnp.sum(cost_a)),
            do_restart=jnp.asarray(False),
        )

    # rel change directly from delta differences (X_ref cancels exactly)
    rel = jax.vmap(
        lambda a, b: jnp.max(
            jnp.linalg.norm(a[..., -1] - b[..., -1], axis=-1)
        )
    )(new_state.D, state.D)
    metrics = spmd_mod.RoundMetrics(
        cost=psum(jnp.sum(cost_a)),
        gradnorm=jnp.sqrt(psum(jnp.sum(gnorm_a**2))),
        max_rel_change=jax.lax.pmax(jnp.max(rel), axis_name)
        if axis_name is not None else jnp.max(rel),
    )
    return new_state, metrics


def make_delta_run_fn(problem: spmd_mod.SPMDProblem, cfg: spmd_mod.SPMDConfig,
                      mesh: Optional[Mesh] = None):
    """Fused run-to-tolerance driver for the delta engine: all rounds as one
    XLA while_loop (like spmd.make_run_fn). Returns
    run(ref, state, max_rounds, tol) -> (state, metrics, rounds)."""
    N = problem.num_agents

    def make_loop(axis_name, agent_offset, pr_blk, ref_blk, qd_static):
        def cond(c):
            _state, metrics, rounds, max_rounds, tol = c
            return jnp.logical_and(
                rounds < max_rounds, metrics.gradnorm >= tol
            )

        def body(c):
            state, _m, rounds, max_rounds, tol = c
            new_state, metrics = _delta_round(
                pr_blk, cfg, axis_name, agent_offset, ref_blk, state,
                qd_static,
            )
            return (new_state, metrics, rounds + 1, max_rounds, tol)

        return cond, body

    def init_carry(state, max_rounds, tol):
        dtype = state.D.dtype
        m0 = spmd_mod.RoundMetrics(
            cost=jnp.asarray(jnp.inf, dtype),
            gradnorm=jnp.asarray(jnp.inf, dtype),
            max_rel_change=jnp.asarray(jnp.inf, dtype),
        )
        return (state, m0, jnp.asarray(0, jnp.int32),
                jnp.asarray(max_rounds, jnp.int32), jnp.asarray(tol, dtype))

    if mesh is None:
        @jax.jit
        def _run(pr, ref, state, max_rounds, tol):
            qd_static = spmd_mod._build_qd_static(pr, cfg)
            cond, body = make_loop(None, jnp.asarray(0, jnp.int32), pr, ref,
                                   qd_static)
            state, metrics, rounds, *_ = jax.lax.while_loop(
                cond, body, init_carry(state, max_rounds, tol)
            )
            return state, metrics, rounds

        def run(ref, state, max_rounds, tol, problem=problem):
            return _run(problem, ref, state, max_rounds, tol)

        return run

    n_dev = mesh.devices.size
    assert N % n_dev == 0
    A = N // n_dev
    blk = P("agents")
    rep = P()

    def sharded_run(pr_blk, ref_blk, state_blk, max_rounds, tol):
        dev = jax.lax.axis_index("agents")
        offset = (dev * A).astype(jnp.int32)
        qd_static = spmd_mod._build_qd_static(pr_blk, cfg)
        cond, body = make_loop("agents", offset, pr_blk, ref_blk, qd_static)
        state, metrics, rounds, *_ = jax.lax.while_loop(
            cond, body, init_carry(state_blk, max_rounds, tol)
        )
        return state, metrics, rounds

    problem_specs = spmd_mod.SPMDProblem(
        num_agents=N, n_max=problem.n_max, d=problem.d, r=problem.r,
        num_band=problem.num_band, band_offsets=problem.band_offsets,
        **{f: (rep if f in spmd_mod._REPLICATED_FIELDS else blk)
           for f in spmd_mod._DATA_FIELDS},
    )
    ref_specs = DeltaRef(X_ref=blk, res_ref_priv=blk, res_ref_shared=blk,
                         M_ref=blk)
    state_specs = DeltaState(D=blk, DY=blk, DV=blk, gamma=rep, it=rep,
                             prev_cost=rep, do_restart=rep)
    fn = jax.shard_map(
        sharded_run, mesh=mesh,
        in_specs=(problem_specs, ref_specs, state_specs, rep, rep),
        out_specs=(state_specs,
                   spmd_mod.RoundMetrics(rep, rep, rep), rep),
        check_vma=False,
    )
    blk_sh = NamedSharding(mesh, blk)

    @jax.jit
    def _run(pr, ref, state, max_rounds, tol):
        return fn(pr, ref, state, max_rounds, tol)

    def run(ref, state, max_rounds, tol, problem=problem):
        pr_dev = spmd_mod._device_put_problem(problem, mesh)
        ref_dev = jax.tree.map(lambda x: jax.device_put(x, blk_sh), ref)
        return _run(pr_dev, ref_dev, state, max_rounds, tol)

    return run


def host_certify(problem: spmd_mod.SPMDProblem, X64: np.ndarray):
    """Pure-numpy f64 evaluation of (global objective, global Riemannian
    gradient norm) at a stacked iterate (N, n_max, r, dh) — the honest
    certification step, independent of any device or reduced precision.

    Shared edges appear once in each endpoint's agent block (flagged
    outgoing/incoming); each copy contributes the gradient of its LOCAL
    side only, so the union covers the global gradient exactly — the same
    attribution the SPMD metrics use (validated against the central
    evaluation in tests/test_spmd.py)."""
    X = np.asarray(X64, np.float64)
    N, n_max, r, dh = X.shape
    d = dh - 1

    def omega(kappa, tau, weight):
        om = np.empty(kappa.shape + (dh,))
        om[..., :d] = (weight * kappa)[..., None]
        om[..., d] = weight * tau
        return om

    om_p = omega(np.asarray(problem.priv_kappa, np.float64),
                 np.asarray(problem.priv_tau, np.float64),
                 np.asarray(problem.priv_weight, np.float64))
    om_s = omega(np.asarray(problem.shared_kappa, np.float64),
                 np.asarray(problem.shared_tau, np.float64),
                 np.asarray(problem.shared_weight, np.float64))

    T = np.asarray(problem.priv_T, np.float64)
    i_idx = np.asarray(problem.priv_i)
    j_idx = np.asarray(problem.priv_j)
    Xi = np.take_along_axis(X, i_idx[:, :, None, None], axis=1)
    Xj = np.take_along_axis(X, j_idx[:, :, None, None], axis=1)
    Res = np.einsum("qmra,qmab->qmrb", Xi, T, optimize=True) - Xj
    Rw = Res * om_p[:, :, None, :]
    cost = np.sum(Res * Rw)
    G = np.zeros((N, n_max, r, dh))
    gi = np.einsum("qmrb,qmab->qmra", Rw, T, optimize=True)
    for a in range(N):
        np.add.at(G[a], i_idx[a], gi[a])
        np.add.at(G[a], j_idx[a], -Rw[a])

    pub = np.take_along_axis(
        X, np.asarray(problem.pub_idx)[:, :, None, None], axis=1
    )
    nbr = pub[np.asarray(problem.shared_nbr_robot),
              np.asarray(problem.shared_nbr_slot)]
    Xl = np.take_along_axis(
        X, np.asarray(problem.shared_idx)[:, :, None, None], axis=1
    )
    Ts = np.asarray(problem.shared_T, np.float64)
    out = np.asarray(problem.shared_outgoing)[:, :, None, None]
    tail = np.where(out, Xl, nbr)
    head = np.where(out, nbr, Xl)
    Res_s = np.einsum("qmra,qmab->qmrb", tail, Ts, optimize=True) - head
    Rw_s = Res_s * om_s[:, :, None, :]
    cost += np.sum(Res_s * Rw_s * out)  # attribute to the outgoing side
    contrib = np.where(
        out, np.einsum("qmrb,qmab->qmra", Rw_s, Ts, optimize=True), -Rw_s
    )
    sidx = np.asarray(problem.shared_idx)
    for a in range(N):
        np.add.at(G[a], sidx[a], contrib[a])

    # Riemannian projection: rotation block minus its normal component
    Y = X[..., :d]
    Gr = G[..., :d]
    YtG = np.einsum("qnra,qnrb->qnab", Y, Gr, optimize=True)
    sym = 0.5 * (YtG + np.swapaxes(YtG, -1, -2))
    Gr_t = Gr - np.einsum("qnra,qnab->qnrb", Y, sym, optimize=True)
    gradnorm = float(np.sqrt(np.sum(Gr_t**2) + np.sum(G[..., d] ** 2)))
    return float(cost), gradnorm


def run_delta_certified(
    problem: spmd_mod.SPMDProblem,
    X0_64: np.ndarray,
    cfg: spmd_mod.SPMDConfig,
    tol: float,
    mesh: Optional[Mesh] = None,
    chunk: int = 25,
    max_rounds: int = 2000,
    verbose: bool = False,
    crash_retries: int = 0,
):
    """Host driver: delta rounds in chunks with f64 re-anchoring between
    chunks. Returns (X_final64, info) with the device-metric trace; callers
    certify by evaluating the f64 global Riemannian gradient norm at the
    assembled final iterate on the host (see scripts/scale_bench.py)."""
    X_ref64 = np.array(X0_64, np.float64)  # (N, n_max, r, dh) stacked
    run = make_delta_run_fn(problem, cfg, mesh)
    ref = build_delta_ref(problem, X_ref64)
    state = initial_delta_state(ref)
    total = 0
    gn = float("inf")
    trace = []
    failures = 0
    while total < max_rounds and gn >= tol:
        try:
            state, metrics, rounds = run(
                ref, state, min(chunk, max_rounds - total), tol
            )
            total += int(rounds)
        except Exception:  # tunnel TPU worker crash: recover and replay
            failures += 1
            if failures > crash_retries:
                raise
            import time as _time

            _time.sleep(75)
            # state/ref are host-backed after every re-anchor — replay
            state = jax.tree.map(jnp.asarray, jax.tree.map(np.asarray, state))
            continue
        gn = float(metrics.gradnorm)
        trace.append({"rounds": total, "gradnorm": gn,
                      "cost": float(metrics.cost)})
        if verbose:
            print(f"  delta round {total}: gradnorm={gn:.6f} "
                  f"cost={float(metrics.cost):.2f}", flush=True)
        # f64 re-anchor: fold the delta into the anchor, shift the Nesterov
        # deltas exactly (V − X, Y − X are small differences)
        D = np.asarray(state.D, np.float64)
        DY = np.asarray(state.DY, np.float64) - D
        DV = np.asarray(state.DV, np.float64) - D
        X_ref64 = X_ref64 + D
        ref = build_delta_ref(problem, X_ref64)
        dt = state.D.dtype
        state = DeltaState(
            D=jnp.zeros_like(state.D),
            DY=jnp.asarray(DY, dt),
            DV=jnp.asarray(DV, dt),
            gamma=state.gamma,
            it=state.it,
            prev_cost=state.prev_cost,
            do_restart=state.do_restart,
        )
    info = {"rounds": total, "trace": trace, "device_gradnorm": gn}
    return X_ref64, info
