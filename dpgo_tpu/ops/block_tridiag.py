"""Block-tridiagonal SPD solver via cyclic reduction — the TPU-native
replacement for the reference's Cholmod LDL^T preconditioner
(reference: src/PoseGraph.cpp:598-613, applied per tCG iteration at
src/QuadraticProblem.cpp:56-69).

The reference factors the FULL sparse matrix (Q + 0.1 I). An exact sparse
LDL^T is a sequential, pointer-chasing algorithm with no good TPU mapping.
Instead we factor the *block-tridiagonal part* of (Q + 0.1 I): the odometry
chain's full (d+1)x(d+1) block coupling plus every edge's diagonal
contribution. This matrix is provably SPD (it is a sum of per-edge PSD terms
plus the shift — loop-closure edges contribute only their PSD diagonal
blocks), and for chain-dominated pose graphs it captures most of Q's
conditioning, cutting tCG iterations far below block-Jacobi.

Cyclic reduction maps to the hardware: log2(n) levels, each a batch of small
(dh x dh) matmuls/inverses — no sequential O(n) scans on the critical path.
The factorization (per-level eliminated-block inverses and coupling products)
is computed once per data-matrix build; each preconditioner application is a
down-sweep + up-sweep of ~2 log2(n) batched matmuls.

System convention: M x = b with
    M[i, i]   = D[i]            (n, b, b)  SPD diagonal blocks
    M[i, i+1] = -E[i]           (n-1, b, b)
    M[i+1, i] = -E[i]^T
matching QuadraticData's (diag + shift, band_E) layout.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class CRLevel(NamedTuple):
    """One cyclic-reduction level's factors (all shapes static).

    m: number of blocks entering this level. Odd positions are eliminated,
    ceil(m/2) even positions are kept for the next level.
    """

    # eliminated (odd) positions: k = 0..n_odd-1 <-> original position 2k+1
    odd_inv: jax.Array  # (n_odd, b, b)  D_odd^{-1}
    odd_L: jax.Array  # (n_odd, b, b)  M[odd, odd-1]
    odd_U: jax.Array  # (n_odd, b, b)  M[odd, odd+1] (zero block at boundary)
    # kept (even) positions: k = 0..n_even-1 <-> original position 2k
    LD: jax.Array  # (n_even, b, b)  M[even, even-1] @ D_{even-1}^{-1}
    UD: jax.Array  # (n_even, b, b)  M[even, even+1] @ D_{even+1}^{-1}


class CRFactor(NamedTuple):
    levels: Tuple[CRLevel, ...]
    root_inv: jax.Array  # (1, b, b) inverse of the final 1-block system


def _spd_inv(D: jax.Array) -> jax.Array:
    """Batched SPD inverse via Cholesky (small blocks, numerically stable)."""
    b = D.shape[-1]
    L = jnp.linalg.cholesky(D)
    eye = jnp.broadcast_to(jnp.eye(b, dtype=D.dtype), D.shape)
    return jax.scipy.linalg.cho_solve((L, True), eye)


def _pad_blocks(A: jax.Array, front: int, back: int) -> jax.Array:
    return jnp.pad(A, ((front, back), (0, 0), (0, 0)))


def factorize(D: jax.Array, E: jax.Array) -> CRFactor:
    """Cyclic-reduction factorization of the SPD block-tridiagonal matrix.

    D: (n, b, b) diagonal blocks; E: (n-1, b, b) with M[i, i+1] = -E[i].
    Returns a CRFactor whose solve() applies M^{-1}. n may be any size >= 1;
    there are ceil(log2(n)) levels. Fully batched; safe under vmap/jit.
    """
    n = D.shape[0]
    # upper coupling per position: U[i] = M[i, i+1] = -E[i], zero at i = n-1
    U = _pad_blocks(-E, 0, 1) if n > 1 else jnp.zeros_like(D)
    # lower coupling per position: L[i] = M[i, i-1] = -E[i-1]^T, zero at i = 0
    L = _pad_blocks(-jnp.swapaxes(E, -1, -2), 1, 0) if n > 1 else jnp.zeros_like(D)

    levels: List[CRLevel] = []
    while n > 1:
        n_odd = n // 2
        n_even = n - n_odd
        D_odd = D[1::2]
        odd_inv = _spd_inv(D_odd)
        odd_L = L[1::2]
        odd_U = U[1::2]

        # neighbors of kept (even) positions; zero blocks where out of range
        inv_pad = _pad_blocks(odd_inv, 1, 1)  # index k+1 <-> odd position 2k+1
        # left odd neighbor of even 2k is 2k-1 (odd index k-1 -> pad slot k)
        invL = inv_pad[:n_even]
        # right odd neighbor of even 2k is 2k+1 (odd index k -> pad slot k+1)
        invR = inv_pad[1 : n_even + 1]

        L_even = L[0::2]
        U_even = U[0::2]
        LD = jnp.einsum("kab,kbc->kac", L_even, invL)
        UD = jnp.einsum("kab,kbc->kac", U_even, invR)

        levels.append(CRLevel(odd_inv=odd_inv, odd_L=odd_L, odd_U=odd_U,
                              LD=LD, UD=UD))

        # reduced system on even positions: even 2k's left odd neighbor is
        # odd index k-1, its right odd neighbor is odd index k
        oL = _pad_blocks(odd_L, 1, 1)[:n_even]  # L of left odd neighbor
        oU = _pad_blocks(odd_U, 0, 1)[:n_even]  # U of right odd neighbor
        oU_left = _pad_blocks(odd_U, 1, 1)[:n_even]  # U of left odd neighbor
        oL_right = _pad_blocks(odd_L, 0, 1)[:n_even]  # L of right odd neighbor

        D = D[0::2] - jnp.einsum("kab,kbc->kac", LD, oU_left) \
            - jnp.einsum("kab,kbc->kac", UD, oL_right)
        L_new = -jnp.einsum("kab,kbc->kac", LD, oL)
        U_new = -jnp.einsum("kab,kbc->kac", UD, oU)
        # the reduced system's L[0] / U[last] must be zero blocks: guaranteed
        # because LD[0] multiplies a zero L_even[0] and the last UD a zero U.
        L, U, n = L_new, U_new, n_even

    return CRFactor(levels=tuple(levels), root_inv=_spd_inv(D))


def solve(factor: CRFactor, b: jax.Array) -> jax.Array:
    """Solve M x = b given a CRFactor. b: (n, b, r) block right-hand sides."""
    # down-sweep: fold eliminated odd blocks into the kept even equations
    odd_rhs = []
    for lv in factor.levels:
        m = b.shape[0]
        n_even = m - m // 2
        b_odd = b[1::2]
        odd_rhs.append(b_odd)
        pad = jnp.pad(b_odd, ((1, 1), (0, 0), (0, 0)))
        b = b[0::2] - jnp.einsum("kab,kbr->kar", lv.LD, pad[:n_even]) \
            - jnp.einsum("kab,kbr->kar", lv.UD, pad[1 : n_even + 1])

    x = jnp.einsum("kab,kbr->kar", factor.root_inv, b)

    # up-sweep: recover eliminated odd blocks, interleave with kept evens
    for lv, b_odd in zip(reversed(factor.levels), reversed(odd_rhs)):
        n_odd = b_odd.shape[0]
        n_even = x.shape[0]
        # odd position 2k+1 has even neighbors 2k (left) and 2k+2 (right)
        x_pad = jnp.pad(x, ((0, 1), (0, 0), (0, 0)))
        rhs = b_odd - jnp.einsum("kab,kbr->kar", lv.odd_L, x_pad[:n_odd]) \
            - jnp.einsum("kab,kbr->kar", lv.odd_U, x_pad[1 : n_odd + 1])
        x_odd = jnp.einsum("kab,kbr->kar", lv.odd_inv, rhs)
        m = n_even + n_odd
        out = jnp.zeros((m,) + x.shape[1:], x.dtype)
        out = out.at[0::2].set(x)
        out = out.at[1::2].set(x_odd)
        x = out
    return x
