"""Fixed-iteration OSQP-style ADMM for the SQP subproblems.

Solves  min 1/2 x^T H x + q^T x  s.t.  l <= A x <= u
with a *matrix-free* constraint operator (formulation.constraint_matvec /
constraint_rmatvec) and the analytically assembled block-diagonal
A^T diag(rho) A (formulation.ata_blockdiag), so no [m, n] matrix ever exists.

TPU shape: the KKT matrix M = H + sigma I + A^T rho A is inverted ONCE per
SQP iteration via Cholesky + wide triangular solve (MXU-efficient), and each
ADMM iteration is then a single dense matvec — sequential triangular solves
inside the iteration loop are ~20x slower on TPU (latency-bound), measured
on v5e. Fixed trip count => one straight-line XLA program; batched via vmap.

This replaces the reference's `osqp` (inside BLF IK) and the `qrqp` QP inner
loop of CasADi `sqpmethod` (centroidal_mpc.ini:13-15).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class ADMMState(NamedTuple):
    x: jnp.ndarray  # [n] primal
    zc: jnp.ndarray  # [m] constraint-space auxiliary
    y: jnp.ndarray  # [m] dual


def spd_inverse(M: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a symmetric positive-definite matrix via Cholesky +
    wide triangular solve: M^-1 = L^-T L^-1. Fastest path on TPU (the wide
    solve feeds the MXU; per-vector solves serialize)."""
    L = jnp.linalg.cholesky(M)
    eye = jnp.broadcast_to(jnp.eye(M.shape[-1], dtype=M.dtype), M.shape)
    Li = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    return jnp.einsum("...ki,...kj->...ij", Li, Li)


def admm_solve(
    minv: jnp.ndarray,
    q: jnp.ndarray,
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    rmatvec: Callable[[jnp.ndarray], jnp.ndarray],
    l: jnp.ndarray,
    u: jnp.ndarray,
    rho: jnp.ndarray,
    state: ADMMState,
    iters: int,
    sigma: float = 1e-6,
    alpha: float = 1.6,
    minv_packed: jnp.ndarray | None = None,
    apply_fn=None,
) -> tuple[ADMMState, jnp.ndarray]:
    """Run `iters` ADMM iterations from `state` (warm-startable).

    minv: precomputed (H + sigma I + A^T rho A)^-1. May be bf16 (the TPU
    hot path, MPCConfig.kkt_dtype: halves the dominant HBM traffic —
    re-reading minv every iteration — and feeds the MXU at native
    precision; accumulation stays f32 via preferred_element_type). The
    bf16 iteration converges to a neighboring QP's solution (~5% cost
    offset at convergence) and MEASURABLY shrinks the recoverable-push
    boundary by ~7% in closed loop (formulation.py kkt_dtype docstring,
    RESULTS.md) — which is why f32 stays the default; the trade is the
    accuracy class the reference accepts on the real robot
    (ipopt_tolerance 1e-2, ergoCubSN000/centroidal_mpc.ini:11).
    Returns (state, primal_residual_inf).
    """

    if apply_fn is not None:
        # externally factored operator (the Riccati path, cmpc/riccati.py):
        # apply_fn(rhs) solves M rhs without any [n, n] matrix; `minv` is
        # ignored (pass None)
        apply_minv = apply_fn

    elif minv_packed is not None:
        from cmw_tpu.ops.symv import BLK, symv_packed

        interp = jax.default_backend() not in ("tpu",)
        T = minv_packed.shape[0]
        nb = int(round((-1 + (1 + 8 * T) ** 0.5) / 2))
        npack = nb * BLK

        def apply_minv(rhs):
            # packed lower-triangle symmetric product (MPCConfig
            # xupdate_impl="symv"): ~0.63x the HBM traffic of the dense
            # GEMV, which is otherwise at the bandwidth roofline. The
            # matrix was zero-padded to the 128 grid, so padded lanes stay
            # exactly zero.
            rhs_p = jnp.pad(rhs, (0, npack - rhs.shape[0]))
            out = symv_packed(
                minv_packed[None], rhs_p[None], interpret=interp
            )[0]
            return out[: rhs.shape[0]]

    else:

        def apply_minv(rhs):
            return jax.lax.dot_general(
                minv,
                rhs.astype(minv.dtype),
                (((minv.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=q.dtype,
            )

    def body(s: ADMMState, _):
        rhs = sigma * s.x - q + rmatvec(rho * s.zc - s.y)
        x = apply_minv(rhs)
        ax = matvec(x)
        zh = alpha * ax + (1.0 - alpha) * s.zc
        zc = jnp.clip(zh + s.y / rho, l, u)
        y = s.y + rho * (zh - zc)
        return ADMMState(x, zc, y), None

    state, _ = jax.lax.scan(body, state, None, length=iters)
    prim_res = jnp.max(jnp.abs(matvec(state.x) - state.zc))
    return state, prim_res


def solve_eq_qp(H, g, A, b, dual_reg: float = 1e-6):
    """Dense equality-constrained QP via the KKT system:
        min 1/2 v^T H v - g^T v   s.t.  A v = b
    Used by the differential-IK layer (wbc/diff_ik.py). Returns v.

    The dual block carries a -dual_reg*I proximal regularization: at
    kinematic singularities (straight knees in the initial stance) the
    constraint Jacobian loses rank and the exact KKT matrix is singular —
    whether the LU hits the zero pivot then depends on fusion-level
    rounding (observed: eager fine, scan-compiled NaN). The regularized
    system stays uniformly invertible and perturbs feasible solutions by
    O(dual_reg). 1e-6 also bounds the duals when the constraint rows turn
    inconsistent at the singularity, which otherwise amplifies rounding
    noise into ~0.2 rad null-space joint drift (measured; 1e-6 -> 1e-5).
    """
    n = H.shape[-1]
    m = A.shape[-2]
    dt = H.dtype
    KKT = jnp.block(
        [[H, jnp.swapaxes(A, -1, -2)], [A, -dual_reg * jnp.eye(m, dtype=dt)]]
    )
    rhs = jnp.concatenate([g, b], axis=-1)
    sol = jnp.linalg.solve(KKT, rhs)
    return sol[..., :n]


def solve_eq_box_qp(
    H,
    g,
    A,
    b,
    box_mask,
    l,
    u,
    iters: int = 30,
    rho: float = 50.0,
    sigma: float = 1e-6,
    dual_reg: float = 1e-6,
):
    """Equality + box-constrained dense QP via ADMM on the box rows:
        min 1/2 v^T H v - g^T v   s.t.  A v = b,  l <= v[box] <= u[box]
    `box_mask` [n] is 1.0 on box-constrained coordinates, 0.0 elsewhere
    (l/u are full-length [n]; unmasked entries are ignored).

    Extends solve_eq_qp with the inequality support BLF's osqp backend has
    and the reference's ik.ini never uses (no inequality tasks configured,
    WholeBodyQPBlock.cpp:131-175): joint position/velocity limit boxes on
    the IK velocities (BLF JointLimitsTask / JointVelocityLimitsTask
    analog). The KKT matrix (with the sigma-proximal and rho on the box
    diagonal — the selector S = diag(box_mask) is diagonal, so S^T rho S
    is too) is factored ONCE via matrix inverse; each of the fixed `iters`
    ADMM steps is a single [n+m] matvec plus clip/dual updates — the same
    fixed-trip-count straight-line structure as the MPC's admm_solve.
    Exact equality feasibility is preserved by solving the equality-KKT
    inside the x-update (same -dual_reg regularization as solve_eq_qp)."""
    n = H.shape[-1]
    m = A.shape[-2]
    dt = H.dtype
    d_rho = rho * box_mask
    KKT = jnp.block(
        [
            [
                H + (sigma * jnp.ones((n,), dt) + d_rho) * jnp.eye(n, dtype=dt),
                jnp.swapaxes(A, -1, -2),
            ],
            [A, -dual_reg * jnp.eye(m, dtype=dt)],
        ]
    )
    Kinv = jnp.linalg.inv(KKT)

    x0 = solve_eq_qp(H, g, A, b, dual_reg)
    z0 = jnp.clip(x0, l, u)
    y0 = jnp.zeros_like(x0)

    def body(carry, _):
        x, z, y = carry
        rhs = jnp.concatenate([g + sigma * x + d_rho * z - box_mask * y, b])
        x = (Kinv @ rhs)[:n]
        z = jnp.clip(x + y / rho, l, u)
        y = y + rho * box_mask * (x - z)
        return (x, z, y), None

    (x, z, y), _ = jax.lax.scan(body, (x0, z0, y0), None, length=iters)
    return x
