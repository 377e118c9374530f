"""Structure-exploiting x-update for the ADMM QP: parametric Riccati.

The ADMM x-update applies M^-1 with M = H + sigma I + A^T rho A, where
H = J^T J + levenberg I is the Gauss-Newton Hessian of the CONDENSED
formulation (states eliminated through `formulation.rollout`). The dense
path (cmpc/qp.py) materializes M^-1 [n,n] once per solve and re-reads it
every ADMM iteration — measured as the HBM roofline of the batched solve
(~40% bandwidth utilization at batch 512 on v5e, BENCH_r04).

This module exploits what the condensation hides: every residual row is
LINEAR in the augmented variables (sensitivity states y, forces F, contact
positions P), and y obeys the linear recursion

    y_{t+1} = A_t y_t + B_t F_t + C_t P,     y_0 = 0

with per-stage Jacobians of `formulation.interval_step` at the
linearization point. Hence M is EXACTLY the condensed Hessian of a
time-structured LQR with
  - augmented state  s_t = [y_t (9), F_{t-1} (24)]   (the F_{t-1} slot
    carries the force-rate coupling, the standard rate-cost augmentation),
  - control          u_t = F_t (24),
  - a GLOBAL 24-var parameter P coupling every stage through C_t (the
    "small contact coupling block" — the reference's own Hessian is
    4,140-nnz sparse for the same reason, tmp.c:58926).

A parametric (P-carrying) backward Riccati recursion factors M once per
SQP iteration; each ADMM iteration then solves M x = rhs with one
backward + one forward vector sweep over the T=20 stages reading only the
per-stage gain matrices (~49k floats — K/KP/D1 + the stage Jacobians —
vs the 254k of the dense inverse, and no [n,n] build, no jacfwd J, no
J^T J, no 504^3 factorization). The apply
is mathematically identical to the dense path (unit-tested to f64
round-off in tests/test_riccati.py), so warm starts, duals, line search
and closed-loop behavior are unchanged by construction.

Derivation: value function V_t(s, P) = 1/2 s' Phi_t s + s' Gamma_t P
+ 1/2 P' Pi_t P + s' gamma_t + P' pi_t with rhs entering only gamma/pi:
the matrix recursions (Phi, Gamma, Pi, gains) run at factor time; the
vector recursions (gamma, pi) run per apply.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cmw_tpu.cmpc import formulation as F


class RiccatiFactor(NamedTuple):
    """Per-stage gains + Schur pieces of the factored KKT operator.

    Shapes: T stages, ns=33 augmented state, nu=24 controls, np_=24
    contact-position parameters. The backward-sweep operators L_su H_u^-1
    and L_uP' H_u^-1 are NOT stored: D1 is symmetric, so they equal K'
    and KP' — the apply reads the same matrices transposed (halves the
    per-stage HBM of the sweeps and the factor's output writes)."""

    A: jnp.ndarray  # [T, 9, 9]    dX'/dX
    B: jnp.ndarray  # [T, 9, nu]   dX'/dF
    C: jnp.ndarray  # [T, 9, np_]  dX'/dP
    K: jnp.ndarray  # [T, nu, ns]  feedback gain  (H_u^-1 L_su')
    KP: jnp.ndarray  # [T, nu, np_] P-feedforward gain (H_u^-1 L_uP)
    D1: jnp.ndarray  # [T, nu, nu]  H_u^-1
    Sinv: jnp.ndarray  # [np_, np_]  (Pi_0 + H_pp)^-1


def _spd_inverse_small(M):
    """Unrolled Gauss-Jordan inverse for a small SPD matrix (n static,
    no pivoting — valid for SPD: every pivot is a Schur complement,
    hence positive).

    Why not jnp.linalg.cholesky + cho_solve: XLA's TPU lowering walks the
    factorization as a ROLLED loop of ~n tiny HBM-bound steps — measured
    1.35 ms per batched [512,24,24] chol+cho_solve on v5e, which put the
    20-stage Riccati recursion's pivot inverses at ~27 ms of the 53 ms
    solve. The unrolled GJ form is a chain of elementwise/broadcast ops
    XLA fuses aggressively; measured: the whole factor drops ~2x.
    """
    n = M.shape[-1]
    A = jnp.concatenate(
        [M, jnp.broadcast_to(jnp.eye(n, dtype=M.dtype), M.shape)], axis=-1
    )
    for j in range(n):
        piv = A[..., j, j]
        row = A[..., j, :] / piv[..., None]
        colj = A[..., :, j]
        A = A - colj[..., :, None] * row[..., None, :]
        A = A.at[..., j, :].set(row)
    return A[..., :, n:]


def _stage_jacobians(cfg: F.MPCConfig, params: F.MPCParams, z_lin):
    """Per-stage Jacobians (A_t, B_t, C_t) of `formulation.interval_step`
    at the linearization point (the rollout states of z_lin)."""
    nc, ncor, K = cfg.n_contacts, cfg.n_corners, cfg.n_slots
    F_lin, P_lin = F.unpack_z(cfg, z_lin)
    X = F.rollout(cfg, params, F_lin, P_lin)  # [N, 9]
    stage = params.stage
    corners = cfg.corners_arr(z_lin.dtype)

    def step_zp(x, f_flat, p_flat, soh_t, a_t):
        P = p_flat.reshape(nc, K, 3)
        f_k = f_flat.reshape(nc, ncor, 3)
        rot = jnp.einsum("is,isxy->ixy", soh_t, stage.slot_rot)
        pos = jnp.einsum("is,isx->ix", soh_t, P)
        c_k = pos[:, None, :] + jnp.einsum("iab,ijb->ija", rot, corners)
        return F.interval_step(cfg, params, x, f_k, c_k, a_t)

    jac = jax.vmap(jax.jacfwd(step_zp, argnums=(0, 1, 2)))
    soh = jnp.moveaxis(stage.slot_onehot, 0, 1)  # [T, nc, K]
    act = stage.active.T  # [T, nc]
    A, B, C = jac(
        X[:-1],
        F_lin.reshape(cfg.T, -1),
        jnp.broadcast_to(P_lin.reshape(-1), (cfg.T, nc * K * 3)),
        soh,
        act,
    )
    return A, B, C


def _cost_blocks(cfg: F.MPCConfig, stage, rho, lam_sigma, dtype):
    """Stage cost blocks matching H + sigma I + A^T rho A exactly.

    Returns (Q_track [9], Wr2 [nu], R [T,nu,nu], Hpp [np_,np_])."""
    T, nc, ncor, K = cfg.T, cfg.n_contacts, cfg.n_corners, cfg.n_slots
    nu = nc * ncor * 3

    q_track = jnp.concatenate(
        [
            jnp.asarray(cfg.com_weight, dtype),
            jnp.zeros(3, dtype),
            jnp.full((3,), cfg.angular_momentum_weight, dtype),
        ]
    )
    wr2 = jnp.tile(jnp.asarray(cfg.force_rate_weight, dtype), nc * ncor)

    # symmetry: r_sym = w_sym * act * (F - mean over corners); J'J per
    # (t, contact, axis) on the 4 corner coords is w_sym^2 act (I - 11'/4)
    # ((I-P) is a projection, so (I-P)'(I-P) = I-P)
    eye_c = np.eye(ncor) - np.ones((ncor, ncor)) / ncor
    sym_blk = np.kron(np.kron(np.eye(nc), eye_c), np.eye(3))  # [nu, nu]
    act_coord = jnp.repeat(stage.active.T, ncor * 3, axis=1)  # [T, nu]
    R_sym = (
        cfg.force_symmetry_weight
        * act_coord[:, :, None]
        * jnp.asarray(sym_blk, dtype)[None]
        * act_coord[:, None, :]
    )
    # act is 0/1 so act[:,None]*blk*act[None,:] == act*blk on the block
    # diagonal (corners of one contact share the activation)

    blk_force, blk_pos = F.ata_blocks(cfg, stage, rho, dtype)

    def blockdiag3(blocks, n):
        # [B3, 3, 3] 3x3 blocks -> dense [n, n] block-diagonal
        nb = blocks.shape[0]
        rows = (
            np.arange(nb)[:, None, None] * 3 + np.arange(3)[None, :, None]
        ).repeat(3, 2)
        cols = np.broadcast_to(
            np.arange(nb)[:, None, None] * 3 + np.arange(3)[None, None, :],
            (nb, 3, 3),
        )
        return jnp.zeros((n, n), dtype).at[rows, cols].set(blocks)

    ata_f = jax.vmap(lambda b: blockdiag3(b.reshape(-1, 3, 3), nu))(blk_force)
    R = R_sym + ata_f + lam_sigma * jnp.eye(nu, dtype=dtype)
    # rate cost on u_t (vs F_prev in the state) applies for t >= 1
    t_ge1 = (jnp.arange(T) >= 1).astype(dtype)[:, None]
    R = R + t_ge1[..., None] * jnp.diag(wr2)[None]

    np_ = nc * K * 3
    adj = jnp.repeat(
        (stage.slot_valid * stage.slot_adjustable).reshape(-1), 3
    )
    Hpp = (
        jnp.diag(cfg.contact_position_weight * adj)
        + lam_sigma * jnp.eye(np_, dtype=dtype)
        + blockdiag3(blk_pos.reshape(-1, 3, 3), np_)
    )
    return q_track, wr2, R, Hpp


def riccati_factor(
    cfg: F.MPCConfig,
    params: F.MPCParams,
    z_lin,
    rho,
    lam_sigma: float,
) -> RiccatiFactor:
    """Factor M = H + sigma I + A^T rho A via the parametric backward
    Riccati recursion. One call per SQP linearization (the dense path's
    cholesky+inverse analog)."""
    dtype = z_lin.dtype
    T = cfg.T
    nu = cfg.n_contacts * cfg.n_corners * 3
    np_ = cfg.n_contacts * cfg.n_slots * 3

    A, B, C = _stage_jacobians(cfg, params, z_lin)
    q_track, wr2, R, Hpp = _cost_blocks(
        cfg, params.stage, rho, lam_sigma, dtype
    )

    # terminal: tracking on y_T only
    Phi_yy0 = jnp.diag(q_track)
    Phi_yf0 = jnp.zeros((9, nu), dtype)
    Phi_ff0 = jnp.zeros((nu, nu), dtype)
    Gam_y0 = jnp.zeros((9, np_), dtype)
    Gam_f0 = jnp.zeros((nu, np_), dtype)
    Pi0 = jnp.zeros((np_, np_), dtype)

    eye_u = jnp.eye(nu, dtype=dtype)
    diag_q = jnp.diag(q_track)
    diag_w = jnp.diag(wr2)

    def bwd(carry, inp):
        """One Riccati stage, matmul-fused (the recursion is op-latency
        bound on TPU — 20 sequential stages of small batched matmuls —
        so same-left-operand products are batched into single wide
        matmuls: ~7 linalg ops per stage instead of ~18; measured 1.9x
        on the whole factor at batch 512 on v5e)."""
        Phi_yy, Phi_yf, Phi_ff, Gam_y, Gam_f, Pi = carry
        At, Bt, Ct, Rt, t = inp
        t_ge1 = (t >= 1).astype(dtype)
        # G = [[B],[I]]; F = [[A, 0],[0, 0]]; E = [[C],[0]]
        G3 = jnp.concatenate([Bt, At, Ct], axis=1)  # [9, nu+9+np_]
        # M1: all Phi_yy right-products at once
        P3 = Phi_yy @ G3
        PyyB, PyyA, PyyC0 = P3[:, :nu], P3[:, nu : nu + 9], P3[:, nu + 9 :]
        X1 = PyyB + Phi_yf  # [9, nu]
        X2 = PyyC0 + Gam_y  # [9, np_]
        # M2: all left-transposed products G3' @ [X1 | X2 | PyyA | PyyC0]
        W = jnp.concatenate([X1, X2, PyyA, PyyC0], axis=1)
        Q = G3.T @ W  # [nu+9+np_, nu+np_+9+np_]
        np2 = X2.shape[1]
        c1, c2, c3 = nu, nu + np2, nu + np2 + 9
        BtX1, BtX2 = Q[:nu, :c1], Q[:nu, c1:c2]
        AtX1 = Q[nu : nu + 9, :c1]
        AtX2 = Q[nu : nu + 9, c1:c2]
        AtPyyA = Q[nu : nu + 9, c2:c3]
        CtX2 = Q[nu + 9 :, c1:c2]
        CtPyyC0 = Q[nu + 9 :, c3:]
        # M3: Phi_yf' right-products
        Y = Phi_yf.T @ G3
        YB, YC = Y[:, :nu], Y[:, nu + 9 :]

        Hu = Rt + BtX1 + YB + Phi_ff
        Hu = 0.5 * (Hu + Hu.T)
        Lsu = jnp.concatenate([AtX1, -t_ge1 * diag_w], axis=0)  # [ns, nu]
        LuP = BtX2 + YC + Gam_f  # [nu, np_]
        D1 = _spd_inverse_small(Hu)
        D1 = 0.5 * (D1 + D1.T)
        S = D1 @ jnp.concatenate([Lsu.T, LuP], axis=1)
        K = S[:, :33]
        KP = S[:, 33:]
        # M4: corr = Lsu D1 Lsu' and Lsu KP together
        C2 = Lsu @ jnp.concatenate([K, KP], axis=1)  # [ns, ns+np_]
        corr, LsuKP = C2[:, :33], C2[:, 33:]

        Phi_yy_n = t_ge1 * diag_q + AtPyyA - corr[:9, :9]
        Phi_yf_n = -corr[:9, 9:]
        Phi_ff_n = t_ge1 * diag_w - corr[9:, 9:]
        Phi_yy_n = 0.5 * (Phi_yy_n + Phi_yy_n.T)
        Phi_ff_n = 0.5 * (Phi_ff_n + Phi_ff_n.T)
        Gam_y_n = AtX2 - LsuKP[:9]
        Gam_f_n = -LsuKP[9:]
        # Pi' + C'Phi_yy C + C'Gam_y + Gam_y'C - LuP' D1 LuP, with
        # C'X2 = C'Phi_yy C + C'Gam_y and Gam_y'C = (C'X2 - C'PyyC0)'
        Pi_n = Pi + CtX2 + (CtX2 - CtPyyC0).T - LuP.T @ KP
        Pi_n = 0.5 * (Pi_n + Pi_n.T)
        return (
            (Phi_yy_n, Phi_yf_n, Phi_ff_n, Gam_y_n, Gam_f_n, Pi_n),
            (K, KP, D1),
        )

    ts = jnp.arange(T, dtype=dtype)
    (_, _, _, _, _, Pi_final), gains = jax.lax.scan(
        bwd,
        (Phi_yy0, Phi_yf0, Phi_ff0, Gam_y0, Gam_f0, Pi0),
        (A, B, C, R, ts),
        reverse=True,
        unroll=T,
    )
    K, KP, D1 = gains
    S = Pi_final + Hpp
    S = 0.5 * (S + S.T)
    Ls = jnp.linalg.cholesky(S)
    Sinv = jax.scipy.linalg.cho_solve((Ls, True), jnp.eye(np_, dtype=dtype))
    return RiccatiFactor(A=A, B=B, C=C, K=K, KP=KP, D1=D1, Sinv=Sinv)


def riccati_apply(cfg: F.MPCConfig, fac: RiccatiFactor, rhs):
    """Solve M x = rhs with the factored operator: one backward vector
    sweep (gamma/pi recursions + per-stage feedforward), the 24x24 P
    solve, one forward sweep. Reads only the per-stage gains."""
    dtype = rhs.dtype
    T = cfg.T
    nu = cfg.n_contacts * cfg.n_corners * 3
    nf = cfg.n_forces
    rhs_F = rhs[:nf].reshape(T, nu)
    rhs_P = rhs[nf:]

    gamma0 = jnp.zeros((33,), dtype)
    pi0 = jnp.zeros((rhs_P.shape[0],), dtype)

    def bwd(carry, inp):
        gam, pi = carry
        At, Bt, Ct, Kt, KPt, D1t, r_t = inp
        gv = Bt.T @ gam[:9] + gam[9:] - r_t  # G' gamma' - rhs_t
        ff = D1t @ gv
        # L_su D1 = K' and L_uP' D1 = KP' (D1 symmetric) — read the
        # stored gains transposed instead of carrying separate copies
        pi_n = pi + Ct.T @ gam[:9] - KPt.T @ gv
        gam_n = jnp.concatenate(
            [At.T @ gam[:9], jnp.zeros((nu,), dtype)]
        ) - Kt.T @ gv
        return (gam_n, pi_n), ff

    (gam_0, pi_0), ffs = jax.lax.scan(
        bwd,
        (gamma0, pi0),
        (fac.A, fac.B, fac.C, fac.K, fac.KP, fac.D1, rhs_F),
        reverse=True,
        unroll=T,
    )
    P = -fac.Sinv @ (pi_0 - rhs_P)

    def fwd(s, inp):
        At, Bt, Ct, Kt, KPt, ff = inp
        u = -(Kt @ s) - KPt @ P - ff
        y_n = At @ s[:9] + Bt @ u + Ct @ P
        return jnp.concatenate([y_n, u]), u

    _, us = jax.lax.scan(
        fwd,
        jnp.zeros((33,), dtype),
        (fac.A, fac.B, fac.C, fac.K, fac.KP, ffs),
        unroll=T,
    )
    return jnp.concatenate([us.reshape(-1), P])
