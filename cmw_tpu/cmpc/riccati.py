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
per-stage gain matrices (~90k floats vs the 254k of the dense inverse, and
no [n,n] build, no jacfwd J, no J^T J, no 504^3 factorization). The apply
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
    contact-position parameters."""

    A: jnp.ndarray  # [T, 9, 9]    dX'/dX
    B: jnp.ndarray  # [T, 9, nu]   dX'/dF
    C: jnp.ndarray  # [T, 9, np_]  dX'/dP
    K: jnp.ndarray  # [T, nu, ns]  feedback gain  (H_u^-1 L_su')
    KP: jnp.ndarray  # [T, nu, np_] P-feedforward gain (H_u^-1 L_uP)
    D1: jnp.ndarray  # [T, nu, nu]  H_u^-1
    SW: jnp.ndarray  # [T, ns, nu]  L_su H_u^-1
    VP: jnp.ndarray  # [T, np_, nu] L_uP' H_u^-1
    Sinv: jnp.ndarray  # [np_, np_]  (Pi_0 + H_pp)^-1


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

    def bwd(carry, inp):
        Phi_yy, Phi_yf, Phi_ff, Gam_y, Gam_f, Pi = carry
        At, Bt, Ct, Rt, t = inp
        t_ge1 = (t >= 1).astype(dtype)
        # G = [[B],[I]]; F = [[A, 0],[0, 0]]; E = [[C],[0]]
        PyyB = Phi_yy @ Bt  # [9, nu]
        Hu = Rt + Bt.T @ PyyB + Bt.T @ Phi_yf + Phi_yf.T @ Bt + Phi_ff
        Hu = 0.5 * (Hu + Hu.T)
        L = jnp.linalg.cholesky(Hu)
        eye_u = jnp.eye(nu, dtype=dtype)
        D1 = jax.scipy.linalg.cho_solve((L, True), eye_u)
        # L_su = N + F' Phi' G : y-rows A'(Phi_yy B + Phi_yf); f-rows -Wr2
        Lsu_y = At.T @ (PyyB + Phi_yf)  # [9, nu]
        Lsu_f = -t_ge1 * jnp.diag(wr2)  # [nu, nu]
        Lsu = jnp.concatenate([Lsu_y, Lsu_f], axis=0)  # [ns, nu]
        # L_uP = G'(Phi' E + Gamma') = B'(Phi_yy C + Gam_y) + Phi_fy C + Gam_f
        PyyC_Gy = Phi_yy @ Ct + Gam_y  # [9, np_]
        LuP = Bt.T @ PyyC_Gy + Phi_yf.T @ Ct + Gam_f  # [nu, np_]

        K = D1 @ Lsu.T
        KP = D1 @ LuP
        SW = Lsu @ D1
        VP = LuP.T @ D1

        # Phi_t = Q~_t + F'Phi'F - Lsu D1 Lsu'
        corr = Lsu @ K  # Lsu D1 Lsu'  [ns, ns]
        Phi_yy_n = (
            t_ge1 * jnp.diag(q_track) + At.T @ Phi_yy @ At - corr[:9, :9]
        )
        Phi_yf_n = -corr[:9, 9:]
        Phi_ff_n = t_ge1 * jnp.diag(wr2) - corr[9:, 9:]
        Phi_yy_n = 0.5 * (Phi_yy_n + Phi_yy_n.T)
        Phi_ff_n = 0.5 * (Phi_ff_n + Phi_ff_n.T)
        # Gamma_t = F'(Phi'E + Gamma') - Lsu KP
        GEG = At.T @ PyyC_Gy  # y-rows
        Gam_y_n = GEG - (Lsu @ KP)[:9]
        Gam_f_n = -(Lsu @ KP)[9:]
        # Pi_t = Pi' + E'Phi'E + E'Gamma' + Gamma''E - LuP' D1 LuP
        Pi_n = Pi + Ct.T @ PyyC_Gy + Gam_y.T @ Ct - LuP.T @ KP
        Pi_n = 0.5 * (Pi_n + Pi_n.T)
        return (
            (Phi_yy_n, Phi_yf_n, Phi_ff_n, Gam_y_n, Gam_f_n, Pi_n),
            (K, KP, D1, SW, VP),
        )

    ts = jnp.arange(T, dtype=dtype)
    (_, _, _, _, _, Pi_final), gains = jax.lax.scan(
        bwd,
        (Phi_yy0, Phi_yf0, Phi_ff0, Gam_y0, Gam_f0, Pi0),
        (A, B, C, R, ts),
        reverse=True,
        unroll=T,
    )
    K, KP, D1, SW, VP = gains
    S = Pi_final + Hpp
    S = 0.5 * (S + S.T)
    Ls = jnp.linalg.cholesky(S)
    Sinv = jax.scipy.linalg.cho_solve((Ls, True), jnp.eye(np_, dtype=dtype))
    return RiccatiFactor(A=A, B=B, C=C, K=K, KP=KP, D1=D1, SW=SW, VP=VP, Sinv=Sinv)


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
        At, Bt, Ct, SWt, VPt, D1t, r_t = inp
        gv = Bt.T @ gam[:9] + gam[9:] - r_t  # G' gamma' - rhs_t
        ff = D1t @ gv
        pi_n = pi + Ct.T @ gam[:9] - VPt @ gv
        gam_n = jnp.concatenate(
            [At.T @ gam[:9], jnp.zeros((nu,), dtype)]
        ) - SWt @ gv
        return (gam_n, pi_n), ff

    (gam_0, pi_0), ffs = jax.lax.scan(
        bwd,
        (gamma0, pi0),
        (fac.A, fac.B, fac.C, fac.SW, fac.VP, fac.D1, rhs_F),
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
