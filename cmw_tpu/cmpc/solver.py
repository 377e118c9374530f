"""Gauss-Newton SQP driver for the centroidal MPC — fully jitted.

Replaces BLF `ReducedModelControllers::CentroidalMPC::advance()`
(reference CentroidalMPCBlock.cpp:615; internals per SURVEY.md §3.4):
  1. pack parameters (state, references, contact masks/nominals, wrench)
  2. warm start from the previous solution (is_warm_start_enabled,
     centroidal_mpc.ini:9 — here: time-shifted forces + slot-matched
     contact positions)
  3. fixed-trip-count SQP: linearize residuals (jacfwd), Gauss-Newton
     Hessian, ADMM QP with warm-started duals
  4. unpack corner forces + adjusted contact positions

Everything is a pure function of (params, warm) -> solution, so batching is
`jax.vmap(solver.solve)` and pod-scale sweeps shard the batch axis
(dist/sweep.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cmw_tpu.cmpc import formulation as F
from cmw_tpu.cmpc.qp import ADMMState, admm_solve, spd_inverse


def _inverse_fn(cfg):
    """Select the KKT-inverse implementation (trace-time decision)."""
    impl = cfg.inverse_impl
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from cmw_tpu.ops.spd_inverse import spd_inverse_pallas

        return lambda M: spd_inverse_pallas(M[None], ns_iters=cfg.ns_iters)[0]
    return spd_inverse


def _admm_impl(cfg) -> str:
    impl = cfg.admm_impl
    if impl == "auto":
        # measured on v5e: the batched XLA scan (bandwidth-parallel across
        # the batch) beats the fused per-item Pallas kernel, whose grid
        # cells serialize 24 small GEMVs each on the single core; keep the
        # fused kernel opt-in for future multi-core parts
        impl = "xla"
    return impl


class MPCSolution(NamedTuple):
    forces: jnp.ndarray  # [T, nc, ncor, 3] world-frame corner forces / mass
    positions: jnp.ndarray  # [nc, K, 3] adjusted contact positions
    states: jnp.ndarray  # [N, 9] predicted (com, vcom, ang_mom)
    z: jnp.ndarray  # [n] raw solution (warm start for the next tick)
    dual: jnp.ndarray  # [m] ADMM dual (warm start)
    slack: jnp.ndarray  # [m] ADMM auxiliary (warm start)
    prim_res: jnp.ndarray  # scalar constraint violation (inf-norm)
    cost: jnp.ndarray  # scalar 1/2 |r|^2


class WarmStart(NamedTuple):
    z: jnp.ndarray
    dual: jnp.ndarray
    slack: jnp.ndarray
    slot_act: jnp.ndarray  # [nc, K] phase keys of the stored positions
    valid: jnp.ndarray  # scalar {0.,1.}: 0 -> cold start


class CentroidalMPCSolver:
    """Stateless solver object: holds only the static MPCConfig."""

    def __init__(self, cfg: F.MPCConfig):
        self.cfg = cfg

    # -- warm start -----------------------------------------------------------

    def cold_start(self, dtype=jnp.float32) -> WarmStart:
        cfg = self.cfg
        return WarmStart(
            z=jnp.zeros((cfg.n_vars,), dtype),
            dual=jnp.zeros((cfg.n_con,), dtype),
            slack=jnp.zeros((cfg.n_con,), dtype),
            slot_act=jnp.full((cfg.n_contacts, cfg.n_slots), -1.0, dtype),
            valid=jnp.zeros((), dtype),
        )

    def _initial_z(self, params: F.MPCParams, warm: WarmStart):
        """Warm-started decision vector.

        Forces: previous solution shifted by one interval (receding horizon).
        Positions: previous slot value where the slot still refers to the same
        phase (matched on activation time), nominal otherwise.
        """
        cfg = self.cfg
        stage = params.stage
        Fz, Pz = F.unpack_z(cfg, warm.z)
        F_shift = jnp.concatenate([Fz[1:], Fz[-1:]], axis=0)
        F_nom = F.nominal_force_guess(cfg, stage, warm.z.dtype)
        F0 = jnp.where(warm.valid > 0, F_shift, F_nom)

        # slot matching on activation times: match[i, s_new, s_old]
        match = (
            jnp.abs(stage.slot_act[:, :, None] - warm.slot_act[:, None, :])
            < 0.5 * cfg.dt
        ).astype(warm.z.dtype)
        match = match * stage.slot_valid[:, :, None]
        has_match = jnp.max(match, axis=-1, keepdims=True)  # [nc, K, 1]
        P_matched = jnp.einsum("iso,iox->isx", match, Pz)
        P0 = jnp.where(
            (warm.valid > 0) * (has_match > 0),
            P_matched,
            stage.slot_pos_nom,
        )
        return F.pack_z(cfg, F0, P0)

    # -- the solve ------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def solve(self, params: F.MPCParams, warm: WarmStart) -> MPCSolution:
        cfg = self.cfg
        z0 = self._initial_z(params, warm)
        dtype = z0.dtype
        stage = params.stage

        l, u, rho = F.constraint_bounds(cfg, stage, dtype)
        ata = F.ata_blockdiag(cfg, stage, rho, dtype)
        # stage-dependent operator coefficients hoisted out of the ADMM
        # loop (F.ConstraintOp docstring: recomputing them per iteration
        # was ~60% of the batched solve)
        con_op = F.constraint_op(cfg, stage, dtype)
        matvec = lambda v: F.op_matvec(cfg, con_op, v)
        rmatvec = lambda v: F.op_rmatvec(cfg, con_op, v)

        res_fn = lambda zz: F.residuals(cfg, params, zz)

        zc0 = jnp.where(warm.valid > 0, warm.slack, jnp.clip(matvec(z0), l, u))
        y0 = jnp.where(warm.valid > 0, warm.dual, jnp.zeros_like(warm.dual))

        use_riccati = cfg.kkt_impl in ("riccati", "auto")
        grad_fn = jax.grad(lambda zz: 0.5 * jnp.sum(res_fn(zz) ** 2))

        if use_riccati:
            # structure-exploiting path (cmpc/riccati.py): no dense J, no
            # J^T J, no [n, n] inverse — factor M through the stage-wise
            # parametric Riccati recursion at the linearization point and
            # apply it inside ADMM with banded vector sweeps. H z products
            # (for q = g - H z) come from one jvp + one vjp at z_lin.
            from cmw_tpu.cmpc.riccati import riccati_apply, riccati_factor

            lam_sig = cfg.levenberg + cfg.admm_sigma

            def hvp_at(z_lin, v):
                _, Jv = jax.jvp(res_fn, (z_lin,), (v,))
                _, vjp_fn = jax.vjp(res_fn, z_lin)
                return vjp_fn(Jv)[0] + cfg.levenberg * v

            if not cfg.refactor_every_sqp:
                fac0 = riccati_factor(cfg, params, z0, rho, lam_sig)
        else:
            eye = jnp.eye(cfg.n_vars, dtype=dtype)

            def gauss_newton(z):
                r = res_fn(z)
                J = jax.jacfwd(res_fn)(z)
                g = J.T @ r
                H = J.T @ J + cfg.levenberg * eye
                return g, H

            inv = _inverse_fn(cfg)
        xupd = cfg.xupdate_impl
        if xupd == "auto":
            xupd = "symv" if jax.default_backend() == "tpu" else "dense"
        use_symv = xupd == "symv" and cfg.kkt_dtype == "f32" and not use_riccati
        if use_symv:
            from cmw_tpu.ops.symv import pack_symmetric

            def pack(m):
                npad = -(-m.shape[-1] // 128) * 128
                pad = npad - m.shape[-1]
                mp = jnp.pad(m, ((0, pad), (0, pad)))
                return pack_symmetric(mp[None])[0]

        if not cfg.refactor_every_sqp and not use_riccati:
            # quasi-Newton: one factorization per solve; later iterations
            # reuse H0 with exact gradients (one reverse-mode pass each),
            # keeping the fixed point correct
            _, H0 = gauss_newton(z0)
            minv0 = inv(H0 + cfg.admm_sigma * eye + ata)
            packed0 = pack(minv0) if use_symv else None

        alphas = jnp.asarray(cfg.line_search_alphas, dtype)

        admm_impl = _admm_impl(cfg)
        if use_riccati:
            admm_impl = "xla"  # the factored apply rides the xla ADMM loop
        if admm_impl == "fused":
            from cmw_tpu.ops.admm_fused import admm_fused_pallas

            A_dense = F.constraint_dense(cfg, stage, dtype)
            interp = jax.default_backend() not in ("tpu",)

            def run_admm(minv, q, z, zc, y, packed=None):
                x, zcn, yn = admm_fused_pallas(
                    minv[None], A_dense[None], q[None], l[None], u[None],
                    rho[None], z[None], zc[None], y[None],
                    iters=cfg.admm_iters, sigma=cfg.admm_sigma,
                    alpha=cfg.admm_alpha, interpret=interp,
                )
                state = ADMMState(x[0], zcn[0], yn[0])
                prim = jnp.max(jnp.abs(matvec(state.x) - state.zc))
                return state, prim

        elif use_riccati:

            def run_admm(fac, q, z, zc, y, packed=None):
                return admm_solve(
                    None, q, matvec, rmatvec, l, u, rho,
                    ADMMState(z, zc, y), iters=cfg.admm_iters,
                    sigma=cfg.admm_sigma, alpha=cfg.admm_alpha,
                    apply_fn=lambda r: riccati_apply(cfg, fac, r),
                )

        else:
            kd = cfg.kkt_dtype
            if kd == "auto":
                kd = "bf16" if jax.default_backend() == "tpu" else "f32"
            tail = min(cfg.kkt_f32_tail, cfg.admm_iters) if kd == "bf16" else 0
            head = cfg.admm_iters - tail

            def run_admm(minv, q, z, zc, y, packed=None):
                state = ADMMState(z, zc, y)
                if head > 0 and kd == "bf16":
                    state, _ = admm_solve(
                        minv.astype(jnp.bfloat16), q, matvec, rmatvec, l, u,
                        rho, state, iters=head,
                        sigma=cfg.admm_sigma, alpha=cfg.admm_alpha,
                    )
                return admm_solve(
                    minv, q, matvec, rmatvec, l, u, rho, state,
                    iters=cfg.admm_iters if kd != "bf16" else tail,
                    sigma=cfg.admm_sigma,
                    alpha=cfg.admm_alpha,
                    minv_packed=packed,
                )

        def sqp_iter(carry, _):
            z, zc, y = carry
            if use_riccati:
                g = grad_fn(z)
                if cfg.refactor_every_sqp:
                    fac = riccati_factor(cfg, params, z, rho, lam_sig)
                    q = g - hvp_at(z, z)
                else:
                    fac = fac0
                    q = g - hvp_at(z0, z)
                minv, packed = fac, None
            elif cfg.refactor_every_sqp:
                g, H = gauss_newton(z)
                minv = inv(H + cfg.admm_sigma * eye + ata)
                packed = pack(minv) if use_symv else None
                q = g - H @ z
            else:
                g, H = grad_fn(z), H0
                minv = minv0
                packed = packed0 if use_symv else None
                q = g - H @ z
            state, prim = run_admm(minv, q, z, zc, y, packed)
            # globalization: scale the step by the merit-minimizing alpha
            # (alpha 0 = keep z; guarantees monotone merit inside a solve).
            # The residual is EXACTLY quadratic in z (com/vel are linear in
            # the forces; L is a product of two linear terms), so the merit
            # along dz is exact from one jvp + one extra residual eval:
            #   r(z + a dz) = r0 + a r1 + a² r2,  A(z + a dz) = az0 + a adz
            # — merit at every alpha then costs only vector ops, vs a full
            # rollout per alpha (was ~60% of the whole solve).
            dz = state.x - z
            r0, r1 = jax.jvp(res_fn, (z,), (dz,))
            r2 = res_fn(z + dz) - r0 - r1
            az0, adz = matvec(z), matvec(dz)

            def merit_at(a):
                r = r0 + a * r1 + (a * a) * r2
                az = az0 + a * adz
                viol = jnp.maximum(az - u, 0.0) + jnp.maximum(l - az, 0.0)
                return 0.5 * jnp.sum(r * r) + cfg.merit_penalty * jnp.sum(viol)

            merits = jax.vmap(merit_at)(alphas)
            a_best = alphas[jnp.argmin(merits)]
            return (z + a_best * dz, state.zc, state.y), prim

        (z, zc, y), prims = jax.lax.scan(
            sqp_iter, (z0, zc0, y0), None, length=cfg.sqp_iters
        )

        forces, positions = F.unpack_z(cfg, z)
        # clamp: zero out numerically tiny forces on inactive intervals
        act = stage.active.T[:, :, None, None]
        forces = forces * act
        states = F.rollout(cfg, params, forces, positions)
        r = res_fn(z)
        return MPCSolution(
            forces=forces,
            positions=positions,
            states=states,
            z=z,
            dual=y,
            slack=zc,
            prim_res=prims[-1],
            cost=0.5 * jnp.sum(r * r),
        )

    def warm_from(self, params: F.MPCParams, sol: MPCSolution) -> WarmStart:
        return WarmStart(
            z=sol.z,
            dual=sol.dual,
            slack=sol.slack,
            slot_act=params.stage.slot_act,
            valid=jnp.ones((), sol.z.dtype),
        )
