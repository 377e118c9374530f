"""Riccati x-update (cmpc/riccati.py) vs the dense KKT operator.

The factored apply must be MATHEMATICALLY IDENTICAL to multiplying by
inv(H + sigma I + A^T rho A) with H = J^T J + levenberg I — the whole
point of the path is that it changes traffic, not semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmw_tpu.cmpc import formulation as F
from cmw_tpu.cmpc.riccati import riccati_apply, riccati_factor
from cmw_tpu.cmpc.solver import CentroidalMPCSolver
from cmw_tpu.core import contacts
from cmw_tpu.core.centroidal import pack_state


def _params(cfg, push=(0.0, 0.0, 0.0), t0=1.02):
    plan = contacts.snap_to_grid(
        contacts.make_alternating_gait(n_steps=8), cfg.dt
    )
    stage = contacts.mpc_stage_params(plan, t0, cfg.T, cfg.dt, cfg.n_slots)
    N = cfg.N
    com_ref = jnp.asarray([0.0, 0.0, 0.7]) + 0.08 * cfg.dt * jnp.arange(N)[
        :, None
    ] * jnp.asarray([1.0, 0.0, 0.0])
    return F.MPCParams(
        x0=pack_state(jnp.asarray([0.0, 0.0, 0.7]), jnp.zeros(3), jnp.zeros(3)),
        com_ref=com_ref,
        ang_mom_ref=jnp.zeros((N, 3)),
        stage=stage,
        ext_force=jnp.asarray(push, jnp.float32),
        ext_torque=jnp.zeros(3),
    )


def _dense_M(cfg, params, z_lin, rho):
    res_fn = lambda zz: F.residuals(cfg, params, zz)
    J = jax.jacfwd(res_fn)(z_lin)
    eye = jnp.eye(cfg.n_vars, dtype=z_lin.dtype)
    H = J.T @ J + cfg.levenberg * eye
    ata = F.ata_blockdiag(cfg, params.stage, rho, z_lin.dtype)
    return H + cfg.admm_sigma * eye + ata


@pytest.mark.parametrize("z_kind", ["zero", "warmlike"])
def test_riccati_apply_matches_dense_inverse(z_kind):
    cfg = F.ergocub_mpc_config()
    params = _params(cfg, push=(0.0, 0.6, 0.0))
    rng = np.random.default_rng(0)
    if z_kind == "zero":
        z_lin = jnp.zeros((cfg.n_vars,), jnp.float32)
    else:
        # a physically-scaled linearization point: gravity-ish forces +
        # nominal positions with noise (the warm-start regime)
        Fg = F.nominal_force_guess(cfg, params.stage)
        P = params.stage.slot_pos_nom + 0.01 * jnp.asarray(
            rng.standard_normal(params.stage.slot_pos_nom.shape), jnp.float32
        )
        z_lin = F.pack_z(cfg, Fg, P)

    _, _, rho = F.constraint_bounds(cfg, params.stage, jnp.float32)
    lam_sig = cfg.levenberg + cfg.admm_sigma

    fac = riccati_factor(cfg, params, z_lin, rho, lam_sig)
    M = _dense_M(cfg, params, z_lin, rho)

    for seed in range(3):
        rhs = jnp.asarray(
            np.random.default_rng(seed).standard_normal(cfg.n_vars),
            jnp.float32,
        )
        x_ric = riccati_apply(cfg, fac, rhs)
        x_dense = jnp.linalg.solve(M, rhs)
        err = float(
            jnp.max(jnp.abs(x_ric - x_dense))
            / (1e-9 + jnp.max(jnp.abs(x_dense)))
        )
        # f32 over a 20-stage recursion vs an f32 dense solve of a matrix
        # with rho_eq=1e4 rows: agreement to ~1e-3 relative is round-off
        # parity (the f64 test below pins the math exactly)
        assert err < 5e-3, (z_kind, seed, err)


def test_riccati_apply_matches_dense_inverse_f64():
    """In f64 the two solves must agree to near machine precision —
    this pins the DERIVATION (cost blocks, recursions, Schur complement),
    not just the numerics."""
    with jax.enable_x64(True):
        cfg = F.ergocub_mpc_config()
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64)
            if jnp.asarray(a).dtype == jnp.float32
            else a,
            _params(cfg, push=(0.3, -0.4, 0.0)),
        )
        z_lin = jnp.asarray(
            0.1 * np.random.default_rng(7).standard_normal(cfg.n_vars),
            jnp.float64,
        )
        _, _, rho = F.constraint_bounds(cfg, params.stage, jnp.float64)
        lam_sig = cfg.levenberg + cfg.admm_sigma
        fac = riccati_factor(cfg, params, z_lin, rho, lam_sig)
        M = _dense_M(cfg, params, z_lin, rho)
        rhs = jnp.asarray(
            np.random.default_rng(11).standard_normal(cfg.n_vars), jnp.float64
        )
        x_ric = riccati_apply(cfg, fac, rhs)
        x_dense = jnp.linalg.solve(M, rhs)
        err = float(
            jnp.max(jnp.abs(x_ric - x_dense))
            / (1e-12 + jnp.max(jnp.abs(x_dense)))
        )
        assert err < 1e-9, err


def test_riccati_solver_parity_with_dense():
    """Full solves (cold + one warm-started receding step) through the
    riccati path vs the dense path: same costs/forces to f32 tolerance."""
    import dataclasses

    cfg_d = F.ergocub_mpc_config(inverse_impl="xla", kkt_impl="dense")
    cfg_r = dataclasses.replace(cfg_d, kkt_impl="riccati")
    params = _params(cfg_d, push=(0.0, 1.0, 0.0))

    sd = CentroidalMPCSolver(cfg_d)
    sr = CentroidalMPCSolver(cfg_r)
    sol_d = sd.solve(params, sd.cold_start())
    sol_r = sr.solve(params, sr.cold_start())
    assert float(sol_r.prim_res) < 1e-2
    assert np.isfinite(np.asarray(sol_r.z)).all()
    # identical math modulo rounding: costs match to ~0.1%
    assert float(sol_r.cost) == pytest.approx(float(sol_d.cost), rel=2e-3)
    assert float(
        jnp.max(jnp.abs(sol_r.forces - sol_d.forces))
    ) < 5e-2 * float(1.0 + jnp.max(jnp.abs(sol_d.forces)))

    # warm-started second tick (the production shape)
    p2 = _params(cfg_d, push=(0.0, 1.0, 0.0), t0=1.08)
    sol_d2 = sd.solve(p2, sd.warm_from(p2, sol_d))
    sol_r2 = sr.solve(p2, sr.warm_from(p2, sol_r))
    assert float(sol_r2.cost) == pytest.approx(float(sol_d2.cost), rel=5e-3)
    assert float(sol_r2.prim_res) < 1e-2


def test_riccati_refactor_every_sqp():
    """refactor_every_sqp=True (exact GN, now cheap on the riccati path)
    solves and is at least as good as quasi-Newton on a hard cold start."""
    import dataclasses

    cfg_q = F.ergocub_mpc_config(kkt_impl="riccati", inverse_impl="xla")
    cfg_e = dataclasses.replace(cfg_q, refactor_every_sqp=True)
    params = _params(cfg_q, push=(0.0, 1.2, 0.0))
    sq = CentroidalMPCSolver(cfg_q)
    se = CentroidalMPCSolver(cfg_e)
    sol_q = sq.solve(params, sq.cold_start())
    sol_e = se.solve(params, se.cold_start())
    assert np.isfinite(float(sol_e.cost))
    assert float(sol_e.prim_res) < 1e-2
    # exact refactoring should not be materially worse
    assert float(sol_e.cost) <= 1.1 * float(sol_q.cost)
