"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import jax.numpy as jnp
import numpy as np

from cmw_tpu.ops.spd_inverse import spd_inverse_pallas


def test_spd_inverse_pallas_matches_numpy():
    # run at the SOLVER'S configured ns_iters, not the kernel default —
    # the two drifted apart once and the closed loop diverged on real TPU
    # hardware while this test (then at the kernel default) stayed green
    from cmw_tpu.cmpc import ergocub_mpc_config

    ns = ergocub_mpc_config().ns_iters
    rng = np.random.default_rng(0)
    B, n = 3, 504
    A = rng.normal(size=(B, n, n)).astype(np.float32) * 0.02
    H = np.einsum("bij,bkj->bik", A, A) + np.eye(n, dtype=np.float32)
    # scale spread like the real ADMM KKT matrix (rho_eq rows)
    H[:, :50, :50] += 1e4 * np.eye(50, dtype=np.float32)
    X = np.asarray(spd_inverse_pallas(jnp.asarray(H), ns_iters=ns, interpret=True))
    err = np.einsum("bij,bjk->bik", H, X) - np.eye(n, dtype=np.float32)
    assert np.abs(err).max() < 1e-4


def test_spd_inverse_pallas_aligned_size():
    rng = np.random.default_rng(1)
    B, n = 2, 256  # already a multiple of 128
    A = rng.normal(size=(B, n, n)).astype(np.float32) * 0.05
    H = np.einsum("bij,bkj->bik", A, A) + np.eye(n, dtype=np.float32)
    X = np.asarray(spd_inverse_pallas(jnp.asarray(H), interpret=True))
    err = np.einsum("bij,bjk->bik", H, X) - np.eye(n, dtype=np.float32)
    assert np.abs(err).max() < 1e-4


def _mpc_setup():
    import jax
    from cmw_tpu.cmpc import CentroidalMPCSolver, ergocub_mpc_config
    from cmw_tpu.cmpc import formulation as F
    from cmw_tpu.core import contacts
    from cmw_tpu.core.centroidal import pack_state

    cfg = ergocub_mpc_config()
    plan = contacts.snap_to_grid(contacts.make_alternating_gait(n_steps=8), cfg.dt)
    stage = contacts.mpc_stage_params(plan, 1.02, cfg.T, cfg.dt, cfg.n_slots)
    params = F.MPCParams(
        x0=pack_state(jnp.asarray([0.0, 0.0, 0.7]), jnp.zeros(3), jnp.zeros(3)),
        com_ref=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.7]), (cfg.N, 3)),
        ang_mom_ref=jnp.zeros((cfg.N, 3)),
        stage=stage,
        ext_force=jnp.zeros(3),
        ext_torque=jnp.zeros(3),
    )
    return cfg, stage, params


def test_constraint_dense_matches_matvec():
    from cmw_tpu.cmpc import formulation as F

    cfg, stage, _ = _mpc_setup()
    A = np.asarray(F.constraint_dense(cfg, stage))
    rng = np.random.default_rng(2)
    for _ in range(3):
        v = rng.normal(size=(cfg.n_vars,)).astype(np.float32)
        ref = np.asarray(F.constraint_matvec(cfg, stage, jnp.asarray(v)))
        np.testing.assert_allclose(A @ v, ref, rtol=1e-5, atol=1e-5)
        w = rng.normal(size=(cfg.n_con,)).astype(np.float32)
        ref_t = np.asarray(F.constraint_rmatvec(cfg, stage, jnp.asarray(w)))
        np.testing.assert_allclose(A.T @ w, ref_t, rtol=1e-5, atol=1e-5)


def test_admm_fused_matches_xla_loop():
    import jax
    from cmw_tpu.cmpc import formulation as F
    from cmw_tpu.cmpc.qp import ADMMState, admm_solve, spd_inverse
    from cmw_tpu.ops.admm_fused import admm_fused_pallas

    cfg, stage, params = _mpc_setup()
    dtype = jnp.float32
    n = cfg.n_vars
    rng = np.random.default_rng(3)
    l, u, rho = F.constraint_bounds(cfg, stage, dtype)
    A = F.constraint_dense(cfg, stage, dtype)
    ata = F.ata_blockdiag(cfg, stage, rho, dtype)
    G = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32) * 0.05)
    H = G @ G.T + jnp.eye(n)
    minv = spd_inverse(H + 1e-6 * jnp.eye(n) + ata)
    q = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    x0 = jnp.zeros(n)
    zc0 = jnp.clip(A @ x0, l, u)
    y0 = jnp.zeros_like(zc0)

    matvec = lambda v: F.constraint_matvec(cfg, stage, v)
    rmatvec = lambda v: F.constraint_rmatvec(cfg, stage, v)
    ref, _ = admm_solve(minv, q, matvec, rmatvec, l, u, rho,
                        ADMMState(x0, zc0, y0), iters=8)
    x, zc, y = admm_fused_pallas(minv[None], A[None], q[None], l[None],
                                 u[None], rho[None], x0[None], zc0[None],
                                 y0[None], iters=8, interpret=True)
    np.testing.assert_allclose(np.asarray(x[0]), np.asarray(ref.x), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(zc[0]), np.asarray(ref.zc), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(ref.y), rtol=2e-4, atol=2e-3)


def test_solver_fused_admm_matches_xla_path():
    import jax
    from cmw_tpu.cmpc import CentroidalMPCSolver, ergocub_mpc_config

    cfg_x, _, params = _mpc_setup()
    import dataclasses
    cfg_f = dataclasses.replace(cfg_x, admm_impl="fused")
    cfg_x = dataclasses.replace(cfg_x, admm_impl="xla")
    sx = CentroidalMPCSolver(cfg_x)
    sf = CentroidalMPCSolver(cfg_f)
    ref = sx.solve(params, sx.cold_start())
    got = sf.solve(params, sf.cold_start())
    np.testing.assert_allclose(np.asarray(got.forces), np.asarray(ref.forces),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.positions),
                               np.asarray(ref.positions), rtol=1e-4, atol=1e-4)


def test_symv_packed_matches_dense():
    """Packed lower-triangle symmetric product (the ADMM x-update traffic
    optimization, MPCConfig.xupdate_impl='symv') == dense M @ v."""
    import numpy as np
    import jax.numpy as jnp
    from cmw_tpu.ops.symv import pack_symmetric, symv_packed

    rng = np.random.default_rng(7)
    B, n = 2, 256
    A = rng.normal(size=(B, n, n)).astype(np.float32)
    M = jnp.asarray(A @ np.swapaxes(A, 1, 2) / n)
    v = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))
    out = symv_packed(pack_symmetric(M), v, interpret=True)
    ref = jnp.einsum("bij,bj->bi", M, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-4)


def test_solver_symv_xupdate_matches_dense():
    """Full solve with xupdate_impl='symv' lands on the dense path's
    solution (same ADMM math, less HBM traffic)."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np
    from cmw_tpu.cmpc import CentroidalMPCSolver, ergocub_mpc_config
    from cmw_tpu.cmpc import formulation as F
    from cmw_tpu.core import contacts
    from cmw_tpu.core.centroidal import pack_state

    cfg = ergocub_mpc_config(horizon=0.6)
    plan = contacts.snap_to_grid(contacts.make_alternating_gait(n_steps=8), cfg.dt)
    stage = contacts.mpc_stage_params(plan, 1.02, cfg.T, cfg.dt, cfg.n_slots)
    params = F.MPCParams(
        x0=pack_state(jnp.asarray([0.0, 0.0, 0.7]), jnp.zeros(3), jnp.zeros(3)),
        com_ref=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.7]), (cfg.N, 3)),
        ang_mom_ref=jnp.zeros((cfg.N, 3)),
        stage=stage,
        ext_force=jnp.zeros(3),
        ext_torque=jnp.zeros(3),
    )
    sA = CentroidalMPCSolver(cfg)
    sB = CentroidalMPCSolver(dataclasses.replace(cfg, xupdate_impl="symv"))
    a = sA.solve(params, sA.cold_start())
    b = sB.solve(params, sB.cold_start())
    assert abs(float(a.cost) - float(b.cost)) < 1e-3 * (abs(float(a.cost)) + 1)
    np.testing.assert_allclose(np.asarray(a.z), np.asarray(b.z), atol=1e-4)
