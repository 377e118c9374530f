"""Unit tests for cmw_tpu.core: Lie groups, splines, contacts, dynamics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmw_tpu.core import centroidal, contacts, integrators, lie, splines


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(16, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    w = jnp.asarray(d * rng.uniform(0.01, 3.0, size=(16, 1)), jnp.float32)
    R = lie.so3_exp(w)
    # orthonormality
    err = jnp.max(jnp.abs(R @ jnp.swapaxes(R, -1, -2) - jnp.eye(3)))
    assert err < 1e-5
    w2 = lie.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), rtol=1e-3, atol=2e-4)


def test_so3_exp_small_angle():
    w = jnp.asarray([[1e-9, 0, 0], [0.0, 0, 0]], jnp.float32)
    R = lie.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R), np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)


def test_quat_mat_roundtrip():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    R = lie.so3_exp(w)
    q = lie.mat_to_quat(R)
    R2 = lie.quat_to_mat(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_rotz_yaw():
    yaw = jnp.asarray([0.3, -1.2], jnp.float32)
    R = lie.rotz(yaw)
    np.testing.assert_allclose(np.asarray(lie.yaw_of(R)), np.asarray(yaw), atol=1e-6)


def test_linear_spline_matches_reference_semantics():
    # resampling 50 Hz knots onto MPC knots (CentroidalMPCBlock.cpp:544-577)
    kt = jnp.arange(5, dtype=jnp.float32) * 0.02
    kv = jnp.stack([kt * 2.0, kt**2], axis=-1)
    q = jnp.asarray([0.0, 0.01, 0.03, 0.08], jnp.float32)
    v, dv = splines.linear_spline(kt, kv, q)
    np.testing.assert_allclose(np.asarray(v[:, 0]), np.asarray(q * 2.0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dv[:, 0]), 2.0, atol=1e-5)
    # clamped beyond the last knot
    v_end, _ = splines.linear_spline(kt, kv, jnp.asarray([1.0], jnp.float32))
    np.testing.assert_allclose(np.asarray(v_end[0]), np.asarray(kv[-1]), atol=1e-6)


def test_quintic_hermite_boundary_conditions():
    p0 = jnp.asarray([0.0]); p1 = jnp.asarray([1.0])
    v0 = jnp.asarray([0.2]); v1 = jnp.asarray([-0.1])
    a0 = jnp.asarray([0.0]); a1 = jnp.asarray([0.5])
    for t, pe, ve, ae in [(0.0, p0, v0, a0), (2.0, p1, v1, a1)]:
        p, v, a = splines.quintic_hermite(jnp.asarray(t), 0.0, 2.0, p0, v0, a0, p1, v1, a1)
        np.testing.assert_allclose(np.asarray(p), np.asarray(pe), atol=1e-5)
        np.testing.assert_allclose(np.asarray(v), np.asarray(ve), atol=1e-5)
        np.testing.assert_allclose(np.asarray(a), np.asarray(ae), atol=1e-4)


def test_centroidal_dynamics_static_equilibrium():
    # two active contacts, 4 corners, forces exactly canceling gravity
    x = centroidal.pack_state(
        jnp.asarray([0.0, 0.0, 0.7]), jnp.zeros(3), jnp.zeros(3)
    )
    corner_pos = jnp.asarray(
        np.stack(
            [
                np.array([[0.08, 0.09, 0], [0.08, 0.07, 0], [-0.08, 0.07, 0], [-0.08, 0.09, 0]]),
                np.array([[0.08, -0.07, 0], [0.08, -0.09, 0], [-0.08, -0.09, 0], [-0.08, -0.07, 0]]),
            ]
        ),
        jnp.float32,
    )
    f = jnp.zeros((2, 4, 3)).at[..., 2].set(centroidal.GRAVITY / 8.0)
    active = jnp.ones(2)
    dx = centroidal.centroidal_dynamics(x, f, corner_pos, active, jnp.zeros(3), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(dx[3:6]), 0.0, atol=1e-5)
    # symmetric corner layout about com x/y -> zero torque
    np.testing.assert_allclose(np.asarray(dx[6:9]), 0.0, atol=1e-4)


def test_rk4_exponential():
    f = lambda x: -x
    x = jnp.asarray(1.0)
    for _ in range(10):
        x = integrators.rk4_step(f, x, 0.1)
    np.testing.assert_allclose(float(x), np.exp(-1.0), rtol=1e-6)


# --- contacts ---------------------------------------------------------------


def test_gait_plan_basic():
    plan = contacts.make_alternating_gait(n_steps=4)
    # at t=0 both feet in contact
    _, in_c = contacts.active_phase(plan, 0.0)
    np.testing.assert_array_equal(np.asarray(in_c), [1.0, 1.0])
    # during the first swing (starts at 1.0, lasts 0.5) the left foot is off
    _, in_c = contacts.active_phase(plan, 1.2)
    np.testing.assert_array_equal(np.asarray(in_c), [0.0, 1.0])
    _, in_c = contacts.active_phase(plan, 1.6)
    np.testing.assert_array_equal(np.asarray(in_c), [1.0, 1.0])


def test_mpc_stage_params_shapes_and_masks():
    plan = contacts.make_alternating_gait(n_steps=6)
    T, K = 20, 4
    sp = contacts.mpc_stage_params(plan, 0.9, T, 0.06, K)
    assert sp.active.shape == (2, T)
    assert sp.slot_onehot.shape == (2, T, K)
    # left foot lifts at 1.0 -> inactive from interval covering t>=1.0
    active_left = np.asarray(sp.active[0])
    # interval k covers [0.9+0.06k, ...); midpoint 0.9+0.06k+0.03
    for k in range(T):
        tm = 0.9 + 0.06 * k + 0.03
        exp = 1.0 if (tm < 1.0 or 1.5 <= tm) else 0.0
        assert active_left[k] == exp, (k, tm)
    # each active interval maps to exactly one slot
    oh = np.asarray(sp.slot_onehot)
    np.testing.assert_allclose(oh.sum(-1), np.asarray(sp.active), atol=0)
    # slot 0 of left foot = current stance (not adjustable), slot 1 = next step
    adj = np.asarray(sp.slot_adjustable)
    assert adj[0, 0] == 0.0 and adj[0, 1] == 1.0


def test_mpc_stage_params_jit_vmap():
    plan = contacts.make_alternating_gait(n_steps=6)
    fn = jax.jit(lambda t: contacts.mpc_stage_params(plan, t, 20, 0.06, 4), static_argnums=())
    sp = fn(jnp.asarray(0.9, jnp.float32))
    assert sp.active.shape == (2, 20)
    batched = jax.vmap(lambda t: contacts.mpc_stage_params(plan, t, 20, 0.06, 4))(
        jnp.asarray([0.0, 0.9, 1.2], jnp.float32)
    )
    assert batched.active.shape == (3, 2, 20)


def test_write_back_adjusted_roundtrip():
    plan = contacts.make_alternating_gait(n_steps=6)
    t0 = 0.9
    sp = contacts.mpc_stage_params(plan, t0, 20, 0.06, 4)
    shifted = sp.slot_pos_nom + jnp.asarray([0.005, -0.004, 0.0])
    new_plan = contacts.write_back_adjusted(plan, t0, 4, shifted, sp.slot_valid)
    sp2 = contacts.mpc_stage_params(new_plan, t0, 20, 0.06, 4)
    mask = np.asarray(sp.slot_valid)[..., None]
    np.testing.assert_allclose(
        np.asarray(sp2.slot_pos_nom) * mask, np.asarray(shifted) * mask, atol=1e-6
    )


def test_merge_plans_keeps_mpc_pose_with_mann_timing():
    mann = contacts.make_alternating_gait(n_steps=6)
    mpc = contacts.make_alternating_gait(n_steps=6)
    # pretend the MPC shifted the current stance pose of each foot
    mpc = mpc._replace(pos=mpc.pos + jnp.asarray([0.02, 0.0, 0.0]))
    t = 0.5  # both feet in their initial stance
    merged = contacts.merge_plans(mann, mpc, t)
    idx, in_c = contacts.active_phase(merged, t)
    assert np.all(np.asarray(in_c) == 1.0)
    _, _, pos, _, _ = contacts.gather_phase(merged, idx)
    # pose comes from the MPC plan
    np.testing.assert_allclose(np.asarray(pos[:, 0]), [0.02, 0.02], atol=1e-6)
    # future contacts come from MANN verbatim
    nidx, has_next = contacts.next_phase(merged, t)
    assert np.all(np.asarray(has_next) == 1.0)
    na, _, npos, _, _ = contacts.gather_phase(merged, nidx)
    ma_idx, _ = contacts.next_phase(mann, t)
    ma, _, mpos, _, _ = contacts.gather_phase(mann, ma_idx)
    np.testing.assert_allclose(np.asarray(npos), np.asarray(mpos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(na), np.asarray(ma), atol=1e-6)
