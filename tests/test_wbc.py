"""WBC + estimation layer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmw_tpu.core import contacts, kinematics as kin, lie
from cmw_tpu.estimation import fixed_foot, legged_odom
from cmw_tpu.wbc import com_zmp, diff_ik, swing_foot, zmp


@pytest.fixture(scope="module")
def model():
    return kin.ergocub_approx()


# --- swing foot -------------------------------------------------------------


def gait():
    return contacts.snap_to_grid(contacts.make_alternating_gait(n_steps=6), 0.06)


def test_swing_foot_stance_holds_pose():
    plan = gait()
    st = swing_foot.evaluate(plan, 0.5)
    np.testing.assert_array_equal(np.asarray(st.in_contact), [1.0, 1.0])
    np.testing.assert_allclose(np.asarray(st.lin_vel), 0.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(st.pos[0]), [0.0, 0.08, 0.0], atol=1e-6)


def test_swing_foot_traj_profile():
    plan = gait()
    # left swings between its first deact (1.02) and second act (1.5)
    t0 = float(plan.deact[0, 0])
    t1 = float(plan.act[0, 1])
    cfg = swing_foot.SwingFootConfig()
    t_apex = t0 + cfg.foot_apex_time * (t1 - t0)
    st_apex = swing_foot.evaluate(plan, t_apex, cfg)
    assert float(st_apex.in_contact[0]) == 0.0
    np.testing.assert_allclose(float(st_apex.pos[0, 2]), cfg.step_height, atol=1e-4)
    # just before landing: close to the next contact pose, small velocity
    st_land = swing_foot.evaluate(plan, t1 - 1e-4, cfg)
    np.testing.assert_allclose(
        np.asarray(st_land.pos[0]), np.asarray(plan.pos[0, 1]), atol=1e-3
    )
    assert abs(float(st_land.lin_vel[0, 2])) < 0.02
    # mid-swing x advances monotonically
    xs = [float(swing_foot.evaluate(plan, t0 + s * (t1 - t0)).pos[0, 0]) for s in (0.2, 0.5, 0.8)]
    assert xs[0] < xs[1] < xs[2]


# --- zmp --------------------------------------------------------------------


def test_foot_zmp_from_wrench():
    # pure vertical force through a point offset (0.02, -0.01) in the sole
    fz = 300.0
    wrench = jnp.asarray([0.0, 0.0, fz, fz * (-0.01), -fz * 0.02, 0.0])
    world, valid, _ = zmp.foot_zmp(wrench, jnp.eye(3), jnp.asarray([1.0, 2.0, 0.0]))
    assert float(valid) == 1.0
    np.testing.assert_allclose(np.asarray(world), [1.02, 1.99, 0.0], atol=1e-6)


def test_global_zmp_weighted():
    w1 = jnp.asarray([0.0, 0.0, 100.0, 0.0, 0.0, 0.0])
    w2 = jnp.asarray([0.0, 0.0, 300.0, 0.0, 0.0, 0.0])
    wr = jnp.stack([w1, w2])
    rot = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
    pos = jnp.asarray([[0.0, 0.1, 0.0], [0.0, -0.1, 0.0]])
    g = zmp.global_zmp(wr, rot, pos)
    np.testing.assert_allclose(np.asarray(g), [0.0, -0.05, 0.0], atol=1e-6)


def test_desired_zmp_from_corners():
    corners = jnp.asarray(
        [[[0.1, 0.0, 0.0], [0.2, 0.0, 0.0], [0.1, 0.1, 0.0], [0.2, 0.1, 0.0]]]
    )
    forces = jnp.zeros((1, 4, 3)).at[0, :, 2].set(jnp.asarray([1.0, 1.0, 1.0, 1.0]))
    z = zmp.desired_zmp_from_corners(forces, corners)
    np.testing.assert_allclose(np.asarray(z), [0.15, 0.05, 0.0], atol=1e-6)


def test_com_zmp_controller_signs():
    g = com_zmp.CoMZMPGains()
    out = com_zmp.com_zmp_control(
        jnp.zeros(2),
        jnp.asarray([0.1, 0.0]),  # com ahead of measured -> speed up +x
        jnp.zeros(2),
        jnp.zeros(2),
        jnp.zeros(2),
        jnp.asarray(0.0),
        g,
    )
    assert float(out[0]) > 0
    out = com_zmp.com_zmp_control(
        jnp.zeros(2), jnp.zeros(2),
        jnp.zeros(2),  # zmp_des
        jnp.zeros(2),
        jnp.asarray([0.05, 0.0]),  # measured zmp ahead -> move com forward
        jnp.asarray(0.0), g,
    )
    assert float(out[0]) > 0


# --- diff IK ----------------------------------------------------------------


def _standing_targets(model, q, base_R, base_p):
    lR, lp = kin.fk(model, q, base_R, base_p)
    fR, fp = kin.frame_poses(model, lR, lp)
    li, ri = model.frame_index("l_sole"), model.frame_index("r_sole")
    c = kin.com(model, lR, lp)
    ridx = model.frame_index("root_link")
    cidx = model.frame_index("chest")
    return diff_ik.IKTargets(
        foot_rot=jnp.stack([fR[li], fR[ri]]),
        foot_pos=jnp.stack([fp[li], fp[ri]]),
        foot_lin_vel=jnp.zeros((2, 3)),
        foot_ang_vel=jnp.zeros((2, 3)),
        com_xy=c[0:2],
        dcom_xy=jnp.zeros(2),
        root_z=fp[ridx, 2],
        droot_z=jnp.asarray(0.0),
        chest_rot=fR[cidx],
        q_reg=q,
    )


def test_ik_at_rest_zero_velocity(model):
    q = jnp.zeros(model.nj)
    base_R, base_p = jnp.eye(3), jnp.asarray([0.0, 0.0, 0.75])
    t = _standing_targets(model, q, base_R, base_p)
    nu = diff_ik.solve_ik(model, q, base_R, base_p, t)
    np.testing.assert_allclose(np.asarray(nu), 0.0, atol=1e-5)


def test_ik_tracks_com_shift(model):
    q = jnp.zeros(model.nj)
    base_R, base_p = jnp.eye(3), jnp.asarray([0.0, 0.0, 0.75])
    t = _standing_targets(model, q, base_R, base_p)
    t = t._replace(dcom_xy=jnp.asarray([0.1, 0.0]))  # want com moving +x
    nu = diff_ik.solve_ik(model, q, base_R, base_p, t)
    lR, lp = kin.fk(model, q, base_R, base_p)
    # com velocity == commanded, feet stationary
    Jc = kin.com_jacobian(model, lR, lp)
    np.testing.assert_allclose(np.asarray(Jc @ nu)[0:2], [0.1, 0.0], atol=1e-4)
    for f in ("l_sole", "r_sole"):
        J = kin.frame_jacobian(model, lR, lp, model.frame_index(f))
        np.testing.assert_allclose(np.asarray(J @ nu), 0.0, atol=1e-4)


def test_ik_closed_loop_converges_to_shifted_com(model):
    """Integrate IK commands: the CoM converges to a shifted target."""
    q = jnp.zeros(model.nj)
    base_R, base_p = jnp.eye(3), jnp.asarray([0.0, 0.0, 0.75])
    t0 = _standing_targets(model, q, base_R, base_p)
    target = t0._replace(com_xy=t0.com_xy + jnp.asarray([0.03, -0.02]))
    dt = 0.01
    for _ in range(200):
        nu = diff_ik.solve_ik(model, q, base_R, base_p, target)
        base_R, base_p = lie.integrate_mixed_velocity(base_R, base_p, nu[0:3], nu[3:6], dt)
        q = q + dt * nu[6:]
    lR, lp = kin.fk(model, q, base_R, base_p)
    c = kin.com(model, lR, lp)
    np.testing.assert_allclose(np.asarray(c[0:2]), np.asarray(target.com_xy), atol=2e-3)
    # feet stayed put
    fR, fp = kin.frame_poses(model, lR, lp)
    np.testing.assert_allclose(float(fp[model.frame_index("l_sole"), 2]), 0.0, atol=2e-3)


def test_eq_box_qp_matches_eq_qp_when_loose():
    """solve_eq_box_qp with a wide box reproduces the equality-only KKT
    solution (the reference's exact ik.ini stack has no inequalities)."""
    from cmw_tpu.cmpc.qp import solve_eq_box_qp, solve_eq_qp

    rng = np.random.default_rng(0)
    n, m = 12, 4
    M = rng.normal(size=(n, n))
    H = jnp.asarray(M @ M.T + n * np.eye(n), jnp.float32)
    g = jnp.asarray(rng.normal(size=n), jnp.float32)
    A = jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
    b = jnp.asarray(rng.normal(size=m), jnp.float32)
    mask = jnp.ones(n, jnp.float32)
    x_eq = solve_eq_qp(H, g, A, b)
    x_box = solve_eq_box_qp(
        H, g, A, b, mask, -1e6 * jnp.ones(n), 1e6 * jnp.ones(n), iters=60
    )
    np.testing.assert_allclose(np.asarray(x_box), np.asarray(x_eq), atol=1e-4)


def test_eq_box_qp_clamps_active_box():
    """A binding box coordinate lands on its bound; equality rows stay
    satisfied; KKT stationarity holds on the free coordinates."""
    from cmw_tpu.cmpc.qp import solve_eq_box_qp

    n, m = 6, 2
    H = jnp.eye(n, dtype=jnp.float32)
    # unconstrained optimum v = g = 2*ones
    g = 2.0 * jnp.ones(n, jnp.float32)
    A = jnp.zeros((m, n), jnp.float32).at[0, 0].set(1.0).at[1, 1].set(1.0)
    b = jnp.asarray([0.5, -0.5], jnp.float32)
    mask = jnp.concatenate([jnp.zeros(2), jnp.ones(4)]).astype(jnp.float32)
    lo = jnp.full((n,), -1e6, jnp.float32).at[2].set(-1.0).at[3].set(-1.0)
    hi = jnp.full((n,), 1e6, jnp.float32).at[2].set(1.0).at[3].set(0.3)
    x = solve_eq_box_qp(H, g, A, b, mask, lo, hi, iters=100)
    x = np.asarray(x)
    np.testing.assert_allclose(x[0], 0.5, atol=1e-3)  # equality rows exact
    np.testing.assert_allclose(x[1], -0.5, atol=1e-3)
    np.testing.assert_allclose(x[2], 1.0, atol=1e-3)  # clamped at hi
    np.testing.assert_allclose(x[3], 0.3, atol=1e-3)  # clamped at hi
    np.testing.assert_allclose(x[4:], 2.0, atol=1e-3)  # free coords at optimum


def test_ik_joint_limit_box_respected(model):
    """A tight velocity box saturates the box-only coordinates (arm joints,
    driven purely by the soft posture task, so the box never conflicts
    with the hard rows) while the hard foot rows remain exact. NB hard
    task rows stay EQUALITIES — a box inconsistent with them is resolved
    in the equalities' favor, matching the task priorities."""
    q, base_rot = kin.walk_ready_pose()
    q = jnp.asarray(q)
    base_R, base_p = jnp.asarray(base_rot), jnp.asarray([0.0, 0.0, 0.75])
    t = _standing_targets(model, q, base_R, base_p)
    # demand a big arm swing via the posture task
    el = model.joint_index("l_elbow")
    t = t._replace(q_reg=q.at[el].add(1.0))
    nu_free = diff_ik.solve_ik(model, q, base_R, base_p, t)
    cap = 0.3 * float(jnp.abs(nu_free[6 + el]))
    t_lim = t._replace(
        qd_lo=jnp.full((model.nj,), -cap), qd_hi=jnp.full((model.nj,), cap)
    )
    nu = diff_ik.solve_ik(model, q, base_R, base_p, t_lim)
    qd = np.asarray(nu[6:])
    assert abs(qd[el]) <= cap * 1.02 + 1e-5, (qd[el], cap)
    assert abs(qd[el]) >= cap * 0.9, (qd[el], cap)  # it saturates, not dies
    # hard foot rows still exact
    lR, lp = kin.fk(model, q, base_R, base_p)
    for f in ("l_sole", "r_sole"):
        J = kin.frame_jacobian(model, lR, lp, model.frame_index(f))
        np.testing.assert_allclose(np.asarray(J @ nu), 0.0, atol=2e-3)


def test_ik_chest_w_rp_stiffens_pitch_tracking(model):
    """chest_w_rp multiplies the chest task's roll/pitch weight rows:
    1 (or None) keeps the reference ik.ini behavior bit-for-bit at the
    math level; large values make a pitched-forward chest target win
    against the posture regularization (the §5d backward-torso-pitch
    terminal mode is exactly this soft-task contest)."""
    q, base_rot = kin.walk_ready_pose()
    q = jnp.asarray(q)
    base_R, base_p = jnp.asarray(base_rot), jnp.asarray([0.0, 0.0, 0.75])
    t = _standing_targets(model, q, base_R, base_p)
    # pitched-forward chest target conflicting with q_reg = current pose
    t = t._replace(
        chest_rot=lie.so3_exp(jnp.asarray([0.0, 0.2, 0.0])) @ t.chest_rot
    )
    lR, lp = kin.fk(model, q, base_R, base_p)
    Jc = kin.frame_jacobian(model, lR, lp, model.frame_index("chest"))[3:6]

    nu_none = diff_ik.solve_ik(model, q, base_R, base_p, t)
    nu_one = diff_ik.solve_ik(
        model, q, base_R, base_p, t._replace(chest_w_rp=jnp.asarray(1.0))
    )
    np.testing.assert_allclose(np.asarray(nu_one), np.asarray(nu_none), atol=1e-6)

    wy_none = float((Jc @ nu_none)[1])  # achieved chest pitch rate
    nu_stiff = diff_ik.solve_ik(
        model, q, base_R, base_p, t._replace(chest_w_rp=jnp.asarray(100.0))
    )
    wy_stiff = float((Jc @ nu_stiff)[1])
    # commanded rate is kp_chest * 0.2 = 1.0 rad/s: the reference
    # weighting concedes ~20% of it to the posture task (measured 0.81);
    # the stiff solve must recover nearly all of it
    assert wy_stiff > wy_none > 0.0, (wy_stiff, wy_none)
    assert wy_stiff > 0.95 * 1.0, (wy_stiff, wy_none)
    # hard foot rows stay exact either way
    for f in ("l_sole", "r_sole"):
        J = kin.frame_jacobian(model, lR, lp, model.frame_index(f))
        np.testing.assert_allclose(np.asarray(J @ nu_stiff), 0.0, atol=1e-4)


# --- estimation -------------------------------------------------------------


def test_fixed_foot_detector_on_gait():
    plan = gait()
    # during left swing (1.02..1.5 snapped) the right foot is fixed
    ff = fixed_foot.detect(plan, 1.2)
    assert int(ff.index) == 1
    # during right swing the left foot is fixed
    t_r = float(plan.deact[1, 0]) + 0.1
    ff = fixed_foot.detect(plan, t_r)
    assert int(ff.index) == 0


def test_legged_odometry_roundtrip(model):
    """FK with the estimated base puts the fixed sole at its pinned pose."""
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.uniform(-0.2, 0.2, model.nj), jnp.float32)
    pin_R = lie.rotz(jnp.asarray(0.3, jnp.float32))
    pin_p = jnp.asarray([0.5, 0.1, 0.0], jnp.float32)
    st = legged_odom.OdometryState(
        fixed_index=jnp.asarray(0), fixed_rot=pin_R, fixed_pos=pin_p
    )
    base_R, base_p = legged_odom.base_pose(model, st, q)
    lR, lp = kin.fk(model, q, base_R, base_p)
    fR, fp = kin.frame_poses(model, lR, lp)
    li = model.frame_index("l_sole")
    np.testing.assert_allclose(np.asarray(fp[li]), np.asarray(pin_p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fR[li]), np.asarray(pin_R), atol=1e-5)


def test_legged_odometry_twist_nullifies_sole(model):
    rng = np.random.default_rng(12)
    q = jnp.asarray(rng.uniform(-0.2, 0.2, model.nj), jnp.float32)
    qd = jnp.asarray(rng.uniform(-0.5, 0.5, model.nj), jnp.float32)
    st = legged_odom.OdometryState(
        fixed_index=jnp.asarray(1), fixed_rot=jnp.eye(3), fixed_pos=jnp.asarray([0.0, -0.1, 0.0])
    )
    base_R, base_p = legged_odom.base_pose(model, st, q)
    tw = legged_odom.base_twist(model, st, q, qd, base_R, base_p)
    lR, lp = kin.fk(model, q, base_R, base_p)
    J = kin.frame_jacobian(model, lR, lp, model.frame_index("r_sole"))
    sole_vel = J @ jnp.concatenate([tw, qd])
    np.testing.assert_allclose(np.asarray(sole_vel), 0.0, atol=1e-4)
