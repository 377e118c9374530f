"""Rigid-body plant physics checks (sim/rigid_body.py).

The plant replaces Gazebo (reference worlds/*/world: ODE, 1 ms steps), so
these tests pin the physics itself: inertia consistency with the centroidal
momentum map, Newtonian free fall, energy conservation of the passive
skeleton, and a PD-servo standing equilibrium with ground contact.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmw_tpu.core import kinematics as kin
from cmw_tpu.core.centroidal import GRAVITY
from cmw_tpu.sim import rigid_body as rb


@pytest.fixture(scope="module")
def model():
    return kin.ergocub_approx()


def _posed(model, seed=0, base_z=1.2):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.uniform(-0.3, 0.3, model.nj), jnp.float32)
    base_rot = jnp.eye(3, dtype=jnp.float32)
    base_pos = jnp.asarray([0.0, 0.0, base_z], jnp.float32)
    return q, base_rot, base_pos


def test_mass_matrix_spd_and_momentum_consistency(model):
    """First 6 rows of M @ nu must reproduce the (independently coded)
    centroidal momentum map: linear momentum exactly, angular momentum
    shifted from the CoM to the base origin."""
    q, base_rot, base_pos = _posed(model)
    link_R, link_p = kin.fk(model, q, base_rot, base_pos)
    M = rb.mass_matrix(model, link_R, link_p)
    M = np.asarray(M, np.float64)
    assert np.allclose(M, M.T, atol=1e-3)
    assert np.all(np.linalg.eigvalsh(M) > 0)

    rng = np.random.default_rng(1)
    nu = jnp.asarray(rng.normal(size=6 + model.nj), jnp.float32)
    h = np.asarray(kin.centroidal_momentum(model, link_R, link_p, nu), np.float64)
    Mnu = M @ np.asarray(nu, np.float64)
    np.testing.assert_allclose(Mnu[0:3], h[0:3], rtol=2e-4, atol=2e-4)
    com = np.asarray(kin.com(model, link_R, link_p), np.float64)
    L_base = h[3:6] + np.cross(com - np.asarray(base_pos, np.float64), h[0:3])
    np.testing.assert_allclose(Mnu[3:6], L_base, rtol=2e-4, atol=2e-4)


def test_free_fall_com_acceleration(model):
    """Airborne, unactuated: CoM must accelerate at exactly -g."""
    q, base_rot, base_pos = _posed(model, base_z=5.0)
    cfg = rb.RigidBodyConfig(
        substeps=1, servo_kp=0.0, servo_kd=0.0, servo_ki=0.0, joint_damping=0.0, armature=0.0
    )
    s = rb.initial_state(model, q, base_rot, base_pos, cfg=cfg)
    rng = np.random.default_rng(2)
    s = s._replace(nu=jnp.asarray(0.3 * rng.normal(size=6 + model.nj), jnp.float32))

    def com_vel_of(st):
        lR, lp = kin.fk(model, st.q, st.base_rot, st.base_pos)
        h = kin.centroidal_momentum(model, lR, lp, st.nu)
        return np.asarray(h[0:3], np.float64) / model.total_mass

    dt = 1e-3
    step = jax.jit(
        lambda st: rb.dynamics_step(cfg, model, st, st.q * 0.0, dt)
    )
    vs = [com_vel_of(s)]
    for _ in range(20):
        s = step(s)
        vs.append(com_vel_of(s))
    vs = np.stack(vs)
    # first difference of the CoM velocity = applied acceleration
    # (positions are too f32-quantized for a double difference)
    acc = np.diff(vs, axis=0) / dt
    np.testing.assert_allclose(acc[:, 2], -GRAVITY, rtol=2e-2)
    np.testing.assert_allclose(acc[:, 0:2], 0.0, atol=0.2)


def test_passive_energy_conservation(model):
    """No contact, no actuation, no damping: E = T + V drifts < 1% over
    0.1 s of tumbling."""
    q, base_rot, base_pos = _posed(model, base_z=5.0)
    cfg = rb.RigidBodyConfig(
        substeps=1, servo_kp=0.0, servo_kd=0.0, servo_ki=0.0, joint_damping=0.0, armature=0.0
    )
    s = rb.initial_state(model, q, base_rot, base_pos, cfg=cfg)
    rng = np.random.default_rng(3)
    s = s._replace(nu=jnp.asarray(0.5 * rng.normal(size=6 + model.nj), jnp.float32))

    def energy(st):
        lR, lp = kin.fk(model, st.q, st.base_rot, st.base_pos)
        M = rb.mass_matrix(model, lR, lp)
        T = 0.5 * float(st.nu @ (M @ st.nu))
        c_local = jnp.asarray(model.link_com, jnp.float32)
        cw = lp + jnp.einsum("lij,lj->li", lR, c_local)
        V = GRAVITY * float(jnp.dot(jnp.asarray(model.link_mass, jnp.float32), cw[:, 2]))
        return T + V

    dt = 5e-4
    step = jax.jit(lambda st: rb.dynamics_step(cfg, model, st, st.q * 0.0, dt))
    e0 = energy(s)
    for _ in range(200):
        s = step(s)
    e1 = energy(s)
    assert abs(e1 - e0) / abs(e0) < 0.01, (e0, e1)


def test_standing_equilibrium(model):
    """Feet on the ground, PD servos holding the initial pose: the robot
    settles (sags a few mm onto the penalty contact) and stays standing;
    total normal force approaches m g."""
    q0 = jnp.zeros(model.nj, jnp.float32)
    lR, lp = kin.fk(model, q0, jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))
    fR, fp = kin.frame_poses(model, lR, lp)
    li = model.frame_index("l_sole")
    base_pos = jnp.asarray([0.0, 0.0, -float(fp[li, 2])], jnp.float32)

    cfg = rb.RigidBodyConfig()
    s = rb.initial_state(model, q0, jnp.eye(3, dtype=jnp.float32), base_pos, cfg=cfg)
    dt = 2e-3
    step = jax.jit(lambda st: rb.dynamics_step(cfg, model, st, q0, dt))
    for _ in range(250):  # 0.5 s
        s = step(s)
    assert bool(jnp.isfinite(s.nu).all())
    # base height sank by the contact penetration (< 2 cm), no tipping
    assert abs(float(s.base_pos[2]) - float(base_pos[2])) < 0.02
    assert float(jnp.abs(s.base_pos[0:2]).max()) < 0.02
    rot_err = float(jnp.abs(s.base_rot - jnp.eye(3)).max())
    assert rot_err < 0.05, rot_err
    fz_total = float(s.corner_forces[..., 2].sum())
    mg = model.total_mass * GRAVITY
    assert abs(fz_total - mg) / mg < 0.1, (fz_total, mg)
    # settled: residual velocities small
    assert float(jnp.abs(s.nu).max()) < 0.5
