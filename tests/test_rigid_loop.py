"""Closed loop on the FULL rigid-body dynamics plant (sim/rigid_body.py).

This is the TPU-native equivalent of the reference's Gazebo validation
(worlds/*/world + dockerfiles/centroidal-mpc.yml:44-52): the controller
streams PositionDirect joint commands to a physically simulated robot (PD
servos, penalty ground contact) and closes the loop on *measured* signals
— encoder joints through legged odometry, contact-wrench ZMP — instead of
the adherent kinematic plant.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cmw_tpu.core import kinematics as kin
from cmw_tpu.mann.network import load_mann_weights
from cmw_tpu.runtime.config import ergocub_gazebo_v1
from cmw_tpu.runtime.loop import WalkingController, constant_inputs
from cmw_tpu.sim.rigid_body import RigidBodyConfig

import pytest as _pytest

pytestmark = _pytest.mark.slow  # closed-loop episode compiles (minutes cold on CPU)

MANN4 = (
    "/root/reference/src/centroidal-mpc-walking/config/robots/ergoCubGazeboV1/"
    "onnx_50_mann4_smaller_steps.onnx"
)


@pytest.fixture(scope="module")
def ctl():
    model = kin.ergocub_approx()
    weights = load_mann_weights(MANN4)
    return WalkingController(
        ergocub_gazebo_v1(rigid=RigidBodyConfig()), model, weights
    )


@pytest.fixture(scope="module")
def ctl_walk():
    """The round-3 measured walking operating point (RESULTS.md §5c):
    deeper crouch for knee margin, higher swing clearance against
    pitch-induced scuffing, perfect-state estimation (the estimator
    robustness gap is tracked separately)."""
    from cmw_tpu.wbc.swing_foot import SwingFootConfig

    model = kin.ergocub_approx()
    weights = load_mann_weights(MANN4)
    return WalkingController(
        ergocub_gazebo_v1(
            rigid=RigidBodyConfig(),
            perfect_state=True,
            com_height_drop=0.10,
            swing=SwingFootConfig(step_height=0.07),
        ),
        model,
        weights,
    )


def ramped_inputs(S, vx, ramp_s, dt=0.002):
    base = constant_inputs(S, (vx, 0.0, 1.0, 0.0))
    t = jnp.arange(S) * dt
    r = jnp.clip(t / ramp_s, 0.0, 1.0)
    return base._replace(
        joypad=base.joypad * jnp.stack([r, r, jnp.ones(S), jnp.ones(S)], axis=1)
    )


def test_rigid_initial_state_settled(ctl):
    """The plant settles onto the contact during initial_state: feet loaded
    with ~mg, base at the walk-ready crouch orientation (pitched by
    kin.CROUCH_BASE_PITCH — the Gazebo spawn pose), bootstrap CoM consistent
    with the measured kinematics (the reference's first-iteration bootstrap,
    WholeBodyQPBlock.cpp:1037-1080)."""
    s0 = ctl.initial_state()
    mg = ctl.model.total_mass * 9.80665
    fz = float(jnp.sum(s0.rb.corner_forces[..., 2]))
    assert abs(fz - mg) / mg < 0.1, (fz, mg)
    # settled base within ~3 deg of the polished initial pose's base
    # orientation (the walking crouch after the IK polish — the chest
    # task's world-upright anchoring rotates it off the raw spawn pose)
    _, pol_rot = ctl.polished_initial_pose()
    rel = np.asarray(s0.rb.base_rot) @ np.asarray(pol_rot).T
    assert rel[2, 2] > np.cos(np.radians(3.0)), rel
    assert float(jnp.abs(s0.rb.nu).max()) < 0.1
    # x9 bootstrap = odometry CoM of the settled plant
    assert abs(float(s0.x9[2]) - float(s0.rb.base_pos[2]) + float(s0.root_z_off)) < 0.03


def test_rigid_stand(ctl):
    """Standing (stand-mode) on the physical plant: upright, finite, no
    fall. With zero commanded motion the MANN freezes and the MPC holds
    the stance — the plant must just stand there."""
    S = 900  # 1.8 s
    sN, tel = ctl.run_episode_blocked(
        ctl.initial_state(), constant_inputs(S, (0.0, 0.0, 1.0, 0.0))
    )
    up = np.asarray(tel.base_act_up)
    bz = np.asarray(tel.base_act_pos)[:, 2]
    assert np.isfinite(up).all() and np.isfinite(bz).all()
    assert up.min() > 0.8, up.min()  # bounded tilt at all times
    assert up[-300:].max() > 0.9, up[-300:].max()
    assert bz.min() > 0.55, bz.min()  # no collapse
    assert np.asarray(tel.foot_contact).sum(1).min() >= 1.0


def test_rigid_walk_forward(ctl_walk):
    """GAIT-ENDURANCE REGRESSION GUARD (VERDICT r3 item 8): commanded
    forward walk at the measured round-4 operating point must survive the
    assertion window upright and advancing.

    Round-5 MEASURED the run-to-run spread the round-4 VERDICT asked for
    (weak #1 / item 2): 1e-6 m/s^2 seed perturbations scatter fell_t over
    2.73-4.54 s (8 replicates, median ~3.8 — RESULTS.md §5g), so the
    "4.54 s frontier" is the top of a wide chaotic distribution whose
    measured FLOOR is ~2.7 s. A >=4.0 s guard would therefore be flaky by
    construction; the honest envelope is 3.0 s — above the round-3
    frontier (2.49-2.55 s: a regression to round-3 behavior FAILS this
    test) and just above the measured floor, while leaving margin for
    CPU/TPU divergence. Calibrated against a CPU run of this exact body
    (2026-08-21)."""
    S = 1500  # 3.0 s
    sN, tel = ctl_walk.run_episode_blocked(
        ctl_walk.initial_state(), ramped_inputs(S, 0.8, 1.0)
    )
    up = np.asarray(tel.base_act_up)
    bp = np.asarray(tel.base_act_pos)
    fc = np.asarray(tel.foot_contact)
    assert np.isfinite(bp).all()
    assert up.min() > 0.70, up.min()
    assert bp[:, 2].min() > 0.5, bp[:, 2].min()
    # the PHYSICAL base moved forward through multiple completed steps
    assert bp[-1, 0] - bp[0, 0] > 0.35, bp[-1, 0] - bp[0, 0]
    ss = fc.sum(1) < 1.5
    swing_id = np.where(ss, np.argmin(fc, axis=1), -1)
    steps = int(np.sum((swing_id[1:] != swing_id[:-1]) & (swing_id[1:] >= 0)))
    assert steps >= 3, steps
