"""Sim plant + estimation-in-the-loop tests (reference robot/sim layer:
YarpSensorBridge / YarpRobotControl / wrench clients, SURVEY.md §2.2)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmw_tpu.core import kinematics as kin
from cmw_tpu.mann.network import load_mann_weights
from cmw_tpu.runtime.config import ergocub_gazebo_v1
from cmw_tpu.runtime.loop import WalkingController, constant_inputs
from cmw_tpu.sim import plant as P

import pytest as _pytest

pytestmark = _pytest.mark.slow  # closed-loop episode compiles (minutes cold on CPU)

MANN4 = (
    "/root/reference/src/centroidal-mpc-walking/config/robots/ergoCubGazeboV1/"
    "onnx_50_mann4_smaller_steps.onnx"
)


@pytest.fixture(scope="module")
def model_weights():
    return kin.ergocub_approx(), load_mann_weights(MANN4)


def test_servo_lag_converges():
    pcfg = P.PlantConfig(servo_tau=0.02)
    q0 = jnp.zeros(4)
    ps = P.initial_state(pcfg, q0)
    cmd = jnp.ones(4)
    for _ in range(200):  # 0.4 s at 2 ms
        ps = P.servo_step(pcfg, ps, cmd, 0.002)
    np.testing.assert_allclose(np.asarray(ps.q_act), 1.0, atol=1e-6)
    # one step moves the exact first-order fraction
    ps1 = P.servo_step(pcfg, P.initial_state(pcfg, q0), cmd, 0.002)
    np.testing.assert_allclose(
        np.asarray(ps1.q_act), 1.0 - np.exp(-0.002 / 0.02), rtol=1e-5
    )


def test_deadband():
    f, tau = P.deadband_wrench(jnp.asarray([0.01, 0.0, 0.0]), jnp.ones(3), mass=56.0)
    assert float(jnp.abs(f).max()) == 0.0 and float(jnp.abs(tau).max()) == 0.0
    f2, tau2 = P.deadband_wrench(jnp.asarray([0.5, 0.0, 0.0]), jnp.ones(3), mass=56.0)
    assert float(f2[0]) == 0.5 and float(tau2[0]) == 1.0


def test_ideal_plant_matches_default_loop(model_weights):
    """PlantConfig() must reduce to the adherent loop bit-exactly."""
    model, weights = model_weights
    S = 120
    inputs = constant_inputs(S, (1.0, 0.0, 1.0, 0.0))
    ctl = WalkingController(ergocub_gazebo_v1(), model, weights)
    assert not ctl.cfg.plant.enabled
    sA, telA = ctl.run_episode(ctl.initial_state(), inputs)
    # servo_tau=0 path is the same trace
    ctl2 = WalkingController(
        ergocub_gazebo_v1(plant=P.PlantConfig(servo_tau=0.0)), model, weights
    )
    sB, telB = ctl2.run_episode(ctl2.initial_state(), inputs)
    np.testing.assert_array_equal(np.asarray(telA.com_mpc), np.asarray(telB.com_mpc))


def test_walk_with_lag_and_noise(model_weights):
    """Realistic plant (20 ms servo, encoder + wrench noise): the estimator
    chain runs on corrupted signals and the robot still walks."""
    model, weights = model_weights
    pcfg = P.PlantConfig(
        servo_tau=0.02, encoder_noise=5e-4, velocity_noise=5e-3, wrench_noise=0.02, seed=7
    )
    ctl = WalkingController(ergocub_gazebo_v1(plant=pcfg), model, weights)
    S = 900  # 1.8 s
    sN, tel = ctl.run_episode(ctl.initial_state(), constant_inputs(S, (1.0, 0.0, 1.0, 0.0)))
    com = np.asarray(tel.com_mpc)
    meas = np.asarray(tel.com_meas)
    assert np.isfinite(com).all() and np.isfinite(meas).all()
    assert np.isfinite(np.asarray(tel.q)).all()
    # still walks forward
    assert com[-1, 0] - com[0, 0] > 0.2
    # the measured CoM (noisy estimated robot) still tracks the plan
    assert np.abs(com[:, 0:2] - meas[:, 0:2]).max() < 0.08
    # plant state advanced and differs from the command (lag is real)
    assert float(jnp.abs(sN.plant.q_act - sN.q).max()) > 1e-5


def test_odometry_feedback_consistency(model_weights):
    """Base estimate from legged odometry stays near the commanded base
    (the IK tracks feet, the odometry anchors them). xy is tight; z is
    looser because the centroidal gait's vertical excursion exceeds what
    the ground-anchored kinematic legs realize (the commanded root rides
    the MPC CoM height, the odometry pins the stance sole to the plan)."""
    model, weights = model_weights
    ctl = WalkingController(ergocub_gazebo_v1(), model, weights)
    S = 600
    _, tel = ctl.run_episode(ctl.initial_state(), constant_inputs(S, (0.8, 0.0, 1.0, 0.0)))
    d = np.abs(np.asarray(tel.base_est_pos) - np.asarray(tel.base_pos))
    assert d[:, 0:2].max() < 0.08, d.max(0)
    assert d[:, 2].max() < 0.15, d.max(0)
