"""MANN subsystem: ONNX import parity, input builder limits, generator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmw_tpu.core import contacts, kinematics as kin
from cmw_tpu.mann import generator as G
from cmw_tpu.mann import input_builder as IB
from cmw_tpu.mann.network import load_mann_weights, mann_forward
from cmw_tpu.mann.onnx_import import load_onnx_graph
from cmw_tpu.mann.onnx_ref import run_graph

MANN4 = (
    "/root/reference/src/centroidal-mpc-walking/config/robots/ergoCubGazeboV1/"
    "onnx_50_mann4_smaller_steps.onnx"
)
MANN8 = (
    "/root/reference/src/centroidal-mpc-walking/config/robots/ergoCubGazeboV1/"
    "onnx_50_mann8_smaller_steps_wider_legs_and_arms.onnx"
)


@pytest.mark.parametrize("path", [MANN4, MANN8])
def test_mann_forward_matches_onnx_graph(path):
    """JAX forward == generic numpy interpreter of the parsed ONNX graph."""
    g = load_onnx_graph(path)
    w = load_mann_weights(path)
    rng = np.random.default_rng(7)
    for _ in range(3):
        x = rng.normal(size=(1, 124)).astype(np.float32)
        y_ref = run_graph(g, {"input": x})["output"]
        y_jax = np.asarray(mann_forward(w, jnp.asarray(x[0])))
        np.testing.assert_allclose(y_jax, y_ref[0], atol=2e-4)


def test_mann_forward_batched():
    w = load_mann_weights(MANN4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 124)), jnp.float32)
    y = jax.jit(mann_forward, static_argnums=())(w, x)
    assert y.shape == (5, 91)
    y1 = mann_forward(w, x[0])
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(y1), atol=1e-5)


def test_input_builder_ellipsoid_limits():
    cfg = IB.InputBuilderConfig()
    # forward: limit = 3.0 * 0.4 = 1.2 > base_vel_norm -> unclipped 0.4
    d = IB.build_desired_trajectory(jnp.asarray([1.0, 0.0]), jnp.asarray([1.0, 0.0]), cfg)
    np.testing.assert_allclose(np.asarray(d.velocities[0]), [0.4, 0.0], atol=1e-6)
    # sideways: limit = 0.3 * 0.4 = 0.12 < 0.4 -> clipped
    d = IB.build_desired_trajectory(jnp.asarray([0.0, 1.0]), jnp.asarray([1.0, 0.0]), cfg)
    assert np.linalg.norm(np.asarray(d.velocities[0])) == pytest.approx(0.12, rel=1e-3)
    # facing angle clamped to max_facing_angle_forward
    d = IB.build_desired_trajectory(jnp.asarray([1.0, 0.0]), jnp.asarray([0.0, 1.0]), cfg)
    ang = np.arctan2(float(d.facing[0, 1]), float(d.facing[0, 0]))
    assert abs(ang) <= cfg.max_facing_angle_forward + 1e-6
    # zero joystick -> zero velocity, identity facing
    d = IB.build_desired_trajectory(jnp.zeros(2), jnp.zeros(2), cfg)
    np.testing.assert_allclose(np.asarray(d.velocities), 0.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(d.positions), 0.0, atol=1e-8)


def test_plan_from_timeline_roundtrip():
    # synth timeline: left stance [0, 0.3), swing, stance [0.5, ...) open
    S = 50
    dt = 0.02
    times = jnp.arange(S) * dt
    flags = np.zeros((S, 2), np.float32)
    flags[:, 1] = 1.0  # right always down
    flags[0:15, 0] = 1.0
    flags[25:, 0] = 1.0
    pos = np.zeros((S, 2, 3), np.float32)
    pos[25:, 0, 0] = 0.2  # left lands 0.2 ahead
    rot = np.broadcast_to(np.eye(3, dtype=np.float32), (S, 2, 3, 3))
    plan = contacts.plan_from_timeline(
        jnp.asarray(flags), times, jnp.asarray(pos), jnp.asarray(rot), P=8
    )
    v = np.asarray(plan.valid)
    assert v[0].sum() == 2 and v[1].sum() == 1
    np.testing.assert_allclose(np.asarray(plan.act[0, :2]), [0.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(float(plan.deact[0, 0]), 0.3, atol=1e-6)
    assert float(plan.deact[0, 1]) > 1e8  # open
    np.testing.assert_allclose(np.asarray(plan.pos[0, 1]), [0.2, 0, 0], atol=1e-6)


@pytest.fixture(scope="module")
def gen_setup():
    model = kin.ergocub_approx()
    weights = load_mann_weights(MANN4)
    cfg = G.GeneratorConfig()
    q0 = jnp.zeros(26, jnp.float32)
    state = G.initial_state(cfg, model, q0)
    return cfg, model, weights, state


def test_generator_rollout_shapes_and_sanity(gen_setup):
    cfg, model, weights, state = gen_setup
    desired = IB.build_desired_trajectory(jnp.asarray([1.0, 0.0]), jnp.asarray([1.0, 0.0]))
    gen = jax.jit(lambda s, d: G.generate(cfg, model, weights, s, d))
    final, out = gen(state, desired)
    S = cfg.n_steps
    assert out.com.shape == (S, 3)
    assert out.joints.shape == (S, 26)
    assert np.isfinite(np.asarray(out.com)).all()
    assert np.isfinite(np.asarray(out.joints)).all()
    assert np.isfinite(np.asarray(out.ang_mom)).all()
    # com height plausible for a ~0.75 m-hip humanoid
    z = np.asarray(out.com[:, 2])
    assert (z > 0.3).all() and (z < 1.2).all(), z
    # contact flags stay boolean
    c = np.asarray(out.contact)
    assert set(np.unique(c)).issubset({0.0, 1.0})


def test_generator_merge_point_rerooting(gen_setup):
    """Saving the state at step k and restarting reproduces the suffix —
    the reference's mergePointIndex mechanism."""
    cfg, model, weights, state = gen_setup
    desired = IB.build_desired_trajectory(jnp.asarray([0.5, 0.0]), jnp.asarray([1.0, 0.0]))
    # roll 10 steps, saving the state
    s = state
    for _ in range(10):
        s, _ = G.step(cfg, model, weights, s, desired)
    saved = s
    # continue 5 more
    recs_a = []
    for _ in range(5):
        s, r = G.step(cfg, model, weights, s, desired)
        recs_a.append(np.asarray(r.com))
    # re-root from the saved state: identical suffix
    s2 = saved
    recs_b = []
    for _ in range(5):
        s2, r = G.step(cfg, model, weights, s2, desired)
        recs_b.append(np.asarray(r.com))
    np.testing.assert_allclose(np.stack(recs_a), np.stack(recs_b), atol=1e-6)


def test_generator_oracle_parity_40_steps(gen_setup):
    """Trajectory-level parity: the lax.scan generator vs the independent
    numpy/f64 autoregressive oracle (mann/gen_oracle.py — own FK chain, own
    ONNX interpreter) over the full 40-step horizon from the walk-ready
    pose under a forward-walk command. Pins the feature-window layout,
    desired blending, base reconstruction, Schmitt triggers, and the
    CoM/angular-momentum extraction (VERDICT r1 item 5; semantics driven at
    CentroidalMPCBlock.cpp:464-509)."""
    from cmw_tpu.mann import gen_oracle as O

    cfg, model, weights, _ = gen_setup
    q0 = jnp.asarray(kin.walk_ready_pose()[0], jnp.float32)
    state = G.initial_state(cfg, model, q0)
    desired = IB.build_desired_trajectory(jnp.asarray([0.8, 0.0]), jnp.asarray([1.0, 0.0]))
    _, outs = G.generate(cfg, model, weights, state, desired)
    graph = O.load_graph(MANN4)
    rec, s_end = O.rollout_oracle(cfg, model, graph, state, desired)

    # identical contact (gait) sequence — the discrete skeleton must match
    np.testing.assert_array_equal(
        np.asarray(outs.contact, np.float64), rec["contact"]
    )
    # continuous channels: f32 scan vs f64 numpy over 40 autoregressive
    # steps (each through a 200k-param net — outputs O(1)); per-axis
    # tolerances sized well below the quantities' dynamic range
    np.testing.assert_allclose(
        np.asarray(outs.joints, np.float64), rec["joints"], atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(outs.base_xy_yaw, np.float64), rec["base_xy_yaw"], atol=2e-3
    )
    np.testing.assert_allclose(np.asarray(outs.com, np.float64), rec["com"], atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(outs.ang_mom, np.float64), rec["ang_mom"], atol=5e-2
    )
