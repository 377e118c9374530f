"""Closed-loop runtime tests (BASELINE configs 3-4)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmw_tpu.core import kinematics as kin
from cmw_tpu.mann.network import load_mann_weights
from cmw_tpu.runtime import telemetry
from cmw_tpu.runtime.config import ergocub_gazebo_v1
from cmw_tpu.runtime.loop import TickInput, WalkingController, constant_inputs

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
    return WalkingController(ergocub_gazebo_v1(), model, weights)


def test_closed_loop_walk_forward(ctl):
    """MANN-guided MPC walk: finite, contact-consistent, tracks, advances."""
    S = 900  # 1.8 s
    sN, tel = ctl.run_episode(ctl.initial_state(), constant_inputs(S, (1.0, 0.0, 1.0, 0.0)))
    com = np.asarray(tel.com_mpc)
    assert np.isfinite(com).all()
    assert np.isfinite(np.asarray(tel.q)).all()
    # at least one foot planned in contact at all times
    nact = np.asarray(tel.foot_contact).sum(1)
    assert nact.min() >= 1.0
    # the robot moves forward
    assert com[-1, 0] - com[0, 0] > 0.2
    # IK tracks the plant CoM (com_meas = FK of the odometry-estimated
    # robot; transient x offsets during the ballistic part of each step)
    err = np.abs(com - np.asarray(tel.com_meas))
    assert err[:, 0:2].max() < 0.09, err.max(0)
    # MPC stays feasible
    assert float(np.asarray(tel.mpc_prim).max()) < 5e-2
    # both feet step (lift + land at least once each)
    fc = np.asarray(tel.foot_contact)
    assert np.abs(np.diff(fc[:, 0])).sum() >= 2
    assert np.abs(np.diff(fc[:, 1])).sum() >= 2


def test_closed_loop_sn000_slowdown(ctl):
    """The ergoCubSN000 preset (MPC 10 Hz, WBC 200 Hz, slow_down_factor 5)
    walks end-to-end with the 5x-stretched gait timing: the generator
    advances ONE step per MPC tick, contact phases last ~5x the gait-time
    duration, and the realized speed is ~1/5 of the factor-1 gait."""
    from cmw_tpu.runtime.config import ergocub_sn000

    cfg = ergocub_sn000()
    assert cfg.mann_advance == 1 and cfg.mpc_every == 20
    ctl5 = WalkingController(cfg, ctl.model, ctl.weights)
    S = 1200  # 6.0 s at wbc_dt = 5 ms
    sN, tel = ctl5.run_episode_blocked(
        ctl5.initial_state(), constant_inputs(S, (1.0, 0.0, 1.0, 0.0))
    )
    com = np.asarray(tel.com_mpc)
    assert np.isfinite(com).all()
    fc = np.asarray(tel.foot_contact)
    assert fc.sum(1).min() >= 1.0
    # both feet step, but at the slowed cadence: single-support phases
    # last ~0.5 s gait-time * 5 = ~2.5 s real time, so in 6 s we expect
    # only ~1-3 lift/land events per foot (a factor-1 gait would show ~10)
    edges = np.abs(np.diff(fc, axis=0)).sum()
    assert 2 <= edges <= 8, f"cadence wrong under slow_down_factor: {edges} edges"
    # forward progress at the slowed cadence: stride length is gait
    # geometry (unchanged), only the step period stretches 5x, so the
    # speed is ~stride/period ~ 0.1 m/s (measured 0.59 m in 6 s) vs the
    # factor-1 gait's ~0.3+ m/s
    adv = com[-1, 0] - com[0, 0]
    assert 0.05 < adv < 0.9, adv
    # MPC stays feasible through the stretched-phase solves
    assert float(np.asarray(tel.mpc_prim).max()) < 5e-2


def test_closed_loop_sn001_lcm_schedule(ctl):
    """ergoCubSN001's timing is the GENERAL mannCallingTime case:
    factor 5 at a 60 ms MPC period -> lcm = 300 ms, so the generator runs
    every 5th MPC tick and the stored rollout is re-sliced at absolute
    times in between (CentroidalMPCBlock.cpp:262-265,477-500). The loop
    must stay finite, in contact, and produce a continuous CoM reference
    across the between-call re-slices."""
    import dataclasses

    from cmw_tpu.mann.generator import GeneratorConfig

    cfg = dataclasses.replace(
        ergocub_gazebo_v1(), gen=GeneratorConfig(slow_down_factor=5.0)
    )
    assert cfg.mann_call_every == 5 and cfg.mann_advance == 3
    ctl5 = WalkingController(cfg, ctl.model, ctl.weights)
    S = 1500  # 3 s at 2 ms
    sN, tel = ctl5.run_episode_blocked(
        ctl5.initial_state(), constant_inputs(S, (1.0, 0.0, 1.0, 0.0))
    )
    com = np.asarray(tel.com_mpc)
    assert np.isfinite(com).all()
    fc = np.asarray(tel.foot_contact)
    assert fc.sum(1).min() >= 1.0
    assert float(np.asarray(tel.mpc_prim).max()) < 5e-2
    # the CoM reference re-sliced from the stored rollout stays continuous
    # (a broken absolute-time offset shows up as 60 ms-period sawteeth)
    cm = np.asarray(tel.com_mann)
    assert np.abs(np.diff(cm, axis=0)).max() < 0.05, np.abs(np.diff(cm, axis=0)).max()


def test_closed_loop_push_recovery(ctl):
    """Lateral push pulse: bounded response + step adjustment reacts."""
    S = 900
    base = constant_inputs(S, (0.6, 0.0, 1.0, 0.0))
    push = jnp.zeros((S, 3)).at[300:500, 1].set(1.5)  # 0.4 s lateral shove
    inputs = base._replace(ext_force=push)
    sN, tel = ctl.run_episode(ctl.initial_state(), inputs)
    com = np.asarray(tel.com_mpc)
    assert np.isfinite(com).all()
    # bounded lateral deviation (doesn't fall over)
    assert np.abs(com[:, 1]).max() < 0.6
    # response actually happened
    sN0, tel0 = ctl.run_episode(ctl.initial_state(), base)
    com0 = np.asarray(tel0.com_mpc)
    assert np.abs(com[:, 1] - com0[:, 1]).max() > 0.01
    # adjusted footsteps differ from the unpushed run during/after the push
    d = np.abs(np.asarray(tel.adjusted_step) - np.asarray(tel0.adjusted_step))
    assert d[300:, :, :, 1].max() > 5e-3


def test_episode_vmappable(ctl):
    """Batched scenarios (the dist/ sweep building block)."""
    S, B = 240, 3
    base = constant_inputs(S, (0.8, 0.0, 1.0, 0.0))
    pushes = jnp.stack([jnp.zeros((S, 3)).at[100:160, 1].set(0.5 * i) for i in range(B)])
    binputs = jax.vmap(lambda p: base._replace(ext_force=p))(pushes)
    s0 = ctl.initial_state()
    s0b = jax.tree_util.tree_map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), s0)
    fn = jax.jit(jax.vmap(lambda s, i: ctl.run_episode(s, i)))
    sN, tel = fn(s0b, binputs)
    assert tel.com_mpc.shape == (B, S, 3)
    assert np.isfinite(np.asarray(tel.com_mpc)).all()


def test_telemetry_schema_matches_fields():
    """The named-channel SCHEMA stays in lockstep with the Telemetry pytree
    (the reference finalizes its metadata before streaming —
    WholeBodyQPBlock.cpp:712; a drifted schema yields silent empty
    descriptions in saved npz files)."""
    from cmw_tpu.runtime.loop import Telemetry

    assert set(telemetry.SCHEMA.keys()) == set(Telemetry._fields)


def test_telemetry_roundtrip(ctl):
    S = 120
    sN, tel = ctl.run_episode(ctl.initial_state(), constant_inputs(S))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ep.npz")
        telemetry.save(path, tel, ctl.cfg.wbc_dt, extra={"note": "test"})
        chans, meta = telemetry.load(path)
    assert meta["ticks"] == S
    assert meta["note"] == "test"
    np.testing.assert_allclose(chans["com_mpc"], np.asarray(tel.com_mpc))
    assert "zmp_des" in meta["schema"]


def test_blocked_episode_matches_flat(ctl):
    """run_episode_blocked (nested scans, no cond — the vmap-sweep hot path)
    computes the same trajectory as the general per-tick-cond episode.

    The math is identical, but XLA fuses the two scan structures
    differently, so last-ulp rounding differences grow through the
    closed loop (the near-singular straight-knee IK amplifies them);
    assert closeness over two MPC periods plus long-horizon sanity."""
    S = 60  # 2 MPC periods
    inputs = constant_inputs(S, (0.9, 0.1, 1.0, 0.0))
    sA, telA = ctl.run_episode(ctl.initial_state(), inputs)
    sB, telB = ctl.run_episode_blocked(ctl.initial_state(), inputs)
    np.testing.assert_allclose(
        np.asarray(telA.com_mpc), np.asarray(telB.com_mpc), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(telA.q), np.asarray(telB.q), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(telA.zmp_des), np.asarray(telB.zmp_des), rtol=1e-3, atol=1e-5
    )
    # longer blocked run stays finite and in contact
    S2 = 600
    _, tel = ctl.run_episode_blocked(
        ctl.initial_state(), constant_inputs(S2, (0.9, 0.1, 1.0, 0.0))
    )
    assert np.isfinite(np.asarray(tel.com_mpc)).all()
    assert np.asarray(tel.foot_contact).sum(1).min() >= 1.0
