"""Checkpoint/resume (SURVEY.md §5.4): split episode == straight episode."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from cmw_tpu.core import kinematics as kin
from cmw_tpu.mann.network import load_mann_weights
from cmw_tpu.runtime import checkpoint
from cmw_tpu.runtime.config import ergocub_gazebo_v1
from cmw_tpu.runtime.loop import WalkingController, constant_inputs

import pytest as _pytest

pytestmark = _pytest.mark.slow  # closed-loop episode compiles (minutes cold on CPU)

MANN4 = (
    "/root/reference/src/centroidal-mpc-walking/config/robots/ergoCubGazeboV1/"
    "onnx_50_mann4_smaller_steps.onnx"
)


def _slice(inputs, a, b):
    return jax.tree.map(lambda x: x[a:b], inputs)


def test_checkpoint_resume_bit_exact():
    ctl = WalkingController(ergocub_gazebo_v1(), kin.ergocub_approx(), load_mann_weights(MANN4))
    S = 240
    inputs = constant_inputs(S, (1.0, 0.0, 1.0, 0.0))

    s_straight, tel_straight = ctl.run_episode(ctl.initial_state(), inputs)

    s_mid, _ = ctl.run_episode(ctl.initial_state(), _slice(inputs, 0, S // 2))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        checkpoint.save(path, s_mid, meta={"t": float(s_mid.t)})
        assert checkpoint.load_meta(path)["t"] == float(s_mid.t)
        s_restored = checkpoint.load(path, ctl.initial_state())

    # restore is exact (shapes, dtypes, values)
    for a, b in zip(jax.tree.leaves(s_mid), jax.tree.leaves(s_restored)):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resuming reproduces the straight run bit-exactly
    s_resumed, tel2 = ctl.run_episode(s_restored, _slice(inputs, S // 2, S))
    for a, b in zip(jax.tree.leaves(s_straight), jax.tree.leaves(s_resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(tel_straight.com_mpc[S // 2 :]), np.asarray(tel2.com_mpc)
    )


def test_checkpoint_batched_pytree():
    """Vmapped batch of states round-trips (long-sweep splitting)."""
    ctl = WalkingController(ergocub_gazebo_v1(), kin.ergocub_approx(), load_mann_weights(MANN4))
    s0 = ctl.initial_state()
    batch = jax.vmap(lambda i: jax.tree.map(lambda x: x, s0._replace(t=s0.t + 0 * i)))(
        jnp.arange(3, dtype=jnp.float32)
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "b.npz")
        checkpoint.save(path, batch)
        back = checkpoint.load(path, batch)
    for a, b in zip(jax.tree.leaves(batch), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
