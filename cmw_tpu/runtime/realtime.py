"""Interactive real-time walking on the native scheduler.

Faithful re-composition of the reference's process topology
(Main.cpp:62-160): two periodic tasks on the C++ scheduler — "MPC"
(mpc.dt period: MANN + CentroidalMPC stage) and "WBC" (wbc_dt period:
estimator + stabilizer + IK stage) — exchanging state under a lock (the
SharedResource pair), with barrier-synchronized start, quit-signal
handling, a liveness watchdog, and per-task deadline telemetry. A joypad
source (apps/joypad.py, the cmw-FakeJoypad analog) feeds the direction
commands through a mailbox.

Logical time stays tick-driven (deterministic, same results as the batch
scan); the virtual clock's time scale plays the role of the reference's
Gazebo real_time_factor (README.md:51 — they slow the world down when the
solver is slower than real time; under the remote-TPU tunnel we do the
same).
"""

from __future__ import annotations

import struct
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from cmw_tpu.runtime import native
from cmw_tpu.runtime.loop import LoopState, TickInput, WalkingController

_MPC_FIELDS = (
    "warm",
    "plan",
    "forces0",
    "corner0",
    "active0",
    "zmp_des",
    "gen_state",
    "q_reg",
    "chest_yaw",
    "mpc_cost",
    "mpc_prim",
)


class RealtimeWalker:
    def __init__(self, ctl: WalkingController, time_scale: float = 0.1):
        self.ctl = ctl
        self.state = ctl.initial_state()
        self.lock = threading.Lock()
        self.joy_mailbox = native.Mailbox()
        self.joy_mailbox.write(struct.pack("<4f", 0.0, 0.0, 1.0, 0.0))
        self.time_scale = time_scale
        self._mpc_fn = jax.jit(lambda s, i: ctl._mpc_stage(s, i))
        self._wbc_fn = jax.jit(lambda s, i: ctl._wbc_stage(s, i))
        self.telemetry = []
        self.sched = native.Scheduler()

    # -- inputs ----------------------------------------------------------------

    def _tick_input(self) -> TickInput:
        _, data = self.joy_mailbox.read(64)
        joy = struct.unpack("<4f", data[:16]) if len(data) >= 16 else (0, 0, 1, 0)
        return TickInput(
            joypad=jnp.asarray(joy, jnp.float32),
            ext_force=jnp.zeros(3),
            ext_torque=jnp.zeros(3),
        )

    def set_joypad(self, motion_x, motion_y, facing_x=1.0, facing_y=0.0):
        self.joy_mailbox.write(struct.pack("<4f", motion_x, motion_y, facing_x, facing_y))

    # -- tasks -------------------------------------------------------------------

    def _mpc_task(self, _t):
        with self.lock:
            s = self.state
        inp = self._tick_input()
        s2 = self._mpc_fn(s, inp)
        jax.block_until_ready(s2.zmp_des)
        with self.lock:
            # publish only MPC-owned fields (the WBC may have advanced)
            self.state = self.state._replace(
                **{f: getattr(s2, f) for f in _MPC_FIELDS}
            )
        return True

    def _wbc_task(self, _t):
        with self.lock:
            s = self.state
        inp = self._tick_input()
        s2, tel = self._wbc_fn(s, inp)
        jax.block_until_ready(s2.q)
        with self.lock:
            mpc_now = {f: getattr(self.state, f) for f in _MPC_FIELDS}
            self.state = s2._replace(**mpc_now)
        self.telemetry.append(
            (float(s2.t), np.asarray(tel.com_mpc), np.asarray(tel.foot_contact))
        )
        return bool(np.isfinite(np.asarray(s2.q)).all())

    # -- run -----------------------------------------------------------------------

    def warmup(self):
        """Compile both stages before the clocks start (the reference's
        y/n start gate, Main.cpp:118-128, exists for the same reason)."""
        inp = self._tick_input()
        s2 = self._mpc_fn(self.state, inp)
        jax.block_until_ready(s2.zmp_des)
        self.state = self.state._replace(**{f: getattr(s2, f) for f in _MPC_FIELDS})
        s3, _ = self._wbc_fn(self.state, inp)
        jax.block_until_ready(s3.q)

    def run(self, duration_s: float, install_signals: bool = False) -> dict:
        """Run the two-task pipeline for `duration_s` wall seconds."""
        cfg = self.ctl.cfg
        self.warmup()
        scale = self.time_scale
        mpc_id = self.sched.add_task("MPC", cfg.mpc.dt / scale, self._mpc_task)
        wbc_id = self.sched.add_task("WBC", cfg.wbc_dt / scale, self._wbc_task)
        self.sched.set_time_scale(scale)
        if install_signals:
            self.sched.handle_quit_signals()
        self.sched.start()
        t0 = time.monotonic()
        # watchdog loop (Main.cpp:137-145)
        while time.monotonic() - t0 < duration_s and self.sched.is_running():
            time.sleep(0.1)
        self.sched.request_stop()
        self.sched.join()
        stats = {
            "failed": self.sched.any_failed(),
            "mpc": self.sched.task_stats(mpc_id),
            "wbc": self.sched.task_stats(wbc_id),
            "ticks": len(self.telemetry),
            "sim_time": float(self.state.t),
        }
        if self.telemetry:
            com = np.stack([c for (_, c, _) in self.telemetry])
            stats["com_final"] = [round(float(v), 4) for v in com[-1]]
            stats["finite"] = bool(np.isfinite(com).all())
        return stats
