"""Native runtime (C++ scheduler/mailbox/clock) tests."""

import struct
import time

import pytest

from cmw_tpu.runtime import native


@pytest.fixture(scope="module")
def L():
    return native.lib()  # builds the .so on first use


def test_mailbox_latest_wins(L):
    mb = native.Mailbox()
    seq, data = mb.read()
    assert seq == 0 and data == b""
    mb.write(b"hello")
    mb.write(b"world!")
    seq, data = mb.read()
    assert seq == 2 and data == b"world!"


def test_scheduler_rates_and_stats(L):
    sched = native.Scheduler()
    counts = {"fast": 0, "slow": 0}

    def fast(t):
        counts["fast"] += 1

    def slow(t):
        counts["slow"] += 1

    tf = sched.add_task("fast", 0.002, fast)
    ts = sched.add_task("slow", 0.02, slow)
    sched.start()
    time.sleep(0.5)
    sched.request_stop()
    sched.join()
    assert not sched.any_failed()
    # ~250 fast runs, ~25 slow runs (generous CI margins)
    assert 100 <= counts["fast"] <= 400, counts
    assert 10 <= counts["slow"] <= 40, counts
    st = sched.task_stats(tf)
    assert st["runs"] == counts["fast"]
    assert st["mean_exec_ms"] < 5.0


def test_scheduler_failure_stops_pipeline(L):
    sched = native.Scheduler()
    ran = {"n": 0}

    def dies(t):
        ran["n"] += 1
        return False  # block failure

    def healthy(t):
        pass

    sched.add_task("dies", 0.01, dies)
    sched.add_task("healthy", 0.01, healthy)
    sched.start()
    time.sleep(0.3)
    alive = sched.is_running()
    sched.request_stop()
    sched.join()
    assert sched.any_failed()
    assert not alive  # watchdog view: pipeline stopped itself
    assert ran["n"] == 1


def test_virtual_clock_scale(L):
    sched = native.Scheduler()
    sched.set_time_scale(0.1)  # the reference's RTF-0.1 world
    t0 = sched.clock_now()
    time.sleep(0.2)
    dt = sched.clock_now() - t0
    assert 0.005 < dt < 0.08  # ~0.02 virtual seconds


def test_mailbox_struct_roundtrip(L):
    """The SharedResource<CentroidalMPCInput> pattern: typed payloads."""
    mb = native.Mailbox()
    payload = struct.pack("<9d", *range(9))
    mb.write(payload)
    seq, data = mb.read()
    vals = struct.unpack("<9d", data)
    assert vals == tuple(float(i) for i in range(9))


def test_joypad_mailbox_to_tick_input(L):
    """The joypad -> controller data path (VERDICT r4 item 8): a command
    written through the native Mailbox (the JoypadProvider analog,
    reference JoypadProvider.cpp:32-43) must arrive in the controller's
    TickInput exactly — without constructing the jitted stages."""
    import numpy as np

    from cmw_tpu.runtime.realtime import RealtimeWalker

    rw = RealtimeWalker.__new__(RealtimeWalker)  # skip __init__ (no jit)
    rw.joy_mailbox = native.Mailbox()
    rw.joy_mailbox.write(struct.pack("<4f", 0.0, 0.0, 1.0, 0.0))
    inp = rw._tick_input()
    assert np.allclose(np.asarray(inp.joypad), [0.0, 0.0, 1.0, 0.0])

    RealtimeWalker.set_joypad(rw, 0.7, -0.2, 0.5, 0.5)
    inp = rw._tick_input()
    assert np.allclose(
        np.asarray(inp.joypad), [0.7, -0.2, 0.5, 0.5], atol=1e-6
    )
    # latest-wins semantics (SharedResource double-buffer analog)
    RealtimeWalker.set_joypad(rw, 0.1, 0.0)
    RealtimeWalker.set_joypad(rw, 0.9, 0.0)
    assert float(np.asarray(rw._tick_input().joypad)[0]) == pytest.approx(0.9)


@pytest.mark.slow
def test_realtime_walker_headless_smoke(L):
    """Drive the full interactive pipeline headlessly for a short wall
    window (VERDICT r4 item 8): scheduler start/stop, MPC+WBC tasks
    exchanging state under the lock, joypad injection mid-run. Asserts the
    pipeline survives, ticks advance logical time, and the state stays
    finite — the reference's `cmw-walking` + `cmw-FakeJoypad` smoke
    (Main.cpp:131-160) without a human at the keyboard."""
    import numpy as np

    from cmw_tpu.core import kinematics as kin
    from cmw_tpu.mann.network import load_mann_weights
    from cmw_tpu.runtime.config import ergocub_gazebo_v1
    from cmw_tpu.runtime.loop import WalkingController
    from cmw_tpu.runtime.realtime import RealtimeWalker

    MANN = (
        "/root/reference/src/centroidal-mpc-walking/config/robots/"
        "ergoCubGazeboV1/onnx_50_mann4_smaller_steps.onnx"
    )
    ctl = WalkingController(
        ergocub_gazebo_v1(), kin.ergocub_approx(), load_mann_weights(MANN)
    )
    rw = RealtimeWalker(ctl, time_scale=0.05)
    rw.set_joypad(0.5, 0.0)  # forward command through the mailbox
    stats = rw.run(duration_s=6.0)
    assert not stats["failed"], stats
    assert stats["ticks"] > 0, stats
    assert stats["sim_time"] > 0.0, stats
    assert stats.get("finite", True), stats
    # the WBC task ran and produced finite joint commands
    assert bool(np.isfinite(np.asarray(rw.state.q)).all())
