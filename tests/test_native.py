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
