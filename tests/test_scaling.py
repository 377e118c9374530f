"""Scaling harness smoke test on the virtual CPU mesh."""


def test_scaling_measure_runs_sharded():
    from cmw_tpu.apps.scaling import measure

    rate = measure(n_dev=2, per_device=2, reps=1, chain=1)
    assert rate > 0
