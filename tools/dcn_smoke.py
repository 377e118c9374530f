"""Multi-host (DCN) smoke test: two local processes, jax.distributed.

Exercises the exact wiring `dist/sweep.py`'s docstring promises for a
multi-host slice — `jax.distributed.initialize()` per process, a GLOBAL
1-D `Mesh(("batch",))` spanning both processes' devices, process-local
shards assembled with `jax.make_array_from_process_local_data`, and a
`shard_map` computation whose `pmean`/`pmax` collectives cross the
process boundary (on real hardware: DCN; here: the CPU gloo/tcp backend).

No real multi-host TPU slice exists in this environment (SURVEY §2.3), so
this validates the control plane + collective semantics the same way the
reference "tests" multi-node — by substitution (SURVEY §4). Run directly:

    python tools/dcn_smoke.py            # parent: spawns 2 worker procs

Prints one JSON line {"ok": true, ...} on success; exercised by
tests/test_scaling.py::test_dcn_two_process_smoke.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    """Bind port 0 on a throwaway socket to let the OS pick a free port
    (a hard-coded port hangs the 240 s timeout when occupied, e.g. two
    suites running concurrently on one host)."""
    import socket

    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def worker(pid: int, port: int):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()  # 2 local x 2 processes

    mesh = Mesh(np.array(jax.devices()), ("batch",))
    # process-local shard of a global [8, 3] batch: rows 4*pid .. 4*pid+3
    local = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)[4 * pid : 4 * pid + 4]
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("batch")), local, global_shape=(8, 3)
    )

    @jax.jit
    def reduce(x):
        def shard(x):
            # same collective pattern as dist/sweep._shard_metrics
            m = jax.lax.pmean(jnp.mean(x), "batch")
            mx = jax.lax.pmax(jnp.max(x), "batch")
            return m, mx

        return jax.shard_map(
            shard, mesh=mesh, in_specs=P("batch"), out_specs=(P(), P()), check_vma=False
        )(x)

    m, mx = reduce(x)
    # global mean/max over ALL rows — proves the collective crossed procs
    np.testing.assert_allclose(float(m), np.arange(24.0).mean(), rtol=1e-6)
    np.testing.assert_allclose(float(mx), 23.0)
    if pid == 0:
        print(
            json.dumps(
                {
                    "ok": True,
                    "processes": jax.process_count(),
                    "global_devices": len(jax.devices()),
                    "global_mean": float(m),
                }
            )
        )
    jax.distributed.shutdown()


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
        return
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(pid), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            cwd=REPO,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        if rc != 0:
            sys.stderr.write(err[-2000:])
            sys.exit(rc)
    sys.stdout.write(outs[0][1])


if __name__ == "__main__":
    main()
