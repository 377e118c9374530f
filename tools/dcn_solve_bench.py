"""Two-process batched-MPC-solve benchmark over the jax.distributed
control plane (VERDICT r2 item 6): the honest stand-in for BASELINE.md's
"N>=2 hosts" scaling row until real multi-host hardware exists.

Runs the REAL `vmap(CentroidalMPCSolver.solve)` sharded over a GLOBAL
mesh spanning two OS processes (CPU backend; on real hardware the same
program rides DCN), plus a single-process run of the same global batch
for the efficiency denominator. Prints one JSON line:

  {"ok": true, "solves_per_s_2proc": ..., "solves_per_s_1proc": ...,
   "efficiency": ...}

Note: both processes share this host's cores, so efficiency ~0.5 is the
ideal here (same-core budget split across 2 coordinating processes); the
measurement validates the dispatch path + collective overhead, not real
scaling. Run: python tools/dcn_solve_bench.py [--batch 64]
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _free_port() -> int:
    import socket

    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _setup_jax(ndev: int):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={ndev}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


def _bench(jax, mesh, batch_global: int, reps: int):
    """Shard the real batched solve over `mesh` ('batch' axis), return
    solves/s (steady-state, after one warmup)."""
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cmw_tpu.cmpc import CentroidalMPCSolver, ergocub_mpc_config
    from cmw_tpu.core import contacts
    from cmw_tpu.core.centroidal import pack_state
    from cmw_tpu.cmpc.formulation import MPCParams

    cfg = ergocub_mpc_config()
    solver = CentroidalMPCSolver(cfg)
    plan = contacts.snap_to_grid(contacts.make_alternating_gait(n_steps=8), cfg.dt)
    stage = contacts.mpc_stage_params(plan, 1.02, cfg.T, cfg.dt, cfg.n_slots)
    N = cfg.N
    base = MPCParams(
        x0=pack_state(jnp.asarray([0.0, 0.0, 0.7]), jnp.zeros(3), jnp.zeros(3)),
        com_ref=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.7]), (N, 3)),
        ang_mom_ref=jnp.zeros((N, 3)),
        stage=stage,
        ext_force=jnp.zeros(3),
        ext_torque=jnp.zeros(3),
    )

    ndev_local = len(jax.local_devices())
    nproc = jax.process_count()
    per_proc = batch_global // nproc

    # process-local push shard -> global sharded array
    pid = jax.process_index()
    pushes_local = np.zeros((per_proc, 3), np.float32)
    pushes_local[:, 1] = np.linspace(-1.0, 1.0, batch_global)[
        pid * per_proc : (pid + 1) * per_proc
    ]
    sharding = NamedSharding(mesh, P("batch"))
    pushes = jax.make_array_from_process_local_data(
        sharding, pushes_local, global_shape=(batch_global, 3)
    )

    @jax.jit
    def solve_batch(p):
        params = jax.vmap(lambda f: base._replace(ext_force=f))(p)
        warm = jax.vmap(lambda _: solver.cold_start())(jnp.zeros(p.shape[0]))
        sol = jax.vmap(solver.solve)(params, warm)
        # one collective so the program exercises the cross-process path
        return jnp.mean(sol.cost), jnp.max(sol.prim_res)

    mean_cost, prim = solve_batch(pushes)
    float(mean_cost)  # sync
    t = time.perf_counter()
    for _ in range(reps):
        mean_cost, prim = solve_batch(pushes)
        float(mean_cost)
    dt = (time.perf_counter() - t) / reps
    return batch_global / dt, float(mean_cost), float(prim)


def worker(pid: int, port: int, batch: int, reps: int):
    jax = _setup_jax(2)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    import numpy as np
    from jax.sharding import Mesh

    assert jax.process_count() == 2
    mesh = Mesh(np.array(jax.devices()), ("batch",))  # 4 global devices
    rate, cost, prim = _bench(jax, mesh, batch, reps)
    if pid == 0:
        print(json.dumps({"solves_per_s": rate, "mean_cost": cost, "prim": prim}))
    jax.distributed.shutdown()


def single(batch: int, reps: int):
    jax = _setup_jax(4)
    import numpy as np
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()), ("batch",))
    rate, cost, prim = _bench(jax, mesh, batch, reps)
    print(json.dumps({"solves_per_s": rate, "mean_cost": cost, "prim": prim}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--worker", nargs=2, type=int, default=None)  # pid port
    ap.add_argument("--single", action="store_true")
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker[0], args.worker[1], args.batch, args.reps)
        return
    if args.single:
        single(args.batch, args.reps)
        return

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)

    # 1-process reference: same 4 virtual devices, one process
    out1 = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--single",
         "--batch", str(args.batch), "--reps", str(args.reps)],
        capture_output=True, env=env, cwd=REPO, timeout=900,
    )
    if out1.returncode != 0:
        sys.stderr.write(out1.stderr.decode()[-2000:])
        sys.exit(out1.returncode)
    r1 = json.loads(out1.stdout.decode().strip().splitlines()[-1])

    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(pid),
             str(port), "--batch", str(args.batch), "--reps", str(args.reps)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, cwd=REPO,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (out, err) in zip(procs, outs):
        if p.returncode != 0:
            sys.stderr.write(err.decode()[-2000:])
            sys.exit(p.returncode)
    r2 = json.loads(outs[0][0].decode().strip().splitlines()[-1])

    print(json.dumps({
        "ok": True,
        "batch": args.batch,
        "solves_per_s_2proc": round(r2["solves_per_s"], 2),
        "solves_per_s_1proc": round(r1["solves_per_s"], 2),
        "efficiency_2proc_vs_1proc": round(r2["solves_per_s"] / r1["solves_per_s"], 3),
        "mean_cost_match": abs(r1["mean_cost"] - r2["mean_cost"]) < 1e-3,
    }))


if __name__ == "__main__":
    main()
