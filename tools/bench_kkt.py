"""A/B the KKT x-update implementations (dense vs riccati) with the
bench.py measurement shape: B=512 items, KB=4 chained warm-started
solves per dispatch, 5 reps. Prints one line per impl.

Usage: python tools/bench_kkt.py [dense|riccati|both] [-b B]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

if "cpu" in _sys.argv:
    jax.config.update("jax_platforms", "cpu")

from cmw_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

from cmw_tpu.cmpc import CentroidalMPCSolver, ergocub_mpc_config
from cmw_tpu.cmpc import formulation as F
from cmw_tpu.core import contacts
from cmw_tpu.core.centroidal import pack_state

B = int(_sys.argv[_sys.argv.index("-b") + 1]) if "-b" in _sys.argv else 512
KB = 4
which = next((a for a in _sys.argv[1:] if a in ("dense", "riccati", "both")), "both")


def bench(cfg, label):
    solver = CentroidalMPCSolver(cfg)
    plan = contacts.snap_to_grid(contacts.make_alternating_gait(n_steps=8), cfg.dt)
    stage = contacts.mpc_stage_params(plan, 1.02, cfg.T, cfg.dt, cfg.n_slots)
    N = cfg.N
    com_ref = jnp.asarray([0.0, 0.0, 0.7]) + 0.08 * cfg.dt * jnp.arange(N)[
        :, None
    ] * jnp.asarray([1.0, 0.0, 0.0])
    base = F.MPCParams(
        x0=pack_state(jnp.asarray([0.0, 0.0, 0.7]), jnp.zeros(3), jnp.zeros(3)),
        com_ref=com_ref,
        ang_mom_ref=jnp.zeros((N, 3)),
        stage=stage,
        ext_force=jnp.zeros(3),
        ext_torque=jnp.zeros(3),
    )
    pushes = jnp.zeros((B, 3)).at[:, 1].set(jnp.linspace(-1.0, 1.0, B))
    params = jax.vmap(lambda p: base._replace(ext_force=p))(pushes)
    warm = jax.vmap(lambda _: solver.cold_start())(jnp.arange(B))

    def chain(w, _):
        sol = jax.vmap(solver.solve)(params, w)
        return jax.vmap(solver.warm_from)(params, sol), (sol.cost, sol.prim_res)

    fn = jax.jit(lambda w: jax.lax.scan(chain, w, None, length=KB)[1])
    sync = lambda o: float(o[0].sum())
    t0 = time.perf_counter()
    out = fn(warm)
    sync(out)
    compile_s = time.perf_counter() - t0
    reps = 5
    t = time.perf_counter()
    for _ in range(reps):
        sync(fn(warm))
    dt = (time.perf_counter() - t) / reps / KB
    cost = np.asarray(out[0])[-1]
    prim = np.asarray(out[1])[-1]
    print(
        f"{label:10s} {B/dt:10.1f} solves/s  compile {compile_s:6.1f}s  "
        f"mean cost {cost.mean():9.3f}  max prim {prim.max():.2e}"
    )
    return B / dt, cost


if which in ("dense", "both"):
    r_d = bench(ergocub_mpc_config(kkt_impl="dense"), "dense")
if which in ("riccati", "both"):
    r_r = bench(ergocub_mpc_config(kkt_impl="riccati"), "riccati")
if which == "both":
    print(f"speedup: {r_r[0]/r_d[0]:.3f}x   cost agreement: "
          f"{np.max(np.abs(r_r[1]-r_d[1]))/ (1+np.abs(r_d[1]).max()):.2e}")
