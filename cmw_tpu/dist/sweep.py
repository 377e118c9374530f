"""Mesh-sharded batched scenario sweeps (BASELINE config 5).

`run_sweep` builds B perturbed push-recovery scenarios, runs the full
closed loop for each (vmap inside shards), shards the batch over a 1-D
`Mesh(("batch",))` with shard_map when requested, and reduces survival
metrics over ICI with pmean. On a single chip the same code runs without
the mesh; on a multi-host slice `jax.distributed.initialize()` +
process-local shards extend it over DCN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from cmw_tpu.runtime.loop import WalkingController, constant_inputs


def build_scenarios(ctl: WalkingController, batch: int, seconds: float, push_max: float):
    """B push-pulse scenarios: magnitude in [-push_max, push_max], window
    0.4 s starting at 0.6 s, alternating x/y direction."""
    cfg = ctl.cfg
    S = int(round(seconds / cfg.wbc_dt))
    S = max(cfg.mpc_every, S - S % cfg.mpc_every)  # block-align for run_episode_blocked
    base = constant_inputs(S, (0.8, 0.0, 1.0, 0.0))
    mags = jnp.linspace(-push_max, push_max, batch)
    dirs = jnp.stack(
        [jnp.where(jnp.arange(batch) % 2 == 0, 1.0, 0.0), jnp.where(jnp.arange(batch) % 2 == 0, 0.0, 1.0)],
        axis=-1,
    )  # [B, 2]
    i0, i1 = int(0.6 / cfg.wbc_dt), int(1.0 / cfg.wbc_dt)
    win = jnp.zeros((S,)).at[i0:i1].set(1.0)
    push = win[None, :, None] * mags[:, None, None] * jnp.pad(dirs, ((0, 0), (0, 1)))[:, None, :]
    inputs = jax.vmap(lambda pf: base._replace(ext_force=pf))(push)
    s0 = ctl.initial_state()
    s0b = jax.tree_util.tree_map(lambda a: jnp.broadcast_to(a, (batch,) + a.shape), s0)
    return s0b, inputs


def _shard_metrics(ctl, s0, inputs, with_axis: bool):
    # blocked episodes: under vmap the per-tick cond would select-evaluate
    # the MPC stage every WBC tick (~30x waste); the nested-scan form runs
    # it once per MPC period (states here are fresh, so tick%k == 0 holds)
    _, tel = jax.vmap(lambda s, i: ctl.run_episode_blocked(s, i))(s0, inputs)
    com = tel.com_mpc  # [b, S, 3]
    lat_dev = jnp.max(jnp.abs(com[:, :, 1]), axis=1)
    z_dev = jnp.max(jnp.abs(com[:, :, 2] - com[:, :1, 2]), axis=1)
    finite = jnp.all(jnp.isfinite(com), axis=(1, 2))
    survived = finite & (lat_dev < 0.6) & (z_dev < 0.4)
    stats = {
        "survival_rate": jnp.mean(survived.astype(jnp.float32)),
        "mean_lat_dev": jnp.mean(lat_dev),
        "max_lat_dev": jnp.max(lat_dev),
    }
    if with_axis:
        stats = {
            "survival_rate": jax.lax.pmean(stats["survival_rate"], "batch"),
            "mean_lat_dev": jax.lax.pmean(stats["mean_lat_dev"], "batch"),
            "max_lat_dev": jax.lax.pmax(stats["max_lat_dev"], "batch"),
        }
    return survived, stats


def run_sweep(
    ctl: WalkingController,
    batch: int,
    seconds: float,
    push_max: float = 2.0,
    use_mesh: bool = False,
) -> dict:
    s0, inputs = build_scenarios(ctl, batch, seconds, push_max)

    if use_mesh:
        devs = jax.devices()
        n = len(devs)
        assert batch % n == 0, f"batch {batch} must divide over {n} devices"
        mesh = Mesh(np.array(devs), ("batch",))
        fn = jax.jit(
            jax.shard_map(
                lambda s, i: _shard_metrics(ctl, s, i, True),
                mesh=mesh,
                in_specs=(P("batch"), P("batch")),
                out_specs=(P("batch"), P()),
                check_vma=False,
            )
        )
    else:
        fn = jax.jit(lambda s, i: _shard_metrics(ctl, s, i, False))

    survived, stats = fn(s0, inputs)
    return {
        "batch": batch,
        "survival_rate": round(float(stats["survival_rate"]), 3),
        "mean_lat_dev": round(float(stats["mean_lat_dev"]), 4),
        "max_lat_dev": round(float(stats["max_lat_dev"]), 4),
        "survived": int(np.asarray(survived).sum()),
    }
