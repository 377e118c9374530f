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


def build_scenarios(
    ctl: WalkingController,
    batch: int,
    seconds: float,
    push_max: float,
    push_duration: float = 0.4,
    vx: float = 0.8,
    ramp: float = 0.0,
    push_t0: float = 0.6,
):
    """B push scenarios: magnitude in [-push_max, push_max], window of
    `push_duration` s starting at `push_t0` s, alternating x/y direction.

    A short pulse (default 0.4 s) tests impulse recovery — absorbable by
    contact forces alone when force authority allows. A sustained push
    (>= 1.5 s) forces the ZMP toward the support boundary for longer than
    force authority can bridge, which is the regime where online footstep
    adjustment (vs pinned footsteps) separates.

    `ramp` > 0 slews the joystick from 0 to vx over that many seconds
    (the rigid plant's measured operating point starts with a 1 s ramp —
    tools/exp_rigid.py --ramp; a step command lurches the physical
    robot)."""
    cfg = ctl.cfg
    S = int(round(seconds / cfg.wbc_dt))
    S = max(cfg.mpc_every, S - S % cfg.mpc_every)  # block-align for run_episode_blocked
    base = constant_inputs(S, (vx, 0.0, 1.0, 0.0))
    if ramp > 0:
        tr = jnp.clip(jnp.arange(S) * cfg.wbc_dt / ramp, 0.0, 1.0)
        base = base._replace(
            joypad=base.joypad
            * jnp.stack([tr, tr, jnp.ones(S), jnp.ones(S)], axis=1)
        )
    mags = jnp.linspace(-push_max, push_max, batch)
    dirs = jnp.stack(
        [jnp.where(jnp.arange(batch) % 2 == 0, 1.0, 0.0), jnp.where(jnp.arange(batch) % 2 == 0, 0.0, 1.0)],
        axis=-1,
    )  # [B, 2]
    i0 = int(push_t0 / cfg.wbc_dt)
    i1 = int((push_t0 + push_duration) / cfg.wbc_dt)
    win = jnp.zeros((S,)).at[i0:i1].set(1.0)
    push = win[None, :, None] * mags[:, None, None] * jnp.pad(dirs, ((0, 0), (0, 1)))[:, None, :]
    inputs = jax.vmap(lambda pf: base._replace(ext_force=pf))(push)
    s0 = ctl.initial_state()
    s0b = jax.tree_util.tree_map(lambda a: jnp.broadcast_to(a, (batch,) + a.shape), s0)
    return s0b, inputs


def _episode_metrics(ctl, s0, inputs, chunk: int):
    """Per-scenario survival metrics via telemetry folding.

    Blocked episodes (the per-tick cond would select-evaluate the MPC stage
    every WBC tick under vmap, ~30x waste) + on-the-fly metric reduction
    (O(1) telemetry memory), chunked with lax.map so 10k scenarios fit one
    chip (a full vmap would materialize [B, 1080, n] SQP Jacobians).
    Returns (supp_dev, z_dev, finite) each [b].
    """
    z0 = s0.x9[..., 2]  # [b] initial CoM height
    zb0 = s0.rb.base_pos[..., 2]  # [b] initial physical base height

    def fold(acc, tel):
        lat, dz, trk, fin, up, bz, zz0 = acc
        com = tel.com_mpc
        # fall signal = CoM leaving the support, NOT world-frame drift: the
        # step-adjustment controller recovers a push by SIDESTEPPING (large
        # world-frame |com_y|, perfectly balanced), so the honest criterion
        # is CoM distance to the stance-feet centroid (tools/diag_push.py:
        # healthy walk < 0.15 m, falls reach 0.5-0.9 m before z blows up)
        fc = tel.foot_contact
        w = fc / jnp.maximum(fc.sum(), 1e-6)
        supp = (w[:, None] * tel.foot_pos_des).sum(0)
        rel = jnp.linalg.norm(com[0:2] - supp[0:2])
        # kinematic-infeasibility signal: the commanded robot's FK CoM can't
        # follow the centroidal-model CoM (healthy walk < 0.07, diag_drift)
        track = jnp.linalg.norm(com[0:2] - tel.com_meas[0:2])
        return (
            jnp.maximum(lat, rel),
            jnp.maximum(dz, jnp.abs(com[2] - zz0)),
            jnp.maximum(trk, track),
            fin & jnp.all(jnp.isfinite(com)) & jnp.isfinite(tel.base_act_up),
            # physical-plant fall signals (rigid mode; constant otherwise):
            # base tilt cosine and base height
            jnp.minimum(up, tel.base_act_up),
            jnp.minimum(bz, tel.base_act_pos[2]),
            zz0,
        )

    def one(args):
        s, i, zz0 = args
        acc0 = (
            jnp.zeros(()), jnp.zeros(()), jnp.zeros(()),
            jnp.asarray(True), jnp.ones(()), jnp.full((), 10.0), zz0,
        )
        _, (lat, dz, trk, fin, up, bz, _) = ctl.run_episode_fold(s, i, fold, acc0)
        return lat, dz, trk, fin, up, bz

    b = z0.shape[0]
    if chunk and b > chunk:
        assert b % chunk == 0, f"batch {b} must divide into chunks of {chunk}"
        resh = lambda a: a.reshape((b // chunk, chunk) + a.shape[1:])
        args = jax.tree_util.tree_map(resh, (s0, inputs, z0))
        outs = jax.lax.map(jax.vmap(one), args)
        return tuple(a.reshape(b) for a in outs) + (zb0,)
    return jax.vmap(one)((s0, inputs, z0)) + (zb0,)


# fall thresholds, calibrated with tools/diag_push.py (healthy walk:
# supp_dev < 0.15, z_dev < 0.05, track_err < 0.07; falls blow well past all)
SUPP_DEV_MAX = 0.4
Z_DEV_MAX = 0.25
TRACK_ERR_MAX = 0.15
# physical-plant thresholds (rigid mode, tools/diag_rigid.py): a standing/
# walking robot keeps base tilt < ~25 deg and never drops its base by 25%
UP_MIN = 0.9
BASE_Z_FRAC_MIN = 0.75


def _shard_metrics(
    ctl, s0, inputs, with_axis: bool, chunk: int = 0,
    up_thresh: float = UP_MIN, model_guards: bool = True,
):
    supp_dev, z_dev, track_err, finite, up_min, bz_min, zb0 = _episode_metrics(
        ctl, s0, inputs, chunk
    )
    if ctl.cfg.rigid is not None:
        # the plant gives the honest fall signal: the physical base tips
        # over or collapses. The model-side criteria stay as guards against
        # adherent-loop divergence. For COMMANDED-WALKING sweeps pass
        # up_thresh=0.7 / model_guards=False (the exp_grid gait criterion:
        # healthy operating-point walking transiently tilts to ~35 deg and
        # the capture-extended steps legitimately run the desired feet
        # ahead of the CoM, so the standing thresholds misread it as a
        # fall; tilt 45 deg / base collapse remain unambiguous).
        survived = (
            finite
            & (up_min > up_thresh)
            & (bz_min > BASE_Z_FRAC_MIN * zb0)
        )
        if model_guards:
            survived = (
                survived & (supp_dev < SUPP_DEV_MAX) & (z_dev < Z_DEV_MAX)
            )
    else:
        survived = (
            finite
            & (supp_dev < SUPP_DEV_MAX)
            & (z_dev < Z_DEV_MAX)
            & (track_err < TRACK_ERR_MAX)
        )
    stats = {
        "survival_rate": jnp.mean(survived.astype(jnp.float32)),
        "mean_supp_dev": jnp.mean(supp_dev),
        "max_supp_dev": jnp.max(supp_dev),
        "max_track_err": jnp.max(track_err),
    }
    if with_axis:
        stats = {
            "survival_rate": jax.lax.pmean(stats["survival_rate"], "batch"),
            "mean_supp_dev": jax.lax.pmean(stats["mean_supp_dev"], "batch"),
            "max_supp_dev": jax.lax.pmax(stats["max_supp_dev"], "batch"),
            "max_track_err": jax.lax.pmax(stats["max_track_err"], "batch"),
        }
    return survived, stats


def run_sweep(
    ctl: WalkingController,
    batch: int,
    seconds: float,
    push_max: float = 2.0,
    use_mesh: bool = False,
    chunk: int = 512,
    per_scenario: bool = False,
    push_duration: float = 0.4,
    vx: float = 0.8,
    ramp: float = 0.0,
    push_t0: float = 0.6,
    up_thresh: float = UP_MIN,
    model_guards: bool = True,
) -> dict:
    s0, inputs = build_scenarios(
        ctl, batch, seconds, push_max, push_duration, vx, ramp, push_t0
    )

    if use_mesh:
        devs = jax.devices()
        n = len(devs)
        assert batch % n == 0, f"batch {batch} must divide over {n} devices"
        mesh = Mesh(np.array(devs), ("batch",))
        fn = jax.jit(
            jax.shard_map(
                lambda s, i: _shard_metrics(
                    ctl, s, i, True, chunk, up_thresh, model_guards
                ),
                mesh=mesh,
                in_specs=(P("batch"), P("batch")),
                out_specs=(P("batch"), P()),
                check_vma=False,
            )
        )
    else:
        fn = jax.jit(
            lambda s, i: _shard_metrics(
                ctl, s, i, False, chunk, up_thresh, model_guards
            )
        )

    survived, stats = fn(s0, inputs)
    out = {
        "batch": batch,
        "survival_rate": round(float(stats["survival_rate"]), 3),
        "mean_supp_dev": round(float(stats["mean_supp_dev"]), 4),
        "max_supp_dev": round(float(stats["max_supp_dev"]), 4),
        "survived": int(np.asarray(survived).sum()),
    }
    surv = np.asarray(survived)
    mags = np.linspace(-push_max, push_max, batch)
    isx = np.arange(batch) % 2 == 0
    # largest |push| below which every weaker same-direction push survived
    # (the "recoverable push set" radius — the paper's step-adjustment claim
    # is that this grows with contact-location decision variables enabled)
    for dname, m in (("x", isx), ("y", ~isx)):
        lim = 0.0
        for a, s in sorted(zip(np.abs(mags[m]), surv[m])):
            if not s:
                break
            lim = a
        out[f"recoverable_push_{dname}"] = round(float(lim), 3)
    if per_scenario:
        out["push_mags"] = [round(float(v), 3) for v in mags]
        out["push_dirs"] = ["x" if v else "y" for v in isx]
        out["survived_mask"] = [bool(v) for v in surv]
    return out
