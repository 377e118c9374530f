"""Fixed-shape contact plans: the TPU-native `ContactPhaseList`.

The reference manipulates variable-length `Contacts::ContactPhaseList` /
`ContactList` objects (BLF; consumed throughout CentroidalMPCBlock.cpp and
WholeBodyQPBlock.cpp). On TPU everything must be shape-static, so a plan is a
pytree of padded arrays: per contact (foot) up to P phases, each with
activation/deactivation time, pose, and a validity flag. Invalid phases are
padded with +BIG times so time comparisons are naturally vacuous.

Key operations (with reference call sites):
  - active_phase / next_phase        <-> ContactList::getActiveContact /
                                         getNextContact
  - snap_to_grid                     <-> ContactPhaseList::forceSampleTime
                                         (CentroidalMPCBlock.cpp:588)
  - merge_plans                      <-> updateContactPhaseList
                                         (CentroidalMPCBlock.cpp:32-110)
  - mpc_stage_params                 <-> the NLP parameter packing inside
                                         BLF CentroidalMPC (SURVEY.md §2.4)

All functions are jittable and vmappable over a leading batch axis of the
plan arrays (use jax.vmap; no data-dependent shapes anywhere).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

BIG_TIME = 1e9


class ContactPlan(NamedTuple):
    """Padded footstep plan. nc contacts (0=left, 1=right), P phase slots."""

    act: jnp.ndarray  # [nc, P] activation times (s); BIG_TIME if invalid
    deact: jnp.ndarray  # [nc, P] deactivation times (s); BIG_TIME if invalid
    pos: jnp.ndarray  # [nc, P, 3] contact (sole) position, world
    rot: jnp.ndarray  # [nc, P, 3, 3] contact orientation, world
    valid: jnp.ndarray  # [nc, P] {0., 1.}

    @property
    def num_contacts(self):
        return self.act.shape[-2]

    @property
    def num_phases(self):
        return self.act.shape[-1]


def empty_plan(nc: int = 2, P: int = 16, dtype=jnp.float32) -> ContactPlan:
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (nc, P, 3, 3))
    return ContactPlan(
        act=jnp.full((nc, P), BIG_TIME, dtype),
        deact=jnp.full((nc, P), BIG_TIME, dtype),
        pos=jnp.zeros((nc, P, 3), dtype),
        rot=eye,
        valid=jnp.zeros((nc, P), dtype),
    )


_T_TOL = 1e-4  # half-tick slack: f32 time accumulation vs grid-snapped phases


def _phase_mask_at(plan: ContactPlan, t) -> jnp.ndarray:
    """[nc, P] mask of phases active at time t (act <= t < deact), with a
    small tolerance so accumulated-f32 times at exact phase boundaries
    resolve to the newly-started phase."""
    return plan.valid * (plan.act <= t + _T_TOL) * (t + _T_TOL < plan.deact)


def active_phase(plan: ContactPlan, t):
    """Per contact: (phase index, in_contact flag) at time t.

    Mirrors ContactList::getActiveContact (used e.g. at
    CentroidalMPCBlock.cpp:70, WholeBodyQPBlock.cpp:1092-1119).
    """
    m = _phase_mask_at(plan, t)
    idx = jnp.argmax(m, axis=-1)
    return idx, jnp.max(m, axis=-1)


def next_phase(plan: ContactPlan, t):
    """Per contact: (index of first phase with act > t, exists flag)."""
    m = plan.valid * (plan.act > t)
    idx = jnp.argmax(m, axis=-1)
    return idx, jnp.max(m, axis=-1)


def present_phase(plan: ContactPlan, t):
    """Per contact: last phase with act <= t (active or most recent).

    Mirrors ContactList::getPresentContact.
    """
    m = plan.valid * (plan.act <= t)
    # last True: argmax over reversed
    P = plan.act.shape[-1]
    rev = jnp.flip(m, axis=-1)
    idx = P - 1 - jnp.argmax(rev, axis=-1)
    return idx, jnp.max(m, axis=-1)


def gather_phase(plan: ContactPlan, idx):
    """Gather per-contact phase data at per-contact indices idx [nc]."""
    take = lambda a: jnp.take_along_axis(
        a, idx.reshape(idx.shape + (1,) * (a.ndim - idx.ndim)), axis=1
    ).squeeze(1)
    return take(plan.act), take(plan.deact), take(plan.pos), take(plan.rot), take(plan.valid)


def snap_to_grid(plan: ContactPlan, dt: float) -> ContactPlan:
    """Round phase boundaries to the MPC grid (forceSampleTime(dT),
    CentroidalMPCBlock.cpp:588)."""
    snap = lambda t: jnp.where(plan.valid > 0, jnp.round(t / dt) * dt, t)
    return plan._replace(act=snap(plan.act), deact=snap(plan.deact))


def merge_plans(mann: ContactPlan, mpc: ContactPlan, t) -> ContactPlan:
    """Receding-horizon contact merge (updateContactPhaseList,
    CentroidalMPCBlock.cpp:32-110).

    For each foot: keep all *future* MANN contacts (act > t) verbatim; for the
    *current* contact, keep the MPC-adjusted pose but the MANN timing. If the
    MPC has no active contact at t, fall through to MANN-only.
    """
    P = mann.num_phases
    # future mann phases (act > t) keep; shift them to start at slot 1,
    # slot 0 holds the merged current contact (or is invalidated).
    mpc_idx, mpc_active = active_phase(mpc, t)
    mann_idx, mann_active = active_phase(mann, t)
    mpc_act_t, _, mpc_pos, mpc_rot, _ = gather_phase(mpc, mpc_idx)
    m_act, m_deact, mann_pos, mann_rot, _ = gather_phase(mann, mann_idx)

    use_merged = mpc_active * mann_active  # [nc]

    # Build output: phase j of the output = (j==current_mann_idx) ? merged :
    # mann phase j, but drop mann phases with act <= t that are not current.
    is_future = mann.valid * (mann.act > t)
    is_current = jnp.zeros_like(mann.valid).at[
        jnp.arange(mann.valid.shape[0]), mann_idx
    ].set(mann_active)
    keep = jnp.maximum(is_future, is_current)

    sel = is_current * use_merged[:, None]  # [nc, P]: use mpc pose on current
    pos = jnp.where(sel[..., None] > 0, mpc_pos[:, None, :], mann.pos)
    rot = jnp.where(sel[..., None, None] > 0, mpc_rot[:, None, :, :], mann.rot)

    act = jnp.where(keep > 0, mann.act, BIG_TIME)
    deact = jnp.where(keep > 0, mann.deact, BIG_TIME)
    valid = keep

    # The regenerated MANN timeline only starts at t, so its "current" phase
    # activation is clipped to ~t; restore the true activation time from the
    # previous plan (the reference's generator keeps continuous history, so
    # its mann timing already carries the real activation).
    act = jnp.where(
        sel > 0, jnp.minimum(act, mpc_act_t[:, None]), act
    )

    # A foot swinging at t has no active contact in either plan, but the
    # swing planner must interpolate FROM its previous stance pose — retain
    # the old plan's most recent past phase in the (free) last slot.
    prev_idx, has_prev = present_phase(mpc, t)
    pa, pd, ppos, prot, _ = gather_phase(mpc, prev_idx)
    keep_past = (1.0 - mann_active) * has_prev  # [nc]
    act = act.at[:, P - 1].set(jnp.where(keep_past > 0, pa, act[:, P - 1]))
    deact = deact.at[:, P - 1].set(
        jnp.where(keep_past > 0, jnp.minimum(pd, t), deact[:, P - 1])
    )
    valid = valid.at[:, P - 1].set(jnp.maximum(valid[:, P - 1], keep_past))
    pos = pos.at[:, P - 1].set(
        jnp.where(keep_past[:, None] > 0, ppos, pos[:, P - 1])
    )
    rot = rot.at[:, P - 1].set(
        jnp.where(keep_past[:, None, None] > 0, prot, rot[:, P - 1])
    )

    return ContactPlan(act=act, deact=deact, pos=pos, rot=rot, valid=valid)


class MPCStageParams(NamedTuple):
    """Fixed-shape per-horizon contact parameters for the MPC solver.

    Shapes: T force intervals, nc contacts, K adjustable-position slots.
    """

    active: jnp.ndarray  # [nc, T] contact active during interval k
    slot_onehot: jnp.ndarray  # [nc, T, K] interval -> position-slot map
    slot_pos_nom: jnp.ndarray  # [nc, K, 3] nominal (planned) contact position
    slot_rot: jnp.ndarray  # [nc, K, 3, 3] contact orientation (not decided)
    slot_valid: jnp.ndarray  # [nc, K]
    slot_adjustable: jnp.ndarray  # [nc, K] 1 if contact starts in the future
    slot_act: jnp.ndarray  # [nc, K] phase activation times (warm-start keying)
    slot_deact: jnp.ndarray  # [nc, K]


def mpc_stage_params(plan: ContactPlan, t0, T: int, dt: float, K: int) -> MPCStageParams:
    """Pack a contact plan into fixed-shape MPC parameters.

    Interval k covers [t0 + k dt, t0 + (k+1) dt); a contact is active on the
    interval if its phase contains the interval start (+ half-step to be
    robust to grid snapping ties).
    """
    nc, P = plan.act.shape
    tk = t0 + dt * jnp.arange(T, dtype=plan.act.dtype) + 0.5 * dt  # [T]
    # [nc, T, P] phase membership per interval
    m = (
        plan.valid[:, None, :]
        * (plan.act[:, None, :] <= tk[None, :, None])
        * (tk[None, :, None] < plan.deact[:, None, :])
    )
    active = jnp.max(m, axis=-1)  # [nc, T]
    phase_idx = jnp.argmax(m, axis=-1)  # [nc, T]

    # first phase still relevant at t0 (deact > t0): the "slot 0" phase
    rel = plan.valid * (plan.deact > t0 + 0.5 * dt)
    first = jnp.argmax(rel, axis=-1)  # [nc]
    has_rel = jnp.max(rel, axis=-1)

    slot = phase_idx - first[:, None]  # [nc, T]
    slot_oh = (
        (slot[..., None] == jnp.arange(K)[None, None, :])
        * active[..., None]
        * has_rel[:, None, None]
    ).astype(plan.act.dtype)

    # slot -> phase gather
    slot_phase = jnp.clip(first[:, None] + jnp.arange(K)[None, :], 0, P - 1)  # [nc, K]
    take = lambda a: jnp.take_along_axis(
        a, slot_phase.reshape(slot_phase.shape + (1,) * (a.ndim - 2)), axis=1
    )
    slot_valid = (
        take(plan.valid)
        * (first[:, None] + jnp.arange(K)[None, :] < P)
        * has_rel[:, None]
    )
    slot_act = take(plan.act)
    slot_deact = take(plan.deact)
    slot_pos = take(plan.pos)
    slot_rot = take(plan.rot)
    slot_adj = slot_valid * (slot_act > t0 + 0.5 * dt)

    return MPCStageParams(
        active=active.astype(plan.act.dtype),
        slot_onehot=slot_oh,
        slot_pos_nom=slot_pos,
        slot_rot=slot_rot,
        slot_valid=slot_valid.astype(plan.act.dtype),
        slot_adjustable=slot_adj.astype(plan.act.dtype),
        slot_act=slot_act,
        slot_deact=slot_deact,
    )


def write_back_adjusted(plan: ContactPlan, t0, K: int, slot_pos, slot_valid) -> ContactPlan:
    """Write MPC-adjusted slot positions back into the plan (the MPC output's
    updated ContactPhaseList, consumed by the WBC swing-foot planners at
    WholeBodyQPBlock.cpp:1092-1119)."""
    nc, P = plan.act.shape
    rel = plan.valid * (plan.deact > t0)
    first = jnp.argmax(rel, axis=-1)
    has_rel = jnp.max(rel, axis=-1)
    # scatter slot_pos into phases first..first+K-1 where slot_valid
    phase_ids = jnp.arange(P)[None, :]  # [1,P]
    slot_of_phase = phase_ids - first[:, None]  # [nc,P]
    in_slots = (slot_of_phase >= 0) & (slot_of_phase < K)
    slot_idx = jnp.clip(slot_of_phase, 0, K - 1)
    gathered = jnp.take_along_axis(slot_pos, slot_idx[..., None], axis=1)  # [nc,P,3]
    sv = jnp.take_along_axis(slot_valid, slot_idx, axis=1)  # [nc,P]
    use = (in_slots * (sv > 0) * (has_rel[:, None] > 0) * (plan.valid > 0))[..., None]
    return plan._replace(pos=jnp.where(use, gathered, plan.pos))


def plan_from_timeline(flags, times, pos, rot, P: int = 16) -> ContactPlan:
    """Convert a sampled contact timeline into a padded ContactPlan.

    flags [S, nc] in {0,1}; times [S]; pos [S, nc, 3]; rot [S, nc, 3, 3]
    (pos/rot = the locked stance pose at each sample, constant within a
    phase). This is how the MANN generator's Schmitt-trigger output becomes
    the reference's `ContactPhaseList` (SURVEY.md §2.5). A phase open at the
    last sample is left open (deactivation = BIG_TIME), matching a receding
    horizon where the final stance extends beyond the generated window.
    """
    S, nc = flags.shape
    dt_s = times[1] - times[0]
    prev = jnp.concatenate([jnp.zeros((1, nc), flags.dtype), flags[:-1]], axis=0)
    rising = flags * (1.0 - prev)  # [S, nc]
    phase_id = jnp.cumsum(rising, axis=0) - 1.0  # [S, nc], valid where flags
    pid = jnp.arange(P, dtype=flags.dtype)
    onehot = (
        (phase_id[:, :, None] == pid[None, None, :]) * (flags[:, :, None] > 0)
    ).astype(flags.dtype)  # [S, nc, P]

    big = jnp.asarray(BIG_TIME, flags.dtype)
    t_b = times[:, None, None]
    act = jnp.min(jnp.where(onehot > 0, t_b, big), axis=0)  # [nc, P]
    last_t = jnp.max(jnp.where(onehot > 0, t_b, -1.0), axis=0)
    valid = (jnp.max(onehot, axis=0) > 0).astype(flags.dtype)
    # open at the end if the phase contains the final sample
    open_end = onehot[-1]  # [nc, P]
    deact = jnp.where(open_end > 0, big, last_t + dt_s)
    deact = jnp.where(valid > 0, deact, big)
    act = jnp.where(valid > 0, act, big)

    # pose: take the sample at the last step of each phase
    last_idx = jnp.argmax(
        jnp.where(onehot > 0, jnp.arange(S, dtype=flags.dtype)[:, None, None], -1.0),
        axis=0,
    )  # [nc, P] int
    pos_p = jnp.take_along_axis(jnp.moveaxis(pos, 0, 1), last_idx[:, :, None], axis=1)
    rot_p = jnp.take_along_axis(
        jnp.moveaxis(rot, 0, 1), last_idx[:, :, None, None], axis=1
    )
    return ContactPlan(act=act, deact=deact, pos=pos_p, rot=rot_p, valid=valid)


# ---------------------------------------------------------------------------
# Scripted gait generation (test/benchmark scenarios; BASELINE config 1 —
# mirrors the reference's first-run path where the MANN phase list is used
# verbatim, CentroidalMPCBlock.cpp:604-607).
# ---------------------------------------------------------------------------


def make_alternating_gait(
    nc_phases: int = 16,
    t_first_lift: float = 1.0,
    single_support: float = 0.50,
    double_support: float = 0.20,
    step_length: float = 0.10,
    step_width: float = 0.16,
    n_steps: int = 10,
    first_swing: int = 0,
    z: float = 0.0,
    dtype=np.float32,
) -> ContactPlan:
    """Host-side scripted alternating-foot gait (numpy -> ContactPlan).

    Both feet start in stance at +-step_width/2. From t_first_lift, feet
    alternate swings of `single_support` seconds separated by
    `double_support` overlap, advancing `step_length` per step.
    """
    P = nc_phases
    act = np.full((2, P), BIG_TIME, dtype)
    deact = np.full((2, P), BIG_TIME, dtype)
    pos = np.zeros((2, P, 3), dtype)
    rot = np.broadcast_to(np.eye(3, dtype=dtype), (2, P, 3, 3)).copy()
    valid = np.zeros((2, P), dtype)

    y = np.array([step_width / 2.0, -step_width / 2.0], dtype)
    x = np.zeros(2, dtype)
    # initial stance for both feet
    phase_count = [0, 0]
    lift_t = [0.0, 0.0]

    def add_phase(i, a, d, px):
        k = phase_count[i]
        if k >= P:
            return
        act[i, k] = a
        deact[i, k] = d
        pos[i, k] = [px, y[i], z]
        valid[i, k] = 1.0
        phase_count[i] = k + 1

    t = t_first_lift
    swing = first_swing
    # schedule: swing foot lifts at t, lands at t+single_support; stance foot
    # keeps contact until its own lift (t + single_support + double_support).
    lands = []
    for s in range(n_steps):
        x[swing] += step_length
        lands.append((swing, t, t + single_support, float(x[swing])))
        t = t + single_support + double_support
        swing = 1 - swing

    # build contact (stance) intervals: contact from landing (or 0) until next lift
    lift_times = {0: [], 1: []}
    land_times = {0: [(0.0, float(0.0))], 1: [(0.0, float(0.0))]}
    for foot, t_lift, t_land, px in lands:
        lift_times[foot].append(t_lift)
        land_times[foot].append((t_land, px))
    for i in (0, 1):
        lts = lift_times[i] + [BIG_TIME]
        for k, (t_land, px) in enumerate(land_times[i]):
            add_phase(i, t_land, lts[k] if k < len(lts) else BIG_TIME, px)

    return ContactPlan(
        act=jnp.asarray(act),
        deact=jnp.asarray(deact),
        pos=jnp.asarray(pos),
        rot=jnp.asarray(rot),
        valid=jnp.asarray(valid),
    )
