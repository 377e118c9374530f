"""Fixed-foot detector: which foot anchors odometry at time t.

Equivalent of BLF `Contacts::FixedFootDetector` (reference
WholeBodyQPBlock.cpp:121-126,267-299; sampling_time 0.002,
centroidal_mpc_walking.ini:34-35). Given the contact phase list and the
current time, the fixed foot is the stance foot whose contact extends
furthest into the future — in single support that is the stance foot; in
double support it is the foot that stays planted through the upcoming
swing of the other.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from cmw_tpu.core import contacts as C


class FixedFoot(NamedTuple):
    index: jnp.ndarray  # [] int: 0 = left, 1 = right
    pos: jnp.ndarray  # [3] planned contact position
    rot: jnp.ndarray  # [3, 3]
    switch_time: jnp.ndarray  # [] activation time of the fixed contact


def detect(plan: C.ContactPlan, t, prefer: int = 0) -> FixedFoot:
    """`prefer` breaks exact double-support ties (both feet planted with
    equal deactivation time) — the reference's `initial_fixed_frame`
    (legged_odometry.ini; l_sole = 0 on every shipped robot)."""
    idx, in_contact = C.active_phase(plan, t)
    act, deact, pos, rot, _ = C.gather_phase(plan, idx)
    # score: remaining stance duration; swinging feet score -inf
    score = jnp.where(in_contact > 0, deact, -jnp.inf)
    fixed = jnp.where(score[prefer] >= score.max(), prefer, jnp.argmax(score))
    return FixedFoot(
        index=fixed,
        pos=pos[fixed],
        rot=rot[fixed],
        switch_time=act[fixed],
    )
