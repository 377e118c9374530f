"""ZMP computation: measured (from contact wrenches) and desired (from MPC
corner forces).

Equivalents of `WholeBodyQPBlock::evaluateZMP` (reference
WholeBodyQPBlock.cpp:737-803) and `computeDesiredZMP` (:805-873): each
foot's local ZMP is computed from its wrench (x = -tau_y/fz, y = tau_x/fz),
transformed to world via the foot pose, and the global ZMP is the
fz-weighted average over feet with positive load; the desired ZMP from the
MPC is the force-weighted average of the corner positions, clamped to a box
around the stance (the reference clamps to +-0.08 m / +-0.03 m in the foot
frame, :837-838).
"""

from __future__ import annotations

import jax.numpy as jnp

MIN_FZ = 0.1  # minimum vertical load to count a foot (reference uses
# `zmpComputed = fz > 0.001` style guards, WholeBodyQPBlock.cpp:745-777)


def foot_zmp(wrench, foot_rot, foot_pos):
    """Local ZMP of one foot wrench [..., 6] = [f(3), tau(3)] expressed in
    the foot (sole) frame; returns world position [..., 3] + validity."""
    fz = wrench[..., 2]
    valid = (fz > MIN_FZ).astype(wrench.dtype)
    safe_fz = jnp.maximum(fz, MIN_FZ)
    x = -wrench[..., 4] / safe_fz
    y = wrench[..., 3] / safe_fz
    local = jnp.stack([x, y, jnp.zeros_like(x)], axis=-1)
    world = foot_pos + jnp.einsum("...ij,...j->...i", foot_rot, local)
    return world, valid, fz


def global_zmp(wrenches, foot_rot, foot_pos):
    """fz-weighted world ZMP over feet. wrenches [..., nc, 6]."""
    world, valid, fz = foot_zmp(wrenches, foot_rot, foot_pos)
    w = valid * jnp.maximum(fz, 0.0)
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), MIN_FZ)
    return jnp.sum(world * w[..., None], axis=-2) / wsum


def desired_zmp_from_corners(forces, corner_pos, clamp_xy=(0.08, 0.03), centers=None):
    """MPC corner forces -> desired ZMP (force-weighted corner average).

    forces/corner_pos [..., nc, ncor, 3]. If `centers` [..., nc, 3] is
    given, the per-foot contribution is clamped to the box +-clamp_xy
    around the foot center before averaging (reference :837-838).
    """
    fz = jnp.maximum(forces[..., 2], 0.0)
    tot = jnp.maximum(jnp.sum(fz, axis=(-2, -1), keepdims=True), 1e-6)
    if centers is not None:
        cx, cy = clamp_xy
        lo = centers[..., None, :] + jnp.asarray([-cx, -cy, 0.0], forces.dtype)
        hi = centers[..., None, :] + jnp.asarray([cx, cy, 0.0], forces.dtype)
        corner_pos = jnp.clip(corner_pos, lo, hi)
    zmp = jnp.sum(corner_pos * fz[..., None], axis=(-3, -2)) / tot[..., 0, :]
    return zmp.at[..., 2].set(0.0)
