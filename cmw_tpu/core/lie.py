"""SO(3)/SE(3) Lie-group operations as pure JAX functions.

TPU-native replacement for the reference's use of `manif::SO3d/SE3d`
(reference call sites: src/centroidal-mpc-walking/src/WholeBodyQPBlock.cpp
throughout, e.g. base-pose integration at WholeBodyQPBlock.cpp:1240-1248).
Everything is shape-static, dtype-polymorphic, vmappable.

Rotations are represented as 3x3 matrices (or unit quaternions [w,x,y,z] where
noted); poses as (R, p) tuples so pytrees stay flat and XLA fuses freely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """so(3) hat map: R^3 -> 3x3 skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of hat: 3x3 skew -> R^3."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def so3_exp(w):
    """Exponential map so(3) -> SO(3), Taylor-safe near zero."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(w)
    W2 = W @ W
    # sin(t)/t and (1-cos t)/t^2 with series fallback. NB: both where()
    # branches are always evaluated — the untaken branch must not produce
    # NaN (0/0), so divide by a guarded denominator.
    theta2_s = jnp.where(theta2 > _EPS, theta2, 1.0)
    a = jnp.where(theta2 > _EPS, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    b = jnp.where(theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2_s, 0.5 - theta2 / 24.0)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


def so3_log(R):
    """Log map SO(3) -> so(3). Safe for angles in [0, pi)."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos_t = jnp.clip((tr - 1.0) / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_t)[..., None, None]
    # theta/(2 sin theta), series for small theta
    s = jnp.sin(theta)
    s_safe = jnp.where(jnp.abs(s) > _EPS, s, 1.0)
    coeff = jnp.where(
        jnp.abs(s) > _EPS, theta / (2.0 * s_safe), 0.5 + theta * theta / 12.0
    )
    return vee(coeff * (R - jnp.swapaxes(R, -1, -2)))


def so3_distance(R1, R2):
    """Geodesic angle between two rotations."""
    return jnp.linalg.norm(so3_log(jnp.swapaxes(R1, -1, -2) @ R2), axis=-1)


def rotz(yaw):
    """Rotation about world z by yaw (vectorized)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], axis=-1),
            jnp.stack([s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def yaw_of(R):
    """Extract yaw (rotation about z) of a rotation matrix."""
    return jnp.arctan2(R[..., 1, 0], R[..., 0, 0])


# --- quaternions [w, x, y, z] -------------------------------------------------


def quat_to_mat(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = w * w + x * x + y * y + z * z
    s = 2.0 / jnp.maximum(n, _EPS)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def mat_to_quat(R):
    """Rotation matrix -> unit quaternion [w,x,y,z], branch-free (Shepperd)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate quaternions (un-normalized), pick by largest pivot
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)
    pivots = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    cand = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4 candidates, 4]
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_mul(q1, q2):
    w1, v1 = q1[..., :1], q1[..., 1:]
    w2, v2 = q2[..., :1], q2[..., 1:]
    w = w1 * w2 - jnp.sum(v1 * v2, axis=-1, keepdims=True)
    v = w1 * v2 + w2 * v1 + jnp.cross(v1, v2)
    return jnp.concatenate([w, v], axis=-1)


# --- SE(3) as (R, p) ----------------------------------------------------------


def se3_compose(R1, p1, R2, p2):
    return R1 @ R2, p1 + jnp.einsum("...ij,...j->...i", R1, p2)


def se3_inverse(R, p):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, p)


def se3_apply(R, p, x):
    return jnp.einsum("...ij,...j->...i", R, x) + p


def se3_exp(xi):
    """se(3) exp: xi = [v(3), w(3)] -> (R, p) with left Jacobian on v."""
    v, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(w)
    W2 = W @ W
    theta2_s = jnp.where(theta2 > _EPS, theta2, 1.0)
    b = jnp.where(theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2_s, 0.5 - theta2 / 24.0)
    c = jnp.where(
        theta2 > _EPS,
        (theta - jnp.sin(theta)) / (theta2_s * theta),
        1.0 / 6.0 - theta2 / 120.0,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = eye + b * W + c * W2
    return R, jnp.einsum("...ij,...j->...i", V, v)


def integrate_mixed_velocity(R, p, v_lin, w_ang, dt):
    """Integrate a *mixed-representation* twist (world-frame linear velocity,
    world-frame angular velocity) over dt, as the reference's
    FloatingBaseSystemKinematics + ForwardEuler does
    (WholeBodyQPBlock.cpp:619-625,1240-1248): p += dt v; R <- exp(dt w) R.
    """
    p_new = p + dt * v_lin
    R_new = so3_exp(dt * w_ang) @ R
    return R_new, p_new


def project_to_so3(R):
    """Re-orthonormalize a rotation matrix (polar projection via SVD)."""
    u, _, vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(u @ vt)
    d = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]], axis=-1
    )
    return (u * d[..., None, :]) @ vt
