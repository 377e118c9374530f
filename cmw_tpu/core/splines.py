"""Linear and quintic splines as pure JAX functions.

Equivalents of BLF `Math::LinearSpline` (the 50 Hz MANN -> MPC-knot
"frequency adapters", reference CentroidalMPCBlock.cpp:544-577) and of the
quintic interpolation used by the swing-foot planner (BLF QuinticSpline;
coefficient derivation mirrored in the reference's config/robots/
ergoCubGazeboV1/untitled.m). Fixed shapes, vmap-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def linear_spline(knot_times, knot_values, query_times):
    """Piecewise-linear interpolation (clamped at the ends).

    knot_times: [K] strictly increasing; knot_values: [K, D];
    query_times: [Q]. Returns ([Q, D] values, [Q, D] derivatives).
    """
    idx = jnp.clip(jnp.searchsorted(knot_times, query_times, side="right") - 1, 0, knot_times.shape[0] - 2)
    t0 = knot_times[idx]
    t1 = knot_times[idx + 1]
    y0 = knot_values[idx]
    y1 = knot_values[idx + 1]
    denom = jnp.maximum(t1 - t0, 1e-9)
    s = jnp.clip((query_times - t0) / denom, 0.0, 1.0)[..., None]
    dy = (y1 - y0) / denom[..., None]
    return y0 + s * (y1 - y0), dy


def quintic_hermite(t, t0, t1, p0, v0, a0, p1, v1, a1):
    """Quintic Hermite segment with full boundary conditions.

    Evaluates position, velocity, acceleration at time t (clamped to
    [t0, t1]). All of p*, v*, a* are [..., D]; t scalar or [...].
    Matches the closed-form coefficients of the reference's untitled.m
    (s^3/s^4/s^5 basis on the normalized segment).
    """
    T = jnp.maximum(t1 - t0, 1e-9)
    s = jnp.clip((t - t0) / T, 0.0, 1.0)[..., None]
    T = jnp.asarray(T)[..., None]  # broadcast against the channel dim
    V0, V1 = v0 * T, v1 * T
    A0, A1 = a0 * T * T, a1 * T * T
    # Coefficients of p(s) = c0 + c1 s + c2 s^2 + c3 s^3 + c4 s^4 + c5 s^5
    c0 = p0
    c1 = V0
    c2 = 0.5 * A0
    c3 = 10.0 * (p1 - p0) - 6.0 * V0 - 4.0 * V1 - 1.5 * A0 + 0.5 * A1
    c4 = -15.0 * (p1 - p0) + 8.0 * V0 + 7.0 * V1 + 1.5 * A0 - A1
    c5 = 6.0 * (p1 - p0) - 3.0 * (V0 + V1) - 0.5 * (A0 - A1)
    p = c0 + s * (c1 + s * (c2 + s * (c3 + s * (c4 + s * c5))))
    dp = c1 + s * (2 * c2 + s * (3 * c3 + s * (4 * c4 + s * 5 * c5)))
    ddp = 2 * c2 + s * (6 * c3 + s * (12 * c4 + s * 20 * c5))
    return p, dp / T, ddp / (T * T)


def quintic_timescale(t, t0, t1):
    """Scalar quintic time-scaling s(t): 0->1 with zero vel/acc at both ends."""
    T = jnp.maximum(t1 - t0, 1e-9)
    x = jnp.clip((t - t0) / T, 0.0, 1.0)
    s = x * x * x * (10.0 + x * (-15.0 + 6.0 * x))
    ds = x * x * (30.0 + x * (-60.0 + 30.0 * x)) / T
    return s, ds
