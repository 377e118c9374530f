"""Fixed-step ODE integrators (RK4 / forward Euler) over pytree states.

Equivalent of BLF `ContinuousDynamicalSystem::{RK4, ForwardEuler}` as used at
reference WholeBodyQPBlock.cpp:597-646 (centroidal RK4, CoM LTI RK4,
floating-base forward Euler). Pure functions: `step(f, x, dt, *args)`.
"""

from __future__ import annotations

import jax


def euler_step(f, x, dt, *args):
    return jax.tree_util.tree_map(lambda a, b: a + dt * b, x, f(x, *args))


def rk4_step(f, x, dt, *args):
    tm = jax.tree_util.tree_map
    k1 = f(x, *args)
    k2 = f(tm(lambda a, b: a + 0.5 * dt * b, x, k1), *args)
    k3 = f(tm(lambda a, b: a + 0.5 * dt * b, x, k2), *args)
    k4 = f(tm(lambda a, b: a + dt * b, x, k3), *args)
    return tm(
        lambda a, b1, b2, b3, b4: a + (dt / 6.0) * (b1 + 2.0 * b2 + 2.0 * b3 + b4),
        x,
        k1,
        k2,
        k3,
        k4,
    )
