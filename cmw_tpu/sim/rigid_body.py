"""Floating-base rigid-body dynamics plant — the Gazebo stand-in.

The reference validates in Gazebo (ODE, 1 ms steps, worlds/*/world:5-8)
with PID position-controlled joints (the icub-models Gazebo PID patch,
dockerfiles/icub-models.patch). This module is the TPU-native equivalent:
full Lagrangian dynamics of the 26-DoF + floating-base model, penalty
ground contact at the 8 foot corners, PD joint servos tracking the
PositionDirect command stream — everything a pure jittable function, so
batched sweeps can run thousands of physically-simulated robots per chip.

Formulation (mixed representation, matching core/kinematics Jacobians):
generalized velocity nu = [v_base(world), w_base(world), qdot] in
R^(6+nj). Dynamics follow the Euler-Lagrange equation evaluated in a
local exponential chart x around the current configuration
(p(x)=p+dx_p, R(x)=exp(hat(dx_th)) R, q(x)=q+dx_q):

    M(0) a = tau_gen - (d/dt M) nu + 1/2 d/dx (nu^T M(x) nu) - dV/dx + J_c^T f_c

with every configuration derivative obtained by jax jvp/grad through the
mass-matrix/potential functions (exact — no finite differences, no
hand-derived Coriolis terms). At x=0 the chart velocities coincide with
nu and the chart acceleration with (dv, dw, ddq), so the solved `a`
integrates directly (semi-implicit Euler; R <- exp(hat(w dt)) R).

Ground contact: per-corner penalty normal force
fz = (kp * penetration - kd * vz) gated to compression, with
friction-cone-capped viscous tangential force — the standard regularized
Coulomb model (same class ODE uses via CFM/ERP).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cmw_tpu.core import kinematics as kin
from cmw_tpu.core import lie
from cmw_tpu.core.centroidal import GRAVITY


@dataclasses.dataclass(frozen=True)
class RigidBodyConfig:
    """Static plant parameters (hashable)."""

    # 2 substeps @ 500 Hz control = 1 ms physics, same step as Gazebo
    # (worlds/*/world:5-8). The velocity-implicit contact/servo update
    # (see dynamics_step) is what makes 1 ms stable — an explicit penalty
    # update needs 0.25 ms and still bounces on footfalls.
    substeps: int = 2  # dynamics substeps per control tick
    contact_kp: float = 6.0e4  # N/m per corner
    contact_kd: float = 3.0e3  # N s/m per corner
    contact_mu: float = 0.8  # plant-side friction (> MPC's 0.33 margin)
    # tangential anchor-spring stiffness: must be high enough that stance
    # feet do not measurably creep under the gait's ~100 N shear loads —
    # at 1e4 the ~1 cm/step creep compounds through the planned-pose
    # odometry re-anchoring into a backward-treadmill ratchet (the
    # stabilizer reads the slip as "ZMP ahead of plan" and accelerates the
    # plan forward, increasing the slip). 1e5 => ~1 mm creep. Stable at
    # h = 1 ms thanks to the implicit velocity update.
    contact_ks: float = 1.0e5  # N/m tangential anchor-spring (static friction)
    contact_kt: float = 6.0e2  # N s/m tangential damping
    # anchor stress-relaxation time constant (s; 0 disables): anchors creep
    # toward the current corner positions so SUSTAINED tangential spring
    # preload bleeds off while transient (gait-timescale) friction stays
    # stiff. Physical origin of the preload: leg compression under load
    # splays the sole laterally ~0.5 mm/mm-of-sink, winding the anchor
    # springs up to ~50 N of DC lateral force that the Coulomb cap then
    # releases asymmetrically when one foot unloads (measured — see
    # reset_anchors). At tau=0.3 a 100 N walking-shear episode creeps the
    # anchor ~3 mm/s (bounded treadmill risk; the round-2 backward
    # treadmill needed ~10 mm/step), while slow splay preload settles at
    # ~splay_rate*ks*tau ~= 15 N instead of 50 N.
    anchor_relax_tau: float = 0.3
    # joint position PID (the Gazebo PID analog, dockerfiles/
    # icub-models.patch). The integral term is load-bearing: a pure PD
    # sags 3-10 deg under gravity torque, which physically tips the robot
    # onto its heel edges during the initial CoM-height squat (measured:
    # lean reaches 13 deg within 0.6 s and the gait never recovers).
    # kp is the reference's patched Gazebo leg PID (icub-models.patch:
    # kp 50.453 Nm/deg => ~2890 Nm/rad). kd/ki are retuned for our
    # approximate inertias: the patch's kd (~10 Nm s/rad) underdamps this
    # model (measured: growing stepping excursions), and its ki (~10)
    # takes seconds to cancel gravity sag, which the gait-start squat
    # cannot afford.
    servo_kp: float = 3000.0  # N m/rad
    # servo_kd retuned round 3 (was 30): at kd=30 the robot rides a
    # zeta ~ 0.1 suspension — stance-foot normal force oscillates
    # 0..2x mg at 3-5 Hz, rocking the sole enough to corrupt the odometry
    # anchor by +-5-10 cm per step. kd=150 (zeta ~ 0.45 on the vertical
    # leg mode) measured: gait survival 1.38 s -> 1.88 s with everything
    # else fixed, and the force trace loses the near-zero minima.
    servo_kd: float = 150.0  # N m s/rad
    servo_ki: float = 4000.0  # N m/(rad s)
    servo_int_max: float = 90.0  # N m anti-windup clamp on the I term
    # tau_max raised round 3 (was 190): the stance knee saturated at 190
    # under single-support load + tracking transients and the base sagged
    # through the support phase (measured). Gazebo's patched PID
    # effectively has no totals cap either (icub-models.patch).
    tau_max: float = 400.0  # N m actuator torque limit
    joint_damping: float = 0.5  # N m s/rad passive
    armature: float = 0.03  # kg m^2 rotor inertia added to M diagonal


class RigidDynParams(NamedTuple):
    """Plant parameters carried as TRACED scalars in RigidBodyState:
    changing them (or vmapping over them — domain randomization) reuses
    the compiled executable. Defaults come from RigidBodyConfig in
    `initial_state`; override post-hoc via
    `state._replace(params=state.params._replace(...))`."""

    contact_kp: jnp.ndarray
    contact_kd: jnp.ndarray
    contact_mu: jnp.ndarray
    contact_ks: jnp.ndarray
    contact_kt: jnp.ndarray
    anchor_relax_tau: jnp.ndarray
    servo_kp: jnp.ndarray
    servo_kd: jnp.ndarray
    servo_ki: jnp.ndarray
    servo_int_max: jnp.ndarray
    tau_max: jnp.ndarray
    joint_damping: jnp.ndarray


def dyn_params(cfg: RigidBodyConfig, dtype=jnp.float32) -> RigidDynParams:
    return RigidDynParams(
        **{
            f: jnp.asarray(getattr(cfg, f), dtype)
            for f in RigidDynParams._fields
        }
    )


class RigidBodyState(NamedTuple):
    base_rot: jnp.ndarray  # [3,3]
    base_pos: jnp.ndarray  # [3]
    q: jnp.ndarray  # [nj]
    nu: jnp.ndarray  # [6+nj] = [v_base(world), w_base(world), qdot]
    corner_forces: jnp.ndarray  # [nc, ncor, 3] last contact forces (world, N)
    anchors: jnp.ndarray  # [nc, ncor, 2] tangential friction anchors (world xy)
    servo_int: jnp.ndarray  # [nj] integral of the joint position error (N m)
    params: RigidDynParams  # traced plant parameters (RigidDynParams doc)


def initial_state(
    model: kin.RobotModel,
    q0,
    base_rot,
    base_pos,
    cfg: RigidBodyConfig,
    sole_frames: tuple = ("l_sole", "r_sole"),
    corners_local: np.ndarray | None = None,
):
    """Build the plant state. `cfg` is REQUIRED: it is the single source
    of the dynamic plant parameters (they are frozen into the traced
    `state.params` here — `dynamics_step` reads them from the state, NOT
    from the cfg it is called with; see `dynamics_step` docstring)."""
    dt = q0.dtype
    base_rot = jnp.asarray(base_rot, dt)
    base_pos = jnp.asarray(base_pos, dt)
    if corners_local is None:
        corners_local = default_corners(len(sole_frames))
    # friction anchors MUST start at the corners' actual world positions:
    # with zeros, a spawn that already penetrates the ground (preloaded
    # contact) drags every corner toward the world origin at the friction
    # limit — measured as both feet sliding ~7 cm inward during settling
    # with the hip-roll servos saturated.
    link_R, link_p = kin.fk(model, q0, base_rot, base_pos)
    pts, _ = corner_points_jacobians(
        model, link_R, link_p, sole_frames, jnp.asarray(corners_local, dt)
    )
    return RigidBodyState(
        base_rot=base_rot,
        base_pos=base_pos,
        q=q0,
        nu=jnp.zeros((6 + model.nj,), dt),
        corner_forces=jnp.zeros(pts.shape, dt),
        anchors=pts[..., 0:2],
        servo_int=jnp.zeros((model.nj,), dt),
        params=dyn_params(cfg, dt),
    )


# -- inertia ------------------------------------------------------------------


def mass_matrix(model: kin.RobotModel, link_R, link_p, armature: float = 0.0):
    """Joint-space inertia matrix M [6+nj, 6+nj] (composite of link CoM
    Jacobians — O(nl n^2) dense einsums, MXU-friendly)."""
    dt = link_R.dtype
    m = jnp.asarray(model.link_mass, dt)
    _, Jv, Jw = kin.link_com_jacobians(model, link_R, link_p)
    I_w = jnp.einsum(
        "lab,lbc,ldc->lad", link_R, jnp.asarray(model.link_inertia, dt), link_R
    )
    M = jnp.einsum("l,lxi,lxj->ij", m, Jv, Jv) + jnp.einsum(
        "lxi,lxy,lyj->ij", Jw, I_w, Jw
    )
    if armature > 0.0:
        nj = model.nj
        M = M + armature * jnp.diag(
            jnp.concatenate([jnp.zeros(6, dt), jnp.ones(nj, dt)])
        )
    return M


def _perturbed_fk(model, base_rot, base_pos, q, x):
    """FK at the exponential-chart point x = [dp(3), dth(3), dq(nj)]."""
    R = lie.so3_exp(x[3:6]) @ base_rot
    p = base_pos + x[0:3]
    return kin.fk(model, q + x[6:], R, p)


def bias_forces(cfg: RigidBodyConfig, model, base_rot, base_pos, q, nu):
    """Coriolis/centrifugal + gravity generalized forces (RHS sign:
    returns b with  M a = tau_gen - b)."""
    dt = q.dtype
    x0 = jnp.zeros((6 + model.nj,), dt)

    def M_of(x):
        link_R, link_p = _perturbed_fk(model, base_rot, base_pos, q, x)
        return mass_matrix(model, link_R, link_p, cfg.armature)

    def Mnu_of(x):
        return M_of(x) @ nu

    # d/dt(M) nu = jvp of (x -> M(x) nu) along x_dot = nu at x=0
    _, Mdot_nu = jax.jvp(Mnu_of, (x0,), (nu,))
    quad_grad = jax.grad(lambda x: 0.5 * jnp.dot(nu, M_of(x) @ nu))(x0)

    def V_of(x):
        link_R, link_p = _perturbed_fk(model, base_rot, base_pos, q, x)
        c_local = jnp.asarray(model.link_com, dt)
        c_world = link_p + jnp.einsum("lij,lj->li", link_R, c_local)
        return GRAVITY * jnp.dot(jnp.asarray(model.link_mass, dt), c_world[:, 2])

    g_gen = jax.grad(V_of)(x0)
    return Mdot_nu - quad_grad + g_gen


# -- contact ------------------------------------------------------------------


def corner_points_jacobians(
    model,
    link_R,
    link_p,
    sole_frames: tuple,
    corners_local,  # [nc, ncor, 3] in sole frame
):
    """World positions + point Jacobians of the foot corners.

    Returns (pts [nc,ncor,3], J_pts [nc,ncor,3,6+nj])."""
    dt = link_R.dtype
    fR, fp = kin.frame_poses(model, link_R, link_p)
    nc, ncor = corners_local.shape[0], corners_local.shape[1]
    cl = jnp.asarray(corners_local, dt)

    Js, pts = [], []
    for i, fname in enumerate(sole_frames):
        fi = model.frame_index(fname)
        Jf = kin.frame_jacobian(model, link_R, link_p, fi)  # [6, 6+nj]
        Ri, pi = fR[fi], fp[fi]
        for j in range(ncor):
            r = Ri @ cl[i, j]  # sole->corner offset, world
            pts.append(pi + r)
            # point Jacobian: Jv + w x r  =>  Jv - hat(r) Jw
            Js.append(Jf[0:3] - lie.hat(r) @ Jf[3:6])
    pts = jnp.stack(pts).reshape(nc, ncor, 3)
    J_pts = jnp.stack(Js).reshape(nc, ncor, 3, -1)
    return pts, J_pts


# -- step ---------------------------------------------------------------------


def dynamics_step(
    cfg: RigidBodyConfig,
    model: kin.RobotModel,
    state: RigidBodyState,
    q_cmd: jnp.ndarray,
    dt: float,
    sole_frames: tuple = ("l_sole", "r_sole"),
    corners_local: np.ndarray | None = None,
    ext_force_base: jnp.ndarray | None = None,  # world N, applied at base origin
):
    """One control-tick step = cfg.substeps semi-implicit Euler substeps.

    Parameter contract (explicit, to avoid a two-sources-of-truth trap):
    only the STATIC, shape/structure-affecting fields of `cfg` are read
    here — `substeps` and `armature`. Every dynamic plant parameter
    (contact stiffness/friction, servo gains, torque limit, damping) comes
    from `state.params` (RigidDynParams), frozen in from the cfg passed to
    `initial_state` and overridable per-experiment without recompiling via
    `state._replace(params=state.params._replace(...))`."""
    nj = model.nj
    dtp = state.q.dtype
    if corners_local is None:
        corners_local = default_corners(len(sole_frames))
    f_ext = (
        jnp.zeros(3, dtp) if ext_force_base is None else jnp.asarray(ext_force_base, dtp)
    )
    h = dt / cfg.substeps
    p_ = state.params  # traced plant parameters

    def substep(s: RigidBodyState, _):
        """Velocity-level implicit step (the ODE ERP/CFM analog).

        Contact spring-dampers and the joint servo are linear in the
        end-of-step velocity nu+; folding their velocity Jacobian into the
        mass matrix makes the update unconditionally stable for stiff
        kp/kd at h = 1 ms, and — critically for walking — removes the
        explicit-integration landing bounce (measured: explicit penalty
        at h <= 0.5 ms still launched the robot airborne with 2-4x mg
        force spikes on each footfall; implicit lands dead):

          (M + h J^T D J + h diag_j(d_srv)) nu+ =
              M nu + h (tau0 - b + J^T f0)

        with per-corner D = diag(kt + h ks, kt + h ks, kd + h kp) on
        active corners and d_srv = servo_kd + joint_damping + h servo_kp;
        f0 and tau0 are the forces/torques evaluated at the current state
        WITHOUT their velocity terms (those live implicitly on the LHS).
        """
        link_R, link_p = kin.fk(model, s.q, s.base_rot, s.base_pos)
        M = mass_matrix(model, link_R, link_p, cfg.armature)
        b = bias_forces(cfg, model, s.base_rot, s.base_pos, s.q, s.nu)
        pts, J_pts = corner_points_jacobians(
            model, link_R, link_p, sole_frames, jnp.asarray(corners_local, dtp)
        )

        pen = jnp.maximum(-pts[..., 2], 0.0)
        active = (pen > 0.0).astype(dtp)
        xy = pts[..., 0:2]
        # friction anchors reset per FOOT (all 4 corners airborne), not per
        # corner: when a loaded foot rolls slightly, its lifted corners must
        # re-grip at their OLD anchors on touch-back — per-corner resets
        # ratchet the stance foot sideways a few mm per roll cycle, which
        # the planned-pose odometry reads as a phantom CoM offset and the
        # stabilizer amplifies into a fall (measured: 3 cm inward slide +
        # 8 deg foot tilt within 0.25 s of the first single-support phase).
        foot_down = (active.max(axis=1) > 0)[:, None, None]
        anchors0 = jnp.where(foot_down, s.anchors, xy)
        # stress relaxation (anchor_relax_tau docstring): DC spring
        # preload decays; transient friction unaffected. tau == 0 disables
        # (branch-free: params are traced values)
        relax = jnp.where(
            p_.anchor_relax_tau > 0.0,
            h / jnp.maximum(p_.anchor_relax_tau, 1e-6),
            0.0,
        )
        anchors0 = anchors0 + (xy - anchors0) * relax

        # position-only force parts (velocity terms are implicit)
        fz0 = p_.contact_kp * pen * active
        ft0 = -p_.contact_ks * (xy - anchors0) * active[..., None]
        f0 = jnp.concatenate([ft0, fz0[..., None]], axis=-1)

        qd = s.nu[6:]
        err = q_cmd - s.q
        s_int = jnp.clip(
            s.servo_int + p_.servo_ki * h * err,
            -p_.servo_int_max,
            p_.servo_int_max,
        )
        # tau_max clips the explicit P+I part only; the implicit damping
        # terms folded into the LHS via d_srv (servo_kd + h*servo_kp) add
        # torque that is NOT bounded, so effective joint torque can exceed
        # tau_max during fast transients. This matches Gazebo's patched PID
        # (which also saturates only the PID output, not the joint-limit /
        # ERP implicit forces); if actuator realism ever becomes a claim,
        # saturate the total by solving with a clamped d_srv instead.
        tau_j0 = jnp.clip(
            p_.servo_kp * err + s_int, -p_.tau_max, p_.tau_max
        )
        d_srv = p_.servo_kd + p_.joint_damping + h * p_.servo_kp
        tau0 = jnp.concatenate([f_ext, jnp.zeros(3, dtp), tau_j0])
        M_srv = M + h * jnp.diag(
            jnp.concatenate([jnp.zeros(6, dtp), jnp.full((nj,), d_srv, dtp)])
        )

        def solve_with(act):
            """Implicit solve with the given corner active set."""
            d_t = (p_.contact_kt + h * p_.contact_ks) * act
            d_z = (p_.contact_kd + h * p_.contact_kp) * act
            D = jnp.stack([d_t, d_t, d_z], axis=-1)  # [nc,ncor,3]
            f0a = f0 * act[..., None]
            JDJ = jnp.einsum("ncxi,ncx,ncxj->ij", J_pts, D, J_pts)
            rhs = M @ s.nu + h * (
                tau0 - b + jnp.einsum("ncxk,ncx->k", J_pts, f0a)
            )
            L = jnp.linalg.cholesky(M_srv + h * JDJ + 1e-9 * jnp.eye(6 + nj, dtype=dtp))
            nu_n = jax.scipy.linalg.cho_solve((L, True), rhs)
            v_new = jnp.einsum("ncxk,k->ncx", J_pts, nu_n)
            return nu_n, f0a - D * v_new

        # active-set pass: corners whose implicit normal force comes out
        # negative are separating this substep — drop them and re-solve
        # once (otherwise the implicit spring acts as glue on lift-off)
        _, fc_try = solve_with(active)
        active = active * (fc_try[..., 2] > 0.0).astype(dtp)
        nu_n, fc = solve_with(active)
        v_new = jnp.einsum("ncxk,k->ncx", J_pts, nu_n)
        fz = jnp.maximum(fc[..., 2], 0.0) * active
        ft_raw = fc[..., 0:2]
        # Coulomb cap + stick-slip at the FOOT (contact patch) level, not
        # per corner: a rigid foot's corners share one slip motion, but
        # their normal loads oscillate as the foot rolls — per-corner caps
        # make the momentarily unloaded corners' anchors creep one-by-one
        # (distributed stick-slip, how parts walk across vibrating tables),
        # ratcheting the stance foot ~3 cm sideways per gait cycle and
        # stealing exactly the lateral ZMP authority the gait needs.
        # Gazebo's ODE solves patch friction as one LCP; this is the
        # penalty-method equivalent.
        # NOTE (one-substep lag, deliberate): nu_n above was solved with the
        # UNCAPPED implicit tangential forces; the Coulomb cap below only
        # shapes the forces recorded in the state (used for measured ZMP)
        # and the anchor slip, which bounds the force on the NEXT substep.
        # During an active slip the plant is therefore momentarily stiffer
        # than contact_mu for up to one substep (h = dt/substeps = 0.5 ms);
        # iterating the solve under the cap would re-introduce the explicit
        # stick-slip chatter the implicit scheme exists to kill.
        ft_foot = ft_raw.sum(axis=1)  # [nc, 2]
        cap_foot = p_.contact_mu * fz.sum(axis=1)  # [nc]
        ft_foot_norm = jnp.linalg.norm(ft_foot, axis=-1)
        scale = jnp.minimum(1.0, cap_foot / jnp.maximum(ft_foot_norm, 1e-9))[
            :, None, None
        ]
        ft = ft_raw * scale
        fc = jnp.concatenate([ft, fz[..., None]], axis=-1)
        # sliding: translate ALL the foot's anchors by the common slip so
        # the springs alone reproduce the capped force (keeps the anchor
        # pattern congruent — no per-corner ratchet)
        # anchors move TOWARD the foot (opposite the spring force direction)
        # by the excess stretch: |ft| drops to exactly the cap
        slip = (
            -(ft_foot / jnp.maximum(ft_foot_norm, 1e-9)[:, None])[:, None, :]
            * ((1.0 - scale[..., 0]) * ft_foot_norm[:, None] / p_.contact_ks / 4.0)[
                :, :, None
            ]
        )
        anchors = jnp.where(
            (active.max(axis=1) > 0)[:, None, None] & (scale < 1.0),
            anchors0 + slip,
            anchors0,
        )

        base_pos = s.base_pos + h * nu_n[0:3]
        base_rot = lie.so3_exp(h * nu_n[3:6]) @ s.base_rot
        q = s.q + h * nu_n[6:]
        return (
            RigidBodyState(base_rot, base_pos, q, nu_n, fc, anchors, s_int, p_),
            None,
        )

    state, _ = jax.lax.scan(substep, state, None, length=cfg.substeps)
    return state


def default_corners(n_feet: int = 2) -> np.ndarray:
    """Physical sole corner table [nc,4,3] (the plant's foot geometry —
    an ergoCub-class sole, wider than the MPC's conservative +-0.01 m
    corner band, centroidal_mpc.ini:24-29)."""
    return np.array(
        [[[0.1, 0.05, 0.0], [0.1, -0.05, 0.0], [-0.08, -0.05, 0.0], [-0.08, 0.05, 0.0]]]
        * n_feet
    )


def reset_anchors(
    model: kin.RobotModel,
    state: RigidBodyState,
    sole_frames: tuple = ("l_sole", "r_sole"),
    corners_local: np.ndarray | None = None,
) -> RigidBodyState:
    """Re-anchor the tangential friction springs at the corners' CURRENT
    world positions, zeroing any built-up spring preload.

    Needed after `settle`: sinking onto the contact splays the soles
    outward ~1 mm from their spawn anchors, leaving each foot with a
    ~±50 N inward-pulling spring. The preloads cancel while both feet are
    loaded, but the Coulomb cap zeroes the UNLOADED foot's spring the
    moment the gait shifts weight — the loaded foot's hidden preload then
    becomes a net ~50 N (~1 m/s²) lateral push toward the unloaded side
    (measured 2026-08-21: fyR +40..+90 N through the first double
    support, fyL −205 N flicker at touch — the uncommanded lateral
    acceleration that tipped every gait start)."""
    if corners_local is None:
        corners_local = default_corners(len(sole_frames))
    link_R, link_p = kin.fk(model, state.q, state.base_rot, state.base_pos)
    pts, _ = corner_points_jacobians(
        model, link_R, link_p, sole_frames, jnp.asarray(corners_local, state.q.dtype)
    )
    return state._replace(anchors=pts[..., 0:2])


def settle(
    cfg: RigidBodyConfig,
    model: kin.RobotModel,
    state: RigidBodyState,
    q_cmd: jnp.ndarray,
    dt: float,
    n_steps: int,
    sole_frames: tuple = ("l_sole", "r_sole"),
    corners_local: np.ndarray | None = None,
) -> RigidBodyState:
    """Let the plant sink onto the penalty contact while the PD servos hold
    `q_cmd` (the Gazebo 'spawn then wait' phase before the controller
    starts, dockerfiles/centroidal-mpc.yml:44-52)."""

    def body(s, _):
        return (
            dynamics_step(cfg, model, s, q_cmd, dt, sole_frames, corners_local),
            None,
        )

    state, _ = jax.lax.scan(body, state, None, length=n_steps)
    return state
