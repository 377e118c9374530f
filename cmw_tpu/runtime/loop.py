"""The closed-loop walking controller as one jitted multi-rate scan.

Re-composition of the reference's two-thread pipeline (SURVEY.md §3.2-3.3)
into a single deterministic control graph:

  every WBC tick (wbc_dt):            every MPC tick (lax.cond-gated):
    fixed-foot detector                 joystick -> input builder
    legged odometry (telemetry)         MANN generate (0.8 s @ 50 Hz),
    centroidal RK4 integrator             merge-point re-root at +mpc dt
    desired/measured ZMP                frequency adapters (linear splines)
    CoM-ZMP stabilizer                  contact-plan merge + grid snap
    CoM LTI integrator                  CentroidalMPC SQP solve (warm)
    swing-foot planners                 write adjusted steps back to plan
    differential-IK QP                  hold first-interval corner forces
    floating-base + joint integration

Feedback topology matches the reference exactly: the MPC receives the
*integrated* centroidal state, not raw measurements
(WholeBodyQPBlock.cpp:1259-1262 — the "adherent model" loop, SURVEY.md
§3.3 note), so the closed loop is well-defined without a physics engine;
external pushes enter as measured wrenches, exactly like the reference's
push-recovery experiments (SURVEY.md §5.3).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cmw_tpu.cmpc import formulation as F
from cmw_tpu.cmpc.solver import CentroidalMPCSolver, WarmStart
from cmw_tpu.core import contacts as C
from cmw_tpu.core import kinematics as kin
from cmw_tpu.core import lie
from cmw_tpu.core.centroidal import centroidal_dynamics, pack_state
from cmw_tpu.core.integrators import rk4_step
from cmw_tpu.core.splines import linear_spline
from cmw_tpu.estimation import fixed_foot, legged_odom
from cmw_tpu.mann import generator as G
from cmw_tpu.sim import plant as P
from cmw_tpu.sim import rigid_body as RB
from cmw_tpu.mann.input_builder import build_desired_trajectory
from cmw_tpu.mann.network import MANNWeights
from cmw_tpu.runtime.config import WalkingConfig
from cmw_tpu.wbc import swing_foot
from cmw_tpu.wbc.com_zmp import com_zmp_control
from cmw_tpu.wbc.diff_ik import IKTargets, solve_ik
from cmw_tpu.wbc.zmp import desired_zmp_from_corners


class DynConfig(NamedTuple):
    """Tuning knobs carried as TRACED scalars in LoopState (not static
    jit constants): changing them reuses the compiled episode executable
    — the difference between a 2-minute and a 12-minute experiment
    iteration on TPU. Defaults come from the matching WalkingConfig
    fields in `initial_state`; override post-hoc with
    `s0._replace(dyn=s0.dyn._replace(x=...))`."""

    gait_hold_window: jnp.ndarray  # [] fraction of swing
    gait_hold_thresh: jnp.ndarray  # [] x body weight
    gait_hold_max_s: jnp.ndarray  # [] s
    capture_margin_x: jnp.ndarray  # [] m
    capture_margin_y: jnp.ndarray  # [] m
    state_fb_gain: jnp.ndarray  # [] 1/s (com xy + vcom xy channels)
    state_fb_l: jnp.ndarray  # [] 1/s, angular-momentum channels only: 0
    #   keeps x9's L purely PLANNED (the clean target for the IK
    #   angular-momentum task); >0 blends measured L in (round-3 behavior
    #   when equal to state_fb_gain)
    com_int_band: jnp.ndarray  # [] m
    joypad_slew: jnp.ndarray  # [] full-scale/s (0 = off)
    td_load_thresh: jnp.ndarray  # [] x body weight: early-touchdown gate
    td_lookahead: jnp.ndarray  # [] s: early contact activation window
    ang_mom_w: jnp.ndarray  # [] IK angular-momentum task weight (0 = off)
    cp_gov: jnp.ndarray  # [] capture-point speed-governor gain (1/m, 0 = off)
    lag_gov: jnp.ndarray  # [] CoM-lag speed-governor gain (1/m, 0 = off)
    lag_band: jnp.ndarray  # [] m of free CoM-behind-stance lag before it acts
    cp_margin: jnp.ndarray  # [] m: cp_gov's stance-toe reach margin
    rush_gain: jnp.ndarray  # [] 1/m: gait-RUSH clock acceleration per meter
    #   of capture-point escape past the stance toe while a foot swings
    #   (the mirror of gait-hold: land early to arrest a forward fall)
    rush_margin: jnp.ndarray  # [] m of free capture overshoot before rushing
    step_ext_max: jnp.ndarray  # [] m: max capture-step landing extension (0=off)
    step_ext_margin: jnp.ndarray  # [] m the landing leads the capture point by
    #   (landing AHEAD of the capture point decelerates; behind accelerates)
    odom_blend: jnp.ndarray  # [] per-tick anchor pull toward the plan pose
    #   (1 = instant, the reference's plan-anchored changeFixedFrame; <1 =
    #   complementary filter spreading landing error over ~wbc_dt/alpha)
    brake_speed: jnp.ndarray  # [] m/s: overspeed double-support brake
    #   ceiling (0 = off) — hold the clock before lift-off while the
    #   measured speed exceeds it and the loaded support still covers
    #   the capture point (config.brake_speed docstring)
    brake_margin: jnp.ndarray  # [] m of capture overshoot past the loaded
    #   toe beyond which the brake releases (stepping is the only brake
    #   left out there)
    fwd_release: jnp.ndarray  # [] bool-as-float: suppress the gait-hold
    #   when the capture point escapes FORWARD (along travel) past the
    #   stance+landing hull — stepping is the only recovery out there;
    #   holding pins the plan mid-transfer (measured terminal mode
    #   2026-08-21: double-support hold with cp_over=+0.28 -> fall)
    rush_ds: jnp.ndarray  # [] bool-as-float: let the gait-rush run from
    #   DOUBLE support too (hurry the upcoming lift) when the capture
    #   point is past the loaded toe, not only while a foot swings
    chest_w_rp: jnp.ndarray  # [] multiplier on the IK chest task's
    #   roll/pitch weight rows (1 = the reference's ik.ini stiffness;
    #   the measured terminal mode is backward torso pitch the soft
    #   chest task cannot arrest — RESULTS.md §5d)
    chest_lean_gain: jnp.ndarray  # [] rad/m: proactive forward chest
    #   lean per meter of capture-point overshoot past the stance toe
    #   (0 = off) — schedules the chest SO3 target to dump backward
    #   angular momentum into the task the IK already anchors, instead
    #   of adding a separate momentum task (measured harmful, §5d)
    step_reach_len: jnp.ndarray  # [] m: leg-length budget for the
    #   capture-step extension's GEOMETRIC reach cap (0 = off). Measured
    #   round-5 failure (r5_grid3 item 7): a 0.4 m catch step was
    #   commanded with the CoM still at z=0.70 — beyond what the ~0.75 m
    #   leg can span — so the foot hovered ~2 cm up for 0.75 s while the
    #   robot rolled over its stance toe. The cap keeps the commanded
    #   landing within sqrt(reach_len^2 - com_z^2) of the measured CoM.
    crouch_gain: jnp.ndarray  # [] m per m of capture-point overshoot:
    #   capture-scheduled crouch — lower the IK root-z target when the
    #   capture point escapes forward, buying exactly the horizontal leg
    #   reach the catch step needs (companion of step_reach_len: as the
    #   root drops, the reach cap opens up on subsequent MPC ticks)
    crouch_max: jnp.ndarray  # [] m: crouch clip


class StoredMann(NamedTuple):
    """The last MANN generator call's output, kept for re-slicing on MPC
    ticks between calls: the reference advances the generator only every
    mannCallingTime = lcm(slow_down_factor * gen dT, MPC dT) and re-slices
    the stored rollout at ABSOLUTE times via its frequency adapters
    (CentroidalMPCBlock.cpp:477-500,544-577). With the factor-1 sim robots
    the call happens every MPC tick and this is pass-through state; with
    ergoCubSN001 (factor 5, 60 ms MPC) calls are 300 ms apart."""

    t0: jnp.ndarray  # [] absolute time of the call
    com: jnp.ndarray  # [S,3] CoM timeline (raw MANN, world)
    ang_mom: jnp.ndarray  # [S,3] angular-momentum timeline (raw MANN)
    joints0: jnp.ndarray  # [nj] first-knot posture (regularization target)
    yaw0: jnp.ndarray  # [] first-knot base yaw (chest task set-point)
    plan: C.ContactPlan  # MANN contact phase list (absolute times)


class LoopState(NamedTuple):
    t: jnp.ndarray  # [] absolute time
    tick: jnp.ndarray  # [] int
    x9: jnp.ndarray  # [9] integrated centroidal state (MPC plant)
    com_xy_int: jnp.ndarray  # [2] CoM LTI integrator
    base_rot: jnp.ndarray  # [3,3] desired floating base
    base_pos: jnp.ndarray  # [3]
    q: jnp.ndarray  # [nj] desired joints (PositionDirect stream)
    warm: WarmStart
    plan: C.ContactPlan  # merged + MPC-adjusted plan
    forces0: jnp.ndarray  # [nc,ncor,3] held MPC first-interval forces
    corner0: jnp.ndarray  # [nc,ncor,3] their world positions
    active0: jnp.ndarray  # [nc]
    zmp_des: jnp.ndarray  # [3]
    gen_state: G.GeneratorState
    q_reg: jnp.ndarray  # [nj] MANN posture regularization
    chest_yaw: jnp.ndarray  # []
    root_z_off: jnp.ndarray  # [] bootstrap root offset (WBQP:1066-1080)
    com_z_ref: jnp.ndarray  # [] height reference
    ref_off: jnp.ndarray  # [3] decaying startup reference offset
    mpc_cost: jnp.ndarray  # [] last solve diagnostics
    mpc_prim: jnp.ndarray  # []
    plant: P.PlantState  # simulated robot (servo lag + sensor RNG)
    rb: RB.RigidBodyState  # rigid-body plant (stepped only when cfg.rigid)
    com_mann: jnp.ndarray  # [3] MANN CoM reference @ knot 0 (telemetry)
    ang_mom_mann: jnp.ndarray  # [3] MANN ang-mom reference @ knot 0
    hold: jnp.ndarray  # [] 1.0 while the gait clock is paused (gait_hold)
    hold_time: jnp.ndarray  # [] consecutive pause time this swing (s)
    joypad_lp: jnp.ndarray  # [4] slew-limited joystick (cfg.joypad_slew)
    mann: StoredMann  # last generator call's output (StoredMann docstring)
    odo: legged_odom.OdometryState  # persistent odometry anchor (rigid path)
    dyn: DynConfig  # traced tuning knobs (DynConfig docstring)


class TickInput(NamedTuple):
    joypad: jnp.ndarray  # [4] = [motion_x, motion_y, facing_x, facing_y]
    ext_force: jnp.ndarray  # [3] mass-normalized push (measured wrench)
    ext_torque: jnp.ndarray  # [3]


class Telemetry(NamedTuple):
    """Per-tick channels (the reference's VectorsCollectionServer schema,
    WholeBodyQPBlock.cpp:655-712)."""

    com_mpc: jnp.ndarray  # integrated centroidal state: com
    dcom_mpc: jnp.ndarray
    ang_mom_mpc: jnp.ndarray
    com_meas: jnp.ndarray  # FK CoM of the commanded robot
    com_ik_target: jnp.ndarray
    zmp_des: jnp.ndarray
    foot_pos_des: jnp.ndarray  # [nc,3]
    foot_contact: jnp.ndarray  # [nc]
    forces0: jnp.ndarray  # [nc,ncor,3]
    q: jnp.ndarray
    base_pos: jnp.ndarray
    base_est_pos: jnp.ndarray  # legged-odometry estimate
    fixed_foot_idx: jnp.ndarray
    mpc_cost: jnp.ndarray
    mpc_prim: jnp.ndarray
    adjusted_step: jnp.ndarray  # [nc, K, 3] current slot positions
    zmp_meas: jnp.ndarray  # [3] measured ZMP (evaluateZMP, WBQP:737-803)
    vcom_zmp: jnp.ndarray  # [2] CoM-ZMP stabilizer output
    dq_cmd: jnp.ndarray  # [nj] IK joint-velocity command
    joypad: jnp.ndarray  # [4] joystick input
    q_reg: jnp.ndarray  # [nj] posture regularization target
    com_mann: jnp.ndarray  # [3] MANN CoM reference @ current knot
    ang_mom_mann: jnp.ndarray  # [3] MANN ang-mom reference
    gait_hold: jnp.ndarray  # [] 1.0 while the gait clock is paused
    gait_rush: jnp.ndarray  # [] clock acceleration factor (0 = nominal)
    base_act_pos: jnp.ndarray  # [3] physical base position (rigid plant)
    base_act_up: jnp.ndarray  # [] cos(base tilt) = R_act[2,2] (rigid plant)
    base_act_lean: jnp.ndarray  # [2] world-z of base x/y axes (pitch/roll)
    fz_act: jnp.ndarray  # [nc] physical per-foot normal force sum (N)
    ft_act: jnp.ndarray  # [nc,2] physical per-foot tangential force sum (N)
    com_act: jnp.ndarray  # [3] ground-truth plant CoM (== com_meas if no rigid)
    q_act: jnp.ndarray  # [nj] physical joint positions (== q if no rigid)


class WalkingController:
    """Holds the static pieces: configs, robot model, MANN weights."""

    def __init__(self, cfg: WalkingConfig, model: kin.RobotModel, weights: MANNWeights):
        self.cfg = cfg
        self.model = model
        self.weights = weights
        self.solver = CentroidalMPCSolver(cfg.mpc)
        self.mass = model.total_mass

    # The episode entry points are jitted with `self` STATIC
    # (static_argnums=0), and jax keys static args by __hash__/__eq__.
    # The default identity hash is UNSAFE across controller lifetimes:
    # CPython reuses a freed object's id, so a controller built after a
    # previous one died can alias the dead controller's jit-cache entry
    # and silently run the OLD config's executable. Observed in
    # `sweep --ablation` (one process, sequential arms): the
    # pinned-footstep arm reproduced the step-adjustment arm's 32
    # scenario outcomes bit-for-bit while the same two configs run
    # side-by-side (both objects alive) diverged within 2 s. Hash and
    # compare by STATIC VALUE instead: the frozen WalkingConfig carries
    # full value semantics; model/weights compare by identity (the
    # cached key holds strong refs, so a hit's stored objects are alive
    # and `is` is sound). Bonus: same-value controllers now share
    # compiled episodes instead of re-tracing.
    def __hash__(self):
        return hash(self.cfg)

    def __eq__(self, other):
        return (
            type(other) is WalkingController
            and self.cfg == other.cfg
            and self.model is other.model
            and self.weights is other.weights
        )

    # -- init -----------------------------------------------------------------

    def polished_initial_pose(self, dtype=jnp.float32, drop: float = None):
        """The reference walk-ready crouch projected onto THIS model's
        constraint manifold: starting from kin.walk_ready_pose (which has
        residual sole tilts up to 1.2 deg — enough to spawn the rigid plant
        on a foot EDGE and ratchet-slide sideways during settling), iterate
        the production IK with targets 'both soles exactly flat on the
        ground, CoM over the feet centroid, posture near the crouch'.
        Cached per controller (keyed by drop)."""
        if drop is None:
            drop = (
                0.0
                if self.cfg.com_height_override is not None
                else self.cfg.com_height_drop
            )
        cache = getattr(self, "_polished_poses", None)
        if cache is None:
            cache = self._polished_poses = {}
        if drop in cache:
            return cache[drop]
        cfg, model = self.cfg, self.model
        q0_np, rot_np = kin.walk_ready_pose()
        q = jnp.asarray(q0_np, dtype)
        base_rot = jnp.asarray(rot_np, dtype)
        base_pos = jnp.zeros(3, dtype)
        li, ri = model.frame_index("l_sole"), model.frame_index("r_sole")
        # flat-foot targets: keep each sole's initial xy + yaw, equalize
        # heights (the base is placed so the soles touch the ground later)
        lR, lp = kin.fk(model, q, base_rot, base_pos)
        fR, fp = kin.frame_poses(model, lR, lp)
        z_mean = 0.5 * (fp[li, 2] + fp[ri, 2])
        foot_pos_t = jnp.stack(
            [fp[li].at[2].set(z_mean), fp[ri].at[2].set(z_mean)]
        )
        foot_rot_t = jnp.stack(
            [lie.rotz(lie.yaw_of(fR[li])), lie.rotz(lie.yaw_of(fR[ri]))]
        )
        com_xy_t = foot_pos_t[:, 0:2].mean(axis=0)
        targets = IKTargets(
            foot_rot=foot_rot_t,
            foot_pos=foot_pos_t,
            foot_lin_vel=jnp.zeros((2, 3), dtype),
            foot_ang_vel=jnp.zeros((2, 3), dtype),
            com_xy=com_xy_t,
            dcom_xy=jnp.zeros(2, dtype),
            root_z=base_pos[2],  # overwritten per-iteration below
            droot_z=jnp.zeros((), dtype),
            chest_rot=jnp.eye(3, dtype=dtype),
            q_reg=q,
        )
        # optionally descend to the OPERATING height during the polish:
        # the walking reference squats com_height_drop below standing (the
        # reference pins 0.7 m, CentroidalMPCBlock.cpp:531-534). Starting
        # — and regularizing the legs — at that height keeps the IK's
        # soft leg-posture target consistent with the hard CoM-z
        # constraint: with the legs regularized to a SHALLOWER crouch than
        # the robot walks at, the QP prefers pitching the base backward
        # over bending the knees deeper, and the pelvis measurably drifts
        # 30+ deg over a few steps on the rigid plant. (The MANN seed
        # keeps the drop=0 walk-ready pose — its training distribution.)
        z_target = base_pos[2] - drop
        h = 0.05
        for _ in range(60):
            lR, lp = kin.fk(model, q, base_rot, base_pos)
            targets = targets._replace(root_z=z_target)
            nu = solve_ik(model, q, base_rot, base_pos, targets, cfg.ik)
            base_rot, base_pos = lie.integrate_mixed_velocity(
                base_rot, base_pos, nu[0:3], nu[3:6], h
            )
            q = q + h * nu[6:]
        cache[drop] = (q, base_rot)
        return cache[drop]

    def initial_state(self, q0=None, base_rot0=None, dtype=jnp.float32) -> LoopState:
        """Default start = the reference's walk-ready crouch + pitched base
        (kin.walk_ready_pose: the Gazebo spawn pose AND the configuration
        the reference seeds MANN with, CentroidalMPCBlock.cpp:271-370).
        Pass q0 explicitly (e.g. zeros) to start elsewhere."""
        cfg, model = self.cfg, self.model
        nj = model.nj
        used_polished = q0 is None and base_rot0 is None
        if used_polished:
            q0, base_rot0 = self.polished_initial_pose(dtype)
        q0 = jnp.zeros(nj, dtype) if q0 is None else q0
        base_rot0 = jnp.eye(3, dtype=dtype) if base_rot0 is None else base_rot0
        # place the base so the lower sole touches the ground
        lR, lp = kin.fk(model, q0, base_rot0, jnp.zeros(3, dtype))
        fR, fp = kin.frame_poses(model, lR, lp)
        li, ri = model.frame_index("l_sole"), model.frame_index("r_sole")
        base_pos = jnp.asarray([0.0, 0.0, -jnp.minimum(fp[li, 2], fp[ri, 2])], dtype)
        lR, lp = kin.fk(model, q0, base_rot0, base_pos)
        fR, fp = kin.frame_poses(model, lR, lp)
        com0 = kin.com(model, lR, lp)
        # the polish already descended to the operating height (see
        # polished_initial_pose) — the reference is the INITIAL CoM height,
        # so the legs' regularization pose matches the walking crouch.
        # Explicit q0/base_rot0 starts skip the polish, so the squat
        # reference must still descend by com_height_drop from wherever
        # the given pose stands (otherwise e.g. exp_rigid --fromzero would
        # silently run with zero squat).
        if cfg.com_height_override is not None:
            com_z_ref = cfg.com_height_override
        elif used_polished:
            com_z_ref = com0[2]
        else:
            com_z_ref = com0[2] - cfg.com_height_drop

        # initial double-stance plan
        # planned soles are flat on the ground: project the (slightly tilted,
        # <1.3 deg at the crouch) FK sole poses to z=0 + yaw-only rotation
        plan = C.empty_plan(2, cfg.plan_phases, dtype)
        plan = plan._replace(
            act=plan.act.at[:, 0].set(0.0),
            deact=plan.deact.at[:, 0].set(C.BIG_TIME),
            valid=plan.valid.at[:, 0].set(1.0),
            pos=plan.pos.at[0, 0].set(fp[li].at[2].set(0.0)).at[1, 0].set(
                fp[ri].at[2].set(0.0)
            ),
            rot=plan.rot.at[0, 0].set(lie.rotz(lie.yaw_of(fR[li]))).at[1, 0].set(
                lie.rotz(lie.yaw_of(fR[ri]))
            ),
        )

        stage = C.mpc_stage_params(plan, 0.0, cfg.mpc.T, cfg.mpc.dt, cfg.mpc.n_slots)
        forces0 = F.nominal_force_guess(cfg.mpc, stage, dtype)[0]
        _, _, corner_k = F.interval_contact_geometry(
            cfg.mpc, stage, stage.slot_pos_nom
        )
        # MANN seed: the walk-ready (drop=0) crouch — the network's
        # training distribution (the reference seeds it with the Gazebo
        # spawn pose, CentroidalMPCBlock.cpp:271-370) — even when the
        # robot itself starts at the deeper operating crouch
        q_ready, _ = self.polished_initial_pose(dtype, drop=0.0)
        gen0 = G.initial_state(cfg.gen, model, q_ready)

        # rigid-body plant: spawn at the desired pose, settle onto the
        # penalty contact holding q0, then bootstrap the centroidal
        # integrator from the *measured* (odometry) CoM — the reference's
        # first-iteration bootstrap (WholeBodyQPBlock.cpp:1037-1080)
        # spawn the plant pre-loaded: sink by the static penetration so the
        # contact springs start carrying the weight instead of micro-bouncing
        # (zero-penetration spawn re-anchors the friction springs on every
        # bounce and the robot ratchet-slides during settling — measured)
        sink = (
            self.mass * 9.80665 / (8.0 * cfg.rigid.contact_kp)
            if cfg.rigid is not None
            else 0.0
        )
        rb0 = RB.initial_state(
            model, q0, base_rot0, base_pos - jnp.asarray([0.0, 0.0, sink], dtype),
            cfg=cfg.rigid if cfg.rigid is not None else RB.RigidBodyConfig(),
        )
        if cfg.rigid is not None:
            n_settle = int(round(cfg.rigid_settle_s / cfg.wbc_dt))
            rb0 = RB.settle(cfg.rigid, model, rb0, q0, cfg.wbc_dt, n_settle)
            # zero the friction-spring preload the settling sink built up
            # (RB.reset_anchors docstring — the hidden ±50 N lateral pull
            # that surfaces as a net push when one foot unloads)
            rb0 = RB.reset_anchors(model, rb0)
            ff0 = fixed_foot.detect(plan, jnp.zeros((), dtype), cfg.odom.initial_fixed_index)
            odo0 = legged_odom.OdometryState(ff0.index, ff0.rot, ff0.pos)
            eR, ep = legged_odom.base_pose(model, odo0, rb0.q)
            mlR, mlp = kin.fk(model, rb0.q, eR, ep)
            com0 = kin.com(model, mlR, mlp)
        else:
            ff0 = fixed_foot.detect(plan, jnp.zeros((), dtype), cfg.odom.initial_fixed_index)
            odo0 = legged_odom.OdometryState(ff0.index, ff0.rot, ff0.pos)

        return LoopState(
            t=jnp.zeros((), dtype),
            tick=jnp.zeros((), jnp.int32),
            x9=pack_state(com0, jnp.zeros(3, dtype), jnp.zeros(3, dtype)),
            com_xy_int=com0[0:2],
            base_rot=base_rot0,
            base_pos=base_pos,
            q=q0,
            warm=self.solver.cold_start(dtype),
            plan=plan,
            forces0=forces0,
            corner0=corner_k[0],
            active0=stage.active[:, 0],
            zmp_des=com0.at[2].set(0.0),
            gen_state=gen0,
            q_reg=q0,
            chest_yaw=jnp.zeros((), dtype),
            root_z_off=base_pos[2] - com0[2],
            com_z_ref=jnp.asarray(com_z_ref, dtype),
            ref_off=jnp.zeros(3, dtype),
            mpc_cost=jnp.zeros((), dtype),
            mpc_prim=jnp.zeros((), dtype),
            plant=P.initial_state(cfg.plant, q0),
            rb=rb0,
            com_mann=com0.at[2].set(com_z_ref),
            ang_mom_mann=jnp.zeros(3, dtype),
            hold=jnp.zeros((), dtype),
            hold_time=jnp.zeros((), dtype),
            joypad_lp=jnp.zeros(4, dtype).at[2].set(1.0),  # facing forward
            mann=StoredMann(
                # t0 = -inf so tick 0 always triggers a generator call
                # (the reference's first run calls unconditionally,
                # CentroidalMPCBlock.cpp:477); arrays are placeholders
                # overwritten by that call before any consumer reads them
                t0=jnp.asarray(-1e9, dtype),
                com=jnp.zeros((cfg.gen.n_steps, 3), dtype),
                ang_mom=jnp.zeros((cfg.gen.n_steps, 3), dtype),
                joints0=q0,
                yaw0=jnp.zeros((), dtype),
                plan=plan,
            ),
            odo=odo0,
            dyn=DynConfig(
                gait_hold_window=jnp.asarray(cfg.gait_hold_window, dtype),
                gait_hold_thresh=jnp.asarray(cfg.gait_hold_thresh, dtype),
                gait_hold_max_s=jnp.asarray(cfg.gait_hold_max_s, dtype),
                capture_margin_x=jnp.asarray(cfg.capture_margin_x, dtype),
                capture_margin_y=jnp.asarray(cfg.capture_margin_y, dtype),
                state_fb_gain=jnp.asarray(cfg.state_fb_gain, dtype),
                state_fb_l=jnp.asarray(cfg.state_fb_l, dtype),
                com_int_band=jnp.asarray(cfg.com_int_band, dtype),
                joypad_slew=jnp.asarray(cfg.joypad_slew, dtype),
                td_load_thresh=jnp.asarray(cfg.td_load_thresh, dtype),
                td_lookahead=jnp.asarray(cfg.td_lookahead, dtype),
                ang_mom_w=jnp.asarray(cfg.ang_mom_task_weight, dtype),
                cp_gov=jnp.asarray(cfg.cp_gov, dtype),
                lag_gov=jnp.asarray(cfg.lag_gov, dtype),
                lag_band=jnp.asarray(cfg.lag_band, dtype),
                cp_margin=jnp.asarray(cfg.cp_gov_margin, dtype),
                rush_gain=jnp.asarray(cfg.rush_gain, dtype),
                rush_margin=jnp.asarray(cfg.rush_margin, dtype),
                step_ext_max=jnp.asarray(cfg.step_ext_max, dtype),
                step_ext_margin=jnp.asarray(cfg.step_ext_margin, dtype),
                odom_blend=jnp.asarray(cfg.odom_blend, dtype),
                brake_speed=jnp.asarray(cfg.brake_speed, dtype),
                brake_margin=jnp.asarray(cfg.brake_margin, dtype),
                fwd_release=jnp.asarray(cfg.fwd_release, dtype),
                rush_ds=jnp.asarray(cfg.rush_ds, dtype),
                chest_w_rp=jnp.asarray(cfg.chest_w_rp, dtype),
                chest_lean_gain=jnp.asarray(cfg.chest_lean_gain, dtype),
                step_reach_len=jnp.asarray(cfg.step_reach_len, dtype),
                crouch_gain=jnp.asarray(cfg.crouch_gain, dtype),
                crouch_max=jnp.asarray(cfg.crouch_max, dtype),
            ),
        )

    # -- MPC + MANN stage (every cfg.mpc_every ticks) ---------------------------

    def _mpc_stage(self, s: LoopState, inp: TickInput) -> LoopState:
        cfg, model = self.cfg, self.model
        dtype = s.x9.dtype
        mpc = cfg.mpc

        # 0. joystick slew limit (config.joypad_slew docstring): step
        # commands from the episode inputs ramp at a thumb-realistic rate;
        # facing passes through unchanged. slew == 0 disables.
        dmax = s.dyn.joypad_slew * mpc.dt
        motion = s.joypad_lp[0:2] + jnp.clip(
            inp.joypad[0:2] - s.joypad_lp[0:2], -dmax, dmax
        )
        motion = jnp.where(s.dyn.joypad_slew > 0, motion, inp.joypad[0:2])
        joypad = jnp.concatenate([motion, inp.joypad[2:4]])
        # the slew state and stand-mode `moving` key off the slewed,
        # PRE-governor command: the governor scales the command
        # instantaneously without corrupting the slew filter or
        # flickering the controller into stand mode
        joypad_pre_gov = joypad
        moving = jnp.linalg.norm(joypad[0:2]) > cfg.stand_threshold

        # 0b. rigid-plant measurements + GAIT-HOLD decision + CAPTURE
        # GOVERNOR (moved ahead of the input builder so the governor can
        # shape the command this same tick). See config.gait_hold_window /
        # config.cp_gov docstrings.
        hold = jnp.zeros((), dtype)
        hold_time = s.hold_time
        if cfg.rigid is not None:
            prev_plan = C.snap_to_grid(s.plan, mpc.dt)
            feet_prev = swing_foot.evaluate(prev_plan, s.t, cfg.swing)
            load = s.rb.corner_forces[..., 2].sum(-1) / (self.mass * 9.80665)
            # measured kinematics in the CURRENT estimate frame (anchored
            # on the previous plan's fixed foot): sole poses for the
            # landing reconciliation, estimated centroidal state for the
            # capture gate (x9 lags the estimate by the feedback time
            # constant — gating on it released into unrecoverable states)
            # the persistent anchor (updated at the last WBC tick) — the
            # same estimate frame the WBC stage uses
            odo_r = s.odo
            if cfg.perfect_state:
                bR, bp = s.rb.base_rot, s.rb.base_pos
            else:
                bR, bp = legged_odom.base_pose_fused(
                    model, odo_r, s.rb.q, s.rb.base_rot
                )
            lRr, lpr = kin.fk(model, s.rb.q, bR, bp)
            fRr, fpr = kin.frame_poses(model, lRr, lpr)
            li = model.frame_index("l_sole")
            ri = model.frame_index("r_sole")
            meas_pos = jnp.stack([fpr[li], fpr[ri]]).at[:, 2].set(0.0)
            meas_rot = lie.rotz(
                jnp.stack([lie.yaw_of(fRr[li]), lie.yaw_of(fRr[ri])])
            )
            com_r = kin.com(model, lRr, lpr)
            if cfg.perfect_state:
                nu_r = s.rb.nu[0:6]
            else:
                nu_r = legged_odom.base_twist(
                    model, odo_r, s.rb.q, s.rb.nu[6:], bR, bp
                )
            h_r = kin.centroidal_momentum(
                model, lRr, lpr, jnp.concatenate([nu_r, s.rb.nu[6:]])
            )
            dcom_r = h_r[0:3] / self.mass
            # pause BEFORE lift-off, while the foot is still ACTIVE in the
            # plan: the MPC keeps two-foot force authority, so its schedule
            # can push off the lagging foot to finish the transfer (the
            # ZMP must pass RIGHT of the CoM to accelerate it left and
            # vice versa). Pausing after deactivation instead pins the
            # MPC's ZMP to the stance foot mid-transfer — an inverted
            # pendulum accelerating AWAY from it, which measurably loads
            # the swing foot harder until the robot falls (trace 2026-08-21:
            # hold_frac 0.55, fall at 0.99 s).
            idxp, in_cp = C.active_phase(prev_plan, s.t)
            _, deact_p, pos_cp, _, _ = C.gather_phase(prev_plan, idxp)
            about_to_lift = (in_cp > 0.5) & (deact_p <= s.t + mpc.dt + 1e-6)
            early_swing = (feet_prev.in_contact < 0.5) & (
                feet_prev.progress < s.dyn.gait_hold_window
            )
            # capture condition: lifting foot i is only safe if the
            # instantaneous capture point (LIPM: com + dcom*sqrt(z/g))
            # lies in the hull of the OTHER foot's current stance and
            # foot i's upcoming landing, expanded by a margin — releasing
            # on load alone lifts into an unrecoverable lateral state
            # (measured: release at load 0.24 with the capture point
            # 0.2 m outside the stance foot, fall within 0.4 s)
            cp_xy = com_r[0:2] + dcom_r[0:2] * jnp.sqrt(
                jnp.maximum(com_r[2], 0.3) / 9.80665
            )
            idxn, has_n = C.next_phase(prev_plan, s.t)
            _, _, pos_n, _, _ = C.gather_phase(prev_plan, idxn)
            land_xy = jnp.where(has_n[:, None] > 0, pos_n[:, 0:2], pos_cp[:, 0:2])
            stance_xy = pos_cp[::-1, 0:2]  # the OTHER foot's stance pose
            margin = jnp.stack([s.dyn.capture_margin_x, s.dyn.capture_margin_y])
            lo = jnp.minimum(stance_xy, land_xy) - margin
            hi = jnp.maximum(stance_xy, land_xy) + margin
            capture_ok = jnp.all((cp_xy >= lo) & (cp_xy <= hi), axis=-1)
            # FORWARD CAPTURE ESCAPE (config.fwd_release docstring): the
            # hold conditions above treat every transfer lag as "pause
            # and finish the transfer", which is right while the
            # REMAINING stance foot can still capture the fall but fatal
            # once the capture point passes that foot's toe along the
            # travel direction: from there no amount of two-foot force
            # scheduling brings the CoM back — the lifting foot's step
            # (rushed, capture-extended) is the only recovery, and a
            # pause just delays it while the robot rolls over the front
            # toe (measured terminal mode of the 4.4-4.8 s runs: a
            # double-support LOAD hold at hold=1.0 while the capture
            # point marched 0.28 m past the toe). Released at the same
            # geometric boundary the gait-rush engages on (+rush_margin),
            # so the clock switches from hold straight into rush.
            spd_m = jnp.linalg.norm(dcom_r[0:2])
            vdir_m = dcom_r[0:2] / jnp.maximum(spd_m, 1e-6)
            toe_other = (
                pos_cp[::-1, 0:2] @ vdir_m + 0.08
            )  # [2] remaining-stance-foot toe along travel, per lifting foot
            fwd_escape = (
                (jnp.dot(cp_xy, vdir_m) > toe_other + s.dyn.rush_margin)
                & (spd_m > 0.05)
                & (s.dyn.fwd_release > 0)
            )
            # fwd_escape vetoes the hold outright (load-lag holds
            # included): any pause while the capture point is out past
            # the leading edge just delays the step that must catch it
            lagging = (
                (about_to_lift | early_swing)
                & ((load > s.dyn.gait_hold_thresh) | ~capture_ok)
                & ~fwd_escape
            )
            # OVERSPEED DOUBLE-SUPPORT BRAKE (config.brake_speed
            # docstring): the round-4 runaway (RESULTS.md §5d) ratchets
            # speed up step by step — each rushed landing still arrives
            # behind the capture point and adds impulse until the plant
            # out-runs its leg geometry. Foot placement stops braking
            # once the needed capture step exceeds reach; double support
            # does not: with both feet loaded the ZMP can travel the
            # whole two-foot polygon. While the measured speed exceeds
            # brake_speed and the capture point is still coverable by a
            # loaded toe (+brake_margin along travel — past that,
            # stepping is the only brake left and holding makes it
            # worse), pause the clock BEFORE lift-off so the MPC sheds
            # the speed with two-foot force authority. (spd_m/vdir_m
            # computed above for the forward-escape test.)
            toe_al = jnp.max(
                jnp.where(load > 0.05, pos_cp[:, 0:2] @ vdir_m + 0.08, -1e9)
            )
            brake = (
                (s.dyn.brake_speed > 0)
                & (spd_m > s.dyn.brake_speed)
                & (jnp.dot(cp_xy, vdir_m) < toe_al + s.dyn.brake_margin)
            )
            lagging = lagging | (about_to_lift & brake)
            # never pause while some foot is in LATE swing: freezing the
            # clock then freezes that foot's descent mid-air (measured:
            # a 0.2 s hover at apex while the base drifts away) — let it
            # land first; the next double support is where holds help
            late_swing = (feet_prev.in_contact < 0.5) & (
                feet_prev.progress >= s.dyn.gait_hold_window
            )
            want = (
                jnp.any(lagging)
                & ~jnp.any(late_swing)
                & (s.dyn.gait_hold_window > 0)
            )
            hold = (want & (s.hold_time < s.dyn.gait_hold_max_s)).astype(dtype)
            hold_time = jnp.where(want, s.hold_time + mpc.dt, 0.0)

            # CAPTURE GOVERNOR (config.cp_gov docstring): scale the
            # commanded motion down when the measured capture point runs
            # ahead of what the current support + bounded step adjustment
            # can cover — forward momentum is shed by slowing the
            # commanded gait BEFORE the stance ZMP saturates at the toe.
            # Gain is traced (DynConfig.cp_gov, 1/m; 0 disables).
            # reach is STANCE-ONLY (+ its own cp_margin): counting the
            # upcoming landing made the governor blind to the measured
            # overspeed window (the capture point legitimately travels
            # toward the landing only if the swing foot actually gets
            # there in time — that is the gait-rush's job below)
            sup_w = (load > 0.05).astype(dtype)
            toe_x = jnp.max(
                jnp.where(sup_w > 0, pos_cp[:, 0] + 0.08, -1e9)
            )
            reach_x = toe_x + s.dyn.cp_margin
            overshoot = jnp.maximum(cp_xy[0] - reach_x, 0.0)
            gov = jnp.clip(1.0 - s.dyn.cp_gov * overshoot, 0.0, 1.0)
            gov = jnp.where(s.dyn.cp_gov > 0, gov, 1.0)

            # CoM-LAG GOVERNOR (config.lag_gov docstring): the round-4
            # vault trace shows the measured CoM falling ever further
            # BEHIND the stance feet (plan marches at commanded speed, the
            # plant slower) until forward acceleration becomes
            # geometrically infeasible (the required ZMP moves behind the
            # heel) and the stance ankle pumps backward pitch instead.
            # Slow the command in proportion to how far the CoM lags the
            # loaded support along the motion direction.
            yaw_b = lie.yaw_of(bR)
            mnorm = jnp.linalg.norm(joypad[0:2])
            mdir_b = joypad[0:2] / jnp.maximum(mnorm, 1e-6)
            cy, sy = jnp.cos(yaw_b), jnp.sin(yaw_b)
            mdir_w = jnp.stack(
                [cy * mdir_b[0] - sy * mdir_b[1], sy * mdir_b[0] + cy * mdir_b[1]]
            )
            sup_w2 = (load > 0.05).astype(dtype)
            sup_c = (sup_w2[:, None] * pos_cp[:, 0:2]).sum(0) / jnp.maximum(
                sup_w2.sum(), 1.0
            )
            lag = jnp.dot(sup_c - com_r[0:2], mdir_w)
            gov2 = jnp.clip(
                1.0 - s.dyn.lag_gov * jnp.maximum(lag - s.dyn.lag_band, 0.0),
                0.0,
                1.0,
            )
            gov2 = jnp.where((s.dyn.lag_gov > 0) & (mnorm > 1e-3), gov2, 1.0)
            joypad = jnp.concatenate([joypad[0:2] * (gov * gov2), joypad[2:4]])

        # 1. joystick -> desired base trajectory
        desired = build_desired_trajectory(
            joypad[0:2], joypad[2:4], cfg.input_builder
        )

        # 1b. GENERATOR-PLAN RE-SYNC (config.gen_resync docstring):
        # translate the generator's virtual world onto the reconciled
        # plan's stance sole, so the reference pipeline progresses at the
        # plant's realized speed instead of the commanded one
        gen_state = s.gen_state
        stored = s.mann
        if cfg.rigid is not None and cfg.gen_resync:
            plan0 = C.snap_to_grid(s.plan, mpc.dt)
            idx0, in0 = C.active_phase(plan0, s.t)
            _, _, pos0, _, _ = C.gather_phase(plan0, idx0)
            w0 = ((in0 > 0.5) & (gen_state.contact > 0.5)).astype(dtype)
            dxy = (
                (pos0[:, 0:2] - gen_state.foot_pose_xy_yaw[:, 0:2])
                * w0[:, None]
            ).sum(0) / jnp.maximum(w0.sum(), 1.0)
            gen_state = gen_state._replace(
                base_xy=gen_state.base_xy + dxy,
                hist_xy=gen_state.hist_xy + dxy,
                foot_pose_xy_yaw=gen_state.foot_pose_xy_yaw.at[:, 0:2].add(dxy),
            )
            # the stored rollout lives in the same virtual world — shift it
            # too so between-call re-slicing stays consistent
            stored = stored._replace(
                com=stored.com.at[:, 0:2].add(dxy),
                plan=stored.plan._replace(
                    pos=stored.plan.pos.at[..., 0:2].add(dxy)
                ),
            )

        # timing tables for the frequency adapters: the input knots are
        # spaced slow_down_factor * gen.dt apart in REAL time (the
        # reference scales them the same way, CentroidalMPCBlock.cpp:
        # 202-211) — at factor 5 the 0.8 s gait horizon covers 4 s
        slow = cfg.gen.slow_down_factor
        gen_times = (jnp.arange(cfg.gen.n_steps, dtype=dtype) + 1.0) * (
            cfg.gen.dt * slow
        )
        knot_times = jnp.arange(mpc.N, dtype=dtype) * mpc.dt

        # 2. MANN autoregression — advanced only when mannCallingTime =
        # lcm(slow_down_factor * gen dT, mpc dT) of gait time has elapsed
        # since the previous call (CentroidalMPCBlock.cpp:262-265,477-500):
        # every MPC tick for the factor-1 sim robots and ergoCubSN000,
        # every 5th tick for ergoCubSN001 (factor 5 at 60 ms). The call
        # re-roots the autoregression mann_advance (= the reference's
        # mergePointIndex) knots into the previous rollout and stores the
        # fresh rollout; between calls step 3 re-slices the stored one.
        # Gait time pauses under gait-hold, so calls defer naturally.
        # slack of half a WBC tick: gait time accumulates in f32 (up to
        # ~1e-5 error over an MPC period at t ~ 10 s), and a call can
        # never legitimately become due half a WBC tick early
        call_now = (
            s.t - stored.t0 >= cfg.mann_calling_time - 0.5 * cfg.wbc_dt
        ) | (s.tick == 0)

        def _call_gen(args):
            gen_state, _ = args
            _, outs, states = G.generate_with_states(
                cfg.gen, model, self.weights, gen_state, desired
            )
            gen_next = jax.tree_util.tree_map(
                lambda a: a[cfg.mann_advance - 1], states
            )
            # MANN contact plan (absolute times). Prepend the generator's
            # state at the current time so the ongoing stance phase covers
            # t (otherwise the merged plan would have a one-sample hole).
            flags = jnp.concatenate(
                [gen_state.contact[None], outs.contact], axis=0
            )
            pose_tl = jnp.concatenate(
                [gen_state.foot_pose_xy_yaw[None], outs.foot_pose_xy_yaw],
                axis=0,
            )
            tl_times = s.t + jnp.concatenate([jnp.zeros(1, dtype), gen_times])
            foot_pos = jnp.concatenate(
                [
                    pose_tl[..., 0:2],
                    jnp.zeros(pose_tl.shape[:-1] + (1,), dtype),
                ],
                axis=-1,
            )
            foot_rot = lie.rotz(pose_tl[..., 2])
            mann_plan = C.plan_from_timeline(
                flags, tl_times, foot_pos, foot_rot, P=cfg.plan_phases
            )
            return gen_next, StoredMann(
                t0=s.t,
                com=outs.com,
                ang_mom=outs.ang_mom,
                joints0=outs.joints[0],
                yaw0=outs.base_xy_yaw[0, 2],
                plan=mann_plan,
            )

        gen_next, stored = jax.lax.cond(
            call_now, _call_gen, lambda args: args, (gen_state, stored)
        )

        # 3. frequency adapters: stored rollout -> MPC knots at ABSOLUTE
        # times (CentroidalMPCBlock.cpp:544-577): MPC knot i reads the
        # stored timeline at (s.t - t0) + i*mpc.dt past the call — offset
        # 0 on call ticks, sliding forward between calls; clamped beyond
        # the stored horizon.
        rel_times = (s.t - stored.t0) + knot_times
        com_ref, _ = linear_spline(gen_times, stored.com, rel_times)
        com_ref = com_ref.at[:, 2].set(s.com_z_ref)  # z override (:531-534)
        # startup shaping: decay the initial reference mismatch instead of
        # tracking it as a step change (config.ref_ramp_tau docstring). The
        # offset decays along the horizon too, so every receding-horizon
        # solve previews a consistent target trajectory.
        if cfg.ref_ramp > 0.0:
            decay = jnp.exp(jnp.asarray(-mpc.dt / cfg.ref_ramp, dtype))
            ref_off = jnp.where(
                s.tick == 0, s.x9[0:3] - com_ref[0], s.ref_off * decay
            )
            kdec = decay ** jnp.arange(mpc.N, dtype=dtype)
            com_ref = com_ref + ref_off[None, :] * kdec[:, None]
        else:
            ref_off = s.ref_off
        L_ref, _ = linear_spline(gen_times, stored.ang_mom, rel_times)
        # 1/m scaling (:525-529); an additional 1/slow_down_factor because
        # the same configuration path traversed slow x slower carries
        # slow x less angular momentum (velocities scale with the time
        # stretch; at factor 1 this is a no-op)
        L_ref = L_ref * (cfg.ang_mom_ref_scale / (self.mass * slow))

        # 5. merge the stored MANN plan with the previous (adjusted) plan,
        # snap to the MPC grid
        plan = C.merge_plans(stored.plan, s.plan, s.t)
        plan = C.snap_to_grid(plan, mpc.dt)

        # STAND MODE: with a ~zero joystick command the shipped MANN nets
        # drift (they were trained almost exclusively on locomotion — the
        # reference's own mann.ini model history shows "more-standing-data"
        # retrains addressing exactly this; the production net it configures
        # is not shipped). When the commanded motion is below threshold,
        # freeze the autoregression and hold the references at the stance
        # centroid instead. The MPC still solves every tick, so push
        # recovery (incl. step adjustment out of stand) stays active.
        if cfg.stand_mode:
            sel = lambda a, b: jnp.where(moving, a, b)
            gen_next = jax.tree_util.tree_map(sel, gen_next, gen_state)
            plan = jax.tree_util.tree_map(sel, plan, C.snap_to_grid(s.plan, mpc.dt))
            # hold CoM over the active-contact centroid at reference height
            act_now = C.mpc_stage_params(s.plan, s.t, 1, mpc.dt, mpc.n_slots)
            w_act = act_now.active[:, 0]
            pos_now = jnp.einsum(
                "is,isx->ix", act_now.slot_onehot[:, 0, :], act_now.slot_pos_nom
            )
            feet_mid = (w_act[:, None] * pos_now).sum(0) / jnp.maximum(w_act.sum(), 1.0)
            com_hold = jnp.concatenate([feet_mid[0:2], s.com_z_ref[None]])
            com_ref = sel(com_ref, jnp.broadcast_to(com_hold, com_ref.shape))
            L_ref = sel(L_ref, jnp.zeros_like(L_ref))

        # GAIT-HOLD freeze (decision + measurements computed in step 0b):
        # while the clock is paused, the generator state and the plan stay
        # at their previous values so swing, landing, and the MPC's force
        # schedule all retime together.
        if cfg.rigid is not None:
            selh = lambda frozen, live: jax.tree_util.tree_map(
                lambda a, b: jnp.where(hold > 0, a, b), frozen, live
            )
            gen_next = selh(gen_state, gen_next)
            plan = selh(prev_plan, plan)

        # CONTACT RECONCILIATION (config.reconcile_contacts docstring):
        # at the ACTIVATION tick of each contact, write the foot's
        # MEASURED sole pose (current estimate frame) into the plan — the
        # odometry then re-anchors where the foot actually landed instead
        # of teleporting by the landing error. Exactly once per landing:
        # continuous re-writing lets the estimate frame chase the foot's
        # own impact dynamics (measured: the estimated CoM swung +0.14 m
        # during a landing while the true CoM moved 6 mm), and no load
        # gate — an active-but-still-descending foot sits at its
        # commanded (≈ planned) pose in the estimate frame anyway, while
        # a load gate loses the race against the fixed-foot switch.
        if cfg.rigid is not None and cfg.reconcile_contacts:
            idx_c, in_c = C.active_phase(plan, s.t)
            act_c, _, _, _, _ = C.gather_phase(plan, idx_c)
            upd = (
                (in_c > 0.5)
                # first two periods of the phase: catches a touchdown that
                # physically completes just after the planned activation,
                # then freezes the anchor
                & (act_c > s.t - 2.0 * mpc.dt - 1e-6)
                & (hold < 0.5)  # frozen clock: activation is not fresh
            )
            onehot = jnp.arange(plan.num_phases)[None, :] == idx_c[:, None]
            sel = (upd[:, None] & onehot)[..., None]
            plan = plan._replace(
                pos=jnp.where(sel, meas_pos[:, None, :], plan.pos),
                rot=jnp.where(sel[..., None], meas_rot[:, None], plan.rot),
            )

            # EARLY ACTIVATION (config.td_load_thresh docstring, (b)): a
            # swinging foot that already carries load, with its planned
            # activation within td_lookahead, becomes active in the plan
            # NOW — the MPC force schedule, the fixed-foot detector and
            # the desired ZMP gain the new support immediately
            idxn_e, has_ne = C.next_phase(plan, s.t)
            act_ne, _, _, _, _ = C.gather_phase(plan, idxn_e)
            _, in_ce = C.active_phase(plan, s.t)
            early_act = (
                (in_ce < 0.5)
                & (has_ne > 0.5)
                & (load > s.dyn.td_load_thresh)
                & (act_ne <= s.t + s.dyn.td_lookahead)
                & (s.dyn.td_load_thresh > 0)
            )
            onehot_n = jnp.arange(plan.num_phases)[None, :] == idxn_e[:, None]
            plan = plan._replace(
                act=jnp.where(early_act[:, None] & onehot_n, s.t, plan.act)
            )

        if cfg.rigid is not None:
            # CAPTURE STEP EXTENSION (config.step_ext_max docstring): move
            # a swing foot's upcoming landing forward to the measured
            # capture point + margin when the capture point has escaped
            # past it — landings ahead of the capture point decelerate;
            # behind, every step pumps the measured 1.2 m/s runaway.
            idxn_s, has_ns = C.next_phase(plan, s.t)
            _, _, pos_ns, _, _ = C.gather_phase(plan, idxn_s)
            mv = jnp.linalg.norm(dcom_r[0:2])
            dirx = dcom_r[0:2] / jnp.maximum(mv, 1e-6)
            _, in_cs = C.active_phase(plan, s.t)
            lead = jnp.einsum(
                "x,ix->i", dirx, cp_xy[None, :] - pos_ns[:, 0:2]
            )
            ext = jnp.clip(
                lead + s.dyn.step_ext_margin, 0.0, s.dyn.step_ext_max
            )
            # GEOMETRIC REACH CAP (config.step_reach_len docstring): cap
            # the commanded landing's forward offset from the measured CoM
            # at what the leg can span at the current CoM height — an
            # unreachable landing makes the foot hover while the robot
            # rolls over the stance toe (measured terminal mode, RESULTS
            # §5g). 0 disables (parity default).
            off0 = jnp.einsum(
                "x,ix->i", dirx, pos_ns[:, 0:2] - com_r[None, 0:2]
            )
            d_max = jnp.sqrt(
                jnp.maximum(s.dyn.step_reach_len**2 - com_r[2] ** 2, 0.0)
            )
            ext_cap = jnp.maximum(d_max - off0, 0.0)
            ext = jnp.where(
                s.dyn.step_reach_len > 0, jnp.minimum(ext, ext_cap), ext
            )
            do_ext = (
                (in_cs < 0.5)  # the foot is currently swinging
                & (has_ns > 0.5)
                & (lead > 0.0)
                & (s.dyn.step_ext_max > 0)
                & (mv > 0.1)
            )
            new_xy = pos_ns[:, 0:2] + dirx[None, :] * ext[:, None]
            onehot_s = jnp.arange(plan.num_phases)[None, :] == idxn_s[:, None]
            sel_s = (do_ext[:, None] & onehot_s)[..., None]
            plan = plan._replace(
                pos=jnp.where(
                    sel_s,
                    jnp.concatenate(
                        [new_xy, jnp.zeros_like(new_xy[:, :1])], axis=-1
                    )[:, None, :],
                    plan.pos,
                )
            )

        # 6. solve the MPC from the integrated state (adherent loop)
        stage = C.mpc_stage_params(plan, s.t, mpc.T, mpc.dt, mpc.n_slots)
        # measured external wrench with the same 0.7 N deadband the WBC
        # applies before forwarding it (WholeBodyQPBlock.cpp:1018-1021)
        ext_f, ext_tau = P.deadband_wrench(inp.ext_force, inp.ext_torque, self.mass)
        params = F.MPCParams(
            x0=s.x9,
            com_ref=com_ref,
            ang_mom_ref=L_ref,
            stage=stage,
            ext_force=ext_f,
            ext_torque=ext_tau,
        )
        sol = self.solver.solve(params, s.warm)
        warm = self.solver.warm_from(params, sol)

        # 7. write adjusted footsteps back; hold first-interval forces
        plan = C.write_back_adjusted(plan, s.t, mpc.n_slots, sol.positions, stage.slot_valid)
        _, _, corner_k = F.interval_contact_geometry(mpc, stage, sol.positions)
        pos_k0 = jnp.einsum("is,isx->ix", stage.slot_onehot[:, 0, :], sol.positions)
        zmp_des = desired_zmp_from_corners(
            sol.forces[0], corner_k[0], centers=pos_k0
        )

        return s._replace(
            warm=warm,
            plan=plan,
            forces0=sol.forces[0],
            corner0=corner_k[0],
            active0=stage.active[:, 0],
            zmp_des=zmp_des,
            gen_state=gen_next,
            # posture regularization: only the UPPER BODY (torso+neck+arms,
            # tail 14) tracks MANN; the legs stay at the initial
            # configuration (m_jointPosRegularize.tail<14>() = ...,
            # WholeBodyQPBlock.cpp:975-979 — legs are fully constrained by
            # the hard tasks, so MANN leg posture would only fight them)
            q_reg=(
                jnp.where(
                    moving if cfg.stand_mode else True,
                    jnp.concatenate([s.q_reg[0:12], stored.joints0[12:26]]),
                    s.q_reg,
                )
            ),
            chest_yaw=(
                jnp.where(moving, stored.yaw0, s.chest_yaw)
                if cfg.stand_mode
                else stored.yaw0
            ),
            mpc_cost=sol.cost,
            mpc_prim=sol.prim_res,
            ref_off=ref_off,
            com_mann=com_ref[0],
            ang_mom_mann=L_ref[0],
            hold=hold,
            hold_time=hold_time,
            joypad_lp=joypad_pre_gov,
            mann=stored,
        )

    # -- WBC stage (every tick) -------------------------------------------------

    def _wbc_stage(self, s: LoopState, inp: TickInput) -> tuple[LoopState, Telemetry]:
        cfg, model = self.cfg, self.model
        dt = cfg.wbc_dt

        pcfg = cfg.plant

        if cfg.rigid is not None:
            # full rigid-body plant (the Gazebo stand-in): PD servos track
            # the PositionDirect stream through the Lagrangian dynamics;
            # the push is a real force on the base, not just a measured
            # wrench. Encoders read the physical joints.
            rbs = RB.dynamics_step(
                cfg.rigid, model, s.rb, s.q, dt,
                ext_force_base=inp.ext_force * self.mass,
            )
            q_meas = rbs.q
            ps = s.plant
        else:
            rbs = s.rb
            # kinematic plant: actual joints track the PositionDirect stream
            # (servo lag), encoders read them with noise; with the default
            # ideal plant this reduces to q_meas == commanded q
            ps = P.servo_step(pcfg, s.plant, s.q, dt)
            q_meas, _dq_meas, ps = P.read_joints(pcfg, ps)

        # estimation: fixed foot + legged odometry on the measured joints;
        # with the rigid plant the base attitude comes from the (ideal)
        # base IMU — kinematic-only odometry cannot observe the robot
        # rocking on a foot edge (legged_odom.base_pose_fused docstring)
        ff = fixed_foot.detect(s.plan, s.t, cfg.odom.initial_fixed_index)
        if cfg.rigid is not None:
            # persistent odometry anchor + complementary plan pull
            # (config.odom_blend docstring): on a fixed-frame switch the
            # new sole is pinned at its MEASURED pose in the current
            # estimate frame (continuity — the base estimate cannot jump),
            # flattened to the ground prior (z=0, yaw-only); every tick
            # the anchor then pulls toward the plan's reconciled pose by
            # the traced fraction. odom_blend=1 reproduces the
            # reference's instant plan anchoring (changeFixedFrame,
            # WholeBodyQPBlock.cpp:300-320).
            switched = ff.index != s.odo.fixed_index
            bR0, bp0 = legged_odom.base_pose_fused(
                model, s.odo, q_meas, rbs.base_rot
            )
            lR0, lp0 = kin.fk(model, q_meas, bR0, bp0)
            fR0, fp0 = kin.frame_poses(model, lR0, lp0)
            li0 = model.frame_index("l_sole")
            ri0 = model.frame_index("r_sole")
            new_p = jnp.where(ff.index == 0, fp0[li0], fp0[ri0]).at[2].set(0.0)
            new_yaw = jnp.where(
                ff.index == 0, lie.yaw_of(fR0[li0]), lie.yaw_of(fR0[ri0])
            )
            cont_pos = jnp.where(switched, new_p, s.odo.fixed_pos)
            cont_yaw = jnp.where(
                switched, new_yaw, lie.yaw_of(s.odo.fixed_rot)
            )
            a = s.dyn.odom_blend
            dyaw = lie.yaw_of(ff.rot) - cont_yaw
            dyaw = jnp.arctan2(jnp.sin(dyaw), jnp.cos(dyaw))
            odo = legged_odom.OdometryState(
                ff.index,
                lie.rotz(cont_yaw + a * dyaw),
                cont_pos + a * (ff.pos - cont_pos),
            )
        else:
            odo = legged_odom.OdometryState(ff.index, ff.rot, ff.pos)
        if cfg.rigid is not None and cfg.perfect_state:
            base_est_R, base_est_p = rbs.base_rot, rbs.base_pos
        elif cfg.rigid is not None:
            base_est_R, base_est_p = legged_odom.base_pose_fused(
                model, odo, q_meas, rbs.base_rot
            )
        else:
            base_est_R, base_est_p = legged_odom.base_pose(model, odo, q_meas)

        # measured external wrench, deadbanded below 0.7 N
        # (WholeBodyQPBlock.cpp:1018-1021)
        ext_f, ext_tau = P.deadband_wrench(inp.ext_force, inp.ext_torque, self.mass)

        # centroidal integrator under held MPC forces (+ measured push)
        dyn = lambda x: centroidal_dynamics(
            x, s.forces0, s.corner0, s.active0, ext_f, ext_tau
        )
        x9 = rk4_step(dyn, s.x9, dt)
        com_des3, dcom_des3 = x9[0:3], x9[3:6]

        # measured CoM: FK of the estimated robot state (the reference's
        # kinDynWithMeasured, WholeBodyQPBlock.cpp:950-991)
        lR, lp = kin.fk(model, q_meas, base_est_R, base_est_p)
        com_meas = kin.com(model, lR, lp)

        # measured-state feedback into the centroidal integrator
        # (config.state_fb_gain docstring): estimated centroidal state from
        # measurements only — odometry FK CoM, kinematic base twist from
        # the fixed-sole constraint, measured joint velocities
        if cfg.rigid is not None:
            qd_meas = rbs.nu[6:]  # ideal encoders on the rigid plant
            if cfg.perfect_state:
                nu_est = rbs.nu[0:6]
            else:
                nu_est = legged_odom.base_twist(
                    model, odo, q_meas, qd_meas, base_est_R, base_est_p
                )
            h = kin.centroidal_momentum(
                model, lR, lp, jnp.concatenate([nu_est, qd_meas])
            )
            meas9 = pack_state(com_meas, h[0:3] / self.mass, h[3:6] / self.mass)
            # LATERAL-ONLY feedback: blending the z channel makes the
            # commanded height FOLLOW a physical sag — the IK's root-z
            # error stays ~0, the legs never extend to push back, and a
            # landing compression turns into an upright straight-down
            # collapse (measured: base z 0.74 -> 0.36 in 0.5 s with the
            # base perfectly level). Height must track the plan stiffly;
            # only the horizontal channels (and L) follow reality.
            g, gl = s.dyn.state_fb_gain, s.dyn.state_fb_l
            zero = jnp.zeros_like(g)
            fb_rate = jnp.stack(
                [g, g, zero, g, g, zero, gl, gl, gl]
            )
            x9 = x9 + dt * fb_rate * (meas9 - x9)
            com_des3, dcom_des3 = x9[0:3], x9[3:6]
        # measured ZMP from the wrench sensors (evaluateZMP, :737-803)
        if cfg.rigid is not None:
            # the real thing: the plant's contact forces at the corner
            # positions of the odometry-frame kinematics (the reference
            # rotates measured sole wrenches into the odometry world the
            # same way, WholeBodyQPBlock.cpp:745-777)
            fRm, fpm = kin.frame_poses(model, lR, lp)
            cl = jnp.asarray(RB.default_corners(2), q_meas.dtype)
            corner_meas = jnp.stack(
                [
                    fpm[model.frame_index(f)]
                    + jnp.einsum("ab,jb->ja", fRm[model.frame_index(f)], cl[i])
                    for i, f in enumerate(("l_sole", "r_sole"))
                ]
            )
            zmp_meas = desired_zmp_from_corners(
                rbs.corner_forces, corner_meas, centers=corner_meas.mean(axis=1)
            )
        elif pcfg.wrench_noise > 0.0:
            zmp_meas, ps = P.read_zmp(
                pcfg, ps, s.forces0, s.corner0, s.corner0.mean(axis=1)
            )
        else:
            zmp_meas = s.zmp_des

        v_cmd = com_zmp_control(
            dcom_des3[0:2],
            com_des3[0:2],
            s.zmp_des[0:2],
            com_meas[0:2],
            zmp_meas[0:2],
            lie.yaw_of(s.base_rot),
            cfg.gains,
        )
        com_xy_int = s.com_xy_int + dt * v_cmd
        if cfg.rigid is not None:
            # anti-windup (config.com_int_band docstring): the integrated
            # CoM command stays within a physical-authority band of the
            # measured CoM; band == 0 disables
            clipped = jnp.clip(
                com_xy_int,
                com_meas[0:2] - s.dyn.com_int_band,
                com_meas[0:2] + s.dyn.com_int_band,
            )
            com_xy_int = jnp.where(s.dyn.com_int_band > 0, clipped, com_xy_int)

        feet = swing_foot.evaluate(s.plan, s.t, cfg.swing)

        if cfg.rigid is not None:
            # EARLY-TOUCHDOWN gate (config.td_load_thresh docstring, (a)):
            # a late-swing foot that already measures ground load is DOWN —
            # hold its target at the measured sole pose instead of driving
            # it through the floor (measured: the un-gated descent command
            # on an early-landed foot vaults the robot over it)
            load_w = rbs.corner_forces[..., 2].sum(-1) / (self.mass * 9.80665)
            fRm2, fpm2 = kin.frame_poses(model, lR, lp)
            # late-swing classification shares the (traced) gait_hold_window
            # threshold with the MPC-stage hold logic — a single early/late
            # split, so tuning the window cannot desynchronize the two
            early_td = (
                (feet.in_contact < 0.5)
                & (feet.progress > s.dyn.gait_hold_window)
                & (load_w > s.dyn.td_load_thresh)
                & (s.dyn.td_load_thresh > 0)
            )
            sole_meas2 = jnp.stack(
                [fpm2[model.frame_index("l_sole")], fpm2[model.frame_index("r_sole")]]
            )
            hold_pos2 = sole_meas2.at[:, 2].set(
                jnp.maximum(sole_meas2[:, 2], 0.0)
            )
            g2 = early_td[:, None]
            feet = feet._replace(
                pos=jnp.where(g2, hold_pos2, feet.pos),
                lin_vel=jnp.where(g2, 0.0, feet.lin_vel),
                ang_vel=jnp.where(g2, 0.0, feet.ang_vel),
            )

        if cfg.rigid is not None and cfg.lift_gate_window > 0.0:
            # contact-force-gated swing lift (config.lift_gate_window
            # docstring): hold the measured sole pose until the plant's
            # own contact forces say the foot is unloaded
            fz_foot = rbs.corner_forces[..., 2].sum(-1)  # [nc] N, measured
            load = fz_foot / (self.mass * 9.80665)
            load_gate = jax.nn.sigmoid((cfg.lift_load_thresh - load) * 30.0)
            early = (feet.in_contact < 0.5) & (feet.progress < cfg.lift_gate_window)
            gate = jnp.where(early, load_gate, 1.0)[:, None]
            sole_meas = jnp.stack(
                [fpm[model.frame_index("l_sole")], fpm[model.frame_index("r_sole")]]
            )
            hold_pos = sole_meas.at[:, 2].set(jnp.maximum(sole_meas[:, 2], 0.0))
            feet = feet._replace(
                pos=gate * feet.pos + (1.0 - gate) * hold_pos,
                lin_vel=gate * feet.lin_vel,
                ang_vel=gate * feet.ang_vel,
            )

        # GAIT-RUSH (config.rush_gain docstring): when the measured
        # capture point escapes past the stance toe (+margin) along the
        # direction of travel while a foot is in swing, run the gait
        # clock FASTER (up to 3x) so the landing comes down early and
        # arrests the forward fall — the mirror of gait-hold.
        rush = jnp.zeros((), s.x9.dtype)
        crouch = jnp.zeros((), s.x9.dtype)
        if cfg.rigid is not None:
            dcom2 = meas9[3:5]
            sp = jnp.linalg.norm(dcom2)
            dirv = dcom2 / jnp.maximum(sp, 1e-6)
            cp2 = com_meas[0:2] + dcom2 * jnp.sqrt(
                jnp.maximum(com_meas[2], 0.3) / 9.80665
            )
            along = feet.pos[:, 0:2] @ dirv
            toe = jnp.max(
                jnp.where(feet.in_contact > 0.5, along + 0.08, -1e9)
            )
            cp_over_toe = jnp.dot(cp2, dirv) - toe  # margin-free, for the
            # chest-lean schedule below (rush subtracts its own margin).
            # `over` keeps the ORIGINAL grouping dot - (toe + margin), NOT
            # cp_over_toe - margin: the reassociated form is not
            # bit-identical in f32 and the rigid path is chaotic enough to
            # turn an ulp into a macroscopic trajectory shift (round-4
            # advisor finding; the in-run baseline moved 4.54 -> 4.55 s).
            over = jnp.dot(cp2, dirv) - (toe + s.dyn.rush_margin)
            any_swing = jnp.any(feet.in_contact < 0.5)
            any_contact = jnp.any(feet.in_contact > 0.5)
            rush = jnp.clip(
                s.dyn.rush_gain * jnp.maximum(over, 0.0), 0.0, 2.0
            )
            # config.rush_ds: with the capture point past the loaded toe
            # and BOTH feet down, hurry the upcoming lift too (the
            # swing-only gate left double support advancing at nominal
            # clock rate while the forward fall developed)
            gate_sup = any_swing | (s.dyn.rush_ds > 0)
            rush = jnp.where(
                gate_sup & (s.dyn.rush_gain > 0) & (sp > 0.05), rush, 0.0
            )
            # CAPTURE-SCHEDULED CROUCH (config.crouch_gain docstring):
            # lower the root-z target with the capture overshoot so the
            # catch step's landing stays geometrically reachable (the
            # step_reach_len cap's companion). Gated like the chest lean:
            # contact + moving (the -1e9 toe sentinel must not saturate it)
            crouch = jnp.where(
                (sp > 0.05) & any_contact,
                jnp.clip(
                    s.dyn.crouch_gain * jnp.maximum(cp_over_toe, 0.0),
                    0.0,
                    s.dyn.crouch_max,
                ),
                0.0,
            )

        # chest set-point: WORLD-UPRIGHT at the regularization config's yaw
        # — the reference takes ONLY the yaw of the kinDynWithRegularization
        # chest rotation and targets Rz(yaw) ("to better stabilize the
        # robot we add a task on the chest only for the yaw",
        # WholeBodyQPBlock.cpp:1219-1228). The roll/pitch-to-zero part is
        # the loop's ONLY world anchoring of the upper-body orientation:
        # targeting the full regularization rotation instead (round-2
        # behavior) leaves base pitch unconstrained, and the pelvis
        # measurably drifts 30+ deg backward over a few steps on the rigid
        # plant while the ZMP stays balanced.
        # the YAW is always extracted from the "chest" frame — the
        # reference hardcodes kinDynWithRegularization "chest" for the yaw
        # (WholeBodyQPBlock.cpp:1221-1222) even when the ik.ini task frame
        # is something else (iCubGenova09 uses neck_2); the TASK still acts
        # on cfg.ik.chest_frame (diff_ik). Fall back to the task frame for
        # models without a "chest" frame.
        rlR, rlp = kin.fk(model, s.q_reg, base_est_R, base_est_p)
        rfR, _ = kin.frame_poses(model, rlR, rlp)
        yaw_frame = (
            "chest" if "chest" in model.frame_names else cfg.ik.chest_frame
        )
        chest_rot_target = lie.rotz(
            lie.yaw_of(rfR[model.frame_index(yaw_frame)])
        )
        if cfg.rigid is not None:
            # capture-scheduled forward lean (config.chest_lean_gain
            # docstring): when the capture point escapes past the stance
            # toe the torso is about to be pitched BACKWARD by the toe
            # braking the CoM (§5d kill chain step 2) — tilt the chest
            # target toward the travel direction so the anchoring task
            # pre-compensates; gain 0 keeps the reference's pure
            # world-upright target. Axis (-dy, dx, 0) tips the torso top
            # toward dirv.
            # gated on any_contact: with no foot down `toe` is the -1e9
            # sentinel, so cp_over_toe is ~+1e9 and any nonzero gain would
            # saturate the 0.4 rad clip on flight ticks regardless of the
            # actual capture state (round-4 advisor finding)
            lean = jnp.where(
                (sp > 0.05) & any_contact,
                jnp.clip(
                    s.dyn.chest_lean_gain * jnp.maximum(cp_over_toe, 0.0),
                    0.0,
                    0.4,
                ),
                0.0,
            )
            lean_axis = jnp.stack(
                [-dirv[1], dirv[0], jnp.zeros((), s.x9.dtype)]
            )
            chest_rot_target = lie.so3_exp(lean * lean_axis) @ chest_rot_target

        targets = IKTargets(
            foot_rot=feet.rot,
            foot_pos=feet.pos,
            foot_lin_vel=feet.lin_vel,
            foot_ang_vel=feet.ang_vel,
            com_xy=com_xy_int,
            dcom_xy=v_cmd,
            root_z=com_des3[2] + s.root_z_off - crouch,
            droot_z=dcom_des3[2],
            chest_rot=chest_rot_target,
            q_reg=s.q_reg,
            # angular-momentum task (config.ang_mom_task_weight): track
            # the MPC's planned L so braking torque decelerates the CoM
            # instead of pitching the torso; rigid-gated (the adherent
            # parity path keeps the reference's exact ik.ini stack)
            ang_mom=x9[6:9] if cfg.rigid is not None else None,
            ang_mom_w=s.dyn.ang_mom_w if cfg.rigid is not None else None,
            chest_w_rp=s.dyn.chest_w_rp if cfg.rigid is not None else None,
        )
        if cfg.ik_joint_limits and model.q_lim is not None:
            # joint-limit qdot box on the DESIRED trajectory (the stream
            # the reference guards only with
            # position_direct_max_admissible_error,
            # centroidal_mpc_walking.ini:32): approach the position
            # limits exponentially, capped by the actuator speed class
            ql = jnp.asarray(model.q_lim[:, 0], s.q.dtype)
            qh = jnp.asarray(model.q_lim[:, 1], s.q.dtype)
            vm = jnp.asarray(model.qd_lim, s.q.dtype)
            targets = targets._replace(
                qd_lo=jnp.maximum(-vm, cfg.ik_limit_gain * (ql - s.q)),
                qd_hi=jnp.minimum(vm, cfg.ik_limit_gain * (qh - s.q)),
            )
        # THE loop-closing detail of the reference architecture: the IK's
        # kinematic state is the MEASURED base pose (legged odometry) with
        # the DESIRED joint positions (m_kinDynWithDesired->setRobotState(
        # m_baseTransform, m_desJointPos, ...), WholeBodyQPBlock.cpp:962-967)
        # — task errors are therefore expressed relative to the physical
        # robot, so commanded motion can never drift open-loop away from
        # reality. With the desired base instead, the rigid plant diverges
        # 5-10 cm from the command within two steps and the swing foot
        # lands in the wrong physical place (measured).
        nu = solve_ik(model, s.q, base_est_R, base_est_p, targets, cfg.ik)
        base_rot, base_pos = lie.integrate_mixed_velocity(
            s.base_rot, s.base_pos, nu[0:3], nu[3:6], dt
        )
        q = s.q + dt * nu[6:]

        s2 = s._replace(
            # gait-hold: the clock pauses while s.hold is set — real time
            # (the plant, the integrators) marches on; gait time does not
            t=s.t + dt * (1.0 - s.hold) * (1.0 + rush),
            tick=s.tick + 1,
            x9=x9,
            com_xy_int=com_xy_int,
            base_rot=base_rot,
            base_pos=base_pos,
            q=q,
            plant=ps,
            rb=rbs,
            odo=odo,
        )
        stage_now = C.mpc_stage_params(s.plan, s.t, 1, cfg.mpc.dt, cfg.mpc.n_slots)
        tel = Telemetry(
            com_mpc=com_des3,
            dcom_mpc=dcom_des3,
            ang_mom_mpc=x9[6:9],
            com_meas=com_meas,
            com_ik_target=jnp.concatenate([com_xy_int, (com_des3[2])[None]]),
            zmp_des=s.zmp_des,
            foot_pos_des=feet.pos,
            foot_contact=feet.in_contact,
            forces0=s.forces0,
            q=q,
            base_pos=base_pos,
            base_est_pos=base_est_p,
            fixed_foot_idx=ff.index.astype(s.t.dtype),
            mpc_cost=s.mpc_cost,
            mpc_prim=s.mpc_prim,
            adjusted_step=stage_now.slot_pos_nom,
            zmp_meas=zmp_meas,
            vcom_zmp=v_cmd,
            dq_cmd=nu[6:],
            joypad=inp.joypad,
            q_reg=s.q_reg,
            com_mann=s.com_mann,
            ang_mom_mann=s.ang_mom_mann,
            gait_hold=s.hold,
            gait_rush=rush,
            base_act_pos=rbs.base_pos if cfg.rigid is not None else base_pos,
            base_act_up=(
                rbs.base_rot[2, 2] if cfg.rigid is not None else base_rot[2, 2]
            ),
            base_act_lean=(
                rbs.base_rot[2, 0:2] if cfg.rigid is not None else base_rot[2, 0:2]
            ),
            fz_act=rbs.corner_forces[..., 2].sum(-1),
            ft_act=rbs.corner_forces[..., 0:2].sum(-2),
            com_act=(
                kin.com(model, *kin.fk(model, rbs.q, rbs.base_rot, rbs.base_pos))
                if cfg.rigid is not None
                else com_meas
            ),
            q_act=rbs.q if cfg.rigid is not None else q,
        )
        return s2, tel

    # -- the step + episode ------------------------------------------------------

    def step(self, s: LoopState, inp: TickInput) -> tuple[LoopState, Telemetry]:
        is_mpc_tick = (s.tick % self.cfg.mpc_every) == 0
        s = jax.lax.cond(
            is_mpc_tick, lambda ss: self._mpc_stage(ss, inp), lambda ss: ss, s
        )
        return self._wbc_stage(s, inp)

    @functools.partial(jax.jit, static_argnums=0)
    def run_episode(self, s0: LoopState, inputs: TickInput):
        """inputs: TickInput with a leading [S] axis. Returns (final state,
        stacked Telemetry).

        General path: per-tick `lax.cond` on `tick % mpc_every` — correct
        for any starting phase (checkpoint resume mid-block). Under vmap
        the batched predicate turns the cond into a select that evaluates
        the MPC stage EVERY tick; batched sweeps should use
        `run_episode_blocked` instead (~mpc_every x less MPC work).
        """
        return jax.lax.scan(self.step, s0, inputs)

    @functools.partial(jax.jit, static_argnums=0)
    def run_episode_blocked(self, s0: LoopState, inputs: TickInput):
        """Episode as nested scans: outer over MPC periods (one `_mpc_stage`
        each), inner over the `mpc_every` WBC ticks of the period. No cond,
        so it stays cheap under vmap/shard_map (the batched-sweep hot path).

        Preconditions: s0.tick % mpc_every == 0 (fresh or block-aligned
        state) and S % mpc_every == 0 — then it is tick-for-tick identical
        to `run_episode` (asserted in tests/test_runtime.py).
        """
        k = self.cfg.mpc_every
        S = inputs.joypad.shape[0]
        assert S % k == 0, f"episode length {S} must be a multiple of {k}"
        blocks = jax.tree_util.tree_map(
            lambda a: a.reshape((S // k, k) + a.shape[1:]), inputs
        )

        def outer(s, blk):
            first = jax.tree_util.tree_map(lambda a: a[0], blk)
            s = self._mpc_stage(s, first)
            s, tels = jax.lax.scan(self._wbc_stage, s, blk)
            return s, tels

        s, tels = jax.lax.scan(outer, s0, blocks)
        tels = jax.tree_util.tree_map(
            lambda a: a.reshape((S,) + a.shape[2:]), tels
        )
        return s, tels

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def run_episode_fold(self, s0: LoopState, inputs: TickInput, fold, acc0):
        """Blocked episode that folds the per-tick Telemetry into an
        accumulator instead of stacking it: `acc = fold(acc, tel)` per tick.
        O(1) telemetry memory — the enabler for 10k-scenario sweeps, where
        stacked [B, S, ...] telemetry would not fit HBM. Same preconditions
        as `run_episode_blocked`.
        """
        k = self.cfg.mpc_every
        S = inputs.joypad.shape[0]
        assert S % k == 0, f"episode length {S} must be a multiple of {k}"
        blocks = jax.tree_util.tree_map(
            lambda a: a.reshape((S // k, k) + a.shape[1:]), inputs
        )

        def inner(carry, i):
            s, acc = carry
            s, tel = self._wbc_stage(s, i)
            return (s, fold(acc, tel)), None

        def outer(carry, blk):
            s, acc = carry
            first = jax.tree_util.tree_map(lambda a: a[0], blk)
            s = self._mpc_stage(s, first)
            (s, acc), _ = jax.lax.scan(inner, (s, acc), blk)
            return (s, acc), None

        (s, acc), _ = jax.lax.scan(outer, (s0, acc0), blocks)
        return s, acc


def constant_inputs(S: int, joypad=(0.0, 0.0, 1.0, 0.0), dtype=jnp.float32) -> TickInput:
    return TickInput(
        joypad=jnp.broadcast_to(jnp.asarray(joypad, dtype), (S, 4)),
        ext_force=jnp.zeros((S, 3), dtype),
        ext_torque=jnp.zeros((S, 3), dtype),
    )
