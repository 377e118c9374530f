"""Configuration presets (the reference's ini tree, SURVEY.md §5.6).

Dataclass equivalents of config/robots/<ROBOT>/*.ini with the same
parameter values; per-robot presets keep the reference's behavioral deltas
(sim 16.7 Hz vs real 10 Hz MPC, WBC 500/200/100 Hz).
"""

from __future__ import annotations

import dataclasses

from cmw_tpu.cmpc.formulation import MPCConfig
from cmw_tpu.estimation.legged_odom import OdomConfig
from cmw_tpu.mann.generator import GeneratorConfig
from cmw_tpu.mann.input_builder import InputBuilderConfig
from cmw_tpu.sim.plant import PlantConfig
from cmw_tpu.sim.rigid_body import RigidBodyConfig
from cmw_tpu.wbc.com_zmp import CoMZMPGains
from cmw_tpu.wbc.diff_ik import IKConfig
from cmw_tpu.wbc.swing_foot import SwingFootConfig


@dataclasses.dataclass(frozen=True)
class WalkingConfig:
    """Everything the closed loop needs; hashable (static under jit)."""

    mpc: MPCConfig = MPCConfig()
    gen: GeneratorConfig = GeneratorConfig()
    ik: IKConfig = IKConfig()
    swing: SwingFootConfig = SwingFootConfig()
    gains: CoMZMPGains = CoMZMPGains()
    input_builder: InputBuilderConfig = InputBuilderConfig()
    odom: OdomConfig = OdomConfig()
    plant: PlantConfig = PlantConfig()  # default: ideal (adherent) plant
    # full rigid-body dynamics plant (the Gazebo stand-in, sim/rigid_body.py);
    # None -> the reference's adherent topology (commands realized exactly)
    rigid: RigidBodyConfig | None = None
    rigid_settle_s: float = 0.4  # pre-episode contact settling time
    wbc_dt: float = 0.002  # WHOLE_BODY_RUNNER sampling_time
    plan_phases: int = 16
    # CoM-height reference override (CentroidalMPCBlock.cpp:531-534 pins it
    # to 0.7 m for ergoCub — ~4 cm below the natural standing height, a
    # deliberate squat that keeps the gait's vertical excursions within leg
    # reach; None -> the same squat relative to the model's standing CoM)
    com_height_override: float | None = None
    com_height_drop: float = 0.05
    # startup reference shaping: the MANN's standing CoM reference sits
    # ~2.3 cm ahead of (and the height override ~5 cm below) the robot's
    # actual initial CoM; tracking that step-change makes the physical
    # robot lurch and rock onto its foot edges at gait start (measured
    # with tools/diag_rigid.py). The initial reference mismatch is instead
    # decayed exponentially with this time constant. 0 disables. None (the
    # default) resolves to 0.4 on the rigid plant and 0 on the adherent
    # kinematic plant, so the adherent sweep baselines (RESULTS.md §2, and
    # the fall thresholds calibrated in dist/sweep.py) keep the behavior
    # they were calibrated against.
    ref_ramp_tau: float | None = None
    # STAND MODE: with joystick motion below this threshold, freeze the
    # MANN autoregression and hold the CoM reference over the stance
    # centroid (runtime/loop._mpc_stage). The shipped MANN nets drift at
    # standstill (trained on locomotion; the reference's mann.ini model
    # history shows "more-standing-data" retrains for exactly this, and the
    # production net it configures is not in the repo). The MPC still runs,
    # so push recovery remains active while standing.
    stand_mode: bool = True
    stand_threshold: float = 0.05
    # CONTACT-FORCE-GATED SWING LIFT (rigid plant only): the planned swing
    # can start while the physical foot still carries load — the measured
    # lateral weight transfer lags the plan by ~0.2 s (RESULTS.md §5) and
    # lifting a loaded foot vaults the robot over the stance edge. While a
    # swing foot is within the first `lift_gate_window` fraction of its
    # swing AND its measured normal load exceeds `lift_load_thresh` x body
    # weight, its IK target holds the MEASURED sole pose (zero velocity)
    # instead of the planned trajectory; the gate releases smoothly as the
    # MPC's force plan actually unloads the foot. 0 disables.
    # Measured (tools/exp_rigid --seconds 6 --vx 0.8, 2026-08-20): window
    # 0.4 / thresh 0.25 changes the failure mode — max tilt before the fall
    # drops 44.5 -> 32.6 deg and forward travel jumps 0.05 -> 0.77 m (the
    # robot genuinely walks at command speed until it goes down) — but the
    # fall itself is not yet cured (1.27 s -> 1.08 s), so the gate ships
    # OFF by default pending the landing-side retiming it implies.
    lift_gate_window: float = 0.0
    lift_load_thresh: float = 0.25
    # GAIT-HOLD / clock-pause (rigid plant only) — the landing-side
    # retiming the round-2 lift gate implied, done coherently: when the
    # plan says a foot is in early swing (progress < gait_hold_window as a
    # fraction of the swing) but the PHYSICAL foot still carries more than
    # gait_hold_thresh x body weight, the controller pauses its gait clock
    # for that MPC period — `t` stops advancing, the MANN generator state
    # and contact plan freeze, and the MPC re-solves the same receding
    # horizon from the robot's ACTUAL (integrated) state. The frozen plan
    # has the lagging foot unloaded in interval 0, so the solver's force
    # schedule actively transfers weight off it; once the measured load
    # drops, the clock resumes and the FULL swing profile (lift, apex,
    # touchdown, and the force schedule on both sides) executes at its
    # planned gait-time cadence — nothing lands late relative to the MPC's
    # forces, which is exactly what the round-2 IK-target-only gate broke.
    # The physical robot simply walks at a slightly lower average speed
    # than commanded when tracking lags. gait_hold_max_s bounds the
    # consecutive pause per swing (if the foot never unloads the clock
    # resumes anyway instead of deadlocking into a permanent stand).
    # 0 disables. Unlike the IK gate this changes no set-point while
    # active — it only stretches real time — so it composes with every
    # other subsystem (odometry, ZMP, telemetry stay consistent).
    gait_hold_window: float = 0.5
    gait_hold_thresh: float = 0.25
    gait_hold_max_s: float = 0.6
    # capture-point hull margins for the gait-hold release (m): a foot may
    # lift only when the LIPM capture point lies within the hull of the
    # stance foot and the upcoming landing, expanded by these margins
    # (foot half-length ~0.09 / half-width ~0.05 plus the MPC's bounded
    # step-adjustment authority)
    capture_margin_x: float = 0.15
    capture_margin_y: float = 0.10
    # MEASURED-STATE FEEDBACK into the centroidal integrator (rigid plant
    # only; 1/s blend rate, 0 disables). The reference's adherent loop
    # feeds the MPC its own integrated state (WholeBodyQPBlock.cpp:
    # 1259-1262) and relies on the plant tracking it tightly; our plant's
    # gait-start lateral transient diverges from the integrator by tens of
    # cm (trace 2026-08-21: cy_des 0.02 vs cy_act 0.39 within 0.9 s) and
    # the MPC then plans from fiction — it never sees the runaway it needs
    # to decelerate. This blends the ESTIMATED centroidal state (odometry
    # FK CoM + kinematic base-twist momentum, all from measurements) into
    # x9 at a bounded rate:  x9 += dt*gain*(x9_meas - x9). At gain g the
    # integrator forgives divergence with time constant 1/g while keeping
    # the adherent smoothness the reference architecture wants.
    state_fb_gain: float = 3.0
    # separate feedback rate for the ANGULAR-MOMENTUM channels of x9
    # (traced, DynConfig.state_fb_l). At 0 the integrator's L stays purely
    # planned — the clean target for the IK angular-momentum task
    # (ang_mom_task_weight); equal to state_fb_gain reproduces the round-3
    # uniform blend.
    state_fb_l: float = 3.0
    # Anti-windup band for the CoM LTI integrator (rigid plant only; m).
    # The reference integrates the stabilizer-corrected CoM velocity
    # open-loop into the IK's CoM target (WholeBodyQPBlock.cpp:634-646,
    # 1185-1187) — fine when the plant tracks, but on our plant a lateral
    # transient winds the integrator up: measured 2026-08-21, the IK CoM
    # target ran 0.5 m away from the physical CoM within 1 s (cy_ik -0.35
    # vs cy_act +0.19) and the IK then contorted the whole posture around
    # an unreachable hard CoM task. A CoM command further than a few cm
    # from the actual CoM has no physical authority anyway (the ZMP is
    # already at the support edge), so clamp the integrator to
    # com_meas +- this band. 0 disables.
    com_int_band: float = 0.05
    # Joystick slew limit on the MOTION components (units of full-scale
    # per second; 0 disables). The reference is driven by a human thumb on
    # FakeJoypad (README videos) — commands ramp over ~a second. A 0->0.8
    # step command makes MANN emit a full-cadence gait whose FIRST double
    # support lasts ~0.1 s: a from-standstill weight transfer the physical
    # plant cannot execute (measured: the CoM arrives at lift-off 5 cm
    # left of plan with +0.3 m/s — past the capture edge of the stance
    # foot). Slewing the commanded motion internally makes step inputs
    # physically realizable without changing steady-state behavior.
    joypad_slew: float = 0.0
    # CONTACT RECONCILIATION (rigid plant only): write the MEASURED sole
    # pose (odometry frame, z=0, yaw-only) of each PHYSICALLY LOADED
    # stance foot into the plan's current phase every MPC tick. The
    # reference keeps the MPC-adjusted pose there
    # (updateContactPhaseList, CentroidalMPCBlock.cpp:32-110) and its
    # Gazebo robot lands within ~1 cm of it; our plant lands several cm
    # off, and anchoring the odometry at the PLANNED landing pose then
    # teleports the estimate frame by the landing error at every
    # fixed-foot switch (measured 2026-08-21: a +6 cm estimated-CoM jump
    # at the first touchdown that commands a fictitious lateral
    # correction of the whole gait and tips step 2). With reconciliation
    # the odometry re-anchors where the foot ACTUALLY is, the MPC's
    # contact geometry matches reality, and the plan's future (MANN)
    # steps converge back to the nominal line through the MPC's bounded
    # step adjustment instead of all at once.
    reconcile_contacts: bool = True
    reconcile_load_thresh: float = 0.15  # x body weight
    # GENERATOR-PLAN RE-SYNC (rigid plant only): every MPC tick, translate
    # the MANN generator's virtual world so its stance sole coincides with
    # the plan's (reconciled = measured) stance sole. The generator rolls
    # an autoregressive virtual gait at the COMMANDED speed; when the
    # physical robot walks slower (measured: ~0.5 m/s realized at a 0.8
    # command), its references and footstep timeline run away forward and
    # the robot is dragged onto its toes until it pitches over (trace
    # 2026-08-21: cx_des - cx_act grows 0 -> 0.12 m within 0.6 s, forward
    # pitch 25 deg, vault). The translation is exact (the generator is
    # translation-equivariant: base/history/foot xy shift, directions and
    # base-frame features unchanged) and makes the whole reference
    # pipeline progress at the speed the plant actually achieves.
    gen_resync: bool = True
    # EARLY-TOUCHDOWN handling (rigid plant only): the swing foot can
    # strike the ground before its planned touchdown (the physical base
    # rides lower/tilted than the estimate frame assumes — measured: the
    # step-2 swing landed ~50 ms early carrying 640 N while the planner
    # still commanded descent, vaulting the robot over it). Two coupled
    # responses while a LATE-swing foot measures more than
    # td_load_thresh x body weight: (a) WBC — hold its target at the
    # measured sole pose instead of driving it further down; (b) MPC —
    # if its planned activation is within td_lookahead, activate the
    # contact NOW in the plan, so the force schedule, fixed-foot detector
    # and desired ZMP gain the new support immediately. 0 disables.
    td_load_thresh: float = 0.10
    td_lookahead: float = 0.13
    # PERFECT-STATE mode (rigid plant only, diagnostic): feed the
    # controller the plant's ground-truth base pose instead of the
    # legged-odometry estimate. Separates the two failure axes: with
    # perfect state, any fall is the controller/gait/plant's fault; with
    # odometry, landing errors corrupt the anchor frame and the
    # controller chases phantoms (measured: estimated CoM 0.6 m from
    # truth after the second off-plan landing). The reference runs the
    # same plan-anchored odometry successfully only because its Gazebo
    # landings are mm-accurate.
    perfect_state: bool = False
    # ANGULAR-MOMENTUM IK TASK weight (rigid plant only; 0 disables).
    # BLF ships IK::AngularMomentumTask but the reference's ik.ini never
    # enables it (WholeBodyQPBlock.cpp:131-175) — its Gazebo plant tracks
    # tightly enough that base pitch stays incidental. On our plant the
    # step-4 forward-momentum vault (RESULTS.md §5c) is exactly an
    # uncoordinated-momentum failure: the MPC's braking force pitches the
    # torso (soft chest task) instead of decelerating the CoM. The task
    # adds soft rows (A_ang(q)/m) nu = L_plan to the IK so whole-body
    # rotation tracks the MPC's planned angular momentum. Traced
    # (DynConfig.ang_mom_w) — sweep without recompiling.
    ang_mom_task_weight: float = 0.0
    # CAPTURE-POINT SPEED GOVERNOR (rigid plant only; 1/m gain, 0
    # disables; traced as DynConfig.cp_gov). Scales the commanded joystick
    # motion down proportionally to how far the measured capture point
    # runs beyond the forward reach of the current support + upcoming
    # landing (+capture_margin_x): forward momentum is shed by slowing the
    # commanded gait BEFORE the stance ZMP saturates at the toe — the
    # round-3 step-4 vault mechanism (RESULTS.md §5c). The reference has
    # no equivalent (a human thumb on FakeJoypad is the speed governor).
    cp_gov: float = 2.0
    # CoM-LAG SPEED GOVERNOR (rigid plant only; 1/m gain, 0 disables;
    # traced as DynConfig.lag_gov with dead-band lag_band in m). The
    # round-4 vault trace (RESULTS.md §5d): the plan marches at commanded
    # speed while the plant walks slower, so the measured CoM falls ever
    # further behind the loaded stance feet; once the CoM is ~10+ cm
    # behind the support, demanding forward acceleration is geometrically
    # infeasible (required ZMP behind the heel) and the stance ankle pumps
    # BACKWARD pitch until the robot topples. The governor scales the
    # commanded motion by 1 - gain*max(0, lag - band), where lag is the
    # support-centroid lead over the CoM along the motion direction —
    # the command slows until the plant catches up (a human driver does
    # exactly this by ear; the reference has no equivalent).
    lag_gov: float = 0.0
    lag_band: float = 0.10
    cp_gov_margin: float = 0.10  # cp_gov's stance-toe reach margin (m)
    # GAIT-RUSH (rigid plant only; the mirror of gait-hold; traced as
    # DynConfig.rush_gain/rush_margin, 0 disables). Round-4 trace
    # (RESULTS.md §5d): during steps 1-2 the measured capture point
    # escapes up to 0.17 m past the stance toe while the swing foot is
    # still mid-air on the gait-time schedule — the robot is falling
    # forward faster than the gait expects, and the late landing arrives
    # as a 1,590 N crash that springs the backward trap. When the capture
    # point is past the stance toe (+rush_margin) and a foot is in swing,
    # the gait clock runs FASTER by rush_gain per meter of overshoot
    # (capped at 3x), bringing the landing down early to catch the fall —
    # the discrete analog of a human shortening a stumbling step.
    rush_gain: float = 5.0
    rush_margin: float = 0.03
    # CAPTURE STEP EXTENSION (rigid plant only; traced as
    # DynConfig.step_ext_max/step_ext_margin; max=0 disables). Companion
    # to gait-rush: an early landing that still arrives BEHIND the
    # capture point adds forward impulse every step — measured runaway to
    # 1.2 m/s upright until the legs fold (RESULTS.md §5d). When the
    # measured capture point is beyond a swing foot's upcoming landing
    # along the travel direction, that landing is moved forward to the
    # capture point + step_ext_margin (clamped to step_ext_max) — the
    # classic capture-point step. Goes beyond the reference MPC's ±1 cm
    # bounding box (centroidal_mpc.ini:30-31) by design: the box presumes
    # a plant that tracks the plan; landing reconciliation snaps the plan
    # back to the realized pose afterwards.
    step_ext_max: float = 0.20
    step_ext_margin: float = 0.06
    # OVERSPEED DOUBLE-SUPPORT BRAKE (rigid plant only; traced as
    # DynConfig.brake_speed/brake_margin; speed=0 disables). The terminal
    # round-4 failure is an upright speed RUNAWAY (RESULTS.md §5d): each
    # rushed landing still arrives behind the capture point, adds forward
    # impulse, and speed ratchets to ~1.2 m/s until the legs fold — at
    # that speed the capture step exceeds leg reach, so foot placement
    # can no longer brake. Double support can: with both feet loaded the
    # ZMP can travel the full two-foot polygon (~0.5 m with an extended
    # capture step), worth ~g*d/z ≈ 5 m/s² of deceleration. While the
    # measured planar speed exceeds brake_speed and the capture point is
    # still coverable by a loaded toe (+brake_margin along travel), the
    # gait clock pauses BEFORE lift-off (sharing gait-hold's machinery
    # and its gait_hold_max_s cap) and the MPC sheds speed with two-foot
    # force authority; past the margin, stepping is the only brake left
    # and the hold releases to the gait-rush. The reference has no
    # equivalent (its Gazebo plant never overspeeds the command).
    brake_speed: float = 0.0
    brake_margin: float = 0.05
    # IK JOINT-LIMIT BOX (static; default off = the reference's exact
    # equality-only ik.ini stack, WholeBodyQPBlock.cpp:131-175). When on,
    # the IK QP adds qdot box constraints from the model's joint limits
    # (BLF JointLimitsTask/JointVelocityLimitsTask analog, solved via
    # qp.solve_eq_box_qp): lo/hi = clip(ik_limit_gain*(q_lim - q), ±qd_lim)
    # — exponential approach to the position limits with time constant
    # 1/ik_limit_gain, plus the absolute velocity cap. Requires a model
    # with q_lim (ergocub_approx ships spec-class estimates).
    ik_joint_limits: bool = False
    ik_limit_gain: float = 5.0
    # FORWARD-ESCAPE HOLD RELEASE + DOUBLE-SUPPORT RUSH (rigid plant
    # only; traced as DynConfig.fwd_release/rush_ds, bool-as-float).
    # Round-4 terminal-mode trace (tools/trace_report.py on the 4.4-4.8 s
    # operating-point falls): the gait-hold — built for incomplete
    # LATERAL weight transfer — engages in double support while the
    # capture point has escaped +0.28 m FORWARD past the stance+landing
    # hull, freezing the clock exactly when stepping is the only
    # recovery; the robot falls over the front toe with hold=1.0.
    # fwd_release vetoes any hold once the capture point passes the
    # REMAINING stance foot's toe (+rush_margin) along the travel
    # direction — beyond that boundary the stance foot cannot capture
    # the fall and only the lifting foot's (rushed, capture-extended)
    # step can, so the clock switches from hold straight into rush;
    # rush_ds lets the gait-rush accelerate the clock from double
    # support as well, so the catching step arrives early. Defaults ON
    # (measured: RESULTS.md §5d round-4 grid); zero both to recover the
    # round-3 behavior.
    fwd_release: float = 1.0
    rush_ds: float = 1.0
    # CHEST ANCHORING STIFFNESS + CAPTURE-SCHEDULED LEAN (rigid plant
    # only; traced as DynConfig.chest_w_rp/chest_lean_gain). The §5d
    # terminal mode stores ~35 deg of backward torso pitch during
    # capture braking that nothing in the reference's ik.ini stack can
    # dump (the chest task is soft; the IK angular-momentum task is
    # measured harmful). chest_w_rp multiplies the chest task's
    # roll/pitch weight rows (1 = ik.ini parity); chest_lean_gain
    # [rad/m] tilts the chest target toward the travel direction in
    # proportion to capture-point overshoot past the stance toe
    # (0 = the reference's pure world-upright-at-yaw target).
    chest_w_rp: float = 1.0
    chest_lean_gain: float = 0.0
    # CATCH-STEP GEOMETRY (rigid plant only; traced as
    # DynConfig.step_reach_len/crouch_gain/crouch_max). Round-5 measured
    # terminal mode (RESULTS §5g): the capture-step extension commanded a
    # 0.4 m landing with the CoM still at z=0.70 — geometrically beyond
    # the ~0.75 m leg — so the foot hovered while the robot rolled over
    # the stance toe. step_reach_len caps the landing's forward offset
    # from the measured CoM at sqrt(len^2 - com_z^2) (0 = off);
    # crouch_gain [m/m] lowers the IK root-z target with capture
    # overshoot, opening that cap exactly when the catch step needs it.
    step_reach_len: float = 0.0
    crouch_gain: float = 0.0
    crouch_max: float = 0.12
    # ODOMETRY ANCHOR COMPLEMENTARY FILTER (rigid plant only; traced as
    # DynConfig.odom_blend). The reference re-pins the fixed sole at its
    # PLANNED pose on every fixed-frame switch (changeFixedFrame,
    # WholeBodyQPBlock.cpp:300-320) — with our plant's cm-scale landing
    # errors that teleports the whole estimate frame by the error at each
    # switch (RESULTS.md §5c). The anchor is now persistent LoopState: on
    # a switch it takes the new sole's measured pose in the current
    # estimate frame (continuity — no teleport), then every WBC tick it
    # pulls toward the plan's (reconciled) pose by this fraction:
    # 1.0 reproduces the reference's instant plan anchor; small values
    # spread the correction over ~wbc_dt/alpha seconds; 0 = pure
    # dead-reckoning (z/roll/pitch stay absolute via flattening + IMU).
    # Measured (exp_grid, vx=0.8 operating point, real odometry): blend
    # 0.25 survives 4.47 s / 8 steps vs 1.99 s / 2 steps at the
    # reference's instant anchoring — within 0.35 s of the
    # perfect-state ceiling (4.81 s).
    odom_blend: float = 0.25
    # scale on the MANN angular-momentum reference fed to the MPC (1.0 =
    # the reference's behavior, CentroidalMPCBlock.cpp:525-529; 0.0 tracks
    # zero angular momentum instead — useful because our reconstruction of
    # MANN's angular momentum goes through the approximate model's inertias)
    ang_mom_ref_scale: float = 1.0

    @property
    def ref_ramp(self) -> float:
        """Resolved startup-reference decay constant (ref_ramp_tau)."""
        if self.ref_ramp_tau is None:
            return 0.4 if self.rigid is not None else 0.0
        return self.ref_ramp_tau

    @property
    def mpc_every(self) -> int:
        return int(round(self.mpc.dt / self.wbc_dt))

    @property
    def mann_calling_time(self) -> float:
        """mannCallingTime = lcm(slow_down_factor * gen dT, MPC dT)
        (CentroidalMPCBlock.cpp:262-265): the generator is advanced only
        when this much gait time has elapsed since the previous call;
        between calls the stored MANN output is re-sliced at absolute
        times by the frequency adapters (:477-500,544-577). Factor-1
        sim robots: lcm(20 ms, 60 ms) = 60 ms = every MPC tick;
        ergoCubSN000 (factor 5, 100 ms MPC): 100 ms = every tick;
        ergoCubSN001 (factor 5, 60 ms MPC): 300 ms = every 5th tick."""
        import math

        a = round(self.gen.slow_down_factor * self.gen.dt * 1e6)
        b = round(self.mpc.dt * 1e6)
        return math.lcm(a, b) / 1e6

    @property
    def mann_advance(self) -> int:
        """Generator steps consumed per generator CALL — the reference's
        mergePointIndex = mannCallingTime / (slow_down_factor * gen dT)
        (CentroidalMPCBlock.cpp:265): the next call re-roots the
        autoregression this many knots into the previous rollout."""
        adv = int(
            round(
                self.mann_calling_time
                / (self.gen.slow_down_factor * self.gen.dt)
            )
        )
        if adv > self.gen.n_steps:
            raise ValueError(
                f"mannCallingTime {self.mann_calling_time} needs a merge "
                f"point {adv} steps in, beyond the generator horizon "
                f"({self.gen.n_steps} steps) — lengthen gen.time_horizon"
            )
        return adv

    @property
    def mann_call_every(self) -> int:
        """MPC ticks between generator calls (mannCallingTime / MPC dT —
        an exact integer by the lcm construction)."""
        return int(round(self.mann_calling_time / self.mpc.dt))


def ergocub_gazebo_v1(**overrides) -> WalkingConfig:
    """Sim preset (config/robots/ergoCubGazeboV1: MPC 16.7 Hz, WBC 500 Hz)."""
    return WalkingConfig(**overrides)


def ergocub_sn000(**overrides) -> WalkingConfig:
    """Real-robot preset (config/robots/ergoCubSN000: MPC 10 Hz with a
    1.3 s horizon, early-terminated SQP, WBC 200 Hz, and the MANN gait
    slowed 5x in real time — mann.ini:16 slow_down_factor 5, so the
    generator advances ONE step per MPC tick and the frequency-adapter
    knots span 5 * 0.8 s = 4 s)."""
    kw = dict(
        mpc=MPCConfig(dt=0.1, horizon=1.3, sqp_iters=2, admm_iters=30),
        gen=GeneratorConfig(slow_down_factor=5.0),
        wbc_dt=0.005,
    )
    kw.update(overrides)
    return WalkingConfig(**kw)
