"""Centroidal-MPC optimal-control formulation (SURVEY.md §2.4).

Decision variables z = [F, P]:
  F [T, nc, ncor, 3]  world-frame corner forces / mass, piecewise constant
  P [nc, K, 3]        contact positions for up to K phase slots per contact
                      (the reference's contact-location decision variables)

Dynamics (mass-normalized, EXACT discrete map under piecewise-constant
corner forces — the reference's OCP integrates the same centroidal model
over `sampling_time 0.06`, centroidal_mpc.ini:3; see `rollout` and
RESULTS.md §4.2 for why this must NOT be simplified to forward Euler):
  c+ = c + dt v + dt²/2 a        with a = g + sum f + f_ext
  v+ = v + dt a
  L+ = L + dt (sum (c_corner - c) x f + tau_ext) - (dt²/2 v + dt³/6 a) x f_tot
The dt²/2 term is load-bearing: a forward-Euler rollout leaves the MPC
blind to the first interval's effect on position, which in closed loop
appears as a slow upward CoM-z drift (~0.01 m/s unpushed) and divergence
under pushes >= 0.8 m/s² (RESULTS.md §4.2).

Cost (weights exactly per centroidal_mpc.ini:17-21):
  com_weight (10,10,200) CoM tracking; angular_momentum_weight 1e2;
  contact_position_weight 2e3 on |P - P_nom|; force_rate_of_change_weight
  (10,10,10) on consecutive force diffs; contact_force_symmetry_weight 100
  on per-corner deviation from the contact mean force.

Constraints — all LINEAR in z (the only nonconvexity is the L-tracking
residual, which couples P and F bilinearly through the torque arm):
  * friction pyramid per corner in the contact-local frame
    (static_friction_coefficient 0.33, number_of_slices 1,
    centroidal_mpc.ini:7-8), fz >= 0 and fz <= fz_max
  * inactive corner forces pinned to zero (activation masks)
  * contact-location bounding boxes around the nominal footstep, expressed
    in the contact frame, asymmetric per foot (centroidal_mpc.ini:30-31,
    41-42); non-adjustable (already-placed) contacts pinned to nominal.

The constraint operator is applied analytically (block-structured einsums —
never materializing the [m, n] matrix), and A^T diag(rho) A is block-diagonal
with 3x3 blocks, so the ADMM KKT matrix is H + sigma I + blockdiag — a single
dense Cholesky per SQP iteration. See qp.py.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cmw_tpu.core.centroidal import GRAVITY, centroidal_dynamics, unpack_state
from cmw_tpu.core.contacts import MPCStageParams


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    """Static solver configuration (hashable -> usable as a jit static arg)."""

    dt: float = 0.06  # centroidal_mpc.ini:3
    horizon: float = 1.2  # centroidal_mpc.ini:4
    n_contacts: int = 2  # centroidal_mpc.ini:6
    n_corners: int = 4  # centroidal_mpc.ini:24
    n_slots: int = 4  # max phases per foot overlapping the horizon
    mu: float = 0.33  # centroidal_mpc.ini:8
    fz_max: float = 3.0 * GRAVITY  # mass-normalized per-corner cap
    f_box: float = 6.0 * GRAVITY  # generous world-frame force box
    # corner offsets in the contact frame [nc, ncor, 3] (centroidal_mpc.ini
    # [CONTACT_*] corner_k)
    corners: tuple = (
        ((0.08, 0.01, 0.0), (0.08, -0.01, 0.0), (-0.08, -0.01, 0.0), (-0.08, 0.01, 0.0)),
        ((0.08, 0.01, 0.0), (0.08, -0.01, 0.0), (-0.08, -0.01, 0.0), (-0.08, 0.01, 0.0)),
    )
    # contact-location bounding boxes, contact frame [nc, 3]
    bbox_lower: tuple = ((-0.01, -0.00, 0.0), (-0.01, -0.05, 0.0))
    bbox_upper: tuple = ((0.01, 0.05, 0.0), (0.01, 0.00, 0.0))
    # cost weights (centroidal_mpc.ini:17-21)
    com_weight: tuple = (10.0, 10.0, 200.0)
    contact_position_weight: float = 2e3
    force_rate_weight: tuple = (10.0, 10.0, 10.0)
    angular_momentum_weight: float = 1e2
    force_symmetry_weight: float = 100.0
    # SQP / ADMM iteration counts (fixed trip counts; the reference's
    # real-robot mode runs early-terminated SQP with 6 QP iterations,
    # ergoCubSN000/centroidal_mpc.ini:15)
    sqp_iters: int = 2
    admm_iters: int = 24
    # per-block ADMM penalties, matched to the Hessian scale of the rows they
    # act on (static stand-in for OSQP's adaptive rho; fixed trip counts)
    admm_rho: float = 10.0  # force identity + cone rows
    admm_rho_pos: float = 2e3  # position box rows (~ contact_position_weight)
    admm_rho_eq: float = 1e4  # pinned (equality) rows
    admm_sigma: float = 1e-6
    admm_alpha: float = 1.6
    levenberg: float = 1e-7
    # SQP globalization: candidate steps are scaled by the best alpha under
    # an l1-penalty merit (cost + merit_penalty * constraint violation);
    # alpha 0 = reject. Prevents divergence of warm-started receding-horizon
    # chains (full GN steps with a stale quasi-Newton Hessian can ratchet).
    # merit evaluation along the SQP step is exact + O(vector) per alpha
    # (quadratic expansion, solver.py), so a fine grid costs nothing
    line_search_alphas: tuple = (1.0, 0.85, 0.7, 0.55, 0.4, 0.25, 0.1, 0.0)
    merit_penalty: float = 1e3
    # Factorize the GN KKT matrix once per solve (quasi-Newton: later SQP
    # iterations reuse the first Hessian with exact gradients) instead of
    # per iteration. ~3x fewer factorizations; the bench/runtime default.
    refactor_every_sqp: bool = False
    # KKT inverse implementation: "auto" = Pallas block-LDL kernel on TPU,
    # XLA cholesky elsewhere; "pallas" / "xla" force one.
    inverse_impl: str = "auto"
    # ADMM loop implementation: "xla" = the matrix-free batched scan in
    # qp.py (bandwidth-parallel across the batch — the measured winner on
    # single-core v5e); "fused" = Pallas kernel with minv + dense A
    # VMEM-resident across all iterations (ops/admm_fused.py — wins only
    # when grid cells can spread over cores). "auto" = xla.
    admm_impl: str = "auto"
    # dtype of the KKT inverse inside the ADMM x-update. The batched solve
    # is HBM-bound on re-reading minv [B, n, n] every iteration (~520 MB/
    # iteration at batch 512); bf16 halves that traffic (+18% solves/s
    # measured on v5e; "auto" = bf16 on TPU) with f32 accumulation. The
    # measured trade-off: the bf16 ADMM fixed point is a NEIGHBORING
    # solution (~5-10% cost offset on hard cold-start pushes) and the
    # boundary of the recoverable-push set shrinks ~7% (sweep A/B); an f32
    # tail (`kkt_f32_tail` of the iterations at f32) restores per-solve
    # cost but not the push boundary. Default therefore stays f32 —
    # capability over throughput; flip to "auto"/"bf16" for sweeps where
    # per-solve optimality at the feasibility boundary is not the metric.
    kkt_dtype: str = "f32"
    kkt_f32_tail: int = 0
    # ADMM x-update read path: "dense" = full [n, n] minv GEMV (XLA
    # multiply-reduce, measured at ~90% of HBM bandwidth — the roofline);
    # "symv" = ops/symv.py Pallas kernel reading only the PACKED lower
    # triangle of the symmetric inverse (nb(nb+1)/2 / nb^2 = 10/16 of the
    # traffic at n=512), packed once per solve. f32-only (composes with
    # kkt_dtype="f32"). Measured on v5e: +2.3% end-to-end (6,018 vs
    # 5,884 solves/s) -- the MXU row padding absorbs most of the saving.
    # "auto" = symv on TPU when kkt_dtype resolves to f32, dense elsewhere
    # (the interpret-mode kernel would only slow CPU tests down).
    xupdate_impl: str = "auto"
    # KKT x-update operator: "dense" = materialize the [n, n] inverse once
    # per factorization and GEMV it every ADMM iteration (via
    # inverse_impl/xupdate_impl above); "riccati" = never build the dense
    # operator at all — factor M through the parametric stage-wise Riccati
    # recursion (cmpc/riccati.py: block-banded in time via the rollout's
    # linear sensitivity recursion + the 24-var contact-position Schur
    # block) and solve each ADMM x-update with backward/forward vector
    # sweeps. Mathematically identical apply (tests/test_riccati.py);
    # skips the dense-J jacfwd, J^T J, and the n^3 factorization, and cuts
    # the per-iteration HBM read from the n^2 inverse to ~T small gain
    # matrices. f32 only; when active it takes precedence over the
    # dense-path knobs (kkt_dtype / xupdate_impl / inverse_impl /
    # admm_impl are ignored). Measured (tools/bench_kkt.py, B=512, KB=4):
    # v5e 6,006 -> 8,838 solves/s (1.47x), CPU 4.1x, cost agreement 5e-5.
    # "auto" = riccati everywhere (it wins on both backends); "dense"
    # keeps the round-4 path (still fully tested — the equivalence tests
    # and the bench numerics sentinel run both).
    kkt_impl: str = "auto"
    # Newton-Schulz pivot-inverse iterations (pallas path). Measured on a
    # real walking KKT matrix on v5e hardware: ns=8 is still mid-contraction
    # (||I - M X||_inf ~ 5e-2 — enough to destabilize the closed loop over a
    # few MPC ticks), ns=12 is fully converged (~2e-6, matching XLA
    # Cholesky). NS contracts quadratically, so 12 sits safely past the
    # knee; the 4 extra (128,128) matmul pairs per pivot block are noise.
    ns_iters: int = 12

    @property
    def T(self) -> int:
        return int(round(self.horizon / self.dt))

    @property
    def N(self) -> int:
        return self.T + 1

    @property
    def n_forces(self) -> int:
        return self.T * self.n_contacts * self.n_corners * 3

    @property
    def n_positions(self) -> int:
        return self.n_contacts * self.n_slots * 3

    @property
    def n_vars(self) -> int:
        return self.n_forces + self.n_positions

    @property
    def n_con(self) -> int:
        # identity force rows + 5 cone rows per corner + position rows
        tcc = self.T * self.n_contacts * self.n_corners
        return tcc * 3 + tcc * 5 + self.n_positions

    def corners_arr(self, dtype=jnp.float32):
        return jnp.asarray(np.array(self.corners), dtype)

    def cone_matrix(self, dtype=jnp.float32):
        """D [5,3]: local-frame friction pyramid + fz row."""
        mu = self.mu
        return jnp.asarray(
            np.array(
                [
                    [1.0, 0.0, -mu],
                    [-1.0, 0.0, -mu],
                    [0.0, 1.0, -mu],
                    [0.0, -1.0, -mu],
                    [0.0, 0.0, 1.0],
                ]
            ),
            dtype,
        )


def ergocub_mpc_config(**overrides) -> MPCConfig:
    """The ergoCubGazeboV1 preset (config/robots/ergoCubGazeboV1/*.ini)."""
    return MPCConfig(**overrides)


def no_adjust(cfg: MPCConfig, eps: float = 1e-4) -> MPCConfig:
    """Disable online step adjustment: shrink the contact-location bounding
    boxes to ~zero so footsteps are pinned to their MANN-nominal poses.

    The paper's headline ablation — with the reference this corresponds to
    zeroing `bounding_box_{upper,lower}_limit` (centroidal_mpc.ini:30-31,
    41-42); forces remain free, so the controller degrades to fixed-footstep
    centroidal MPC.
    """
    nc = cfg.n_contacts
    return dataclasses.replace(
        cfg,
        bbox_lower=tuple((-eps, -eps, 0.0) for _ in range(nc)),
        bbox_upper=tuple((eps, eps, 0.0) for _ in range(nc)),
    )


class MPCParams(NamedTuple):
    """Per-solve parameters (the reference NLP's p vector, SURVEY.md §2.4)."""

    x0: jnp.ndarray  # [9] initial (com, vcom, ang_mom)
    com_ref: jnp.ndarray  # [N, 3]
    ang_mom_ref: jnp.ndarray  # [N, 3]
    stage: MPCStageParams
    ext_force: jnp.ndarray  # [3] external force / mass, world
    ext_torque: jnp.ndarray  # [3] external torque / mass about CoM


# --- decision-vector packing -------------------------------------------------


def pack_z(cfg: MPCConfig, forces, positions):
    return jnp.concatenate([forces.reshape(-1), positions.reshape(-1)])


def unpack_z(cfg: MPCConfig, z):
    nf = cfg.n_forces
    F = z[:nf].reshape(cfg.T, cfg.n_contacts, cfg.n_corners, 3)
    P = z[nf:].reshape(cfg.n_contacts, cfg.n_slots, 3)
    return F, P


# --- rollout + residuals -----------------------------------------------------


def interval_contact_geometry(cfg: MPCConfig, stage: MPCStageParams, positions):
    """Per-interval contact pose and world corner positions.

    positions: [nc, K, 3] decision variables. Returns
      pos_k [T, nc, 3], rot_k [T, nc, 3, 3], corner_k [T, nc, ncor, 3].
    """
    pos_k = jnp.einsum("its,isx->tix", stage.slot_onehot, positions)
    rot_k = jnp.einsum("its,isxy->tixy", stage.slot_onehot, stage.slot_rot)
    # pad inactive intervals with identity-ish rotation (forces are zero there)
    corners = cfg.corners_arr(positions.dtype)
    corner_k = pos_k[:, :, None, :] + jnp.einsum("tiab,ijb->tija", rot_k, corners)
    return pos_k, rot_k, corner_k


def interval_step(cfg: MPCConfig, params: MPCParams, x, f_k, c_k, a_k):
    """One exact discrete interval of the centroidal dynamics under the
    held corner forces f_k with world corner positions c_k and activation
    a_k. THE single source of the discrete map — `rollout` scans it and the
    Riccati x-update (cmpc/riccati.py) linearizes it per stage, so the two
    paths can never drift apart."""
    dt = cfg.dt
    com, vcom, L = x[0:3], x[3:6], x[6:9]
    f = f_k * a_k[:, None, None]  # masked corner forces [nc,ncor,3]
    f_tot = jnp.sum(f, axis=(0, 1))
    g = jnp.zeros_like(vcom).at[2].set(-GRAVITY)
    acc = g + f_tot + params.ext_force
    com_n = com + dt * vcom + 0.5 * dt * dt * acc
    vcom_n = vcom + dt * acc
    # ∫₀^dt Σ (c − com(t))×f dt with com(t) = com + v t + ½ a t²:
    #   dt·Σ(c − com)×f − (v dt²/2 + a dt³/6) × f_tot
    dL0 = jnp.sum(jnp.cross(c_k - com[None, None, :], f), axis=(0, 1))
    sweep = 0.5 * dt * dt * vcom + (dt**3 / 6.0) * acc
    L_n = L + dt * (dL0 + params.ext_torque) - jnp.cross(sweep, f_tot)
    return jnp.concatenate([com_n, vcom_n, L_n])


def rollout(cfg: MPCConfig, params: MPCParams, forces, positions):
    """Exact discrete rollout of the centroidal dynamics under
    piecewise-constant corner forces. Returns X [N, 9].

    Forces are constant over each interval, so the CoM map is the exact
    double-integrator step (com += dt v + dt²/2 a) and the angular-momentum
    integral ∫(c − com(t))×f dt is closed-form. This must match the plant
    (RK4 @ wbc_dt of the same held forces, runtime/loop.py) — a plain Euler
    rollout here leaves the MPC blind to the first interval's dt²/2 effect
    on position, which in closed loop showed up as a slow upward CoM-z
    drift (~0.01 m/s unpushed) that pushes amplified into divergence."""
    _, _, corner_k = interval_contact_geometry(cfg, params.stage, positions)
    active_k = params.stage.active.T  # [T, nc]

    def step(x, inp):
        f_k, c_k, a_k = inp
        x_next = interval_step(cfg, params, x, f_k, c_k, a_k)
        return x_next, x_next

    # T=20 steps of tiny ops: full unroll lets XLA fuse across steps (the
    # scan body alone is latency-bound; measured ~4% whole-solve win on v5e)
    _, xs = jax.lax.scan(
        step, params.x0, (forces, corner_k, active_k), unroll=cfg.T
    )
    return jnp.concatenate([params.x0[None], xs], axis=0)


def residuals(cfg: MPCConfig, params: MPCParams, z):
    """Stacked weighted residual vector r(z); cost = 1/2 |r|^2."""
    F, P = unpack_z(cfg, z)
    X = rollout(cfg, params, F, P)
    com, _, L = unpack_state(X)

    w_com = jnp.sqrt(jnp.asarray(cfg.com_weight, z.dtype))
    w_L = jnp.sqrt(jnp.asarray(cfg.angular_momentum_weight, z.dtype))
    w_pos = jnp.sqrt(jnp.asarray(cfg.contact_position_weight, z.dtype))
    w_rate = jnp.sqrt(jnp.asarray(cfg.force_rate_weight, z.dtype))
    w_sym = jnp.sqrt(jnp.asarray(cfg.force_symmetry_weight, z.dtype))

    r_com = (w_com * (com[1:] - params.com_ref[1:])).reshape(-1)
    r_L = (w_L * (L[1:] - params.ang_mom_ref[1:])).reshape(-1)

    adj = (params.stage.slot_valid * params.stage.slot_adjustable)[..., None]
    r_pos = (w_pos * adj * (P - params.stage.slot_pos_nom)).reshape(-1)

    r_rate = (w_rate * (F[1:] - F[:-1])).reshape(-1)

    mean_f = jnp.mean(F, axis=2, keepdims=True)
    act = params.stage.active.T[:, :, None, None]  # [T, nc, 1, 1]
    r_sym = (w_sym * act * (F - mean_f)).reshape(-1)

    return jnp.concatenate([r_com, r_L, r_pos, r_rate, r_sym])


# --- linear constraint operator ---------------------------------------------


class ConstraintOp(NamedTuple):
    """Precomputed stage-dependent coefficient tensors of the constraint
    operator A. Build ONCE per solve with `constraint_op`; the matrix-free
    matvec/rmatvec inside the ADMM loop then reduce to two einsums each.
    (Recomputing the interval geometry + cone contraction inside every
    iteration was ~60% of the whole batched solve: 55 of 86 ms of the
    ADMM scan at batch 512 on v5e, measured.)"""

    cone_coeff: jnp.ndarray  # [T, nc, 5, 3]: D @ rot_k^T per interval
    slot_rot: jnp.ndarray  # [nc, K, 3, 3]


def constraint_op(cfg: MPCConfig, stage: MPCStageParams, dtype=jnp.float32) -> ConstraintOp:
    _, rot_k, _ = interval_contact_geometry(
        cfg, stage, jnp.zeros((cfg.n_contacts, cfg.n_slots, 3), dtype)
    )
    D = cfg.cone_matrix(dtype)
    # cone row d of local force = sum_a D[d,a] (rot_k^T f)[a]
    #   => coeff[t,i,d,c] = sum_a D[d,a] rot_k[t,i,c,a]
    return ConstraintOp(
        cone_coeff=jnp.einsum("da,tica->tidc", D, rot_k),
        slot_rot=stage.slot_rot,
    )


def op_matvec(cfg: MPCConfig, op: ConstraintOp, z):
    """A z: [n] -> [m]. Blocks: force identity; friction cone (local frame);
    contact position in contact frame.

    The tiny contractions (c=3 / d=5) are written as explicit
    broadcast-multiply-sum rather than einsum: XLA lowers the einsum form
    to dot_general with batch dims, whose operand layout ({3,4,...} minor
    ordering) disagrees with the loop carry's canonical layout — measured
    ~10 ms/solve of pure `copy`/`reshape` data formatting inside the
    batched ADMM loop at batch 512 on v5e. The broadcast form stays a
    single loop fusion in the carry's native layout."""
    F, P = unpack_z(cfg, z)
    # [t,i,j,d] = sum_c coeff[t,i,d,c] * F[t,i,j,c]
    cone = jnp.sum(op.cone_coeff[:, :, None, :, :] * F[:, :, :, None, :], axis=-1)
    # [i,s,a] = sum_b rot[i,s,b,a] * P[i,s,b]
    p_loc = jnp.sum(op.slot_rot * P[:, :, :, None], axis=-2)
    return jnp.concatenate([F.reshape(-1), cone.reshape(-1), p_loc.reshape(-1)])


def op_rmatvec(cfg: MPCConfig, op: ConstraintOp, y):
    """A^T y: [m] -> [n]. (Broadcast-sum form — see op_matvec.)"""
    tcc3 = cfg.n_forces
    tcc5 = cfg.T * cfg.n_contacts * cfg.n_corners * 5
    y1 = y[:tcc3].reshape(cfg.T, cfg.n_contacts, cfg.n_corners, 3)
    y2 = y[tcc3 : tcc3 + tcc5].reshape(cfg.T, cfg.n_contacts, cfg.n_corners, 5)
    y3 = y[tcc3 + tcc5 :].reshape(cfg.n_contacts, cfg.n_slots, 3)
    # [t,i,j,c] = sum_d y2[t,i,j,d] * coeff[t,i,d,c]
    gF = y1 + jnp.sum(
        y2[..., :, None] * op.cone_coeff[:, :, None, :, :], axis=-2
    )
    # [i,s,b] = sum_a y3[i,s,a] * rot[i,s,b,a]
    gP = jnp.sum(op.slot_rot * y3[:, :, None, :], axis=-1)
    return jnp.concatenate([gF.reshape(-1), gP.reshape(-1)])


def constraint_matvec(cfg: MPCConfig, stage: MPCStageParams, z):
    """A z (one-shot convenience; hot paths precompute `constraint_op`)."""
    return op_matvec(cfg, constraint_op(cfg, stage, z.dtype), z)


def constraint_rmatvec(cfg: MPCConfig, stage: MPCStageParams, y):
    """A^T y (one-shot convenience; hot paths precompute `constraint_op`)."""
    return op_rmatvec(cfg, constraint_op(cfg, stage, y.dtype), y)


def constraint_bounds(cfg: MPCConfig, stage: MPCStageParams, dtype=jnp.float32):
    """(l, u, rho_vec) for the three constraint blocks."""
    T, nc, ncor, K = cfg.T, cfg.n_contacts, cfg.n_corners, cfg.n_slots
    act = stage.active.T[:, :, None, None]  # [T,nc,1,1]

    # block 1: force identity — active: generous box; inactive: pinned to 0
    big = jnp.asarray(cfg.f_box, dtype)
    l1 = jnp.where(act > 0, -big, 0.0) * jnp.ones((T, nc, ncor, 3), dtype)
    u1 = jnp.where(act > 0, big, 0.0) * jnp.ones((T, nc, ncor, 3), dtype)
    rho1 = jnp.where(act > 0, cfg.admm_rho, cfg.admm_rho_eq) * jnp.ones(
        (T, nc, ncor, 3), dtype
    )

    # block 2: cone rows — constant (satisfied with equality at f = 0)
    inf = jnp.asarray(1e20, dtype)
    l2 = jnp.broadcast_to(
        jnp.asarray([-1e20, -1e20, -1e20, -1e20, 0.0], dtype), (T, nc, ncor, 5)
    )
    u2 = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 0.0, cfg.fz_max], dtype), (T, nc, ncor, 5)
    )
    rho2 = jnp.full((T, nc, ncor, 5), cfg.admm_rho, dtype)

    # block 3: position boxes in the contact frame around nominal
    p_nom_loc = jnp.einsum("isba,isb->isa", stage.slot_rot, stage.slot_pos_nom)
    bl = jnp.asarray(np.array(cfg.bbox_lower), dtype)[:, None, :]
    bu = jnp.asarray(np.array(cfg.bbox_upper), dtype)[:, None, :]
    adj = (stage.slot_valid * stage.slot_adjustable)[..., None]
    l3 = p_nom_loc + jnp.where(adj > 0, bl, 0.0)
    u3 = p_nom_loc + jnp.where(adj > 0, bu, 0.0)
    rho3 = jnp.where(adj > 0, cfg.admm_rho_pos, cfg.admm_rho_eq) * jnp.ones(
        (nc, K, 3), dtype
    )

    l = jnp.concatenate([l1.reshape(-1), l2.reshape(-1), l3.reshape(-1)])
    u = jnp.concatenate([u1.reshape(-1), u2.reshape(-1), u3.reshape(-1)])
    rho = jnp.concatenate([rho1.reshape(-1), rho2.reshape(-1), rho3.reshape(-1)])
    return l, u, rho


def constraint_dense(cfg: MPCConfig, stage: MPCStageParams, dtype=jnp.float32):
    """Materialize A as a dense [m, n] matrix.

    A is block-local in 3-wide variable groups (each corner force / slot
    position touches only its own rows), so the dense form is a cheap block
    scatter. Used by the fused Pallas ADMM kernel (ops/admm_fused.py), which
    keeps A VMEM-resident across all iterations — there the dense GEMV beats
    the structured einsum matvec because nothing ever revisits HBM.
    """
    T, nc, ncor, K = cfg.T, cfg.n_contacts, cfg.n_corners, cfg.n_slots
    tcc = T * nc * ncor
    tcc3 = cfg.n_forces
    tcc5 = tcc * 5
    n, m = cfg.n_vars, cfg.n_con

    _, rot_k, _ = interval_contact_geometry(
        cfg, stage, jnp.zeros((nc, K, 3), dtype)
    )
    D = cfg.cone_matrix(dtype)
    # cone block per (t,i): D R^T [5,3] (same for every corner j)
    C = jnp.einsum("da,tica->tidc", D, rot_k)  # [T,nc,5,3]
    blocks_cone = jnp.broadcast_to(C[:, :, None], (T, nc, ncor, 5, 3)).reshape(
        tcc, 5, 3
    )
    # position block per (i,s): R^T — entry [a,b] = R[b,a]
    blocks_pos = jnp.swapaxes(stage.slot_rot.reshape(-1, 3, 3), -1, -2)

    A = jnp.zeros((m, n), dtype)
    idf = np.arange(tcc3)
    A = A.at[idf, idf].set(1.0)

    rows_c = tcc3 + (
        np.arange(tcc)[:, None, None] * 5 + np.arange(5)[None, :, None]
    ) * np.ones((1, 1, 3), np.int32)
    cols_c = (
        np.arange(tcc)[:, None, None] * 3 + np.arange(3)[None, None, :]
    ) * np.ones((1, 5, 1), np.int32)
    A = A.at[rows_c.astype(np.int32), cols_c.astype(np.int32)].set(blocks_cone)

    nslot = nc * K
    rows_p = (
        tcc3
        + tcc5
        + np.arange(nslot)[:, None, None] * 3
        + np.arange(3)[None, :, None] * np.ones((1, 1, 3), np.int64)
    )
    cols_p = (
        tcc3
        + np.arange(nslot)[:, None, None] * 3
        + np.arange(3)[None, None, :] * np.ones((1, 3, 1), np.int64)
    )
    A = A.at[rows_p.astype(np.int32), cols_p.astype(np.int32)].set(blocks_pos)
    return A


def ata_blocks(cfg: MPCConfig, stage: MPCStageParams, rho, dtype=jnp.float32):
    """The 3x3 blocks of A^T diag(rho) A: (blk_force [T,nc,ncor,3,3],
    blk_pos [nc,K,3,3]). Identity block -> diag(rho1); cone block ->
    rho2-weighted R (D^T D) R^T per corner; position block -> rho3 I per
    slot. Consumed by `ata_blockdiag` (dense assembly) and by the Riccati
    x-update path (cmpc/riccati.py), which keeps them as blocks."""
    T, nc, ncor, K = cfg.T, cfg.n_contacts, cfg.n_corners, cfg.n_slots
    tcc3 = cfg.n_forces
    tcc5 = T * nc * ncor * 5
    rho1 = rho[:tcc3].reshape(T, nc, ncor, 3)
    rho2 = rho[tcc3 : tcc3 + tcc5].reshape(T, nc, ncor, 5)
    rho3 = rho[tcc3 + tcc5 :].reshape(nc, K, 3)

    _, rot_k, _ = interval_contact_geometry(
        cfg, stage, jnp.zeros((nc, K, 3), dtype)
    )
    D = cfg.cone_matrix(dtype)
    # per-corner cone normal matrix: C = D R^T; block = C^T diag(rho2) C
    C = jnp.einsum("da,tica->tidc", D, rot_k)  # [T,nc,5,3] (same for corners)
    blk_cone = jnp.einsum("tijd,tidc,tide->tijce", rho2, C, C)  # [T,nc,ncor,3,3]
    blk_force = blk_cone + jnp.einsum(
        "tijc,ce->tijce", rho1, jnp.eye(3, dtype=dtype)
    )
    blk_pos = jnp.einsum("isc,ce->isce", rho3, jnp.eye(3, dtype=dtype))
    return blk_force, blk_pos


def ata_blockdiag(cfg: MPCConfig, stage: MPCStageParams, rho, dtype=jnp.float32):
    """A^T diag(rho) A as a dense [n, n] matrix (3x3 blocks on the block
    diagonal — see `ata_blocks`)."""
    T, nc, ncor, K = cfg.T, cfg.n_contacts, cfg.n_corners, cfg.n_slots
    blk_force, blk_pos = ata_blocks(cfg, stage, rho, dtype)

    blocks = jnp.concatenate(
        [blk_force.reshape(-1, 3, 3), blk_pos.reshape(-1, 3, 3)], axis=0
    )
    nblk = blocks.shape[0]
    n = cfg.n_vars
    rows = (np.arange(nblk)[:, None, None] * 3 + np.arange(3)[None, :, None]).repeat(3, 2)
    cols = np.broadcast_to(
        np.arange(nblk)[:, None, None] * 3 + np.arange(3)[None, None, :], (nblk, 3, 3)
    )
    M = jnp.zeros((n, n), dtype).at[rows, cols].set(blocks)
    return M


def nominal_force_guess(cfg: MPCConfig, stage: MPCStageParams, dtype=jnp.float32):
    """Gravity-supporting initial forces: share GRAVITY among active corners."""
    act = stage.active.T[:, :, None]  # [T, nc, 1]
    n_active = jnp.maximum(jnp.sum(act, axis=(1, 2), keepdims=True) * cfg.n_corners, 1.0)
    fz = GRAVITY * act / n_active  # [T, nc, 1]
    F = jnp.zeros((cfg.T, cfg.n_contacts, cfg.n_corners, 3), dtype)
    return F.at[..., 2].set(jnp.broadcast_to(fz, F.shape[:-1]))
