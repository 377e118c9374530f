"""cmw_tpu — TPU-native centroidal-MPC walking framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the ICRA-2022
"Online Non-linear Centroidal MPC for Humanoid Robot Locomotion with Step
Adjustment" controller (reference: GiulioRomualdi/
paper_romualdi_2022_icra_centroidal-mpc-walking, studied in SURVEY.md).

Layer map (SURVEY.md §7):
  core/        spatial math, centroidal dynamics, integrators, splines,
               fixed-shape contact plans, URDF kinematics
  cmpc/        the non-linear centroidal MPC: Gauss-Newton SQP over corner
               forces + contact-location decision variables, ADMM QP inner
               loop, fully jitted + vmap-batchable
  mann/        mixture-of-experts trajectory generator (native JAX forward of
               the reference's ONNX nets) + autoregressive rollout
  wbc/         simplified whole-body layer: swing-foot planner, CoM-ZMP
               stabilizer, differential-IK QP
  estimation/  fixed-foot detector, legged odometry
  runtime/     multi-rate closed-loop scheduler (lax.scan), config, telemetry
  dist/        device-mesh batched scenario sweeps (shard_map / pjit)
  ops/         Pallas TPU kernels for the hot paths
  apps/        CLI entry points: walk, sweep, parity
"""

__version__ = "0.1.0"

import jax as _jax

# Control numerics: TPU matmuls default to bf16 inputs, which is far too
# coarse for 3x3 rotation algebra, KKT solves, and SQP convergence. Force
# full-f32 matmul precision globally; hot kernels that tolerate bf16 (e.g.
# MANN expert layers) override per-op via `precision=` / explicit dtypes.
_jax.config.update("jax_default_matmul_precision", "highest")
