"""Non-linear centroidal MPC with online step adjustment (the centerpiece).

TPU-native re-design of BLF `ReducedModelControllers::CentroidalMPC`
(reference call sites CentroidalMPCBlock.cpp:144-148,407-410,579-626; NLP
structure per SURVEY.md §2.4): a Gauss-Newton SQP over corner forces and
contact-location decision variables with an OSQP-style fixed-iteration ADMM
QP inner loop — everything shape-static, fully jitted, vmap-batchable.
"""

from cmw_tpu.cmpc.formulation import MPCConfig, MPCParams, ergocub_mpc_config
from cmw_tpu.cmpc.solver import CentroidalMPCSolver, MPCSolution

__all__ = [
    "MPCConfig",
    "MPCParams",
    "ergocub_mpc_config",
    "CentroidalMPCSolver",
    "MPCSolution",
]
