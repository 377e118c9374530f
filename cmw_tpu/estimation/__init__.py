"""Estimation layer: fixed-foot detection + contact-aided legged odometry.

Equivalents of BLF `Contacts::FixedFootDetector` and
`Estimators::LeggedOdometry` as used in the reference WBC thread
(WholeBodyQPBlock.cpp:92-129,263-320).
"""
