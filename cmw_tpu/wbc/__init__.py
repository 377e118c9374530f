"""Simplified-model whole-body control layer.

TPU-native equivalents of the reference WBC thread's components
(WholeBodyQPBlock, SURVEY.md §3.3): swing-foot SE3 interpolation, ZMP
computation (measured + desired), CoM-ZMP stabilizer, and the QP-based
differential inverse kinematics with the exact task set of ik.ini.
"""
