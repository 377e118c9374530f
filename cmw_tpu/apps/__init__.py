"""CLI entry points (the reference's executables, SURVEY.md §7.7):

  python -m cmw_tpu.apps.walk    — closed-loop walking demo (cmw-walking)
  python -m cmw_tpu.apps.sweep   — batched push-recovery sweep
  python -m cmw_tpu.apps.parity  — JAX solver vs scipy-f64 oracle check
"""
