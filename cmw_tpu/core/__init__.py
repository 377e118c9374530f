"""Core math: Lie groups, centroidal dynamics, integrators, splines, contacts."""

from cmw_tpu.core import lie, centroidal, integrators, splines, contacts

__all__ = ["lie", "centroidal", "integrators", "splines", "contacts"]
