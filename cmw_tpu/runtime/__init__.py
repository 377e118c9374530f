"""Closed-loop runtime: multi-rate scheduler, config presets, telemetry.

The reference runs two real-time threads (MPC @ 16.7 Hz, WBC @ 500 Hz)
exchanging mailboxes (Main.cpp:75-134). On TPU the whole control graph is
ONE jitted lax.scan over WBC ticks with the MPC+MANN stage gated by
lax.cond at its period (SURVEY.md §2.3 row 1) — deterministic, replayable,
and batchable over scenarios by vmap.
"""
