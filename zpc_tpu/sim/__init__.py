"""Simulation pipelines (reference layer 8, SURVEY §2.8)."""

from .mpm import MPMSim, MPMState, make_mpm_state, explicit_step
