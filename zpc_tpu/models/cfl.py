"""Timestep estimation (CFL).

Reference: ``physics/SoundSpeedCfl.hpp``
(``evaluate_timestep_linear_elasticity`` used at
simulation/mpm/Simulator.cpp:57): dt = cfl * dx / c where c is the elastic
wave speed sqrt((lam + 2 mu) / rho); plus the per-step velocity CFL used by
grid ops (max-vel reduction, simulation/grid/GridOp.hpp:72-86).
"""

from __future__ import annotations

import jax.numpy as jnp

from .constitutive import lame_parameters

__all__ = ["sound_speed", "timestep_linear_elasticity", "timestep_velocity"]


def sound_speed(E: float, nu: float, rho: float):
    mu, lam = lame_parameters(E, nu)
    return jnp.sqrt((lam + 2.0 * mu) / rho)


def timestep_linear_elasticity(E: float, nu: float, rho: float, dx: float,
                               cfl: float = 0.5):
    return cfl * dx / sound_speed(E, nu, rho)


def timestep_velocity(max_vel: jnp.ndarray, dx: float, cfl: float = 0.5,
                      dt_max: float = 1e-3):
    """Velocity CFL bound from the grid max-speed reduction."""
    return jnp.minimum(cfl * dx / jnp.maximum(max_vel, 1e-6), dt_max)
