"""Simulation driver: step loop + export/checkpoint hooks.

The app-layer loop the reference leaves to zeno: runs a chosen transfer
path, adapts dt by the grid CFL, exports frames through the async IO worker
(io/IO.h idiom) and checkpoints state (the resume capability the reference
lacks, SURVEY §5.4).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.cfl import timestep_velocity
from ..utils.io import AsyncIO, save_state, write_bgeo
from .mpm import MPMSim, MPMState, explicit_step
from .mpm_binned import BinnedConfig, explicit_step_binned
from .mpm_pallas import explicit_step_pallas

__all__ = ["simulate"]


def simulate(sim: MPMSim, state: MPMState, *, dt: float, steps: int,
             path: str = "auto", bins_capacity: Optional[int] = None,
             frame_every: int = 0, frame_prefix: str = "frame",
             checkpoint_every: int = 0, checkpoint_path: str = "ckpt.npz",
             adapt_dt: bool = False, cfl: float = 0.5,
             on_frame: Optional[Callable] = None) -> MPMState:
    """Run ``steps`` explicit MPM steps.

    ``path``: "baseline" | "binned" | "pallas" | "auto" (pallas on TPU,
    binned elsewhere).  Frames are written as bgeo through the background IO
    worker so exports overlap device compute.
    """
    if path == "auto":
        path = ("pallas" if jax.devices()[0].platform not in ("cpu",)
                else "binned")
    cfg = BinnedConfig(bins_capacity=bins_capacity or
                       max(64, state.particles.capacity // 128 * 2))
    if path == "baseline":
        step = jax.jit(lambda s, d: explicit_step(sim, s, d))
    elif path == "binned":
        step = jax.jit(lambda s, d: explicit_step_binned(sim, s, d, cfg)[0])
    elif path == "pallas":
        step = jax.jit(lambda s, d: explicit_step_pallas(sim, s, d, cfg)[0])
    else:
        raise ValueError(path)

    io = AsyncIO.instance()
    dt_j = jnp.float32(dt)
    for i in range(steps):
        state = step(state, dt_j)
        if adapt_dt:
            dx = float(state.grid.dx)
            dt_j = jnp.minimum(
                jnp.float32(dt),
                timestep_velocity(state.max_vel, dx, cfl, dt_max=dt))
        if frame_every and (i + 1) % frame_every == 0:
            n = state.particles.size
            x = np.asarray(state.particles["x"][:n])
            v = np.asarray(state.particles["v"][:n])
            io.submit(write_bgeo, f"{frame_prefix}.{i + 1:05d}.bgeo", x,
                      {"v": v})
            if on_frame is not None:
                on_frame(i + 1, state)
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            save_state(checkpoint_path, state)
    io.wait()
    return state
