"""Tetrahedral FEM: implicit elasticity on any constitutive model.

The reference's implicit stack (``simulation/mpm/ImplicitMPM.hpp``,
BASELINE config 5 "implicit MPM/FEM") exposes the FEM side through its
constitutive models (``physics/constitutive_models/*``: ``psi``/
``first_piola``/``dP_dF``) and leaves mesh-FEM assembly downstream.
Here it is part of the framework: element deformation gradients
``F = Ds Dm^{-1}``, energy ``sum vol_e psi(F_e)`` over any
:class:`zpc_tpu.models.constitutive.ElasticModel`, implicit Euler by
Newton-CG on the incremental potential — the same matrix-free pattern
as :mod:`zpc_tpu.sim.cloth` (autodiff gradient, ``jax.jvp``
Hessian-vector products, no per-element 12x12 assembly), plus the IPC
ground barrier and analytic half-space step limiter.

Model choice note: the Newton operator takes second derivatives of
``psi`` by autodiff.  Smooth invariant-based energies (NeoHookean's
log-J form) differentiate cheaply; singular-value energies
(FixedCorotated, StvkWithHencky) drag the 3x3 Jacobi SVD through
``jvp(grad(.))`` and compile very slowly — prefer NeoHookean here, or
supply a Gauss-Newton ``dP_dF_action`` operator for SVD models.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry.contact import barrier
from ..math.solvers import cg
from ..math.vecmat import mm

__all__ = ["FemSim", "make_tet_box", "fem_energy", "implicit_step"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FemSim:
    """Static topology + material for a tet mesh."""

    tets: jax.Array       # [M, 4] int32
    Dm_inv: jax.Array     # [M, 3, 3] rest-shape inverses
    vol: jax.Array        # [M] rest volumes (positive)
    mass: jax.Array       # [N]
    free: jax.Array       # [N] bool (False = pinned)
    model: object         # ElasticModel pytree (batched psi)
    gravity: jax.Array    # [3]
    ground_n: jax.Array
    ground_off: jax.Array
    dhat: jax.Array
    kappa: jax.Array


def _tet_edges(x, tets):
    a = x[tets[:, 0]]
    return jnp.stack([x[tets[:, 1]] - a, x[tets[:, 2]] - a,
                      x[tets[:, 3]] - a], axis=-1)        # [M, 3, 3]


def make_tet_box(nx: int, ny: int, nz: int, spacing: float, *, model,
                 density: float = 1e3, origin=(0.0, 0.0, 0.0),
                 pinned=(), ground_n=(0.0, 1.0, 0.0),
                 ground_off: float = 0.0, dhat: float = 0.01,
                 kappa: float = 1e2,
                 gravity=(0.0, -9.8, 0.0)) -> Tuple[FemSim, jax.Array]:
    """Regular hex grid split into 5 tets per cell (parity-alternated so
    faces match); host-side build."""
    gx, gy, gz = np.meshgrid(np.arange(nx), np.arange(ny),
                             np.arange(nz), indexing="ij")
    pos = (np.stack([gx, gy, gz], -1).reshape(-1, 3) * spacing
           + np.asarray(origin)).astype(np.float32)
    vid = np.arange(nx * ny * nz).reshape(nx, ny, nz)
    five = [(0, 1, 2, 4), (1, 2, 3, 7), (1, 4, 5, 7),
            (2, 4, 6, 7), (1, 2, 4, 7)]
    five_flip = [(0, 1, 3, 5), (0, 2, 3, 6), (0, 4, 5, 6),
                 (3, 5, 6, 7), (0, 3, 5, 6)]
    tets = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            for k in range(nz - 1):
                c = [vid[i + a, j + b, k + d]
                     for a in (0, 1) for b in (0, 1) for d in (0, 1)]
                pick = five if (i + j + k) % 2 == 0 else five_flip
                for t in pick:
                    tets.append([c[t[0]], c[t[1]], c[t[2]], c[t[3]]])
    tets = np.asarray(tets, np.int32)
    x0 = jnp.asarray(pos)
    Dm = _tet_edges(x0, jnp.asarray(tets))
    det = jnp.linalg.det(Dm)
    # orient every tet positively (swap two verts where det < 0)
    flip = np.asarray(det) < 0
    tets[flip, 2], tets[flip, 3] = (tets[flip, 3].copy(),
                                    tets[flip, 2].copy())
    tets_j = jnp.asarray(tets)
    Dm = _tet_edges(x0, tets_j)
    vol = jnp.linalg.det(Dm) / 6.0
    mass = np.zeros(nx * ny * nz, np.float32)
    np.add.at(mass, tets.reshape(-1),
              np.repeat(np.asarray(vol) * density / 4.0, 4))
    free = np.ones(nx * ny * nz, bool)
    free[list(pinned)] = False
    f32 = jnp.float32
    sim = FemSim(tets=tets_j, Dm_inv=jnp.linalg.inv(Dm), vol=vol,
                 mass=jnp.asarray(mass), free=jnp.asarray(free),
                 model=model, gravity=jnp.asarray(gravity, f32),
                 ground_n=jnp.asarray(ground_n, f32),
                 ground_off=f32(ground_off), dhat=f32(dhat),
                 kappa=f32(kappa))
    return sim, x0


def fem_energy(sim: FemSim, x: jax.Array) -> jax.Array:
    """Elastic + ground-barrier energy."""
    Ds = _tet_edges(x, sim.tets)
    F = mm(Ds, sim.Dm_inv)
    e_el = jnp.sum(sim.vol * sim.model.psi(F))
    gap = x @ sim.ground_n - sim.ground_off
    e_c = jnp.sum(barrier(gap * gap, sim.dhat * sim.dhat, sim.kappa))
    return e_el + e_c


def implicit_step(sim: FemSim, x: jax.Array, v: jax.Array, dt, *,
                  newton_iters: int = 2,
                  cg_iters: int = 50) -> Tuple[jax.Array, jax.Array]:
    """Implicit Euler on the incremental potential (Newton-CG,
    matrix-free; same scheme as sim/cloth.py)."""
    dt = jnp.asarray(dt, x.dtype)
    free3 = sim.free[:, None]
    m3 = jnp.maximum(sim.mass, 1e-12)[:, None]
    xhat = x + dt * v + (dt * dt) * sim.gravity[None, :]
    xhat = jnp.where(free3, xhat, x)

    def phi_grad(y):
        g = (m3 / (dt * dt)) * (y - xhat) + jax.grad(
            lambda z: fem_energy(sim, z))(y)
        return jnp.where(free3, g, 0.0)

    def project(p):
        return jnp.where(free3, p, 0.0)

    y = x
    for _ in range(newton_iters):
        g = phi_grad(y)
        hvp = lambda p: project(jax.jvp(phi_grad, (y,), (project(p),))[1])
        res = cg(hvp, -g, project=project, max_iters=cg_iters,
                 rel_tol=1e-3)
        dx = project(res.x)
        gap = y @ sim.ground_n - sim.ground_off
        dgap = dx @ sim.ground_n
        a_vert = jnp.where(dgap < 0,
                           0.9 * gap / jnp.maximum(-dgap, 1e-30), 1.0)
        alpha = jnp.minimum(1.0, jnp.min(jnp.where(sim.free, a_vert,
                                                   jnp.inf)))
        y = y + alpha * dx
    v_new = jnp.where(free3, (y - x) / dt, 0.0)
    return y, v_new
