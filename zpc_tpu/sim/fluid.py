"""J-only weakly-compressible fluid MPM (claymore's fluid pipeline;
reference ``simulation/mpm``'s EquationOfState material path).

Fluids need no deformation gradient: the EOS stress depends only on the
volume ratio J, so particles carry a scalar J instead of a dim x dim F —
6 (2-D) / 12 (3-D) fewer floats per particle through every transfer, and
the stress contribution to the APIC affine matrix is a *diagonal* update
(one scalar per particle) instead of a full Kirchhoff tensor.

J evolves by the MLS-MPM identity  J' = J (1 + dt tr(C'))  — the trace
of the affine velocity gradient is the discrete divergence.

Shares the stencil/scatter machinery (and the oracle-test contract) with
``sim.mpm.explicit_step``; works in 2-D and 3-D.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import prop
from ..geometry.collider import resolve_boundaries
from ..geometry.sparse_grid import SparseGrid, sparse_grid
from ..models.constitutive import EquationOfState
from .mpm import MPMSim, MPMState, _stencil, _apic_dinv

__all__ = ["make_fluid_state", "explicit_fluid_step"]


def make_fluid_state(x: jax.Array, *, dx: float, rho: float = 1e3,
                     ppc: float = 8.0, block_capacity: int = 4096,
                     velocity: Optional[jax.Array] = None,
                     capacity: Optional[int] = None,
                     origin=None) -> MPMState:
    """Particle state carrying (x, v, J, C, m, vol) and a m/v grid."""
    from ..containers.structured import structured_field
    n, dim = x.shape
    cap = capacity or n
    vol0 = dx ** dim / ppc
    props = [prop("x", dim), prop("v", dim), prop("J"),
             prop("C", (dim, dim)), prop("m"), prop("vol")]
    data = {
        "x": x,
        "v": velocity if velocity is not None else jnp.zeros((n, dim)),
        "J": jnp.ones((n,)),
        "C": jnp.zeros((n, dim, dim)),
        "m": jnp.full((n,), rho * vol0),
        "vol": jnp.full((n,), vol0),
    }
    particles = structured_field(props, cap, data=data, size=n)
    grid = sparse_grid([prop("m"), prop("v", dim)], dx=dx,
                       block_capacity=block_capacity, dim=dim,
                       origin=origin)
    return MPMState(particles, grid, jnp.float32(0.0))


def explicit_fluid_step(sim: MPMSim, state: MPMState, dt,
                        j_clamp: float = 0.1) -> MPMState:
    """One explicit APIC step with scalar-J EOS stress.

    ``sim.model`` must be an ``EquationOfState``; ``j_clamp`` bounds J
    from below for blow-up safety under violent compression (the
    claymore fluid kernels clamp the same way).
    """
    assert isinstance(sim.model, EquationOfState), \
        "fluid pipeline needs an EquationOfState model"
    p = state.particles
    grid = state.grid
    dim, bs = grid.dim, grid.block_size
    ncell = grid.cells_per_block
    cap_cells = grid.block_capacity * ncell
    dx = grid.dx
    pmask = p.mask
    m = jnp.where(pmask, p["m"], 0.0)

    cells, w3, base, xi = _stencil(sim, grid, p["x"])
    pblock = jnp.floor_divide(base, bs)
    grid = grid.activate(pblock, valid=pmask, dilation=1)

    # fused P2G: tau = -p(J) J I is diagonal, so the stress only shifts
    # the APIC affine matrix's diagonal by one scalar per particle
    Dinv = _apic_dinv(sim.order, dx)
    # masked lanes carry J = 0; pressure(0) = inf and 0 * inf = NaN
    J = jnp.where(pmask, p["J"], 1.0)
    tau_s = -sim.model.pressure(J) * J                         # [N]
    stress_s = -dt * Dinv * jnp.where(pmask, p["vol"], 0.0) * tau_s
    A = m[:, None, None] * p["C"]
    A = A + stress_s[:, None, None] * jnp.eye(dim, dtype=A.dtype)
    xdiff = (cells.astype(xi.dtype) - xi[:, None, :]) * dx     # [N,S^d,d]
    mom = w3[..., None] * (
        m[:, None, None] * p["v"][:, None, :] +
        jnp.einsum("nij,nkj->nki", A, xdiff))
    mass_c = w3 * m[:, None]
    slot = grid.cell_slot(cells)
    slot = jnp.where(slot >= 0, slot, cap_cells)
    payload = jnp.concatenate([mass_c[..., None], mom], -1)
    acc = jnp.zeros((cap_cells + 1, 1 + dim), payload.dtype)
    acc = acc.at[slot.reshape(-1)].add(
        payload.reshape(-1, 1 + dim))[:cap_cells]
    gm = acc[:, 0]
    gmv = acc[:, 1:]

    has_mass = gm > 0.0
    gv0 = jnp.where(has_mass[:, None],
                    gmv / jnp.maximum(gm, 1e-30)[:, None], 0.0)
    gv = gv0 + dt * sim.gravity[None, :]
    node_x = grid.node_world_positions().reshape(cap_cells, dim)
    gv = resolve_boundaries(sim.colliders, node_x, gv)
    gv = jnp.where(has_mass[:, None], gv, 0.0)
    max_vel = jnp.sqrt(jnp.max(jnp.sum(gv * gv, -1)))
    grid = grid.with_data(
        m=gm.reshape(grid.block_capacity, ncell),
        v=gv.reshape(grid.block_capacity, ncell, dim))

    safe_slot = jnp.minimum(slot, cap_cells - 1)
    vnode = gv[safe_slot]
    vnode = jnp.where((slot < cap_cells)[..., None], vnode, 0.0)
    v_new = jnp.einsum("nk,nki->ni", w3, vnode)
    B = jnp.einsum("nk,nki,nkj->nij", w3, vnode, xdiff)
    C_new = Dinv * B
    if sim.flip > 0.0:
        gdv = gv - gv0
        dvnode = jnp.where((slot < cap_cells)[..., None],
                           gdv[safe_slot], 0.0)
        dv = jnp.einsum("nk,nki->ni", w3, dvnode)
        v_new = sim.flip * (p["v"] + dv) + (1.0 - sim.flip) * v_new
    # volume update: divergence of the affine field (MLS-MPM)
    J_new = J * (1.0 + dt * jnp.trace(C_new, axis1=-2, axis2=-1))
    J_new = jnp.maximum(J_new, j_clamp)
    x_new = p["x"] + dt * v_new

    mk = pmask[:, None]
    particles = p.update(
        x=jnp.where(mk, x_new, p["x"]),
        v=jnp.where(mk, v_new, p["v"]),
        J=jnp.where(pmask, J_new, p["J"]),
        C=jnp.where(mk[..., None], C_new, p["C"]),
    )
    return MPMState(particles, grid, max_vel)
