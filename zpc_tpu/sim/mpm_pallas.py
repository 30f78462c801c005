"""Explicit MPM step with Pallas transfer kernels — the fastest path.

Pipeline = the binned step (:mod:`zpc_tpu.sim.mpm_binned`) with the gather
-bound stages replaced by the kernels in :mod:`zpc_tpu.ops.p2g_pallas`:
exactly two XLA indexed ops remain per step (scatter particles into the
bin-padded layout, gather the results back); everything between is
pipelined VMEM blocks, contiguous DMA, and MXU contractions.

Physics identical to ``explicit_step`` / ``explicit_step_binned`` up to
summation order (shared oracle tests).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.collider import resolve_boundaries
from ..geometry.sparse_grid import neighbor_offsets
from ..math.interpolation import bspline_weights
from ..ops import p2g_pallas as PK
from .mpm import MPMSim, MPMState
from .mpm_binned import BIN_SIZE, BinnedConfig

__all__ = ["explicit_step_pallas"]


def explicit_step_pallas(sim: MPMSim, state: MPMState, dt,
                         cfg: BinnedConfig, *, interpret: bool = False
                         ) -> Tuple[MPMState, jax.Array]:
    p = state.particles
    grid = state.grid
    dim, bs = grid.dim, grid.block_size
    assert dim == 3 and bs == 4 and BIN_SIZE == PK.K
    assert sim.order == 2, "pallas kernels hardcode quadratic B-splines"
    nb = grid.block_capacity
    dx = grid.dx
    N = p.capacity
    nbins = cfg.bins_capacity
    K = BIN_SIZE

    pmask0 = p.mask
    x0 = p["x"]
    origin_w = grid.transform.matrix[:dim, 3]

    # ---- partition + bin structure (XLA; shared with mpm_binned) -----------
    inv_dx = 1.0 / dx
    xi0 = (x0 - origin_w) * inv_dx
    base0, _, _ = bspline_weights(xi0, sim.order)
    pblock0 = jnp.floor_divide(base0, bs)
    grid, bslot0 = grid.activate_with_slots(pblock0, valid=pmask0,
                                            dilation=1)
    table = grid.table
    sort_key = jnp.where(pmask0 & (bslot0 >= 0), bslot0, nb)
    pid = jnp.arange(N, dtype=jnp.int32)
    skey, sid = jax.lax.sort((sort_key, pid), num_keys=1, is_stable=True)

    blk_ids = jnp.arange(nb, dtype=jnp.int32)
    starts = jnp.searchsorted(skey, blk_ids).astype(jnp.int32)
    ends = jnp.searchsorted(skey, blk_ids + 1).astype(jnp.int32)
    counts = ends - starts
    bins_per_block = (counts + K - 1) // K
    bin_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32),
         jnp.cumsum(bins_per_block)]).astype(jnp.int32)
    total_bins = bin_start[-1]
    overflow = total_bins > nbins
    bin_idx = jnp.arange(nbins, dtype=jnp.int32)
    bin_block = jnp.clip(
        (jnp.searchsorted(bin_start, bin_idx, side="right") - 1
         ).astype(jnp.int32), 0, nb - 1)
    bin_live = bin_idx < total_bins
    origins = table.active_coords[bin_block]            # [nbins, 3]

    # original particle -> flat bin-lane position (for scatter + gather)
    inv_sorted = jnp.zeros((N,), jnp.int32).at[sid].set(pid)
    blk_of_p = jnp.clip(sort_key, 0, nb - 1)
    off_in_blk = inv_sorted - starts[blk_of_p]
    bin_of_p = bin_start[blk_of_p] + off_in_blk // K
    lane_of_p = off_in_blk % K
    flat_of_p = bin_of_p * K + lane_of_p
    valid_p = pmask0 & (sort_key < nb) & (flat_of_p < nbins * K)
    flat_safe = jnp.clip(flat_of_p, 0, nbins * K - 1)
    # overflow also covers table overflow (live particle whose block was
    # dropped, bslot0 < 0): such particles are excluded from the bins, so
    # their result gather below is gated on valid_p and the host must grow
    # capacity + re-trace (bht _buildSuccess idiom, Bht.hpp:163-175)
    overflow = overflow | jnp.any(pmask0 & (bslot0 < 0))

    # ---- pack + scatter into bin-padded layout (indexed op #1) -------------
    Dinv = 4.0 / (dx * dx)
    m0 = jnp.where(pmask0, p["m"], 0.0)
    vol0 = jnp.where(pmask0, p["vol"], 0.0)
    tau = sim.model.kirchhoff(p["F"])
    A = m0[:, None, None] * p["C"] - \
        (dt * Dinv * vol0)[:, None, None] * tau
    has_Jp = sim.plasticity is not None and p.has_prop("Jp")
    jp_col = (p["Jp"][:, None] if has_Jp
              else jnp.zeros((N, 1), x0.dtype))
    packed = jnp.concatenate([
        x0, p["v"], A.reshape(N, 9), m0[:, None], p["F"].reshape(N, 9),
        jp_col, jnp.zeros((N, 2), x0.dtype)], axis=1)   # [N, PACK_W=28]
    dst = jnp.where(valid_p, flat_safe, nbins * K)
    binned = jnp.zeros((nbins * K + 1, PK.PACK_W), jnp.float32
                       ).at[dst].set(packed)[:-1].reshape(nbins, K,
                                                          PK.PACK_W)

    # ---- P2G kernel + bins->blocks segsum + halo merge ---------------------
    cubes = PK.p2g_bins(binned, origins, dt, dx, origin_w,
                        interpret=interpret)
    seg = jnp.where(bin_live, bin_block, nb)
    block_cubes = jax.ops.segment_sum(cubes, seg, num_segments=nb + 1)[:nb]

    dirs = jnp.asarray([d for d in neighbor_offsets(3, 0, 1).tolist()
                        if any(d)], jnp.int32)          # [7, 3]
    coords = table.active_coords
    nbr_spill = jax.vmap(
        lambda d: table.query(coords - d[None, :]), out_axes=1)(dirs)
    nbr_spill = jnp.where(table.mask[:, None], nbr_spill, -1)
    node_vals = PK.halo_merge(block_cubes, nbr_spill, interpret=interpret)
    gm = node_vals[:, 0, :64]                           # [nb, 64]
    gmv = jnp.moveaxis(node_vals[:, 1:4, :64], 1, 2)    # [nb, 64, 3]

    # ---- grid update (dense XLA) -------------------------------------------
    has_mass = gm > 0.0
    gv = jnp.where(has_mass[..., None],
                   gmv / jnp.maximum(gm, 1e-30)[..., None], 0.0)
    gv = gv + dt * sim.gravity[None, None, :]
    corners = jnp.asarray(neighbor_offsets(3, 0, bs - 1))
    node_cells = coords[:, None, :] * bs + corners[None, :, :]
    node_x = node_cells.astype(gv.dtype) * dx + origin_w
    gv = resolve_boundaries(sim.colliders, node_x, gv)
    gv = jnp.where(has_mass[..., None], gv, 0.0)
    max_vel = jnp.sqrt(jnp.max(jnp.sum(gv * gv, -1)))
    # channel-major node velocities for the G2P kernel
    gvp = jnp.zeros((nb, PK.ROWS, 128), jnp.float32)
    gvp = gvp.at[:, 0:3, 0:64].set(jnp.moveaxis(gv, 2, 1))

    # ---- G2P kernel ---------------------------------------------------------
    nbr_pull = jax.vmap(
        lambda d: table.query(coords + d[None, :]), out_axes=1)(dirs)
    own = jnp.arange(nb, dtype=jnp.int32)[:, None]
    nbr8_blocks = jnp.concatenate([own, nbr_pull], axis=1)  # [nb, 8]
    nbr8_blocks = jnp.where(table.mask[:, None], nbr8_blocks, -1)
    nbr8 = nbr8_blocks[bin_block]                           # [nbins, 8]
    res = PK.g2p_bins(binned, gvp, origins, nbr8, dt, dx, origin_w,
                      interpret=interpret)                  # [nbins, K, 24]

    # ---- plasticity (XLA elementwise on the binned layout) -----------------
    if has_Jp:
        F_new = res[..., 6:15].reshape(nbins, K, 3, 3)
        Jp_b = binned[..., 25]
        F_proj, Jp_new = sim.plasticity.project(F_new, Jp_b)
        res = jnp.concatenate(
            [res[..., :6], F_proj.reshape(nbins, K, 9), res[..., 15:]], -1)

    # ---- gather results back (indexed op #2) -------------------------------
    flat_res = res.reshape(nbins * K, res.shape[-1])[flat_safe]
    # gate on valid_p (not pmask0): live particles excluded from the bins by
    # an overflow keep their old values instead of gathering garbage
    mk1 = valid_p[:, None]
    channels = dict(
        x=jnp.where(mk1, flat_res[:, 0:3], x0),
        v=jnp.where(mk1, flat_res[:, 3:6], p["v"]),
        F=jnp.where(mk1[..., None],
                    flat_res[:, 6:15].reshape(N, 3, 3), p["F"]),
        C=jnp.where(mk1[..., None],
                    flat_res[:, 15:24].reshape(N, 3, 3), p["C"]))
    if has_Jp:
        Jp_flat = Jp_new.reshape(nbins * K)[flat_safe]
        channels["Jp"] = jnp.where(valid_p, Jp_flat, p["Jp"])
    particles = p.update(**channels)
    grid = grid.with_data(m=gm, v=gv)
    return MPMState(particles, grid, max_vel), overflow
