"""Round 4 (VERDICT item 5): re-test Jacobi preconditioning with the
BARRIER stiffness in the CG operator.  The round-3 negative result
(elastic-K diag estimate HURTS: 7 -> 11-15 iters) predates the contact
coupling; the barrier Hessian is kappa-scaled and near-rank-1 per
particle, so its squared-weight grid diagonal is an honest row norm.

Iteration counts are hardware-independent -> run on CPU.  Sweep kappa
and dt; report CG iters at tol 1e-3 with mass-only vs mass+barrier-diag
preconditioner, settled pile on a floor mesh (the regime where barrier
curvature dominates the residual).
"""

import sys

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from zpc_tpu.models.constitutive import FixedCorotated
from zpc_tpu.sim.mpm import MPMSim, make_mpm_state
from zpc_tpu.sim.mpm_binned2 import BinnedConfig2, bin_state
from zpc_tpu.sim.contact_implicit import MeshContact
from zpc_tpu.sim.implicit_binned2 import (implicit_rollout_binned2,
                                          implicit_step_binned2)


def _floor_mesh(y=0.2, lo=-1.0, hi=2.0):
    a = [lo, y, lo]
    b = [hi, y, lo]
    c = [hi, y, hi]
    d = [lo, y, hi]
    return jnp.asarray([[a, b, c], [a, c, d]], jnp.float32)


def main():
    rng = np.random.default_rng(0)
    n = 2048
    x = np.stack([rng.uniform(0.3, 0.7, n),
                  rng.uniform(0.21, 0.35, n),
                  rng.uniform(0.3, 0.7, n)], -1)
    st = make_mpm_state(jnp.asarray(x, jnp.float32), dx=0.05,
                        block_capacity=512)
    sim = MPMSim(model=FixedCorotated.from_young_poisson(1e4, 0.3),
                 gravity=jnp.asarray([0.0, -9.8, 0.0]))
    cfg = BinnedConfig2(bins_capacity=192)
    for kappa in (5e-2, 5e0, 5e2):
        mc = MeshContact.build(_floor_mesh(), dhat=0.02, kappa=kappa,
                               max_tris=4)
        for dt in (2e-3, 8e-3):
            # settle 20 steps so the pile is IN contact, then measure
            stl, _ = implicit_rollout_binned2(
                sim, st, jnp.float32(dt), cfg, 20, cg_iters=60,
                contact=mc)
            bst = bin_state(sim, stl, cfg)
            row = [f"kappa={kappa:g} dt={dt:g}:"]
            for pre in (False, True):
                _, it = implicit_step_binned2(
                    sim, bst, jnp.float32(dt), cfg, cg_iters=60,
                    cg_tol=1e-3, contact=mc, rebin=False,
                    with_stats=True, contact_precond=pre)
                row.append(f"{'diag' if pre else 'mass'}={int(it)}")
            print(" ".join(row), flush=True)


if __name__ == "__main__":
    main()
