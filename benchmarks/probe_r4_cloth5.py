"""Round 4: contact active-set compaction — live-row census + step cost.

The r4 cloth ablation (probe_r4_cloth4) showed the CG apply is indexed-
row-rate bound and self-contact holds most rows (4NC/apply).  This
probe measures, in the settled two-layer bench state: (1) how many of
the N*C candidate slots actually have live barriers (bpp > 0) at the
linearization point, (2) the step cost dense vs compacted at a safe
budget.
"""
import sys
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import dataclasses
from benchmarks.measure import chained_ms
from zpc_tpu.sim.cloth import (ClothSim, implicit_step, make_cloth_grid,
                               build_incidence, self_contact_candidates,
                               assemble_operator)

def setup(nx=64):
    spacing, gap, dhat = 0.6 / nx, 0.015, 0.008
    simA, xA = make_cloth_grid(nx, nx, spacing, height=0.2, dhat=dhat,
                               ground_off=-10.0, k_stretch=2e2,
                               k_bend=1e-4, mass=0.01)
    N = xA.shape[0]
    xB = xA + jnp.asarray([0.5 * spacing, gap, 0.5 * spacing])
    free = np.concatenate([np.zeros(N, bool), np.ones(N, bool)])
    sim = build_incidence(dataclasses.replace(
        simA,
        tris=jnp.concatenate([simA.tris, simA.tris + N]),
        edges=jnp.concatenate([simA.edges, simA.edges + N]),
        hinges=jnp.concatenate([simA.hinges, simA.hinges + N]),
        rest_len=jnp.concatenate([simA.rest_len, simA.rest_len]),
        rest_angle=jnp.concatenate([simA.rest_angle, simA.rest_angle]),
        mass=jnp.concatenate([simA.mass, simA.mass]),
        free=jnp.asarray(free), edge_inc=None, hinge_inc=None,
        stencil=None))
    x0 = jnp.concatenate([xA, xB])
    return sim, x0

def main():
    sim, x0 = setup()
    nv = int(x0.shape[0])
    dtj = jnp.float32(0.005)

    def step(i, c, budget=None):
        x, v = c
        x, v, _ = implicit_step(sim, x, v, dtj, newton_iters=2,
                                cg_iters=24, self_contact=True,
                                contact_budget=budget)
        return x, v

    warm = jax.jit(lambda c: jax.lax.fori_loop(0, 40, step, c))
    c0 = jax.block_until_ready(warm((x0, jnp.zeros_like(x0))))

    # live-row census at the settled state
    @jax.jit
    def census(c):
        x, v = c
        cand, _ = self_contact_candidates(sim, x, 8)
        op = assemble_operator(sim, x, x, dtj, cand=cand)
        bpp = op["contact"][3]
        return (jnp.sum((bpp > 0).astype(jnp.int32)),
                jnp.sum((cand >= 0).astype(jnp.int32)))
    n_live, n_cand = census(c0)
    print(f"slots {nv * 8}  candidates {int(n_cand)}  "
          f"live {int(n_live)}", flush=True)

    ms = chained_ms(step, c0, iters=10, reps=3, marginal=True)
    print(f"dense step: {ms:.1f} ms", flush=True)
    for budget in (2 * nv, nv):
        stepb = lambda i, c, b=budget: step(i, c, budget=b)
        ms = chained_ms(stepb, c0, iters=10, reps=3, marginal=True)
        print(f"budget {budget:6d}: {ms:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
