"""Round-5 probe: window-stencil contact on the bench cloth scene.

VERDICT r5 item 1: the round-4 EOD ContactWindow path (slice-form
in-window contact + indexed residue) vs the dense gathered contact —
146.9 ms/step at 8k verts was the round-4 dense number, target 60-80.

Run on TPU:  python benchmarks/probe_r5_cloth_window.py [--nx 64]
"""

import argparse
import sys
import time

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms


def build(nx):
    from zpc_tpu.sim.cloth import (ClothSim, build_grid_stencil,
                                   build_incidence, make_cloth_grid)
    # scale-similar scene: dhat/gap track the mesh spacing so the
    # contact regime (and candidate counts) are size-invariant; at
    # nx=64 these are exactly the historical 0.008 / 0.015
    spacing = 0.6 / nx
    gap, dhat = 1.6 * spacing, 0.8533333 * spacing
    simA, xA = make_cloth_grid(nx, nx, spacing, height=0.2, dhat=dhat,
                               ground_off=-10.0, k_stretch=2e2,
                               k_bend=1e-4, mass=0.01)
    N = xA.shape[0]
    xB = xA + jnp.asarray([0.5 * spacing, gap, 0.5 * spacing])
    free = np.concatenate([np.zeros(N, bool), np.ones(N, bool)])
    sim = ClothSim(
        tris=jnp.concatenate([simA.tris, simA.tris + N]),
        edges=jnp.concatenate([simA.edges, simA.edges + N]),
        hinges=jnp.concatenate([simA.hinges, simA.hinges + N]),
        rest_len=jnp.concatenate([simA.rest_len, simA.rest_len]),
        rest_angle=jnp.concatenate([simA.rest_angle, simA.rest_angle]),
        mass=jnp.concatenate([simA.mass, simA.mass]),
        free=jnp.asarray(free),
        k_stretch=simA.k_stretch, k_bend=simA.k_bend,
        gravity=simA.gravity, ground_n=simA.ground_n,
        ground_off=simA.ground_off, dhat=simA.dhat, kappa=simA.kappa,
        mu=simA.mu, epsv=simA.epsv)
    sim = build_grid_stencil(build_incidence(sim),
                             ((0, nx, nx), (N, nx, nx)))
    return sim, jnp.concatenate([xA, xB])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--residue", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--max-cand", type=int, default=8)
    ap.add_argument("--skip-dense", action="store_true")
    args = ap.parse_args()
    from zpc_tpu.sim.cloth import ContactWindow, implicit_step
    sim, x0 = build(args.nx)
    nv = int(x0.shape[0])
    dtj = jnp.float32(0.005)
    mc = args.max_cand
    print(f"nv={nv} tris={int(sim.tris.shape[0])} max_cand={mc} "
          f"dev={jax.devices()[0].device_kind}", flush=True)

    def step_dense(i, c):
        x, v = c
        x, v, _ = implicit_step(sim, x, v, dtj, newton_iters=2,
                                cg_iters=24, self_contact=True,
                                max_cand=mc)
        return x, v

    cw = ContactWindow(radius=1, max_residue=args.residue)

    def step_win(i, c):
        x, v = c
        x, v, _ = implicit_step(sim, x, v, dtj, newton_iters=2,
                                cg_iters=24, self_contact=True,
                                max_cand=mc, contact_window=cw)
        return x, v

    t0 = time.time()
    warm = jax.jit(lambda c: jax.lax.fori_loop(0, 40, step_win, c))
    c0 = jax.block_until_ready(warm((x0, jnp.zeros_like(x0))))
    print(f"settle(window) compile+run {time.time() - t0:.1f}s",
          flush=True)
    # overflow census at the settled state (eager, outside the loop)
    from zpc_tpu.sim.cloth import (classify_window_residue,
                                   self_contact_candidates)
    for mc_try in (mc, 12, 16, 20):
        cand, ovf = jax.jit(lambda x, _m=mc_try: self_contact_candidates(
            sim, x, _m))(c0[0])
        *_, rovf = jax.jit(
            lambda c: classify_window_residue(sim, cw, c))(cand)
        print(f"settled: max_cand={mc_try} cand_ovf={bool(ovf)} "
              f"residue_ovf={bool(rovf)}", flush=True)
        if not bool(ovf):
            break

    ms = chained_ms(step_win, c0, iters=args.iters, reps=3,
                    marginal=True)
    print(f"window   : {ms:7.1f} ms/step "
          f"({nv / (ms / 1e3) / 1e6:.3f} M vert-steps/s)", flush=True)
    if not args.skip_dense:
        ms = chained_ms(step_dense, c0, iters=args.iters, reps=3,
                        marginal=True)
        print(f"dense    : {ms:7.1f} ms/step "
              f"({nv / (ms / 1e3) / 1e6:.3f} M vert-steps/s)", flush=True)


if __name__ == "__main__":
    main()
