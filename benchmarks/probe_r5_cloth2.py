"""Round-5 probe 2: honest max_cand for the cloth bench + timing at it.

probe_r5_cloth_window found cand_ovf=True at the settled state for
max_cand up to 20.  Diagnose the real candidate-count distribution
(own-layer ring-1 triangle AABBs touch every vertex by construction,
so raw LBVH counts are ~2x the contact-relevant pairs), pick a
non-overflowing budget, and time window vs dense at it.  Also times a
plain (non-marginal) chain as a cross-check on the marginal method.

Run on TPU:  python benchmarks/probe_r5_cloth2.py [--nx 64]
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
from benchmarks.probe_r5_cloth_window import build


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--residue", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--mc", type=int, default=32)
    ap.add_argument("--skip-dense", action="store_true")
    ap.add_argument("--skip-diag", action="store_true")
    args = ap.parse_args()
    from zpc_tpu.sim.cloth import (ContactWindow, implicit_step,
                                   self_contact_candidates)
    sim, x0 = build(args.nx)
    nv = int(x0.shape[0])
    dtj = jnp.float32(0.005)
    mc = args.mc
    cw = ContactWindow(radius=1, max_residue=args.residue)
    print(f"nv={nv} tris={int(sim.tris.shape[0])} mc={mc} "
          f"dev={jax.devices()[0].device_kind}", flush=True)

    def step_win(i, c):
        x, v = c
        x, v, _ = implicit_step(sim, x, v, dtj, newton_iters=2,
                                cg_iters=24, self_contact=True,
                                max_cand=mc, contact_window=cw)
        return x, v

    def step_dense(i, c):
        x, v = c
        x, v, _ = implicit_step(sim, x, v, dtj, newton_iters=2,
                                cg_iters=24, self_contact=True,
                                max_cand=mc)
        return x, v

    t0 = time.time()
    warm = jax.jit(lambda c: jax.lax.fori_loop(0, 40, step_win, c))
    c0 = jax.block_until_ready(warm((x0, jnp.zeros_like(x0))))
    print(f"settle(window mc={mc}) compile+run {time.time() - t0:.1f}s",
          flush=True)

    if not args.skip_diag:
        # candidate-count census at a GENEROUS budget (bounds the true
        # per-vertex candidate count; also validates band coverage)
        from zpc_tpu.containers.bvh import (build_lbvh_complete,
                                            query_overlaps_sorted)
        x = c0[0]
        tv = x[sim.tris]
        bvh = jax.jit(lambda lo, hi: build_lbvh_complete(lo, hi))(
            jnp.min(tv, 1), jnp.max(tv, 1))
        tile = 128
        nq = -(-nv // tile) * tile
        pts = jnp.concatenate(
            [x, jnp.full((nq - nv, 3), 1e9, x.dtype)])
        qid, hits, cnt, band = jax.jit(
            lambda b, p: query_overlaps_sorted(
                b, p, p, 64, tile=tile, uniform_extent=sim.dhat))(
            bvh, pts)
        cnt_v = np.zeros(nq, np.int32)
        cnt_v[np.asarray(qid)] = np.asarray(cnt)
        band_v = np.zeros(nq, bool)
        band_v[np.asarray(qid)] = np.asarray(band)
        cnt_v, band_v = cnt_v[:nv], band_v[:nv]
        print(f"raw AABB counts: max={cnt_v.max()} "
              f"p99={np.percentile(cnt_v, 99):.0f} "
              f"mean={cnt_v.mean():.1f} inband={band_v.mean():.4f}",
              flush=True)
        cand, ovf = jax.jit(lambda y: self_contact_candidates(
            sim, y, mc))(x)
        live = int(jnp.sum((cand >= 0).astype(jnp.int32)))
        print(f"mc={mc}: cand_ovf={bool(ovf)} live_cand={live} "
              f"({live / nv:.2f}/vertex)", flush=True)

    ms = chained_ms(step_win, c0, iters=args.iters, reps=3,
                    marginal=True)
    print(f"window mc={mc} (marginal): {ms:7.1f} ms/step", flush=True)
    ms2 = chained_ms(step_win, c0, iters=args.iters, reps=3,
                     marginal=False)
    print(f"window mc={mc} (plain)   : {ms2:7.1f} ms/step", flush=True)
    if not args.skip_dense:
        ms = chained_ms(step_dense, c0, iters=args.iters, reps=3,
                        marginal=True)
        print(f"dense  mc={mc} (marginal): {ms:7.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
