"""Round-5: WHICH term of the cloth broad-phase overflow fires?

self_contact_candidates' overflow = any(n_keep > max_cand) OR NOT
band_ok, where band_ok folds the per-entry band certificate AND the
per-cell slot bound cnt <= C.  The settled-state probe flipped from
cand_ovf=False (446a786, 38.4 ms) to True (HEAD, 87 ms) with no
semantic diff in sight — break the flag apart at the settled state.

Run on TPU:  python benchmarks/probe_r5_cloth3.py [--nx 64]
"""

import argparse
import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.probe_r5_cloth_window import build


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--mc", type=int, default=32)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--group", type=int, default=128)
    ap.add_argument("--qtile", type=int, default=128)
    ap.add_argument("--cells", type=int, default=8)
    args = ap.parse_args()
    from zpc_tpu.containers.bvh import (build_lbvh_complete,
                                        query_overlaps_sorted)
    from zpc_tpu.sim.cloth import ContactWindow, implicit_step
    sim, x0 = build(args.nx)
    N = int(x0.shape[0])
    mc = args.mc
    cw = ContactWindow(radius=1, max_residue=1024)
    dtj = jnp.float32(0.005)

    def step_win(i, c):
        x, v = c
        x, v, _ = implicit_step(sim, x, v, dtj, newton_iters=2,
                                cg_iters=24, self_contact=True,
                                max_cand=mc, contact_window=cw)
        return x, v

    warm = jax.jit(lambda c: jax.lax.fori_loop(0, args.steps,
                                               step_win, c))
    c0 = jax.block_until_ready(warm((x0, jnp.zeros_like(x0))))
    x = c0[0]

    # inline replay of self_contact_candidates' big-M path
    tile = args.qtile
    tv = x[sim.tris]
    bvh = jax.jit(build_lbvh_complete)(jnp.min(tv, 1), jnp.max(tv, 1))
    nq = -(-N // tile) * tile
    pad = nq - N
    pts = jnp.concatenate([x, jnp.full((pad, 3), 1e9, x.dtype)])
    R, C = args.cells, mc + 3
    qid, hits, cnt, band = jax.jit(lambda b, p: query_overlaps_sorted(
        b, p, p, C, tile=tile, group=args.group,
        uniform_extent=sim.dhat, decompose=True, cells=R))(bvh, pts)
    qid, hits, cnt, band = map(np.asarray, (qid, hits, cnt, band))
    live = qid < N
    print(f"entries: {qid.shape[0]}  live: {int(live.sum())}", flush=True)
    print(f"band violations (live): {int((~band & live).sum())}",
          flush=True)
    bad_q = np.zeros(nq, bool)
    np.logical_or.at(bad_q, qid[~band & live], True)
    print(f"out-of-band QUERIES: {int(bad_q.sum())} / {N}", flush=True)
    print(f"cnt > C={C} (live):     {int(((cnt > C) & live).sum())}"
          f"   max cnt: {int(cnt[live].max())}", flush=True)
    # per-vertex survivor count (recompute incident exclusion)
    E = qid.shape[0]
    pos = np.arange(E, dtype=np.int64)
    order = np.argsort(qid, kind="stable")
    occ = np.empty(E, np.int64)
    occ[order] = pos % R
    hits_v = np.full((nq, R, C), -1, np.int64)
    hits_v[qid, occ] = hits
    hits_v = hits_v[:N].reshape(N, R * C)
    tris = np.asarray(sim.tris)
    vidc = np.arange(N)[:, None]
    hs = np.maximum(hits_v, 0)
    inc = np.zeros(hits_v.shape, bool)
    for k in range(3):
        inc |= tris[:, k][hs] == vidc
    inc &= hits_v >= 0
    keep = (hits_v >= 0) & ~inc
    n_keep = keep.sum(1)
    print(f"n_keep: max {int(n_keep.max())}  p99 "
          f"{np.percentile(n_keep, 99):.0f}  mean {n_keep.mean():.2f}"
          f"  > mc={mc}: {int((n_keep > mc).sum())}", flush=True)


if __name__ == "__main__":
    main()
