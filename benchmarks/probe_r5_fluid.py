"""Round-5: attribute the fluid/elastic throughput gap (VERDICT item 3).

The 262k dam-break row (3.9 ms/step = 67.8 M pps) folds full sort-based
rebins into the marginal chain; the elastic row (2.0 ms) measures a
settled block that almost never rebins.  This probe separates the terms
at the bench's measured window (post-100-step collapse):

  1. bare step (rebin never; the pure transfer+EOS cost)
  2. adaptive with FULL rebin on needs_rebin (the bench row as-is)
  3. adaptive with INCREMENTAL migration (migrate_capacity budget,
     reserve_bins free-lane headroom), full rebin as the fallback
  4. rebin cadence: how many of 60 chained steps set needs_rebin

Run on TPU:  python benchmarks/probe_r5_fluid.py [--n 262144]
"""

import argparse
import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms


def build(n, bins, nb, chunk, reserve=0, migrate=0):
    from zpc_tpu.models.constitutive import EquationOfState
    from zpc_tpu.sim.fluid import make_fluid_state
    from zpc_tpu.sim.fluid_binned2 import bin_fluid_state
    from zpc_tpu.sim.mpm_binned2 import BinnedConfig2
    from zpc_tpu.geometry.collider import Collider, ColliderType
    from zpc_tpu.geometry.levelset import ComplementLevelSet, Cuboid
    from zpc_tpu.sim.mpm import MPMSim

    rng = np.random.default_rng(11)
    dx = 1.0 / 128
    side_c = round((n / 8) ** (1 / 3))
    cell = np.arange(side_c)
    ci = np.stack(np.meshgrid(cell, cell, cell, indexing="ij"),
                  -1).reshape(-1, 3)
    offs = np.stack(np.meshgrid(*([np.asarray([0.25, 0.75])] * 3),
                                indexing="ij"), -1).reshape(-1, 3)
    x = (ci[:, None, :] + offs[None, :, :]).reshape(-1, 3)
    x = (x + rng.uniform(-0.1, 0.1, x.shape)) * dx + 0.05
    x = x.astype(np.float32)[:n]
    st = make_fluid_state(jnp.asarray(x), dx=dx, rho=1e3,
                          block_capacity=nb)
    tank = Collider(ComplementLevelSet(Cuboid(jnp.full(3, 0.02),
                                              jnp.full(3, 0.98))),
                    ColliderType.slip)
    sim = MPMSim(model=EquationOfState(mu=jnp.float32(0.0),
                                       lam=jnp.float32(8e4),
                                       gamma=jnp.float32(7.0)),
                 gravity=jnp.asarray([0.0, -9.8, 0.0]), colliders=(tank,))
    cfg = BinnedConfig2(bins_capacity=bins, block_capacity=nb,
                        chunk_bins=chunk, reserve_bins=reserve,
                        migrate_capacity=migrate)
    bst = jax.block_until_ready(
        jax.jit(lambda s: bin_fluid_state(sim, s, cfg))(st))
    return sim, bst, cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--migrate", type=int, default=8192)
    ap.add_argument("--reserve", type=int, default=1)
    ap.add_argument("--bins", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=0)
    ap.add_argument("--skip-inc", action="store_true")
    args = ap.parse_args()
    from zpc_tpu.sim.fluid_binned2 import explicit_fluid_step_binned2
    from zpc_tpu.sim.mpm_binned2 import _rebin, rebin_adaptive

    n = args.n
    big = n > 524288
    bins = args.bins or (10240 if big else 4096)
    nb = 8192 if big else 4096
    chunk = args.chunk or (640 if big else 512)
    dtj = jnp.float32(2e-4)
    print(f"n={n >> 10}k dev={jax.devices()[0].device_kind}", flush=True)

    def warm_to_window(sim, bst, cfg, step):
        w = jax.jit(lambda s: jax.lax.fori_loop(0, 100, step, s))
        return jax.block_until_ready(w(bst))

    # --- full-rebin adaptive (the bench row) -----------------------------
    sim, bst, cfg = build(n, bins, nb, chunk)

    def step_full(_, s):
        s = jax.lax.cond(s.needs_rebin,
                         lambda t: _rebin(sim, t, cfg), lambda t: t, s)
        return explicit_fluid_step_binned2(sim, s, dtj, cfg, rebin=False)

    w0 = warm_to_window(sim, bst, cfg, step_full)
    ms = chained_ms(step_full, w0, iters=args.iters, marginal=True)
    print(f"adaptive FULL rebin   : {ms:7.2f} ms/step "
          f"({n / ms / 1e3:.1f} M pps)", flush=True)

    # rebin cadence at the window: run 60 steps, count needs_rebin fires
    s, k = w0, jnp.int32(0)

    def body(i, c):
        s, k = c
        k = k + s.needs_rebin.astype(jnp.int32)
        s = jax.lax.cond(s.needs_rebin,
                         lambda t: _rebin(sim, t, cfg), lambda t: t, s)
        return explicit_fluid_step_binned2(sim, s, dtj, cfg,
                                           rebin=False), k
    s, k = jax.block_until_ready(
        jax.jit(lambda c: jax.lax.fori_loop(0, 60, body, c))((s, k)))
    print(f"rebin cadence          : {int(k)}/60 steps "
          f"(ovf={bool(s.overflow)})", flush=True)

    # --- bare step (never rebin; lower bound) -----------------------------
    def step_bare(_, s):
        return explicit_fluid_step_binned2(sim, s, dtj, cfg, rebin=False)
    ms = chained_ms(step_bare, w0, iters=args.iters, marginal=True)
    print(f"bare step (no rebin)  : {ms:7.2f} ms/step "
          f"({n / ms / 1e3:.1f} M pps)", flush=True)

    # --- incremental migration -------------------------------------------
    if args.skip_inc:
        return
    simi, bsti, cfgi = build(n, bins, nb, chunk,
                             reserve=args.reserve, migrate=args.migrate)

    def step_inc(_, s):
        s = jax.lax.cond(s.needs_rebin,
                         lambda t: rebin_adaptive(simi, t, cfgi),
                         lambda t: t, s)
        return explicit_fluid_step_binned2(simi, s, dtj, cfgi, rebin=False)

    wi = warm_to_window(simi, bsti, cfgi, step_inc)
    ms = chained_ms(step_inc, wi, iters=args.iters, marginal=True)
    print(f"adaptive INCREMENTAL  : {ms:7.2f} ms/step "
          f"({n / ms / 1e3:.1f} M pps)  "
          f"(migrate={args.migrate} reserve={args.reserve} "
          f"ovf={bool(wi.overflow)})", flush=True)


if __name__ == "__main__":
    main()
