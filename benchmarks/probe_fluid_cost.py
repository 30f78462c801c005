"""Decompose the fluid dam-break step cost: bare step vs cond tax vs
rebin frequency, and whether the incremental rebin absorbs the firings."""

import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms
from zpc_tpu.geometry.collider import Collider, ColliderType
from zpc_tpu.geometry.levelset import ComplementLevelSet, Cuboid
from zpc_tpu.models.constitutive import EquationOfState
from zpc_tpu.sim.fluid import make_fluid_state
from zpc_tpu.sim.fluid_binned2 import (bin_fluid_state, _rebin,
                                       explicit_fluid_step_binned2)
from zpc_tpu.sim.mpm import MPMSim
from zpc_tpu.sim.mpm_binned2 import BinnedConfig2, rebin_adaptive


def setup(n, migrate=0, reserve=0):
    rng = np.random.default_rng(11)
    x = np.stack([rng.uniform(0.05, 0.30, n), rng.uniform(0.05, 0.80, n),
                  rng.uniform(0.05, 0.95, n)], -1).astype(np.float32)
    st = make_fluid_state(jnp.asarray(x), dx=1.0 / 128, rho=1e3,
                          block_capacity=4096)
    tank = Collider(ComplementLevelSet(Cuboid(jnp.full(3, 0.02),
                                              jnp.full(3, 0.98))),
                    ColliderType.slip)
    sim = MPMSim(model=EquationOfState(mu=jnp.float32(0.0),
                                       lam=jnp.float32(8e4),
                                       gamma=jnp.float32(7.0)),
                 gravity=jnp.asarray([0.0, -9.8, 0.0]), colliders=(tank,))
    cfg = BinnedConfig2(bins_capacity=3072, block_capacity=4096,
                        migrate_capacity=migrate, reserve_bins=reserve)
    bst = jax.block_until_ready(
        jax.jit(lambda s: bin_fluid_state(sim, s, cfg))(st))
    return sim, cfg, bst


def main():
    n = 262144
    sim, cfg, bst = setup(n)
    dtj = jnp.float32(2e-4)

    def bare(_, s):
        return explicit_fluid_step_binned2(sim, s, dtj, cfg, rebin=False)
    ms = chained_ms(bare, bst, iters=10, marginal=True,
                    label="fluid bare step")
    print(f"  -> {n / (ms / 1e3) / 1e6:.2f} M pps", flush=True)

    # rebin frequency over 60 steps from the binned start
    step = jax.jit(lambda s: explicit_fluid_step_binned2(
        sim, s, dtj, cfg, rebin=False))
    reb = jax.jit(lambda s: _rebin(sim, s, cfg))
    s = bst
    fired = 0
    for i in range(60):
        if bool(s.needs_rebin):
            s = reb(s)
            fired += 1
        s = step(s)
    print(f"rebins in 60 steps (full): {fired}", flush=True)

    ms = chained_ms(lambda i, s: reb(s) if False else _rebin(sim, s, cfg),
                    bst, iters=3, marginal=True, label="full rebin")

    # incremental rebin variant
    sim2, cfg2, bst2 = setup(n, migrate=8192, reserve=1)
    s = bst2
    fired = 0
    step2 = jax.jit(lambda t: explicit_fluid_step_binned2(
        sim2, t, dtj, cfg2, rebin=False))
    rebA = jax.jit(lambda s: rebin_adaptive(sim2, s, cfg2))
    for i in range(60):
        if bool(s.needs_rebin):
            s = rebA(s)
            fired += 1
        s = step2(s)
    print(f"rebins in 60 steps (adaptive-capable cfg): {fired}, "
          f"overflow={bool(s.overflow)}", flush=True)
    ms = chained_ms(lambda i, s: rebin_adaptive(sim2, s, cfg2), bst2,
                    iters=3, marginal=True, label="adaptive rebin")


if __name__ == "__main__":
    main()
