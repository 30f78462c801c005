"""Round 4: chunked transfers inside the implicit CG operator at 1M
(chunk_bins extended to _ctx_p2g/_ctx_g2p), with and without contact."""

import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms
from examples.mpm_block import build
from zpc_tpu.sim.contact_implicit import MeshContact
from zpc_tpu.sim.implicit_binned2 import implicit_step_binned2
from zpc_tpu.sim.mpm_binned2 import BinnedConfig2, bin_state


def _terrain(res, y0=0.56, amp=0.02):
    xs = np.linspace(0.0, 1.0, res + 1)
    X, Z = np.meshgrid(xs, xs, indexing="ij")
    Y = y0 + amp * np.sin(6.2832 * X) * np.cos(6.2832 * Z)
    V = np.stack([X, Y, Z], -1).astype(np.float32)
    a = V[:-1, :-1].reshape(-1, 3)
    b = V[1:, :-1].reshape(-1, 3)
    c = V[1:, 1:].reshape(-1, 3)
    d = V[:-1, 1:].reshape(-1, 3)
    return jnp.asarray(np.concatenate(
        [np.stack([a, b, c], 1), np.stack([a, c, d], 1)]))


def main():
    n = 1_000_000
    sim, st, _ = build(n, dx=1.0 / 128, block_capacity=8192)
    dtj = jnp.float32(5e-4)
    for ch in (0, 768, 512):
        cfg = BinnedConfig2(bins_capacity=9216, block_capacity=8192,
                            chunk_bins=ch)
        bst = jax.block_until_ready(
            jax.jit(lambda s: bin_state(sim, s, cfg))(st))

        def step(_, s):
            return implicit_step_binned2(sim, s, dtj, cfg, cg_iters=50,
                                         cg_tol=1e-3, rebin=False)
        ms = chained_ms(step, bst, iters=2, reps=2, marginal=True,
                        label=f"implicit 1M chunk={ch or 'off':>4}")
        print(f"    -> {n / (ms / 1e3) / 1e6:.2f} M particles/s",
              flush=True)

    # contact-coupled at 100k tris, chunked
    mesh = _terrain(224)
    mc = MeshContact.build(mesh, dhat=0.01, kappa=10.0, max_tris=8)
    for ch in (0, 768):
        cfg = BinnedConfig2(bins_capacity=9216, block_capacity=8192,
                            chunk_bins=ch)
        bst = jax.block_until_ready(
            jax.jit(lambda s: bin_state(sim, s, cfg))(st))

        def stepc(_, s):
            return implicit_step_binned2(sim, s, dtj, cfg, cg_iters=50,
                                         cg_tol=1e-3, contact=mc,
                                         rebin=False)
        ms = chained_ms(stepc, bst, iters=2, reps=2, marginal=True,
                        label=f"implicit+contact 100k tris chunk="
                              f"{ch or 'off':>4}")
        print(f"    -> {n / (ms / 1e3) / 1e6:.2f} M particles/s",
              flush=True)


if __name__ == "__main__":
    main()
