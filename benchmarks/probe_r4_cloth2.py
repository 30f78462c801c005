"""Round 4: cloth step with the assembled GN operator vs the round-3
autodiff-HVP operator, at the bench config (two-layer 8k verts,
Newton 2 x CG 24, LBVH self-contact).  Also splits one assemble and
one apply."""

import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms, dep_scalar
from benchmarks.probe_r4_cloth import build_two_layer
from zpc_tpu.sim.cloth import (apply_operator, assemble_operator,
                               implicit_step, self_contact_candidates)


def main():
    sim, x0 = build_two_layer()
    dt = jnp.float32(0.005)
    v0 = jnp.zeros_like(x0)

    def mkstep(op):
        def stepfn(i, c):
            x, v = c
            x, v, _ = implicit_step(sim, x, v, dt, newton_iters=2,
                                    cg_iters=24, self_contact=True,
                                    operator=op)
            return x, v
        return stepfn

    c0 = jax.block_until_ready(
        jax.jit(lambda c: jax.lax.fori_loop(0, 40, mkstep("assembled"),
                                            c))((x0, v0)))

    for op in ("assembled", "autodiff"):
        ms = chained_ms(mkstep(op), c0, iters=4, reps=3, marginal=True,
                        label=f"full step {op}")
        print(f"    -> {x0.shape[0] / (ms / 1e3) / 1e6:.2f} "
              f"M vert-steps/s", flush=True)

    x, v = c0
    cand, _ = jax.jit(
        lambda xx: self_contact_candidates(sim, xx, 8))(x)
    cand = jax.block_until_ready(cand)
    lam = jnp.zeros(x.shape[:1], x.dtype)

    def asm(i, c):
        y, = c
        op = assemble_operator(sim, y, y, dt, cand=cand, lam=lam)
        return (y + dep_scalar(op["diag"]) + dep_scalar(op["gth"]),)
    chained_ms(asm, (x,), iters=8, marginal=True, label="one assemble")

    op0 = jax.block_until_ready(jax.jit(
        lambda y: assemble_operator(sim, y, y, dt, cand=cand,
                                    lam=lam))(x))

    def app(i, c):
        y, = c
        h = apply_operator(sim, op0, y * 1e-3, dt)
        return (y + 1e-20 * h,)
    chained_ms(app, (x,), iters=16, marginal=True, label="one apply")


if __name__ == "__main__":
    main()
