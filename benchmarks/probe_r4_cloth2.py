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


if __name__ == "__main__" and "--split" not in sys.argv and "--scale" not in sys.argv:
    main()


def split():
    """Stage split at the bench shapes: bp, grad, ccd, one full CG."""
    from zpc_tpu.geometry.contact import barrier_grad
    from zpc_tpu.math.solvers import cg
    from zpc_tpu.sim.cloth import (_self_contact_alpha, cloth_energy,
                                   self_contact_energy)
    sim, x0 = build_two_layer()
    dt = jnp.float32(0.005)
    v0 = jnp.zeros_like(x0)

    def stepfn(i, c):
        x, v = c
        x, v, _ = implicit_step(sim, x, v, dt, newton_iters=2,
                                cg_iters=24, self_contact=True)
        return x, v
    c0 = jax.block_until_ready(
        jax.jit(lambda c: jax.lax.fori_loop(0, 40, stepfn, c))((x0, v0)))
    x, v = c0

    def bp(i, c):
        xx, = c
        cand, ovf = self_contact_candidates(sim, xx, 8)
        return (xx + dep_scalar(cand) + 1e-30 * ovf,)
    chained_ms(bp, (x,), iters=6, marginal=True, label="broad phase")

    cand, _ = jax.jit(lambda xx: self_contact_candidates(sim, xx, 8))(x)
    cand = jax.block_until_ready(cand)
    free3 = sim.free[:, None]
    m3 = sim.mass[:, None]
    xhat = jnp.where(free3, x + dt * v + dt * dt * sim.gravity[None, :],
                     x)

    def phi_grad(y):
        def e(z):
            return cloth_energy(sim, z) + self_contact_energy(sim, z,
                                                              cand)
        return jnp.where(free3, (m3 / (dt * dt)) * (y - xhat)
                         + jax.grad(e)(y), 0.0)

    def pg(i, c):
        y, = c
        return (y + 1e-20 * phi_grad(y),)
    chained_ms(pg, (x,), iters=8, marginal=True, label="one phi_grad")

    def ccd(i, c):
        y, = c
        a = _self_contact_alpha(sim, y, y * 1e-3, cand)
        return (y + 1e-20 * a,)
    chained_ms(ccd, (x,), iters=8, marginal=True, label="CCD alpha")

    lam = jnp.zeros(x.shape[:1], x.dtype)
    proj = lambda p: jnp.where(free3, p, 0.0)

    def onecg(i, c):
        y, = c
        op = assemble_operator(sim, y, y, dt, cand=cand, lam=lam)
        hvp = lambda p: proj(apply_operator(sim, op, proj(p), dt))
        res = cg(hvp, -phi_grad(y), project=proj,
                 precondition=lambda r: r / op["diag"],
                 max_iters=24, rel_tol=1e-3)
        return (y + 1e-20 * res.x,)
    chained_ms(onecg, (x,), iters=4, marginal=True,
               label="assemble+grad+CG(tol)")


if __name__ == "__main__" and "--split" in sys.argv and "--scale" not in sys.argv:
    split()


def scale():
    """Full assembled step at 8k and 32k verts: the 8k step is op-count
    latency-bound (probe_r4_cloth4 ablation), so per-vertex throughput
    should rise steeply with mesh size."""
    for nx, iters in ((64, 4), (128, 3)):
        sim, x0 = build_two_layer(nx)
        dt = jnp.float32(0.005)

        def stepfn(i, c):
            x, v = c
            x, v, _ = implicit_step(sim, x, v, dt, newton_iters=2,
                                    cg_iters=24, self_contact=True)
            return x, v
        c0 = jax.block_until_ready(jax.jit(
            lambda c: jax.lax.fori_loop(0, 30, stepfn, c))(
            (x0, jnp.zeros_like(x0))))
        ms = chained_ms(stepfn, c0, iters=iters, reps=3, marginal=True,
                        label=f"full step assembled {2 * nx * nx} verts")
        print(f"    -> {x0.shape[0] / (ms / 1e3) / 1e6:.3f} "
              f"M vert-steps/s", flush=True)


if __name__ == "__main__" and "--scale" in sys.argv:
    scale()
