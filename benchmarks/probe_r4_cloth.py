"""Round 4 cloth attribution: where do 257.6 ms/step at 8k verts go?

Splits: broad phase (LBVH build + banded query), one phi_grad, one HVP,
the CCD limiter, full step with/without the Jacobi preconditioner, and
the observed CG iteration counts at tol 1e-3.
"""

import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms, dep_scalar
from zpc_tpu.geometry.contact import barrier_grad
from zpc_tpu.math.solvers import cg
from zpc_tpu.sim.cloth import (ClothSim, _self_contact_alpha, cloth_energy,
                               implicit_step, make_cloth_grid,
                               self_contact_candidates, self_contact_energy)


def build_two_layer(nx=64):
    spacing, gap, dhat = 0.6 / nx, 0.015, 0.008
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
    from zpc_tpu.sim.cloth import build_incidence
    sim = build_incidence(sim)
    return sim, jnp.concatenate([xA, xB])


def main():
    sim, x0 = build_two_layer()
    dt = jnp.float32(0.005)
    v0 = jnp.zeros_like(x0)

    # settle into contact (same regime as the bench row)
    def stepfn(i, c):
        x, v = c
        x, v, _ = implicit_step(sim, x, v, dt, newton_iters=2,
                                cg_iters=24, self_contact=True,
                                precondition=False)
        return x, v
    c0 = jax.block_until_ready(
        jax.jit(lambda c: jax.lax.fori_loop(0, 40, stepfn, c))(
            (x0, v0)))
    x, v = c0

    # ---- components ----------------------------------------------------
    def bp(i, c):
        xx, = c
        cand, ovf = self_contact_candidates(sim, xx, 8)
        return (xx + dep_scalar(cand) + 1e-30 * ovf,)
    ms = chained_ms(bp, (x,), iters=4, marginal=True,
                    label="broad phase (build+query)")

    cand, _ = jax.jit(
        lambda xx: self_contact_candidates(sim, xx, 8))(x)
    cand = jax.block_until_ready(cand)

    free3 = sim.free[:, None]
    m3 = sim.mass[:, None]
    xhat = x + dt * v + (dt * dt) * sim.gravity[None, :]
    xhat = jnp.where(free3, xhat, x)

    def phi_grad(y):
        def energy(z):
            return cloth_energy(sim, z) + self_contact_energy(
                sim, z, cand)
        g = (m3 / (dt * dt)) * (y - xhat) + jax.grad(energy)(y)
        return jnp.where(free3, g, 0.0)

    def pg(i, c):
        y, = c
        return (y + 1e-20 * phi_grad(y),)
    ms = chained_ms(pg, (x,), iters=8, marginal=True, label="one phi_grad")

    def hv(i, c):
        y, = c
        p = jnp.where(free3, y * 1e-3, 0.0)
        h = jax.jvp(phi_grad, (y,), (p,))[1]
        return (y + 1e-20 * h,)
    ms = chained_ms(hv, (x,), iters=8, marginal=True, label="one HVP")

    def ccd(i, c):
        y, = c
        a = _self_contact_alpha(sim, y, y * 1e-3, cand)
        return (y + 1e-20 * a,)
    ms = chained_ms(ccd, (x,), iters=8, marginal=True, label="CCD alpha")

    # ---- CG iteration counts at tol 1e-3 -------------------------------
    def project(p):
        return jnp.where(free3, p, 0.0)
    g = jax.jit(phi_grad)(x)
    hvp = lambda p: project(jax.jvp(phi_grad, (x,), (project(p),))[1])
    res = jax.jit(lambda b: cg(hvp, b, project=project, max_iters=200,
                               rel_tol=1e-3))(-g)
    print(f"CG iters (no precond, tol 1e-3, cap 200): {int(res.iters)}",
          flush=True)

    N = x.shape[0]
    deg = jnp.zeros((N,), x.dtype).at[sim.edges.reshape(-1)].add(1.0)
    gap0 = x @ sim.ground_n - sim.ground_off
    g2 = gap0 * gap0
    d2h = sim.dhat * sim.dhat
    bpp = jax.grad(lambda s: jnp.sum(barrier_grad(s, d2h, sim.kappa)))(g2)
    curv = jnp.maximum(2.0 * barrier_grad(g2, d2h, sim.kappa)
                       + 4.0 * g2 * bpp, 0.0)
    diag = sim.mass / (dt * dt) + sim.k_stretch * deg + curv
    M = lambda r: r / diag[:, None]
    res = jax.jit(lambda b: cg(hvp, b, project=project, precondition=M,
                               max_iters=200, rel_tol=1e-3))(-g)
    print(f"CG iters (Jacobi precond, tol 1e-3, cap 200): "
          f"{int(res.iters)}", flush=True)

    # ---- full steps -----------------------------------------------------
    for label, kw in (("step (no precond, CG 24)",
                       dict(precondition=False, cg_iters=24)),
                      ("step (precond, CG 24)",
                       dict(precondition=True, cg_iters=24)),
                      ("step (precond, CG 12)",
                       dict(precondition=True, cg_iters=12))):
        def sf(i, c, kw=kw):
            xx, vv = c
            xx, vv, _ = implicit_step(sim, xx, vv, dt, newton_iters=2,
                                      self_contact=True, **kw)
            return xx, vv
        ms = chained_ms(sf, (x, v), iters=5, reps=3, marginal=True,
                        label=label)


if __name__ == "__main__":
    main()
