"""Tet FEM implicit solver (sim/fem.py): mesh-build invariants, rest
equilibrium, hang and ground-drop behavior."""

import numpy as np
import jax
import jax.numpy as jnp

from zpc_tpu.models.constitutive import NeoHookean
from zpc_tpu.sim.fem import (FemSim, fem_energy, implicit_step,
                             make_tet_box)


def test_tet_box_build():
    model = NeoHookean.from_young_poisson(1e5, 0.3)
    nx, ny, nz, h = 4, 3, 3, 0.1
    sim, x0 = make_tet_box(nx, ny, nz, h, model=model, density=1e3)
    assert sim.tets.shape == ((nx - 1) * (ny - 1) * (nz - 1) * 5, 4)
    # positively oriented tets tiling the box exactly
    vol = np.asarray(sim.vol)
    assert (vol > 0).all()
    box = (nx - 1) * (ny - 1) * (nz - 1) * h ** 3
    np.testing.assert_allclose(vol.sum(), box, rtol=1e-5)
    np.testing.assert_allclose(float(sim.mass.sum()), 1e3 * box,
                               rtol=1e-5)
    # shared faces: each interior face appears in exactly two tets
    # (indirectly guaranteed by exact volume tiling + positivity)


def test_rest_state_is_equilibrium():
    model = NeoHookean.from_young_poisson(1e5, 0.3)
    sim, x0 = make_tet_box(3, 3, 3, 0.1, model=model,
                           gravity=(0.0, 0.0, 0.0))
    g = jax.grad(lambda x: fem_energy(sim, x))(x0)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-3)


def test_hanging_block_sags_and_settles():
    # NeoHookean: smooth log-J psi -> cheap second derivatives under
    # jvp; FixedCorotated's SVD-based psi compiles minutes of Hessian
    # graph on CPU (see sim/fem.py docstring note)
    model = NeoHookean.from_young_poisson(5e4, 0.3)
    nx, ny, nz = 3, 5, 3
    top = [i * ny * nz + (ny - 1) * nz + k
           for i in range(nx) for k in range(nz)]
    sim, x0 = make_tet_box(nx, ny, nz, 0.05, model=model, density=1e3,
                           origin=(0.0, 0.3, 0.0), pinned=top)
    v = jnp.zeros_like(x0)
    step = jax.jit(lambda x, v: implicit_step(sim, x, v, 0.01))
    x = x0
    for _ in range(40):
        x, v = step(x, v)
    xn = np.asarray(x)
    assert np.isfinite(xn).all()
    np.testing.assert_allclose(xn[top], np.asarray(x0)[top], atol=1e-6)
    assert xn[:, 1].min() < np.asarray(x0)[:, 1].min() - 1e-4  # sagged
    assert np.abs(np.asarray(v)).max() < 0.2                   # settled


def test_drop_no_penetration():
    model = NeoHookean.from_young_poisson(5e4, 0.3)
    sim, x0 = make_tet_box(3, 3, 3, 0.05, model=model, density=1e3,
                           origin=(0.0, 0.05, 0.0), dhat=0.02,
                           kappa=5.0)
    v = jnp.zeros_like(x0)
    step = jax.jit(lambda x, v: implicit_step(sim, x, v, 0.005))
    x = x0
    for _ in range(50):
        x, v = step(x, v)
        assert float(np.asarray(x)[:, 1].min()) > 0.0
    assert np.abs(np.asarray(v)).max() < 0.5
    # block is resting near the ground, not bounced away
    assert float(np.asarray(x)[:, 1].min()) < 0.05
