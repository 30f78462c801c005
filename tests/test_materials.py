"""Material-family smoke: every constitutive/plasticity pairing runs stably
through the MPM pipeline (small short rollouts on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from examples.materials import build
from zpc_tpu.sim.mpm import explicit_step


@pytest.mark.parametrize("material", ["jello", "snow", "sand", "fluid"])
def test_material_rollout(material):
    sim, st, dt = build(material, n=512, dx=1.0 / 32)
    step = jax.jit(lambda s: explicit_step(sim, s, jnp.float32(dt)))
    for _ in range(10):
        st = step(st)
    x = np.asarray(st.particles["x"])
    v = np.asarray(st.particles["v"])
    assert np.isfinite(x).all() and np.isfinite(v).all()
    assert np.abs(v).max() < 50.0
    # nothing fell through the ground by more than a couple cells
    assert x[:, 1].min() > 0.1 - 3.0 / 32


def test_snow_hardens_Jp():
    sim, st, dt = build("snow", n=512, dx=1.0 / 32)
    # pre-compressed state beyond the critical compression threshold
    F0 = jnp.broadcast_to(jnp.diag(jnp.asarray([0.9, 0.9, 0.9])),
                          (512, 3, 3))
    st = type(st)(st.particles.update(F=F0), st.grid, st.max_vel)
    step = jax.jit(lambda s: explicit_step(sim, s, jnp.float32(dt)))
    st = step(st)
    Jp = np.asarray(st.particles["Jp"])
    F = np.asarray(st.particles["F"])
    assert np.isfinite(Jp).all()
    assert (np.abs(Jp - 1.0) > 1e-3).all()    # volume moved to plastic part
    s_min = np.linalg.svd(F, compute_uv=False).min()
    assert s_min > 0.97                       # elastic part clamped
