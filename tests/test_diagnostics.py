"""Failure detection / elastic recovery tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zpc_tpu.models.constitutive import FixedCorotated
from zpc_tpu.sim.mpm import MPMSim, MPMState, make_mpm_state, explicit_step
from zpc_tpu.utils.diagnostics import Watchdog, validate_state


def _state(rng, n=128):
    x = jnp.asarray(rng.uniform(0.3, 0.7, (n, 3)), jnp.float32)
    return make_mpm_state(x, dx=0.05, block_capacity=256)


class TestValidate:
    def test_healthy(self, rng):
        st = _state(rng)
        rep = validate_state(st)
        assert bool(rep.healthy) and int(rep.nan_count) == 0

    def test_detects_nan(self, rng):
        st = _state(rng)
        v = st.particles["v"].at[3, 1].set(jnp.nan)
        st = MPMState(st.particles.update(v=v), st.grid, st.max_vel)
        rep = validate_state(st)
        assert not bool(rep.healthy) and int(rep.nan_count) == 1

    def test_detects_explosion(self, rng):
        st = _state(rng)
        v = st.particles["v"].at[0].set(jnp.asarray([1e6, 0, 0]))
        st = MPMState(st.particles.update(v=v), st.grid, st.max_vel)
        assert not bool(validate_state(st).healthy)

    def test_escaped(self, rng):
        st = _state(rng)
        x = st.particles["x"].at[0].set(jnp.asarray([99.0, 0, 0]))
        st = MPMState(st.particles.update(x=x), st.grid, st.max_vel)
        rep = validate_state(st, bounds=([0, 0, 0], [1, 1, 1]))
        assert int(rep.escaped) == 1


class TestWatchdog:
    def test_rollback_halves_dt(self, rng):
        st = _state(rng)
        sim = MPMSim(model=FixedCorotated.from_young_poisson(1e4, 0.3),
                     gravity=jnp.asarray([0.0, -9.8, 0.0]))
        calls = {"n": 0}
        real = jax.jit(lambda s, d: explicit_step(sim, s, d))

        def flaky(s, d):
            calls["n"] += 1
            out = real(s, d)
            if calls["n"] == 2:  # inject a blow-up on the 2nd call
                v = out.particles["v"].at[0, 0].set(jnp.nan)
                out = MPMState(out.particles.update(v=v), out.grid,
                               out.max_vel)
            return out

        wd = Watchdog(step=flaky, dt=1e-4)
        out = wd.run(st, steps=4)
        assert wd.rollbacks == 1
        assert wd.dt == pytest.approx(5e-5)
        assert np.isfinite(np.asarray(out.particles["v"])).all()

    def test_gives_up_after_retries(self, rng):
        st = _state(rng)

        def always_bad(s, d):
            v = s.particles["v"].at[0, 0].set(jnp.nan)
            return MPMState(s.particles.update(v=v), s.grid, s.max_vel)

        wd = Watchdog(step=always_bad, dt=1e-4, max_retries=3)
        with pytest.raises(RuntimeError, match="diverged"):
            wd.run(st, steps=2)
