"""Simulation driver test: frames, checkpointing, dt adaptation."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from zpc_tpu.models.constitutive import FixedCorotated
from zpc_tpu.sim.mpm import MPMSim, make_mpm_state
from zpc_tpu.sim.runner import simulate
from zpc_tpu.utils.io import load_state, read_bgeo


def test_simulate_with_frames_and_checkpoint(rng, tmp_path):
    x = jnp.asarray(rng.uniform(0.3, 0.7, (256, 3)), jnp.float32)
    st = make_mpm_state(x, dx=0.05, block_capacity=256)
    sim = MPMSim(model=FixedCorotated.from_young_poisson(1e4, 0.3),
                 gravity=jnp.asarray([0.0, -9.8, 0.0]))
    prefix = str(tmp_path / "f")
    ckpt = str(tmp_path / "c.npz")
    frames = []
    out = simulate(sim, st, dt=1e-4, steps=6, path="binned",
                   bins_capacity=64,
                   frame_every=3, frame_prefix=prefix,
                   checkpoint_every=6, checkpoint_path=ckpt,
                   adapt_dt=True,
                   on_frame=lambda i, s: frames.append(i))
    assert frames == [3, 6]
    assert os.path.exists(prefix + ".00003.bgeo")
    pos, attrs = read_bgeo(prefix + ".00006.bgeo")
    assert pos.shape == (256, 3) and "v" in attrs
    # checkpoint restores bit-identical state
    st2 = load_state(ckpt, out)
    np.testing.assert_array_equal(np.asarray(st2.particles["x"]),
                                  np.asarray(out.particles["x"]))
    assert np.isfinite(np.asarray(out.particles["v"])).all()
