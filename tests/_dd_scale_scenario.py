"""Shared scenario for the cross-process dd SCALE test (round 5).

Both the 2-process worker (tests/_multihost_worker.py) and the
single-process comparator (tests/test_multihost.py) build THIS exact
scenario, so the per-step comm-stat dicts are comparable number by
number: 100k particles, 70% in a dense slab straddling the middle
morton splits, everyone marching +x — real migration pressure on a
skewed ownership map (VERDICT r4 item 6).

``run_dd`` also encodes the HOST-SIDE RECOVERY CONTRACT under test:
each step first runs with a block budget (``NB_SMALL``) that the slab
is known to overflow; when the overflow flag comes back the step is
re-run from the SAME input state with ``NB_BIG`` (the re-trace
recovery path, same contract as
tests/test_domain_decomp.py::test_migration_cap_overflow_fires_and_recovers
but across the process boundary).  Both sides execute the identical
decision sequence, so their stats digests must agree EXACTLY.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

N = 100_000
DX = 0.025
STEPS = 3
DT = 2e-3
NB_SMALL = 512        # overflows on the slab (exercises recovery)
NB_BIG = 1024         # recovery budget (verified sufficient)
MIG_CAP = 8192


def build():
    from zpc_tpu.models.constitutive import FixedCorotated
    from zpc_tpu.sim.mpm import MPMSim, make_mpm_state
    rng = np.random.default_rng(42)
    n_slab = int(0.7 * N)
    xs = rng.uniform([0.42, 0.15, 0.15], [0.55, 0.85, 0.85],
                     (n_slab, 3))
    xu = rng.uniform(0.08, 0.92, (N - n_slab, 3))
    x = jnp.asarray(np.concatenate([xs, xu]), jnp.float32)
    v = np.zeros((N, 3), np.float32)
    v[:, 0] = 3.0            # march +x across the morton splits
    st = make_mpm_state(x, dx=DX, block_capacity=4096)
    st = dataclasses.replace(st, particles=st.particles.update(
        v=jnp.asarray(v)))
    sim = MPMSim(model=FixedCorotated.from_young_poisson(1e4, 0.3),
                 gravity=jnp.asarray([0.0, -9.8, 0.0]))
    return sim, st


def oracle(sim, st, steps=STEPS):
    """Single-device reference trajectory (ref_x, ref_v) numpy arrays."""
    from zpc_tpu.sim.mpm import explicit_step
    ref = st
    step = jax.jit(lambda s: explicit_step(sim, s, jnp.float32(DT)))
    for _ in range(steps):
        ref = step(ref)
    return (np.asarray(ref.particles["x"])[:N],
            np.asarray(ref.particles["v"])[:N])


def run_dd(sim, st, mesh, *, steps=STEPS):
    """STEPS dd steps on ``mesh`` with per-step overflow recovery.

    Returns ``(dds, n_recovered, stats list)``.  Identical call on the
    cross-process and single-process meshes — ``n_recovered`` and the
    stats must agree exactly."""
    from zpc_tpu.sim.domain_decomp import explicit_step_dd, make_dd_state
    dds = make_dd_state(st, mesh)

    def make_step(nb):
        return jax.jit(lambda s: explicit_step_dd(
            sim, s, jnp.float32(DT), mesh, grid_template=st.grid,
            nb_local=nb, mig_cap=MIG_CAP, with_stats=True))

    step_small, step_big = make_step(NB_SMALL), make_step(NB_BIG)
    n_recovered = 0
    stats_all = []
    for _ in range(steps):
        nxt, ov, stats = step_small(dds)
        if bool(ov):
            # host-side recovery: re-trace budget, SAME input state
            n_recovered += 1
            nxt, ov, stats = step_big(dds)
            assert not bool(ov), "recovery budget NB_BIG overflowed too"
        dds = nxt
        stats_all.append(jax.tree.map(np.asarray, stats))
    return dds, n_recovered, stats_all


def stats_digest(stats_all):
    """Flatten the per-step stats into one JSON-friendly list of ints
    (deterministic order) for exact cross-process comparison."""
    out = []
    for stats in stats_all:
        for key in ("fwd_rows", "ret_rows", "mig_rows"):
            out.extend(int(v) for v in np.asarray(stats[key]).ravel())
        out.append(int(stats["fwd_row_bytes"]))
        out.append(int(stats["ret_row_bytes"]))
        for k in sorted(stats["hop_wire_bytes"]):
            out.append(int(stats["hop_wire_bytes"][k]))
    return out
