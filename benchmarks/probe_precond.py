"""Does the diag(M + dt^2 K) Jacobi preconditioner buy CG iterations
over mass-only?  Small stiff problem on CPU; counts tol-based iters."""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from examples.mpm_block import build
from zpc_tpu.sim.implicit_binned2 import implicit_step_binned2
from zpc_tpu.sim.mpm_binned2 import BinnedConfig2, bin_state


class _NoMu:
    """Model proxy hiding mu/lam: forces the mass-only preconditioner."""

    def __init__(self, m):
        object.__setattr__(self, "_m", m)

    def __getattr__(self, k):
        if k in ("mu", "lam"):
            raise AttributeError(k)
        return getattr(object.__getattribute__(self, "_m"), k)


def main():
    import dataclasses
    n = 32768
    for dt_s, label in ((5e-4, "dt=5e-4"), (2e-3, "dt=2e-3 (stiff)")):
        sim, st, _ = build(n, dx=1.0 / 64)
        cfg = BinnedConfig2(bins_capacity=640, block_capacity=1024)
        bst = jax.jit(lambda s: bin_state(sim, s, cfg))(st)
        for name, model in (("mass-only", _NoMu(sim.model)),
                            ("diag(M+dt2K)", sim.model)):
            sim2 = dataclasses.replace(sim, model=model) \
                if dataclasses.is_dataclass(sim) else sim
            if not dataclasses.is_dataclass(sim):
                raise SystemExit("sim not a dataclass; adapt probe")
            _, iters = implicit_step_binned2(
                sim2, bst, jnp.float32(dt_s), cfg, cg_iters=100,
                cg_tol=1e-3, rebin=False, with_stats=True)
            print(f"{label:18s} {name:14s} iters={int(iters)}")


if __name__ == "__main__":
    main()
