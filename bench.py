"""Driver benchmark: explicit MPM particle-steps/sec on one chip (BASELINE
config 3, the north-star metric), using the binned (fast) transfer path.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the A100-CUDA parity target from
BASELINE.json: claymore-class explicit MPM on A100 sustains ~100M
particle-steps/sec for 256k fp32 quadratic-APIC particles (literature
anchor; the reference repo publishes no numbers — BASELINE.md).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])

A100_PARTICLE_STEPS_PER_SEC = 100e6  # parity anchor (claymore-class MPM)


def main():
    from examples.mpm_block import build
    from zpc_tpu.sim.mpm_binned import BinnedConfig, explicit_step_binned

    n = 262144
    sim, st, dt = build(n, dx=1.0 / 128)
    cfg = BinnedConfig(bins_capacity=4096)
    chain = 10

    def chained(s):
        # OR-reduce overflow through the carry: a mid-rollout bin overflow
        # must surface, not silently corrupt the measured physics
        def body(_, carry):
            t, ov = carry
            t2, ov2 = explicit_step_binned(sim, t, jnp.float32(dt), cfg)
            return t2, ov | ov2
        return jax.lax.fori_loop(0, chain, body, (s, jnp.bool_(False)))

    step = jax.jit(chained)
    st, overflow = jax.block_until_ready(step(st))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        (st, ov) = jax.block_until_ready(step(st))
        overflow = overflow | ov
        best = min(best, time.perf_counter() - t0)
    if bool(overflow):
        raise RuntimeError("bin overflow mid-rollout: grow bins_capacity")
    pps = n * chain / best
    print(json.dumps({
        "metric": "explicit MPM particle-steps/sec (256k, fp32, APIC)",
        "value": round(pps / 1e6, 3),
        "unit": "M particle-steps/s",
        "vs_baseline": round(pps / A100_PARTICLE_STEPS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
