"""Driver benchmark: explicit MPM particle-steps/sec on one chip (BASELINE
config 3, the north-star metric), using the binned-v2 adaptive path
(bin-ordered state, drift-slack windows, rebin only when a particle
leaves its bin's block window).

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

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])

A100_PARTICLE_STEPS_PER_SEC = 100e6  # parity anchor (claymore-class MPM)


def main():
    from examples.mpm_block import build
    from zpc_tpu.sim.mpm_binned2 import (BinnedConfig2, adaptive_chain,
                                         bin_state, explicit_step_binned2,
                                         rebin_adaptive)

    n = 262144
    sim, st, dt = build(n, dx=1.0 / 128)
    dtj = jnp.float32(dt)
    # chunk_bins=640: the round-4 on-chip working-set fix — the [B,K,·]
    # transfer intermediates only get S(1) (VMEM/scratch) buffer
    # assignments when small enough; chunking the pipeline over bins
    # keeps them on-chip at any problem size (probe_r4_hlo.py,
    # probe_r4_chunk.py: 93 -> 127 M pps bare at 256k, 56 -> 125 at 1M)
    cfg = BinnedConfig2(bins_capacity=2560, block_capacity=2048,
                        chunk_bins=640)
    # long chains amortize the fixed per-dispatch overhead of the remote
    # TPU path (~35 ms/call measured in benchmarks/probe_r3_tax.py —
    # 20-step chains under-reported the sustained rate by ~35%%).
    # 720 steps stay inside the scene's free-fall phase (impact at
    # ~740 steps for this drop height/dt), so every rep measures the
    # same recentering-stabilized regime
    chain = 720

    bst = jax.jit(lambda s: bin_state(sim, s, cfg))(st)

    def chained(s):
        # two-level adaptive chain: the rebin cond is hoisted out of the
        # per-step loop (a live in-body cond costs ~2.4 ms/step even when
        # never taken — probe_r3_cond), and Galilean recentering keeps
        # bulk translation rebin-free; overflow OR-reduces through the
        # carry so a mid-rollout bin overflow surfaces instead of
        # silently corrupting the measured physics
        return adaptive_chain(
            lambda t: explicit_step_binned2(sim, t, dtj, cfg, rebin=False),
            lambda t: rebin_adaptive(sim, t, cfg), s, chain)

    step = jax.jit(chained)
    out = step(bst)                               # compile + warm
    np.asarray(jax.device_get(out.cols.reshape(-1)[0]))   # reliable sync
    best = float("inf")
    # 5 reps: the remote-tunnel dispatch adds run-to-run noise of a few
    # percent on a ~1.9 s chain (measured 98.9 vs 101.3 M pps across
    # invocations); best-of-5 costs ~4 s and tightens the estimate
    for _ in range(5):
        # measure the SAME trajectory window each rep (steps [0, chain)
        # from the binned initial state): carrying state across reps made
        # the number depend on where impact fell in the rep sequence
        t0 = time.perf_counter()
        out = step(bst)
        np.asarray(jax.device_get(out.cols.reshape(-1)[0]))
        best = min(best, time.perf_counter() - t0)
    if bool(out.overflow):
        raise RuntimeError("bin overflow mid-rollout: grow bins_capacity")
    pps = n * chain / best
    print(json.dumps({
        "metric": "explicit MPM particle-steps/sec (256k, fp32, APIC)",
        "value": round(pps / 1e6, 3),
        "unit": "M particle-steps/s",
        "vs_baseline": round(pps / A100_PARTICLE_STEPS_PER_SEC, 4),
    }))


def _watchdog(seconds: float):
    """The remote-TPU tunnel occasionally hangs at backend init for
    hours (observed round 3).  Rather than wedging the driver, fail
    loudly on stderr and exit nonzero — printing a fabricated JSON line
    on stdout would be recorded as a real (zero) measurement."""
    import os
    import threading

    def fire():
        sys.stderr.write(
            f"bench.py watchdog: no result after {seconds:.0f}s — "
            "TPU tunnel likely down; no JSON emitted.\n")
        sys.stderr.flush()
        os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


if __name__ == "__main__":
    wd = _watchdog(2400.0)
    main()
    wd.cancel()
