"""Hardened TPU timing through the axon tunnel.

Two failure modes discovered on hardware (see /tmp probes, round 2):

1. ``block_until_ready`` can return **before execution** on the first
   re-dispatch of a compiled program through the tunnel (measured: block
   0.1 ms, actual completion 150 s later).  Only a *host transfer* of an
   output element is a reliable synchronization point.
2. XLA folds/narrows naive timing loops: scalar ``out[0,0,0]``
   dependences are sliced back through matmuls, rolls are fused across
   iterations, bilinear forms are factorized through plain sums.  Chained
   dependences must pass through ``abs`` (or the full state must be the
   carry).

``chained_ms`` applies both rules: data-dependent fori_loop chains,
host-transfer sync per rep, median over the post-warmup reps.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["chained_ms", "dep_scalar"]


def dep_scalar(x) -> jax.Array:
    """Fold an array into a chain-dependence scalar XLA cannot narrow or
    factorize (abs blocks bilinear factorization; sum needs all lanes)."""
    return 1e-30 * jnp.sum(jnp.abs(x))


def _sync(tree):
    """Reliable device synchronization: host-transfer one element of the
    first array leaf (block_until_ready alone lies through the tunnel)."""
    leaves = [l for l in jax.tree.leaves(tree)
              if hasattr(l, "dtype") and getattr(l, "size", 0) > 0]
    assert leaves, "nothing to synchronize on"
    np.asarray(jax.device_get(leaves[0].reshape(-1)[0]))
    return tree


def chained_ms(body, x0, iters=20, reps=4, const=None, label=None,
               marginal=False):
    """Median wall-ms of one ``body`` application, amortized over a
    data-dependent fori_loop chain; compile + warmup excluded.

    ``body(i, carry[, const])`` -> carry.  ``const`` rides as a jit
    argument so large workspaces aren't baked into the HLO (the remote
    compiler 413s above ~100 MB).

    ``marginal=True``: the remote dispatch path costs ~35 ms per CALL
    regardless of work (benchmarks/probe_r3_tax.py), which swamps cheap
    bodies at small ``iters``.  Marginal mode times chains of ``iters``
    and ``2*iters`` through ONE compiled program (traced trip count) and
    reports the difference / iters — the true on-chip amortized cost.
    """
    if const is None:
        f = jax.jit(lambda n, x: jax.lax.fori_loop(0, n, body, x))
        call = lambda n, x: f(n, x)
    else:
        f = jax.jit(lambda n, c, x: jax.lax.fori_loop(
            0, n, lambda i, xx: body(i, xx, c), x))
        call = lambda n, x: f(n, const, x)

    def timed(n, x):
        t0 = time.perf_counter()
        x = _sync(call(n, x))
        return time.perf_counter() - t0, x

    x = _sync(call(iters, x0))               # compile + warm
    x = _sync(call(iters, x))                # flush pipeline effects
    if marginal:
        times = []
        for _ in range(reps):
            t1, x = timed(iters, x)
            t2, x = timed(2 * iters, x)
            times.append((t2 - t1) / iters)
        ms = max(float(np.median(times)), 1e-6) * 1e3
    else:
        times = []
        for _ in range(reps):
            t, x = timed(iters, x)
            times.append(t / iters)
        ms = float(np.median(times)) * 1e3
    if label:
        print(f"{label:46s} {ms:8.3f} ms", flush=True)
    return ms
