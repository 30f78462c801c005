"""Isolate the TPU compile-time pathology of multi-operand stable sorts
(the v2 bin_state hog: 9-operand chunked sorts at ~600k lanes compile for
>25 min through the tunnel while CPU takes seconds).

Times compile+first-run of: pair sort, 3/5/9-operand stable sorts, the
same with is_stable=False, and the permutation-scatter alternative
(sort (key, iota) once, move 24 columns by one scatter)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

N = 655360


def stamp(msg, t0):
    print(f"[{time.time() - t0:8.1f}s] {msg}", flush=True)


def main():
    t0 = time.time()
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))
    cols = [jnp.asarray(rng.standard_normal(N).astype(np.float32))
            for _ in range(24)]
    iota = jnp.arange(N, dtype=jnp.int32)
    stamp("inputs ready", t0)

    def timed(name, fn, *args):
        t1 = time.time()
        out = jax.jit(fn)(*args)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.device_get(leaf.reshape(-1)[0]))
        stamp(f"{name}: compile+run {time.time() - t1:.1f}s", t0)
        return out

    timed("pair sort stable", lambda k, i: jax.lax.sort(
        (k, i), num_keys=1, is_stable=True), key, iota)

    timed("3-op sort stable", lambda k, a, b: jax.lax.sort(
        (k, a, b), num_keys=1, is_stable=True), key, cols[0], cols[1])

    timed("5-op sort stable", lambda k, *cs: jax.lax.sort(
        (k, *cs), num_keys=1, is_stable=True), key, *cols[:4])

    timed("5-op sort unstable", lambda k, *cs: jax.lax.sort(
        (k, *cs), num_keys=1, is_stable=False), key, *cols[:4])

    timed("9-op sort stable", lambda k, *cs: jax.lax.sort(
        (k, *cs), num_keys=1, is_stable=True), key, *cols[:8])

    def perm_scatter(k, i, *cs):
        sk, perm = jax.lax.sort((k, i), num_keys=1, is_stable=True)
        mat = jnp.stack(cs, axis=1)              # [N, 24]
        out = jnp.zeros_like(mat).at[jnp.argsort(perm)].set(mat)
        return sk, out

    timed("perm + 24-col scatter", perm_scatter, key, iota, *cols)

    def perm_gather(k, i, *cs):
        sk, perm = jax.lax.sort((k, i), num_keys=1, is_stable=True)
        mat = jnp.stack(cs, axis=1)
        return sk, mat[perm]

    timed("perm + 24-col gather", perm_gather, key, iota, *cols)

    # runtime of the winners, chained
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from benchmarks.measure import chained_ms
    chained_ms(lambda i, c: (jax.lax.sort(
        (jnp.roll(c[0], 1) ^ i, c[1]), num_keys=1, is_stable=True)),
        (key, iota), iters=8, label="pair sort runtime")
    chained_ms(lambda i, c: perm_gather(jnp.roll(c[0], 1) ^ i, iota,
                                        *[c[1][:, j] for j in range(24)]),
               (key, jnp.stack(cols, 1)), iters=4,
               label="perm+gather24 runtime")
    chained_ms(lambda i, c: perm_scatter(jnp.roll(c[0], 1) ^ i, iota,
                                         *[c[1][:, j] for j in range(24)]),
               (key, jnp.stack(cols, 1)), iters=4,
               label="perm+scatter24 runtime")


if __name__ == "__main__":
    main()
