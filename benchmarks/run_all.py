"""Full benchmark harness — the five BASELINE.md configs.

Measurement methodology: independent repeated dispatches through the axon
tunnel under-report (block_until_ready returns before execution for small
programs), so every benchmark here runs N **data-dependent** iterations
inside one jitted ``fori_loop`` and divides the synchronized wall time —
the same discipline as the MPM chained benches.

Writes BENCHMARKS.md at the repo root.
Run on the target chip:  python benchmarks/run_all.py [--quick]
"""

import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def chained_ms(body, x0, iters, reps=3):
    """Median wall ms of one `body` application, amortized over a dependent
    fori_loop chain (compile excluded)."""
    f = jax.jit(lambda x: jax.lax.fori_loop(0, iters, body, x))
    x = jax.block_until_ready(f(x0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        x = jax.block_until_ready(f(x))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def bytes_gb(n):
    return n / 1e9


def bench_primitives(n=1_000_000):
    """Config 1: reduce / scan / sort on 1M elements (dependent chains)."""
    rng = np.random.default_rng(0)
    xf = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    xi = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
    rows = []

    ms = chained_ms(lambda i, s: s + jnp.sum(xf + s * 1e-30), jnp.float32(0),
                    iters=50)
    rows.append(("reduce 1M f32", f"{ms:.3f} ms",
                 f"{bytes_gb(n * 4 / (ms / 1e3)):.0f} GB/s"))

    ms = chained_ms(lambda i, x: jnp.cumsum(x) * 1e-9, xf, iters=30)
    rows.append(("inclusive-scan 1M f32", f"{ms:.3f} ms",
                 f"{bytes_gb(2 * n * 4 / (ms / 1e3)):.0f} GB/s"))

    ms = chained_ms(lambda i, k: jax.lax.sort(jnp.roll(k, 1) ^ i), xi,
                    iters=10)
    rows.append(("sort 1M i32", f"{ms:.2f} ms",
                 f"{n / (ms / 1e3) / 1e6:.0f} Mkeys/s"))

    def sp_body(i, kv):
        k, v = kv
        ko, vo = jax.lax.sort((jnp.roll(k, 1) ^ i, v), num_keys=1)
        return ko, vo

    vals = jnp.arange(n, dtype=jnp.int32)
    f = jax.jit(lambda kv: jax.lax.fori_loop(0, 10, sp_body, kv))
    kv = jax.block_until_ready(f((xi, vals)))
    t0 = time.perf_counter()
    kv = jax.block_until_ready(f(kv))
    ms = (time.perf_counter() - t0) / 10 * 1e3
    rows.append(("radix_sort_pair 1M i32", f"{ms:.2f} ms",
                 f"{n / (ms / 1e3) / 1e6:.0f} Mpairs/s"))
    return rows


def bench_poisson(n=128):
    """Config 2: matrix-free CG on a dense n^3 Poisson problem."""
    from zpc_tpu.math.solvers import cg

    def laplace(u):
        out = 6.0 * u
        out = out - jnp.pad(u[1:], ((0, 1), (0, 0), (0, 0)))
        out = out - jnp.pad(u[:-1], ((1, 0), (0, 0), (0, 0)))
        out = out - jnp.pad(u[:, 1:], ((0, 0), (0, 1), (0, 0)))
        out = out - jnp.pad(u[:, :-1], ((0, 0), (1, 0), (0, 0)))
        out = out - jnp.pad(u[:, :, 1:], ((0, 0), (0, 0), (0, 1)))
        out = out - jnp.pad(u[:, :, :-1], ((0, 0), (0, 0), (1, 0)))
        return out

    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, n, n)).astype(np.float32))
    iters = 100

    def solve_chain(b):
        res = cg(laplace, b, max_iters=iters, rel_tol=0.0)
        return b + 1e-30 * res.x    # dependence for honest chaining

    f = jax.jit(solve_chain)
    bb = jax.block_until_ready(f(b))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        bb = jax.block_until_ready(f(bb))
    wall = (time.perf_counter() - t0) / reps
    it_s = iters / wall
    bw = bytes_gb(iters * 8 * n ** 3 * 4 / wall)
    return [(f"CG Poisson {n}^3 (100 iters)",
             f"{wall * 1e3:.1f} ms", f"{it_s:.0f} iters/s, ~{bw:.0f} GB/s")]


def bench_mpm(n=262144, quick=False):
    """Config 3: explicit MPM, the available transfer paths."""
    from examples.mpm_block import build
    from zpc_tpu.sim.mpm import explicit_step
    from zpc_tpu.sim.mpm_binned import BinnedConfig, explicit_step_binned
    from zpc_tpu.sim.mpm_pallas import explicit_step_pallas

    sim, st0, dt = build(n, dx=1.0 / 128)
    dtj = jnp.float32(dt)
    cfg = BinnedConfig(bins_capacity=4096)
    rows = []
    chain = 5 if quick else 10

    def run(name, step1):
        # step1 returns (state, overflow); OR-reduce overflow through the
        # carry so a mid-rollout bin overflow fails loudly (the flag exists
        # precisely so the host can react)
        def chained(carry):
            def body(_, c):
                t, ov = c
                t2, ov2 = step1(t)
                return t2, ov | ov2
            return jax.lax.fori_loop(0, chain, body, carry)
        f = jax.jit(chained)
        s, overflow = jax.block_until_ready(f((st0, jnp.bool_(False))))
        t0 = time.perf_counter()
        reps = 2 if quick else 3
        for _ in range(reps):
            s, ov = jax.block_until_ready(f((s, overflow)))
            overflow = overflow | ov
        wall = time.perf_counter() - t0
        assert not bool(overflow), f"{name}: bin overflow mid-rollout"
        pps = n * reps * chain / wall
        rows.append((f"MPM 256k {name}",
                     f"{wall / reps / chain * 1e3:.1f} ms/step",
                     f"{pps / 1e6:.2f} M particle-steps/s"))

    run("binned", lambda s: explicit_step_binned(sim, s, dtj, cfg))
    try:
        run("pallas", lambda s: explicit_step_pallas(sim, s, dtj, cfg))
    except Exception as e:  # pallas path requires Mosaic compile support
        rows.append(("MPM 256k pallas", "n/a", str(e)[:60]))
    if not quick:
        run("baseline",
            lambda s: (explicit_step(sim, s, dtj), jnp.bool_(False)))
    return rows


def bench_bvh(n=1_000_000, quick=False):
    """Config 4: LBVH build + query over primitives (dependent chains)."""
    from zpc_tpu.containers.bvh import build_lbvh, query_overlaps

    if quick:
        n = 262144
    rng = np.random.default_rng(0)
    c = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    h = np.full((n, 3), 0.002, np.float32)
    lo = jnp.asarray(c - h)
    hi = jnp.asarray(c + h)

    def build_body(i, lohi):
        l, h2 = lohi
        bvh = build_lbvh(l, h2)
        # dependence: jiggle boxes by a root-box epsilon
        eps = 1e-12 * bvh.lo[0, 0]
        return l + eps, h2 + eps

    ms = chained_ms(build_body, (lo, hi), iters=5, reps=2)
    rows = [(f"LBVH build {n // 1000}k", f"{ms:.1f} ms",
             f"{n / (ms / 1e3) / 1e6:.1f} Mprims/s")]

    bvh = jax.jit(build_lbvh)(lo, hi)
    nq = 100_000
    qlo = lo[:nq] - 0.004
    qhi = hi[:nq] + 0.004

    def q_body(i, q):
        ql, qh = q
        hits, cnt = query_overlaps(bvh, ql, qh, 16)
        eps = 1e-12 * cnt[0]
        return ql + eps, qh + eps

    ms = chained_ms(q_body, (qlo, qhi), iters=3, reps=2)
    rows.append((f"LBVH query {nq // 1000}k boxes", f"{ms:.1f} ms",
                 f"{nq / (ms / 1e3) / 1e6:.2f} Mqueries/s"))
    return rows


def bench_implicit(n=1_000_000, quick=False):
    """Config 5: implicit MPM step, PCG on the binned operator."""
    from examples.mpm_block import build
    from zpc_tpu.sim.implicit_binned import implicit_step_binned
    from zpc_tpu.sim.mpm_binned import BinnedConfig

    if quick:
        n = 262144
    sim, st, dt = build(n, dx=1.0 / 128,
                        block_capacity=8192 if n > 500_000 else 4096)
    cfg = BinnedConfig(bins_capacity=max(2048, n // 128 * 2))
    step = jax.jit(lambda s: implicit_step_binned(
        sim, s, jnp.float32(5e-4), cfg, cg_iters=20)[0])
    s = jax.block_until_ready(step(st))
    t0 = time.perf_counter()
    s = jax.block_until_ready(step(s))
    wall = time.perf_counter() - t0
    return [(f"implicit MPM {n // 1000}k (20 CG iters)",
             f"{wall * 1e3:.0f} ms/step",
             f"{n / wall / 1e6:.2f} M particles/s")]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="BENCHMARKS.md")
    args = ap.parse_args()

    dev = jax.devices()[0]
    sections = [
        ("Parallel primitives (config 1)", bench_primitives()),
        ("Poisson CG (config 2)", bench_poisson(64 if args.quick else 128)),
        ("Explicit MPM (config 3)", bench_mpm(quick=args.quick)),
        ("LBVH (config 4)", bench_bvh(quick=args.quick)),
        ("Implicit MPM (config 5)", bench_implicit(quick=args.quick)),
    ]
    lines = [f"# BENCHMARKS — measured on {dev.device_kind} "
             f"({time.strftime('%Y-%m-%d')})",
             "",
             "All timings from data-dependent chained iterations inside one",
             "compiled program (see module docstring).", ""]
    for title, rows in sections:
        lines.append(f"## {title}\n")
        lines.append("| case | time | throughput |")
        lines.append("|---|---|---|")
        for r in rows:
            lines.append("| " + " | ".join(r) + " |")
        lines.append("")
    out = "\n".join(lines)
    print(out)
    with open(args.out, "w") as f:
        f.write(out + "\n")


if __name__ == "__main__":
    main()
