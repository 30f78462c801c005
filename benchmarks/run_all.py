"""Full benchmark harness — the five BASELINE.md configs.

Writes BENCHMARKS.md at the repo root with one row per config.
Run on the target chip:  python benchmarks/run_all.py [--quick]
"""

import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from zpc_tpu.utils.profile import bench


def bytes_gb(n):
    return n / 1e9


def bench_primitives(n=1_000_000):
    """Config 1: reduce / exclusive-scan / radix-sort on 1M elements."""
    import zpc_tpu as z

    rng = np.random.default_rng(0)
    pol = z.tpu_exec()
    xi = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
    xf = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    rows = []
    ms = bench(jax.jit(jnp.sum), xf, iters=20)
    rows.append(("reduce 1M f32", f"{ms:.3f} ms",
                 f"{bytes_gb(n * 4 / (ms / 1e3)):.1f} GB/s"))
    scan = jax.jit(lambda a: jnp.cumsum(a))
    ms = bench(scan, xf, iters=20)
    rows.append(("exclusive-scan 1M f32", f"{ms:.3f} ms",
                 f"{bytes_gb(2 * n * 4 / (ms / 1e3)):.1f} GB/s"))
    srt = jax.jit(lambda k: jax.lax.sort(k))
    ms = bench(srt, xi, iters=10)
    rows.append(("sort 1M i32", f"{ms:.3f} ms",
                 f"{n / (ms / 1e3) / 1e6:.0f} Mkeys/s"))
    vals = jnp.arange(n, dtype=jnp.int32)
    srtp = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
    ms = bench(srtp, xi, vals, iters=10)
    rows.append(("radix_sort_pair 1M i32", f"{ms:.3f} ms",
                 f"{n / (ms / 1e3) / 1e6:.0f} Mpairs/s"))
    return rows


def bench_poisson(n=128):
    """Config 2: matrix-free CG on a dense n^3 Poisson problem."""
    from zpc_tpu.math.solvers import cg

    def laplace(u):
        # 7-point stencil, Dirichlet walls (matrix-free on [n,n,n])
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
    solve = jax.jit(lambda b: cg(laplace, b, max_iters=iters,
                                 rel_tol=0.0))
    res = jax.block_until_ready(solve(b))
    t0 = time.perf_counter()
    res = jax.block_until_ready(solve(b))
    dt_wall = time.perf_counter() - t0
    it_s = iters / dt_wall
    bw = bytes_gb(iters * 8 * n ** 3 * 4 / dt_wall)
    return [(f"CG Poisson {n}^3 (100 iters)",
             f"{dt_wall * 1e3:.1f} ms", f"{it_s:.0f} iters/s, ~{bw:.0f} GB/s")]


def bench_mpm(n=262144, quick=False):
    """Config 3: explicit MPM, all three transfer paths."""
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
        def chained(s):
            return jax.lax.fori_loop(0, chain, lambda _, t: step1(t), s)
        f = jax.jit(chained)
        s = jax.block_until_ready(f(st0))
        t0 = time.perf_counter()
        reps = 2 if quick else 3
        for _ in range(reps):
            s = f(s)
        jax.block_until_ready(s)
        wall = time.perf_counter() - t0
        pps = n * reps * chain / wall
        rows.append((f"MPM 256k {name}",
                     f"{wall / reps / chain * 1e3:.1f} ms/step",
                     f"{pps / 1e6:.2f} M particle-steps/s"))

    run("binned", lambda s: explicit_step_binned(sim, s, dtj, cfg)[0])
    try:
        run("pallas", lambda s: explicit_step_pallas(sim, s, dtj, cfg)[0])
    except Exception as e:  # pallas path requires TPU
        rows.append(("MPM 256k pallas", "n/a", str(e)[:60]))
    if not quick:
        run("baseline", lambda s: explicit_step(sim, s, dtj))
    return rows


def bench_bvh(n=1_000_000, quick=False):
    """Config 4: LBVH build + query over 1M primitives."""
    from zpc_tpu.containers.bvh import build_lbvh, query_overlaps

    if quick:
        n = 100_000
    rng = np.random.default_rng(0)
    c = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    h = np.full((n, 3), 0.002, np.float32)
    lo = jnp.asarray(c - h)
    hi = jnp.asarray(c + h)
    buildf = jax.jit(lambda lo, hi: build_lbvh(lo, hi))
    ms = bench(buildf, lo, hi, warmup=1, iters=5)
    rows = [(f"LBVH build {n // 1000}k", f"{ms:.1f} ms",
             f"{n / (ms / 1e3) / 1e6:.1f} Mprims/s")]
    bvh = buildf(lo, hi)
    nq = 100_000
    qlo = lo[:nq] - 0.004
    qhi = hi[:nq] + 0.004
    qf = jax.jit(lambda a, b: query_overlaps(bvh, a, b, 32))
    ms = bench(qf, qlo, qhi, warmup=1, iters=5)
    rows.append((f"LBVH query {nq // 1000}k boxes", f"{ms:.1f} ms",
                 f"{nq / (ms / 1e3) / 1e6:.2f} Mqueries/s"))
    return rows


def bench_implicit(n=1_000_000, quick=False):
    """Config 5: implicit MPM step, 1M particles, PCG."""
    from examples.mpm_block import build
    from zpc_tpu.sim.implicit import implicit_step

    if quick:
        n = 65536
    sim, st, dt = build(n, dx=1.0 / 128, block_capacity=8192)
    step = jax.jit(lambda s: implicit_step(sim, s, jnp.float32(5e-4),
                                           cg_iters=20))
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
             f"({time.strftime('%Y-%m-%d')})", ""]
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
