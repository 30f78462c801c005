"""Round-5: roofline statement for the chunked 1M MPM step (VERDICT r5
item 5): how much HBM traffic does the 8 ms step actually move, and is
there headroom above 127 M pps?

Census method: walk the compiled HLO text computation by computation
(fusion bodies excluded — only materialized fusion OUTPUTS count),
multiply instructions inside the chunk-scan while bodies by the trip
count, split buffers by S(1) (on-chip scratch) vs HBM, and report
estimated HBM bytes/particle/step = (writes + reads ~ 2x outputs).
Then time the bare step and compare implied GB/s against v5e peak
(~819 GB/s) and a VPU flop model (docs/design.md round 5).

Run on TPU:  python benchmarks/probe_r5_roofline.py
"""

import collections
import re
import sys

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms
from examples.mpm_block import build
from zpc_tpu.sim.mpm_binned2 import (BinnedConfig2, bin_state,
                                     explicit_step_binned2)

INSTR = re.compile(r"^\s*(?:ROOT )?%?([\w.\-]+) = ([a-z0-9]+)\[([\d,]*)\]"
                   r"(\{[^}]*\})? ([\w\-]+)")
COMP = re.compile(r"^(?:ENTRY )?%?([\w.\-]+) (?:\([^)]*\))? ?->")
DTB = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
       "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2,
       "f64": 8, "s64": 8, "u64": 8}


def census(n=1 << 20, bins=9216, blocks=8192, chunk=768, big_mb=4):
    sim, st0, dt = build(n, dx=1.0 / 128, block_capacity=blocks)
    dtj = jnp.float32(dt)
    cfg = BinnedConfig2(bins_capacity=bins, block_capacity=blocks,
                        chunk_bins=chunk)
    trip = -(-bins // chunk)
    bst = jax.block_until_ready(
        jax.jit(lambda s: bin_state(sim, s, cfg))(st0))
    step = jax.jit(lambda s: explicit_step_binned2(sim, s, dtj, cfg,
                                                   rebin=False))
    comp = step.lower(bst).compile()
    print(f"n={n >> 10}k bins={bins} chunk={chunk} trip={trip} "
          f"dev={jax.devices()[0].device_kind}")
    print(comp.memory_analysis(), flush=True)
    cur = ""
    hbm = collections.Counter()      # op kind -> bytes (HBM, xtrip)
    scr = 0                          # S(1) scratch bytes (not HBM)
    rows = []
    for line in comp.as_text().splitlines():
        if not line.startswith(" "):
            m = COMP.match(line)
            if m:
                cur = m.group(1)
            continue
        m = INSTR.match(line)
        if not m:
            continue
        name, dty, dims, layout, op = m.groups()
        if "fused" in cur or dty not in DTB or not dims:
            continue
        if op in ("parameter", "constant", "get-tuple-element",
                  "tuple", "bitcast", "while", "conditional"):
            continue
        sz = DTB[dty]
        for d in dims.split(","):
            sz *= int(d)
        mult = trip if "while" in cur or "body" in cur else 1
        if layout and "S(1)" in layout:
            scr += sz * mult
            continue
        hbm[op] += sz * mult
        if sz * mult >= big_mb << 20:
            rows.append((sz * mult, f"{dty}[{dims}]{layout or ''}",
                         op, cur, name))
    tot = sum(hbm.values())
    print(f"HBM-materialized output bytes/step: {tot / 1e6:.1f} MB "
          f"({tot / n:.0f} B/particle); scratch S(1): {scr / 1e6:.1f} MB")
    print("== by op kind (>= 4 MB) ==")
    for op, sz in hbm.most_common(20):
        if sz >= 4 << 20:
            print(f"{sz / 1e6:9.1f} MB  {op}")
    rows.sort(reverse=True)
    print(f"== instructions with output x trip >= {big_mb} MB ==")
    for sz, shape, op, c, name in rows[:30]:
        print(f"{sz / 1e6:9.1f} MB  {op:14s} {shape}  [{c}] {name}")

    ms = chained_ms(lambda i, s: explicit_step_binned2(
        sim, s, dtj, cfg, rebin=False), bst, iters=20, reps=3,
        marginal=True)
    gbs = 2 * tot / (ms / 1e3) / 1e9
    print(f"bare step: {ms:.2f} ms ({n / (ms / 1e3) / 1e6:.1f} M pps, "
          f"{ms / n * 1e6:.1f} ns/particle)")
    print(f"implied HBM traffic (2x outputs): {gbs:.0f} GB/s "
          f"vs ~819 peak -> {gbs / 819:.1%} of roofline", flush=True)


if __name__ == "__main__":
    census()
