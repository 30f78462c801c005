"""Dump the optimized-HLO buffer census of the bare v2 explicit step.

Attribution tool for the P2G gap: lists every HLO instruction in the
compiled step whose output buffer exceeds a size threshold, with shape,
layout and op kind — copies/transposes/bitcast-convert rows are the
materialization tax to hunt.
"""

import collections
import re
import sys

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from examples.mpm_block import build
from zpc_tpu.sim.mpm_binned2 import (BinnedConfig2, bin_state,
                                     explicit_step_binned2)


def main():
    n = 262144
    sim, st0, dt = build(n, dx=1.0 / 128)
    dtj = jnp.float32(dt)
    cfg = BinnedConfig2(bins_capacity=2560, block_capacity=2048)
    bst = jax.jit(lambda s: bin_state(sim, s, cfg))(st0)

    step = jax.jit(lambda s: explicit_step_binned2(sim, s, dtj, cfg,
                                                   rebin=False))
    lowered = step.lower(bst)
    comp = lowered.compile()
    print(comp.memory_analysis(), flush=True)
    txt = comp.as_text()

    # per-instruction output sizes from shapes like f32[2560,128,80]{2,1,0}
    pat = re.compile(r"^\s*(?:ROOT )?%?([\w.\-]+) = ([a-z0-9]+)\[([\d,]*)\]"
                     r"(\{[^}]*\})? ([\w\-]+)")
    dt_bytes = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
                "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2,
                "f64": 8, "s64": 8, "u64": 8}
    rows = []
    kind_tot = collections.Counter()
    for line in txt.splitlines():
        m = pat.match(line)
        if not m:
            continue
        name, dty, dims, layout, op = m.groups()
        if dty not in dt_bytes or not dims:
            continue
        sz = dt_bytes[dty]
        for d in dims.split(","):
            sz *= int(d)
        if op in ("parameter", "constant", "get-tuple-element", "tuple"):
            continue
        kind_tot[op] += sz
        if sz >= 8 << 20:
            rows.append((sz, f"{dty}[{dims}]{layout or ''}", op, name))
    rows.sort(reverse=True)
    print(f"\n== instructions with output >= 8 MB ({len(rows)}) ==")
    for sz, shape, op, name in rows[:60]:
        print(f"{sz / 1e6:9.1f} MB  {op:18s} {shape}  {name}")
    print("\n== total output bytes by op kind (>= 16 MB) ==")
    for op, sz in kind_tot.most_common(20):
        if sz >= 16 << 20:
            print(f"{sz / 1e6:9.1f} MB  {op}")


if __name__ == "__main__":
    main()
