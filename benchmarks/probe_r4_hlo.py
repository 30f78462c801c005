"""HLO buffer census of the bare v2 step at 256k AND 1M (round 4).

The r4 ablation (probe_r4_1m.py) shows every per-particle stage scaling
superlinearly at 1M (tau 0.17 -> 2.53 ms for 3.6x the particles) while
the stencil stage scales exactly linearly and the indexed ops are
innocent.  17.9 ms at ~800 GB/s implies ~14 GB of traffic vs ~3 GB
logical: hunt the materialization difference between the two compiled
programs.
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

PAT = re.compile(r"^\s*(?:ROOT )?%?([\w.\-]+) = ([a-z0-9]+)\[([\d,]*)\]"
                 r"(\{[^}]*\})? ([\w\-]+)")
DTB = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
       "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2,
       "f64": 8, "s64": 8, "u64": 8}


def census(n, bins, blocks, big_mb):
    sim, st0, dt = build(n, dx=1.0 / 128, block_capacity=blocks) \
        if blocks != 2048 else build(n, dx=1.0 / 128)
    dtj = jnp.float32(dt)
    cfg = BinnedConfig2(bins_capacity=bins, block_capacity=blocks)
    bst = jax.jit(lambda s: bin_state(sim, s, cfg))(st0)
    step = jax.jit(lambda s: explicit_step_binned2(sim, s, dtj, cfg,
                                                   rebin=False))
    comp = step.lower(bst).compile()
    print(f"\n########## n={n >> 10}k B={bins} nb={blocks}")
    print(comp.memory_analysis(), flush=True)
    txt = comp.as_text()
    rows = []
    kind_tot = collections.Counter()
    fusion_bytes = 0
    for line in txt.splitlines():
        m = PAT.match(line)
        if not m:
            continue
        name, dty, dims, layout, op = m.groups()
        if dty not in DTB or not dims:
            continue
        sz = DTB[dty]
        for d in dims.split(","):
            sz *= int(d)
        if op in ("parameter", "constant", "get-tuple-element", "tuple"):
            continue
        # only top-level (materialized) instructions matter: fusion
        # bodies are indented deeper but match too — filter by the
        # computation context: lines inside fusions start with extra
        # indent in as_text(); approximate by counting leading spaces
        indent = len(line) - len(line.lstrip())
        if indent > 2:
            continue
        kind_tot[op] += sz
        if op == "fusion":
            fusion_bytes += sz
        if sz >= big_mb << 20:
            rows.append((sz, f"{dty}[{dims}]{layout or ''}", op, name))
    rows.sort(reverse=True)
    print(f"== top-level instructions with output >= {big_mb} MB "
          f"({len(rows)}) ==")
    for sz, shape, op, name in rows[:50]:
        print(f"{sz / 1e6:9.1f} MB  {op:18s} {shape}  {name}")
    print("== total top-level output bytes by op kind ==")
    for op, sz in kind_tot.most_common(20):
        if sz >= 8 << 20:
            print(f"{sz / 1e6:9.1f} MB  {op}")


def main():
    census(262144, 2560, 2048, 8)
    census(1048576, 9216, 8192, 16)


if __name__ == "__main__":
    main()
