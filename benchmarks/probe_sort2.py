"""Round-3 sort probes — decide the Pallas-sort question with data.

The round-2 verdict asks for a >=1 Gkeys/s 16M sort (CUB DeviceRadixSort
delegation in the reference, cuda/execution/ExecutionPolicy.cuh:760-870).
On TPU there is no scatter primitive, so a radix sort's permutation pass
has no fast form; the open question is whether a hand-written comparator
network (bitonic, VMEM-blocked) can beat XLA's own comparator sort
(``lax.sort``, 427 Mkeys/s at 16M measured round 2).  The total is set by
compare-exchange *substage* throughput: a 16M bitonic sort needs ~300
substages over the data (153 in-VMEM local, 28 cross-chunk HBM streams,
119 in-VMEM merge substages).  This probe measures, on hardware:

A. ``lax.sort`` vs shape: operand count (the rebin path uses 3-operand
   sorts), stability, batching (initial-run generation), dtype, and the
   packed-pair trick (key<<b|val single-array sort when widths fit).
B. A real Pallas bitonic *local merge* kernel (17 unrolled substages on
   [1024,128] i32 chunks) -> per-substage ms.
C. A Pallas *cross-chunk* compare-exchange streaming kernel -> HBM-pass ms.

Feasibility math printed at the end: full-sort projection = 153*sub +
119*sub + 28*cross (+pair variants).  Run with --interp for the CPU
correctness checks of both kernels.
"""

import argparse
import functools
import sys

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--interp", action="store_true",
                    help="CPU interpret-mode correctness checks only")
parser.add_argument("--n", type=int, default=1 << 24)
args = parser.parse_args()

import jax

if args.interp:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from benchmarks.measure import chained_ms  # noqa: E402

LANES = 128


# ---------------------------------------------------------------- kernels

def _partner(x, j, hi_mask):
    """x at flat-index XOR j inside a [R,128] row-major chunk."""
    if j < LANES:
        return jnp.where(hi_mask, pltpu.roll(x, j, 1),
                         pltpu.roll(x, x.shape[1] - j, 1))
    jr = j // LANES
    return jnp.where(hi_mask, pltpu.roll(x, jr, 0),
                     pltpu.roll(x, x.shape[0] - jr, 0))


def _hi_mask(j, shape):
    """True where flat index has bit j set (the upper element of the pair)."""
    if j < LANES:
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        return (lane & j) != 0
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    return (row & (j // LANES)) != 0


def _substage(key, pays, j, take_min_of):
    """One compare-exchange substage at stride j.

    take_min_of(hi_mask) -> bool array/scalar: element keeps the pair min.
    Returns (key, pays) after exchange.
    """
    hi = _hi_mask(j, key.shape)
    pk = _partner(key, j, hi)
    tm = take_min_of(hi)
    sel = (key <= pk) == tm            # keep own iff own is the wanted one
    nkey = jnp.where(sel, key, pk)
    npays = []
    for p in pays:
        pp = _partner(p, j, hi)
        npays.append(jnp.where(sel, p, pp))
    return nkey, npays


def _merge_kernel(*refs, rows, dir_from_pid):
    """Bitonic local merge: substages j = rows*128/2 .. 1 (each chunk is a
    bitonic sequence; dir per chunk from program_id parity if asked)."""
    key = refs[0][...]
    pays = [r[...] for r in refs[1:len(refs) // 2]]
    outs = refs[len(refs) // 2:]
    if dir_from_pid:
        up = (pl.program_id(0) & 1) == 0
    else:
        up = True
    j = rows * LANES // 2
    while j >= 1:
        key, pays = _substage(key, pays, j,
                              lambda hi: jnp.logical_xor(hi, up))
        j //= 2
    outs[0][...] = key
    for o, p in zip(outs[1:], pays):
        o[...] = p


def local_merge(key, *pays, rows=1024, dir_from_pid=False, interpret=False):
    """Apply the 17-substage local bitonic merge to every [rows,128] chunk."""
    chunk = rows * LANES
    n = key.shape[0]
    assert n % chunk == 0
    grid = n // chunk
    arrs = (key,) + pays
    shaped = [a.reshape(grid * rows, LANES) for a in arrs]
    spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_merge_kernel, rows=rows,
                          dir_from_pid=dir_from_pid),
        out_shape=[jax.ShapeDtypeStruct(s.shape, s.dtype) for s in shaped],
        grid=(grid,),
        in_specs=[spec] * len(shaped),
        out_specs=[spec] * len(shaped),
        interpret=interpret,
    )(*shaped)
    return tuple(o.reshape(-1) for o in outs)


def _cross_kernel(*refs, up):
    """Compare-exchange between the two halves of a [2, B, 128] block."""
    ins = refs[:len(refs) // 2]
    outs = refs[len(refs) // 2:]
    a, b = ins[0][0, 0], ins[0][0, 1]
    swap = jnp.logical_xor(a <= b, up)     # True -> exchange
    outs[0][0, 0] = jnp.where(swap, b, a)
    outs[0][0, 1] = jnp.where(swap, a, b)
    for i, o in zip(ins[1:], outs[1:]):
        pa, pb = i[0, 0], i[0, 1]
        o[0, 0] = jnp.where(swap, pb, pa)
        o[0, 1] = jnp.where(swap, pa, pb)


def cross_pass(key, *pays, j, up=True, bsub=1024, interpret=False):
    """One bitonic substage at stride j (multiple of bsub*128): pairs
    (i, i^j) exchanged by streaming [2, bsub, 128] blocks."""
    n = key.shape[0]
    assert j % (bsub * LANES) == 0 and n % (2 * j) == 0
    rows_j = j // LANES
    arrs = (key,) + pays
    shaped = [a.reshape(n // (2 * j), 2, rows_j, LANES) for a in arrs]
    grid = (n // (2 * j), rows_j // bsub)
    spec = pl.BlockSpec((1, 2, bsub, LANES), lambda p, b: (p, 0, b, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_cross_kernel, up=up),
        out_shape=[jax.ShapeDtypeStruct(s.shape, s.dtype) for s in shaped],
        grid=grid,
        in_specs=[spec] * len(shaped),
        out_specs=[spec] * len(shaped),
        interpret=interpret,
    )(*shaped)
    return tuple(o.reshape(-1) for o in outs)


# ----------------------------------------------------------- correctness

def _check():
    rng = np.random.default_rng(0)
    rows, chunk, nch = 8, 8 * LANES, 4
    n = chunk * nch
    # each chunk: ascending first half, descending second half (bitonic)
    base = rng.integers(0, 1 << 30, (nch, chunk)).astype(np.int32)
    bit = np.concatenate([np.sort(base[:, :chunk // 2], axis=1),
                          -np.sort(-base[:, chunk // 2:], axis=1)], axis=1)
    keys = jnp.asarray(bit.reshape(-1))
    vals = jnp.asarray((bit.reshape(-1) * 3) & 0x7FFFFFFF)
    sk, sv = local_merge(keys, vals, rows=rows, interpret=True)
    sk = np.asarray(sk).reshape(nch, chunk)
    sv = np.asarray(sv).reshape(nch, chunk)
    ref = np.sort(bit, axis=1)
    assert (sk == ref).all(), "local_merge keys wrong"
    # payload must travel with its key (keys unique w.h.p.)
    order = np.argsort(bit, axis=1, kind="stable")
    refv = np.take_along_axis((bit * 3) & 0x7FFFFFFF, order, axis=1)
    assert (sv == refv).all(), "local_merge payload wrong"

    # alternating directions per chunk parity
    sk2, = local_merge(keys, rows=rows, dir_from_pid=True, interpret=True)
    sk2 = np.asarray(sk2).reshape(nch, chunk)
    assert (sk2[0::2] == ref[0::2]).all()
    assert (sk2[1::2] == -np.sort(-bit[1::2], axis=1)).all()

    # cross pass at stride j = chunk (pairs chunks 0-1, 2-3)
    flat = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
    pv = (flat * 7) & 0x7FFFFFFF
    ck, cv = cross_pass(flat, pv, j=chunk, bsub=rows, interpret=True)
    fk = np.asarray(flat).reshape(nch, chunk)
    mn = np.minimum(fk[0::2], fk[1::2])
    mx = np.maximum(fk[0::2], fk[1::2])
    ckr = np.asarray(ck).reshape(nch, chunk)
    assert (ckr[0::2] == mn).all() and (ckr[1::2] == mx).all()
    fv = np.asarray(pv).reshape(nch, chunk)
    swap = ~(fk[0::2] <= fk[1::2])
    cvr = np.asarray(cv).reshape(nch, chunk)
    assert (cvr[0::2] == np.where(swap, fv[1::2], fv[0::2])).all()
    print("correctness: local_merge + cross_pass OK (interpret)")


# ----------------------------------------------------------------- probes

def main():
    n = args.n
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
    vi = jnp.asarray(rng.integers(0, 1 << 20, n).astype(np.int32))
    res = {}

    def row(name, ms, keys=n):
        res[name] = ms
        print(f"{name:42s} {ms:9.3f} ms   "
              f"{keys / (ms / 1e3) / 1e6:8.1f} Mkeys/s", flush=True)

    def prb(name, body, carry, iters=6, keys=n):
        try:
            ms = chained_ms(body, carry, iters=iters, marginal=True)
            row(name, ms, keys)
        except Exception as e:  # noqa: BLE001
            print(f"{name:42s} FAILED: {type(e).__name__}: {e}",
                  flush=True)

    M = 0x7FFFFFFF

    def evolve(k, i):
        return (k * jnp.int32(1664525) + i) & M

    # A. lax.sort shapes
    prb("lax.sort 16M i32 1-op unstable",
        lambda i, c: (jax.lax.sort(evolve(c[0], i), is_stable=False),),
        (xi,))
    prb("lax.sort 16M i32 1-op stable",
        lambda i, c: (jax.lax.sort(evolve(c[0], i), is_stable=True),),
        (xi,))
    prb("lax.sort 16M 2-op unstable",
        lambda i, c: jax.lax.sort((evolve(c[0], i), c[1]), num_keys=1,
                                  is_stable=False), (xi, vi))
    prb("lax.sort 16M 2-op stable",
        lambda i, c: jax.lax.sort((evolve(c[0], i), c[1]), num_keys=1,
                                  is_stable=True), (xi, vi))
    prb("lax.sort 16M 3-op stable",
        lambda i, c: jax.lax.sort((evolve(c[0], i), c[1], c[2]),
                                  num_keys=1, is_stable=True),
        (xi, vi, vi))
    # packed pair: (key<<20|val) single sort + unpack (key<2^11 here)
    xik = xi >> 19        # 11-bit keys

    def packed(i, c):
        k = evolve(c[0], i) >> 19
        p = (k << 20) | c[1]
        sp = jax.lax.sort(p, is_stable=False)
        return (sp >> 20, sp & ((1 << 20) - 1))
    prb("packed-pair 16M (11b key | 20b val)", packed, (xik, vi))

    for b, l in ((16, n // 16), (256, n // 256), (2048, n // 2048)):
        xb = xi.reshape(b, l)
        prb(f"lax.sort batched [{b},{l}] unstable",
            lambda i, c: (jax.lax.sort(evolve(c[0], i), is_stable=False),),
            (xb,))

    xf = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    prb("lax.sort 16M f32 1-op unstable",
        lambda i, c: (jax.lax.sort(c[0] + 1e-7 * i, is_stable=False),),
        (xf,))

    # B. Pallas local merge: 17 substages over [1024,128] chunks
    prb("pallas local_merge 16M keys (17 sub)",
        lambda i, c: local_merge(evolve(c[0], i), dir_from_pid=True)[:1],
        (xi,))
    prb("pallas local_merge 16M key+val (17 sub)",
        lambda i, c: local_merge(evolve(c[0], i), c[1],
                                 dir_from_pid=True)[:2],
        (xi, vi))

    # C. Pallas cross pass (one substage, stride 2^22)
    prb("pallas cross_pass 16M keys (1 sub)",
        lambda i, c: cross_pass(evolve(c[0], i), j=1 << 22)[:1], (xi,))
    prb("pallas cross_pass 16M key+val (1 sub)",
        lambda i, c: cross_pass(evolve(c[0], i), c[1], j=1 << 22)[:2],
        (xi, vi))

    # projection: full bitonic sort of 2^24 = local sort (153 sub)
    # + 7 local-merge passes (17 sub each) + 28 cross passes
    if ("pallas local_merge 16M keys (17 sub)" in res
            and "pallas cross_pass 16M keys (1 sub)" in res):
        sub = res["pallas local_merge 16M keys (17 sub)"] / 17
        crs = res["pallas cross_pass 16M keys (1 sub)"]
        proj = (153 + 7 * 17) * sub + 28 * crs
        print(f"\nprojected full bitonic 16M keys: {proj:.1f} ms "
              f"({n / proj / 1e3:.0f} Mkeys/s)  [sub={sub * 1e3:.0f} us, "
              f"cross={crs:.2f} ms]")
        if "pallas local_merge 16M key+val (17 sub)" in res:
            subp = res["pallas local_merge 16M key+val (17 sub)"] / 17
            crsp = res["pallas cross_pass 16M key+val (1 sub)"]
            projp = (153 + 7 * 17) * subp + 28 * crsp
            print(f"projected full bitonic 16M pairs: {projp:.1f} ms "
                  f"({n / projp / 1e3:.0f} Mpairs/s)")


if __name__ == "__main__":
    if args.interp:
        _check()
    else:
        main()
