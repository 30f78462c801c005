"""Round 4: isolate the decomposed join LOOP (operands pre-built) to
find why it runs ~27 ms where the margin-op roofline predicts ~10 ms.

Variants at the c4/1M shapes (4M entries, ntiles=nq/T, TL=n/ntiles):
  A  transposed [G,3TL,T] counts body, T=128 G=512   (current bvh.py)
  B  transposed T=256 G=256 (2x volume, 2-vreg minor)
  C  legacy [G,T,3TL] T=128 G=512 (96-lane minor)
  D  A without the membership fma margins (box margins only)
  E  pure elementwise min-chain of the same [G,3TL,T] shape (roofline)
  F  A as ONE unrolled expression (no fori_loop; nsteps=1, G=ntiles)
"""

import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.measure import chained_ms, dep_scalar

N = 1 << 20
NQ = 4 * N


def make_operands(T):
    ntiles = NQ // T
    TL = -(-N // ntiles)
    rng = np.random.default_rng(0)
    wins = [jnp.asarray(rng.uniform(0, 1, (ntiles, 3 * TL))
                        .astype(np.float32)) for _ in range(6)]
    wp = jnp.asarray(rng.integers(0, N, (ntiles, 3 * TL))
                     .astype(np.float32))
    wc_h = jnp.asarray(rng.integers(0, 1 << 15, (ntiles, 3 * TL))
                       .astype(np.float32))
    wc_l = jnp.asarray(rng.integers(0, 1 << 15, (ntiles, 3 * TL))
                       .astype(np.float32))
    qc = [jnp.asarray(rng.uniform(0, 1, (NQ,)).astype(np.float32))
          for _ in range(6)]
    eh = [jnp.asarray(rng.integers(0, 1 << 15, (NQ,))
                      .astype(np.float32)) for _ in range(4)]
    return ntiles, TL, wins, wp, wc_h, wc_l, qc, eh


def join(T, G, orient, member=True, unroll=False):
    ntiles, TL, *_ = make_operands(T)
    nsteps = 1 if unroll else ntiles // G
    Ge = ntiles if unroll else G

    def f(ops):
        wins, wp, wc_h, wc_l, qc, eh = ops

        def body_tile(tw, ql, qh, e4):
            wl, wh = tw[0:3], tw[3:6]
            wpp, wch, wcl = tw[6:9]
            eah, eal, ebh, ebl = e4
            if orient == "t":
                mg = jnp.broadcast_to(wpp[:, :, None],
                                      (Ge, 3 * TL, T))
                if member:
                    mg = jnp.minimum(
                        mg, (wch[:, :, None] - eah[:, None, :]) * 65536.0
                        + (wcl[:, :, None] - eal[:, None, :]))
                    mg = jnp.minimum(
                        mg, (ebh[:, None, :] - wch[:, :, None]) * 65536.0
                        + (ebl[:, None, :] - wcl[:, :, None]))
                for d in range(3):
                    mg = jnp.minimum(
                        mg, wh[d][:, :, None] - ql[d][:, None, :])
                    mg = jnp.minimum(
                        mg, qh[d][:, None, :] - wl[d][:, :, None])
                return jnp.sum(mg >= 0, axis=1).astype(jnp.int32)
            mg = jnp.broadcast_to(wpp[:, None, :], (Ge, T, 3 * TL))
            if member:
                mg = jnp.minimum(
                    mg, (wch[:, None, :] - eah[:, :, None]) * 65536.0
                    + (wcl[:, None, :] - eal[:, :, None]))
                mg = jnp.minimum(
                    mg, (ebh[:, :, None] - wch[:, None, :]) * 65536.0
                    + (ebl[:, :, None] - wcl[:, None, :]))
            for d in range(3):
                mg = jnp.minimum(mg, wh[d][:, None, :] - ql[d][:, :, None])
                mg = jnp.minimum(mg, qh[d][:, :, None] - wl[d][:, None, :])
            return jnp.sum(mg >= 0, axis=-1).astype(jnp.int32)

        flat = jax.lax.optimization_barrier(
            tuple(wins) + (wp, wc_h, wc_l) + tuple(qc) + tuple(eh))
        w6 = flat[:6]
        wpp, wch, wcl = flat[6:9]
        q6 = flat[9:15]
        e4 = flat[15:19]

        def loop_body(s, acc):
            tg_w = [jax.lax.dynamic_slice_in_dim(w, s * Ge, Ge, 0)
                    for w in (w6 + (wpp, wch, wcl))]
            tg_q = [jax.lax.dynamic_slice_in_dim(q, s * (Ge * T),
                                                 Ge * T, 0).reshape(Ge, T)
                    for q in (q6 + e4)]
            cnt = body_tile(tg_w, tg_q[:3], tg_q[3:6], tg_q[6:])
            return acc + jnp.sum(cnt)

        return jax.lax.fori_loop(0, nsteps, loop_body, jnp.int32(0))
    return f


def elementwise_chain(T, G):
    ntiles, TL, *_ = make_operands(T)
    nsteps = ntiles // G

    def f(ops):
        a = jax.lax.optimization_barrier(ops[0][0])

        def loop_body(s, acc):
            sl = jax.lax.dynamic_slice_in_dim(a, s * G, G, 0)
            mg = jnp.broadcast_to(sl[:, :, None], (G, 3 * TL, T))
            for _ in range(11):
                mg = jnp.minimum(mg, mg * 1.0000001 + 0.1)
            return acc + jnp.sum(mg >= 0.5, axis=(0, 1, 2)
                                 ).astype(jnp.int32)
        return jax.lax.fori_loop(0, nsteps, loop_body, jnp.int32(0))
    return f


def main():
    cases = [
        ("A transposed T128 G512", join(128, 512, "t")),
        ("B transposed T256 G256", join(256, 256, "t")),
        ("C legacy     T128 G512", join(128, 512, "l")),
        ("D transposed no-member", join(128, 512, "t", member=False)),
        ("E elementwise chain    ", elementwise_chain(128, 512)),
        ("F transposed unrolled  ", join(128, 512, "t", unroll=True)),
    ]
    T_by_case = {"B": 256}
    for label, fn in cases:
        T = T_by_case.get(label[0], 128)
        ops = make_operands(T)[2:]
        wins, wp, wc_h, wc_l, qc, eh = ops

        def body(i, cs, consts):
            x, = cs
            w2 = tuple(w + x[0, 0] for w in consts[0])
            out = fn((w2,) + consts[1:])
            return (x + 1e-30 * jnp.abs(out).astype(jnp.float32),)
        ms = chained_ms(
            body, (jnp.zeros((1, 1), jnp.float32),), iters=3,
            const=(tuple(wins), wp, wc_h, wc_l, tuple(qc), tuple(eh)),
            marginal=True, label=label)
        print(f"    -> {NQ / (ms / 1e3) / 1e6:.0f} Mentries/s",
              flush=True)


if __name__ == "__main__":
    main()
