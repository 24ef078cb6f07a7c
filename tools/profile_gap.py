"""Stage-by-stage profile of the HTC1 gap-array Pallas decode pipeline.

r03 located the bottleneck: ~4 eager staging dispatches x the tunnel's
~29 ms floor per block (the kernels themselves were a few ms).  This now
measures the FUSED single-dispatch pipeline (VERDICT item 1) two ways:
wall-clock per call (includes one floor) and chained in-jit repeats
(true device throughput, the headline bench discipline).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def t(fn, reps=5, label=""):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    log(f"{label}: min {min(ts)*1e3:.2f} ms  med {sorted(ts)[len(ts)//2]*1e3:.2f} ms")
    return min(ts)


def main():
    size = 1 << 26  # 64 MB
    from huffman_tpu.models import GapArrayCodec
    from huffman_tpu.utils import generate_redundant
    from huffman_tpu.ops.pallas.decode_kernel import (
        _fused_blocks,
        decode_ranks_pallas,
    )
    from huffman_tpu.ops.compact import _sym_tiles, plan_compact

    data = generate_redundant(size, 0.5, seed=0)
    codec = GapArrayCodec.fit(data, block_bytes=size, method="pallas")
    log("encoding...")
    comp = codec.encode(data)
    log(f"n_segs={comp.block_gaps[0].size} max_count={comp.block_counts[0].max()}")

    gaps = comp.block_gaps[0].astype(np.int32)
    counts = comp.block_counts[0]
    words = np.concatenate([comp.block_words[0], np.zeros(1, np.uint32)])
    n_segs = gaps.size
    max_count = -(-int(counts.max()) // 8) * 8

    words_j = jnp.asarray(words[None])  # (1, W)
    gaps_j = jnp.asarray(gaps)
    counts_j = jnp.asarray(counts.astype(np.int32))
    jax.block_until_ready(words_j)

    plan = plan_compact(np.asarray(counts, np.int64), size)
    log(f"plan: band={plan.statics.band} s_cap={plan.statics.s_cap} "
        f"chunk={plan.statics.chunk_bytes} n_tiles={plan.statics.n_tiles}")
    symlo, symhi = _sym_tiles(np.asarray(codec.table.symtab, np.uint8))
    bases_j = jnp.asarray(plan.bases)
    s0_j = jnp.asarray(plan.s0_rel)

    kw = dict(
        spec=codec.spec, seg_bits=codec.seg_bits, n_segs_b=n_segs,
        max_count=max_count, statics=plan.statics, interpret=False,
    )

    # fused single-dispatch decode
    def fused():
        out = _fused_blocks(
            words_j, gaps_j, counts_j, bases_j, s0_j, symlo, symhi,
            codec.dec, **kw,
        )
        jax.block_until_ready(out)
        return out

    out = fused()
    ok = bool(jnp.array_equal(out, jnp.asarray(data)))
    log(f"verify: {'PASS' if ok else 'FAIL'}")
    dt = t(fused, label="fused pipeline (1 dispatch, incl. floor)")
    log(f"  -> {size/dt/1e9:.2f} GB/s")

    # ranks kernel alone, chained in-jit (true kernel throughput)
    def make_chain(R, which):
        @jax.jit
        def f(words2, gaps, counts, bases, s0):
            def body(i, carry):
                acc, w = carry
                w = w.at[0, 0].set(w[0, 0] ^ jnp.uint32(1))
                if which == "fused":
                    o = _fused_blocks(
                        w, gaps, counts, bases, s0, symlo, symhi,
                        codec.dec, **kw,
                    )
                    acc = acc ^ o[:8].astype(jnp.int32)
                else:
                    o = decode_ranks_pallas(
                        w.reshape(-1), gaps, counts, codec.dec,
                        spec=codec.spec, seg_bits=codec.seg_bits,
                        n_segs=n_segs, max_count=max_count,
                    )
                    acc = acc ^ o[0, :8]
                return acc, w
            acc, _ = jax.lax.fori_loop(
                0, R, body, (jnp.zeros(8, jnp.int32), words2))
            return acc
        return f

    for which in ("ranks", "fused"):
        r1, r2 = 2, 6
        fs = {r: make_chain(r, which) for r in (r1, r2)}
        for r in (r1, r2):
            jax.block_until_ready(
                fs[r](words_j, gaps_j, counts_j, bases_j, s0_j))
        ts = {r: [] for r in (r1, r2)}
        for _ in range(5):
            for r in (r1, r2):
                t0 = time.perf_counter()
                jax.block_until_ready(
                    fs[r](words_j, gaps_j, counts_j, bases_j, s0_j))
                ts[r].append(time.perf_counter() - t0)
        dt = max(min(ts[r2]) - min(ts[r1]), 1e-9) / (r2 - r1)
        log(f"chained {which}: {dt*1e3:.2f} ms/rep -> {size/dt/1e9:.2f} GB/s")


if __name__ == "__main__":
    main()
