"""Measure: random gathers from a corpus-sized array — XLA gather shapes vs a
Pallas kernel with the corpus pinned in VMEM (VERDICT round-1 item 5: settle
the Pallas question with data).

The gappy-lookup and extraction kernels read (MMOV+2)-wide windows of
refstr/rlp at data-dependent corpus positions; this probe isolates exactly that
access pattern, plus single-word random gathers and H2D/D2H transfer rates.

MEASUREMENT CAVEAT (found in round 2): on the axon relay backend
``block_until_ready()`` returns before the computation's results are
materialized host-side, so a timing loop that only blocks is off by orders of
magnitude — every rep here forces a real ``np.asarray`` fetch of the scalar
checksum.  The round-1 version of this probe lacked that and reported XLA
window gathers at HBM roofline (~430 GB/s); the corrected numbers put ALL
gather shapes at ~100-200M gathered words/s (~0.5 GB/s) — the chip has no
per-lane gather hardware and XLA serializes dynamic addressing, exactly like
the Pallas per-item path.  Kernel design must therefore minimize gathered
words per item; transfers move ~40 MB/s (incompressible) each way through the
relay tunnel, so small uploads beat extra gathers but large per-item column
uploads do not.

Run on the chip:  python tools/pallas_probe.py [--n 131072] [--corpus 1000000]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

W = 32        # window width per item (rounded up from MMOV+2 for tiling)
BLK = 512     # items per Pallas grid step


@jax.jit
def xla_gather(ref, pos):
    win = ref[pos[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]]
    return jnp.sum(win, dtype=jnp.int32)


@jax.jit
def xla_scalar_gather(ref, pos):
    return jnp.sum(ref[pos], dtype=jnp.int32)


def pallas_gather_fn(n_items, corpus_len):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows_total = corpus_len // 128
    grid = n_items // BLK
    lane_iota = None

    def kernel(pos_sref, ref_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        base = pl.program_id(0) * BLK
        g = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 0) * 128 + \
            jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)

        def body(i, acc):
            p = pos_sref[base + i]
            row = p // 128
            col = p - row * 128
            rows = ref_ref[pl.ds(row, 2), :]
            m = (g >= col) & (g < col + W)
            return acc + jnp.sum(jnp.where(m, rows, 0), dtype=jnp.int32)

        acc = jax.lax.fori_loop(0, BLK, body, jnp.int32(0))
        out_ref[0:1, 0:1] += jnp.full((1, 1), acc, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[pl.BlockSpec((rows_total, 128), lambda i, pos: (0, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda i, pos: (0, 0)),
    )

    @jax.jit
    def run(ref, pos):
        ref2d = ref[: rows_total * 128].reshape(rows_total, 128)
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        )(pos, ref2d)
        return jnp.sum(out)
    return run


def pallas_pipelined_fn(n_items, corpus_len, k_slots=8):
    """K-deep pipelined per-item window DMA: each item's [W] window is copied
    HBM->VMEM straight into its output row by an async DMA; K rotating
    semaphores keep K copies in flight (the per-item fori variant above waits
    each copy before issuing the next, so this measures how much outstanding
    DMA parallelism buys on top of serialized dynamic addressing).

    FINDING: does not compile on this toolchain — Mosaic tiles 1D HBM memrefs
    at (1024,) and requires DMA slices aligned to the tile, so a 32-word
    per-item HBM window copy is inexpressible; the aligned alternative
    overfetches 1024+ words/item, strictly worse than the ~100M words/s
    serialized gather path.  Outstanding-DMA pipelining is therefore CLOSED as
    an optimization lever for this access pattern; kept for the record."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = n_items // BLK

    def kernel(pos_sref, hbm_ref, out_ref, sems):
        base = pl.program_id(0) * BLK

        def dma_for(i, slot):
            p = pos_sref[base + i]
            return pltpu.make_async_copy(
                hbm_ref.at[pl.ds(p, W)],
                out_ref.at[i, :],
                sems.at[slot],
            )

        for k in range(k_slots):      # warm-up: K copies in flight
            dma_for(k, k).start()

        def loop_body(i, carry):
            slot = jax.lax.rem(i, k_slots)
            dma_for(i, slot).wait()

            @pl.when(i + k_slots < BLK)
            def _():
                dma_for(i + k_slots, slot).start()
            return carry

        jax.lax.fori_loop(0, BLK, loop_body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((BLK, W), lambda i, pos: (i, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((k_slots,))],
    )

    @jax.jit
    def run(ref, pos):
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_items, W), jnp.int32),
        )(pos, ref)
        return jnp.sum(out, dtype=jnp.int32)
    return run


def timeit(fn, *args, reps=10):
    r = np.asarray(fn(*args))              # compile + real fetch
    t0 = time.perf_counter()
    for _ in range(reps):
        r = np.asarray(fn(*args))          # force materialization every rep
    return (time.perf_counter() - t0) / reps, r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--corpus", type=int, default=1000000)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.integers(2, 1000, size=args.corpus).astype(np.int32))
    pos = jnp.asarray(rng.integers(0, args.corpus - W,
                                   size=args.n).astype(np.int32))

    t_x, r_x = timeit(xla_gather, ref, pos, reps=args.reps)
    words = args.n * W
    print(f"xla_gather:    {t_x * 1e3:8.3f} ms  ({args.n} x {W} windows, "
          f"{words / t_x / 1e6:.0f}M words/s, checksum {int(r_x)})")
    t_s, r_s = timeit(xla_scalar_gather, ref, pos, reps=args.reps)
    print(f"xla_scalar:    {t_s * 1e3:8.3f} ms  ({args.n} words, "
          f"{args.n / t_s / 1e6:.0f}M words/s, checksum {int(r_s)})")

    try:
        run = pallas_gather_fn(args.n, args.corpus)
        t_p, r_p = timeit(run, ref, pos, reps=args.reps)
        print(f"pallas_vmem:   {t_p * 1e3:8.3f} ms  (checksum {int(r_p)})")
        assert int(r_p) == int(r_x), "checksum mismatch"
        print(f"speedup: {t_x / t_p:.2f}x")
    except Exception as e:
        print(f"pallas path failed: {type(e).__name__}: {e}")
        sys.exit(1)

    for k in (4, 8, 16):
        try:
            run = pallas_pipelined_fn(args.n, args.corpus, k_slots=k)
            t_k, r_k = timeit(run, ref, pos, reps=args.reps)
            assert int(r_k) == int(r_x), "checksum mismatch (pipelined)"
            print(f"pallas_dma[{k:2d}]: {t_k * 1e3:8.3f} ms  "
                  f"({words / t_k / 1e6:.0f}M words/s, "
                  f"{t_x / t_k:.2f}x XLA)")
        except Exception as e:
            print(f"pallas_dma[{k}] failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
