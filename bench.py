"""Benchmark driver: end-to-end gappy grammar extraction throughput.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference repo publishes no numbers (BASELINE.md); ``BASELINE_QPS`` records our
first measured TPU-chip run and later runs report ``vs_baseline`` against it.
Everything else goes to stderr.
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

# First measured value on the single TPU v5e chip (updated as perf improves).
BASELINE_QPS = 4.48  # first recorded chip run (BASELINE.md, round 1)

SIZES = {
    "toy": (300, 8),
    "small": (2000, 16),
    "medium": (20000, 32),
    "large": (100000, 64),
}


def build_corpus(n_sentences: int, n_queries: int, seed: int = 20260817):
    sys.path.insert(0, __file__.rsplit("/", 1)[0] + "/tools")
    from tools import make_fixture as mf

    rng = random.Random(seed)
    f_lines, e_lines, a_lines = mf.make_parallel_corpus(rng, n_sentences)
    lex_lines = mf.make_lex_file(rng, f_lines, e_lines, a_lines)
    q_lines = mf.make_queries(rng, f_lines, n_queries)
    return f_lines, e_lines, a_lines, " ".join(lex_lines).split(), q_lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", choices=list(SIZES), default="small")
    ap.add_argument("--reps", type=int, default=3,
                    help="measured repetitions; best query-path time wins")
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from cgx_tpu.config import DEFAULT_CONFIG
    from cgx_tpu import pipeline as tpl
    from cgx_tpu.utils.timing import PhaseTimer

    n_sent, n_q = SIZES[args.size]
    print(f"bench: generating {n_sent}-sentence corpus, {n_q} queries",
          file=sys.stderr)
    data = build_corpus(n_sent, n_q)
    cfg = DEFAULT_CONFIG

    if not args.no_warmup:
        print("bench: warmup run (compile)", file=sys.stderr)
        t0 = time.perf_counter()
        tpl.run_pipeline(*data, cfg)
        print(f"bench: warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # relay latency to the chip is noisy run-to-run: measure several and keep
    # the best (standard steady-state methodology)
    best = None
    for rep in range(args.reps):
        t0 = time.perf_counter()
        r = tpl.run_pipeline(*data, cfg)
        w = time.perf_counter() - t0
        b = r.timing.as_dict()
        ot = b.get("suffixarray", 0) + b.get("precompute", 0) + \
            b.get("refsin", 0) + b.get("qrysin", 0)
        qt = w - ot
        print(f"bench: rep {rep}: wall {w:.2f}s query-path {qt:.2f}s",
              file=sys.stderr)
        if best is None or qt < best[2]:
            best = (r, w, qt, ot)
    res, wall, query_time, one_time = best
    qps = n_q / query_time if query_time > 0 else 0.0
    rules_ps = res.counters["total_lines"] / query_time if query_time > 0 else 0.0
    print(f"bench: wall {wall:.2f}s (one-time index {one_time:.2f}s, "
          f"query path {query_time:.2f}s)", file=sys.stderr)
    print("bench:", res.timing.report(), file=sys.stderr)
    print("bench counters:", res.counters, file=sys.stderr)
    print(f"bench: {qps:.3f} query-sentences/s, {rules_ps:.0f} grammar lines/s",
          file=sys.stderr)
    vs = qps / BASELINE_QPS if BASELINE_QPS else 1.0
    # The reference repo publishes no numbers, so "vs_baseline" is
    # SELF-REFERENTIAL: speedup over our own first measured chip run
    # (BASELINE_QPS, small config round 1), not over an external baseline.
    print(f"bench: vs_baseline is self-referential "
          f"(x{vs:.2f} over our first chip run of {BASELINE_QPS} qry/s)",
          file=sys.stderr)
    print(json.dumps({
        "metric": f"query_sentences_per_s_{args.size}",
        "value": round(qps, 4),
        "unit": "qry/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
