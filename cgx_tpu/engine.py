"""Dispatch engines for the device stages.

The lookup/extraction orchestrators express their device work against a small
engine protocol so the same host logic drives both index layouts:

* ``ReplicatedEngine`` — the whole index resident on one device
  (cgx_tpu.index.container.GrammarIndex), batch kernels dispatched directly;
* ``cgx_tpu.parallel.sharded.ShardedEngine`` — every O(corpus) array split
  across a mesh; work items partitioned to the shard owning the corpus
  position they read around, SA values fetched with distributed gathers.

Methods (all take/return host numpy; device placement is the engine's
business): ``sa_values``, ``fwd``, ``bwd``, ``pcs``, ``two``, ``contig``,
``onegap``, ``twogap``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cgx_tpu.utils.batching import (Pending, chunked_batch,
                                    chunked_indices)

# dispatch chunk sizes for the expanded lookup kernels: their per-item device
# temps are tiny (scalars / one MMOV window), so much larger chunks than the
# default amortize the relay round trip without HBM pressure
PCS_CHUNK = 2_097_152
SCAN_CHUNK = 524_288


def _offsets(counts) -> np.ndarray:
    """Exclusive prefix [D+1] of per-pattern item counts."""
    return np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)


def expand_hits(hit_idx, counts, ids=None):
    """Map flat item indices back to (pattern, tx) using the count prefix.
    ``ids`` optionally maps local pattern index -> caller pattern id."""
    cum = np.cumsum(counts)
    pi = np.searchsorted(cum, hit_idx, side="right")
    tx = hit_idx - (cum[pi] - counts[pi])
    pat = ids[pi] if ids is not None else pi
    return pat, tx, pi


def _pad1(a) -> np.ndarray:
    """Bucket-padded row table (clip-safe gathers, shape-stable programs)."""
    from cgx_tpu.utils.batching import pad_tokens
    a = np.asarray(a, np.int32)
    if not len(a):
        a = np.zeros(1, np.int32)
    return pad_tokens(a, np.int32(0))


def _pad_pat(a, edge=False) -> np.ndarray:
    """Bucket-padded per-pattern array; ``edge`` repeats the final value
    (required for the monotone count prefix)."""
    from cgx_tpu.utils.batching import pad_tokens
    a = np.ascontiguousarray(a)
    fill = a[-1] if (edge and len(a)) else 0
    return pad_tokens(a, a.dtype.type(fill))


class ReplicatedEngine:
    """Single-device dispatch against a fully-resident GrammarIndex.

    The lookup stages use the ``*_expanded`` entry points: per-pattern arrays
    upload, the multi-million-item work list materializes ON DEVICE (indices
    generated per chunk, occurrence data read from the resident SA/precomp
    tables), and only packed hit masks come back — H2D and D2H both drop from
    O(items * fields) to O(patterns) + O(items/8)."""

    def __init__(self, index, sa_host: np.ndarray, cfg):
        self.index = index
        self.sa_host = sa_host
        self.cfg = cfg

    def sa_values(self, rows) -> np.ndarray:
        return self.sa_host[np.asarray(rows, np.int64)].astype(np.int32)

    def pcs_expanded(self, queries, pc, base, counts, sl, el, tok, stok,
                     fetch=True):
        from cgx_tpu.search.lookup import _pcs_batch_exp
        ix, cfg = self.index, self.cfg
        offs = _offsets(counts)
        N = int(offs[-1])
        pcsd = (jnp.asarray(_pad1(pc.onegap_start)),
                jnp.asarray(_pad1(pc.onegap_length)))
        D = len(counts)
        pp = tuple(jnp.asarray(_pad_pat(np.asarray(a, np.int64)
                                        .astype(np.int32), edge=(i == 1)))
                   for i, a in enumerate((base, offs, sl, el, tok, stok)))
        qt = ix.device_query_tokens(queries)
        packed_p = chunked_indices(
            lambda s, n: _pcs_batch_exp(ix.refstr_padded, qt, *pcsd, *pp,
                                        jnp.int32(s), jnp.int32(D), ix.offs0,
                                        cfg.max_rule_span, n), N,
            chunk=PCS_CHUNK, item_div=32, fetch=False)

        def _post():
            bits = np.asarray(packed_p.get()[0], np.uint32)
            ok = ((bits[:, None] >> np.arange(32, dtype=np.uint32)) & 1
                  ).astype(bool).ravel()[:N]
            return (ok,)
        return _post() if fetch else Pending(_post)

    def scan_expanded(self, queries, fwd, lo, counts, sl, el, side,
                      fetch=True):
        from cgx_tpu.search.lookup import _scan_batch_exp
        ix, cfg = self.index, self.cfg
        offs = _offsets(counts)
        N = int(offs[-1])
        D = len(counts)
        pp = tuple(jnp.asarray(_pad_pat(np.asarray(a, np.int64)
                                        .astype(np.int32), edge=(i == 1)))
                   for i, a in enumerate((lo, offs, sl, el, side)))
        qt = ix.device_query_tokens(queries)
        return chunked_indices(
            lambda s, n: _scan_batch_exp(ix.refstr_padded, ix.sa, ix.rlp,
                                         ix.lr_tar, qt, *pp, jnp.int32(s),
                                         jnp.int32(D), ix.offs0,
                                         cfg.max_rule_span,
                                         cfg.min_gap_size, fwd, n), N,
            chunk=SCAN_CHUNK, fetch=fetch)

    def two_expanded(self, onegap_sa, pc, lo, counts, pcmode, fetch=True):
        from cgx_tpu.search.lookup import _two_batch_exp
        ix, cfg = self.index, self.cfg
        offs = _offsets(counts)
        N = int(offs[-1])
        tabs = tuple(jnp.asarray(_pad1(a)) for a in (
            onegap_sa.str_position, onegap_sa.length,
            pc.onegap_start, pc.onegap_length))
        D = len(counts)
        pp = (jnp.asarray(_pad_pat(np.asarray(lo, np.int64)
                                   .astype(np.int32))),
              jnp.asarray(_pad_pat(offs.astype(np.int32), edge=True)),
              jnp.asarray(_pad_pat(np.asarray(pcmode, bool))))
        comb_p = chunked_indices(
            lambda s, n: _two_batch_exp(ix.refstr_padded, ix.rlp, ix.lr_tar,
                                        *tabs, *pp, jnp.int32(s),
                                        jnp.int32(D), ix.offs0,
                                        cfg.max_rule_span, cfg.min_gap_size,
                                        n), N, chunk=SCAN_CHUNK, fetch=False)

        def _post():
            comb = np.asarray(comb_p.get()[0], np.uint32)
            return (comb & 0xFFFF).astype(np.int64), \
                ((comb >> 16) & 0xFFFF).astype(np.int64)
        return _post() if fetch else Pending(_post)

    def contig(self, sa_pos, lm, fetch=True):
        from cgx_tpu.extract.device import _contig_batch
        ix, cfg = self.index, self.cfg
        return chunked_batch(
            lambda sp, lp: _contig_batch(
                ix.refstr_padded, ix.sa, ix.rlp, ix.lr_tar,
                jnp.asarray(sp), jnp.asarray(lp), ix.offs0,
                cfg.max_rule_span, cfg.max_rule_symbols),
            [np.asarray(sa_pos, np.int32), np.asarray(lm, np.int32)],
            fetch=fetch)

    def onegap(self, css, fes, sls, els, fetch=True):
        from cgx_tpu.extract.device import _onegap_batch
        ix, cfg = self.index, self.cfg
        return chunked_batch(
            lambda *a: _onegap_batch(
                ix.refstr_padded, ix.rlp, ix.lr_tar,
                *(jnp.asarray(x) for x in a), ix.offs0,
                cfg.max_rule_span, cfg.max_rule_symbols),
            [np.asarray(css, np.int32), np.asarray(fes, np.int32),
             np.asarray(sls, np.int32), np.asarray(els, np.int32)],
            fetch=fetch)

    def twogap(self, css, fes, ses, sls, els, cls, fetch=True):
        from cgx_tpu.extract.device import _twogap_batch
        ix, cfg = self.index, self.cfg
        return chunked_batch(
            lambda *a: _twogap_batch(
                ix.refstr_padded, ix.rlp, ix.lr_tar,
                *(jnp.asarray(x) for x in a), ix.offs0, cfg.max_rule_span),
            [np.asarray(css, np.int32), np.asarray(fes, np.int32),
             np.asarray(ses, np.int32), np.asarray(sls, np.int32),
             np.asarray(els, np.int32), np.asarray(cls, np.int32)],
            fetch=fetch)
