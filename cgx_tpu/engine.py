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

from cgx_tpu.utils.batching import chunked_batch


class ReplicatedEngine:
    """Single-device dispatch against a fully-resident GrammarIndex."""

    def __init__(self, index, sa_host: np.ndarray, cfg):
        self.index = index
        self.sa_host = sa_host
        self.cfg = cfg

    def sa_values(self, rows) -> np.ndarray:
        return self.sa_host[np.asarray(rows, np.int64)].astype(np.int32)

    def fwd(self, queries, gostart, sl, el, stok):
        from cgx_tpu.search.lookup import _fwd_batch
        ix, cfg = self.index, self.cfg
        return chunked_batch(
            lambda *a: _fwd_batch(
                ix.refstr_padded, ix.rlp, ix.lr_tar,
                ix.device_query_tokens(queries),
                *(jnp.asarray(x) for x in a), ix.offs0,
                cfg.max_rule_span, cfg.min_gap_size),
            [gostart, sl, el, stok])

    def bwd(self, queries, gostart, sl, el, tok):
        from cgx_tpu.search.lookup import _bwd_batch
        ix, cfg = self.index, self.cfg
        return chunked_batch(
            lambda *a: _bwd_batch(
                ix.refstr_padded, ix.rlp, ix.lr_tar,
                ix.device_query_tokens(queries),
                *(jnp.asarray(x) for x in a), ix.offs0,
                cfg.max_rule_span, cfg.min_gap_size),
            [gostart, sl, el, tok])

    def pcs(self, queries, pstart, plen, sl, el, tok, stok):
        from cgx_tpu.search.lookup import _pcs_batch
        ix, cfg = self.index, self.cfg
        return chunked_batch(
            lambda *a: _pcs_batch(
                ix.refstr_padded, ix.device_query_tokens(queries),
                *(jnp.asarray(x) for x in a), ix.offs0, cfg.max_rule_span),
            [pstart, plen, sl, el, tok, stok])

    def two(self, pstart, plen):
        from cgx_tpu.search.lookup import _two_batch
        ix, cfg = self.index, self.cfg
        return chunked_batch(
            lambda *a: _two_batch(
                ix.refstr_padded, ix.rlp, ix.lr_tar,
                *(jnp.asarray(x) for x in a), ix.offs0,
                cfg.max_rule_span, cfg.min_gap_size),
            [pstart, plen])

    def contig(self, sa_pos, lm):
        from cgx_tpu.extract.device import _contig_batch
        ix, cfg = self.index, self.cfg
        return chunked_batch(
            lambda sp, lp: _contig_batch(
                ix.refstr_padded, ix.sa, ix.rlp, ix.lr_tar,
                jnp.asarray(sp), jnp.asarray(lp), ix.offs0,
                cfg.max_rule_span, cfg.max_rule_symbols),
            [np.asarray(sa_pos, np.int32), np.asarray(lm, np.int32)])

    def onegap(self, css, fes, sls, els):
        from cgx_tpu.extract.device import _onegap_batch
        ix, cfg = self.index, self.cfg
        return chunked_batch(
            lambda *a: _onegap_batch(
                ix.refstr_padded, ix.rlp, ix.lr_tar,
                *(jnp.asarray(x) for x in a), ix.offs0,
                cfg.max_rule_span, cfg.max_rule_symbols),
            [np.asarray(css, np.int32), np.asarray(fes, np.int32),
             np.asarray(sls, np.int32), np.asarray(els, np.int32)])

    def twogap(self, css, fes, ses, sls, els, cls):
        from cgx_tpu.extract.device import _twogap_batch
        ix, cfg = self.index, self.cfg
        return chunked_batch(
            lambda *a: _twogap_batch(
                ix.refstr_padded, ix.rlp, ix.lr_tar,
                *(jnp.asarray(x) for x in a), ix.offs0, cfg.max_rule_span),
            [np.asarray(css, np.int32), np.asarray(fes, np.int32),
             np.asarray(ses, np.int32), np.asarray(sls, np.int32),
             np.asarray(els, np.int32), np.asarray(cls, np.int32)])
