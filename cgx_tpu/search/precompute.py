"""TPU frequent-pair precomputation.

TPU-native reformulation of the precomp kernel (GappyLook.cu:740-869) + host driver
(SuffixArray.cu:1132-1340).  The reference scans, for every (a, b) cell of the top-P
frequent tokens, the rarer token's occurrences — re-reading each occurrence up to P
times.  Here every occurrence of a top token is scanned **once** per direction; each
move yields at most one partner token, and cell membership/ownership is resolved on
the host with a binary search into the sorted top list:

* forward scan from an occurrence of ``a``: partner ``b = str[pos]`` owns cell
  (a, b) iff count(b) >= count(a)  (the reference's ``reverse`` rule,
  SuffixArray.cu:1203-1215);
* backward scan from an occurrence of ``b``: partner ``a`` owns cell (a, b) iff
  count(a) > count(b).

Gap-consistency failures are tallied per cell in ``feature_missing``
(ExtractPair.c:899-908 correction).  Emissions are identical to the reference's
per-cell scans; tests enforce bit-equality with the sequential oracle."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cgx_tpu.config import ExtractorConfig
from cgx_tpu.preproc.corpus import SourceCorpus
from cgx_tpu.preproc.suffix_array import SAIndex
from cgx_tpu.search.lookup import MMOV, _gap_check, _gap_check_grow, _prefix_ok
from cgx_tpu.types import Precomp
from cgx_tpu.utils.batching import chunked_batch, pad_items


def _fwd_item(refstr, rlp, l_tar, r_tar, mrs, mgs, gostart):
    """Forward scan: all (move) candidates with their partner token and gap check
    (GappyLook.cu:787-822, per-cell token test hoisted to the host)."""
    moves = jnp.arange(MMOV, dtype=jnp.int32)
    gap0_bad = refstr[gostart + mgs] < 2
    pos = gostart + 1 + mgs + moves
    temp = refstr[jnp.minimum(pos, refstr.shape[0] - 1)]
    bad = temp < 2
    span_ok = 1 + mgs + moves + 1 <= mrs
    scan_ok = _prefix_ok(~bad) & span_ok & ~gap0_bad & ~bad
    gc = _gap_check_grow(rlp, l_tar, r_tar, gostart + 1, mgs - 1, mrs, True)
    start = jnp.broadcast_to(gostart, (MMOV,))
    length = moves + 1 + mgs
    return scan_ok, temp, gc, start, length


def _bwd_item(refstr, rlp, l_tar, r_tar, mrs, mgs, gostart):
    moves = jnp.arange(MMOV, dtype=jnp.int32)
    gap0_bad = (gostart - mgs >= 0) & (refstr[jnp.maximum(gostart - mgs, 0)] < 2)
    pos = gostart - 1 - mgs - moves
    oob = pos < 0
    temp = jnp.where(oob, jnp.int32(-1), refstr[jnp.maximum(pos, 0)])
    bad = oob | (temp < 2)
    span_ok = 1 + mgs + moves + 1 <= mrs
    scan_ok = _prefix_ok(~bad) & span_ok & ~gap0_bad & ~bad
    gc = _gap_check_grow(rlp, l_tar, r_tar, gostart - 1, mgs - 1, mrs, False)
    start = pos
    length = moves + 1 + mgs
    return scan_ok, temp, gc, start, length


@functools.partial(jax.jit, static_argnames=("mrs", "mgs"))
def _fwd_batch(refstr, rlp, l_tar, r_tar, gostart, mrs, mgs):
    f = functools.partial(_fwd_item, refstr, rlp, l_tar, r_tar, mrs, mgs)
    return jax.vmap(f)(gostart)


@functools.partial(jax.jit, static_argnames=("mrs", "mgs"))
def _bwd_batch(refstr, rlp, l_tar, r_tar, gostart, mrs, mgs):
    f = functools.partial(_bwd_item, refstr, rlp, l_tar, r_tar, mrs, mgs)
    return jax.vmap(f)(gostart)


def top_tokens(source: SourceCorpus, sa: SAIndex, cfg: ExtractorConfig):
    """Top-P frequent tokens via SA runs (SuffixArray.cu:1148-1198), canonical
    tie-break by ascending token id (DESIGN.md)."""
    first = np.asarray(source.str_)[np.asarray(sa.sa)]
    valid = first >= 2
    v = first[valid]
    pos = np.flatnonzero(valid)
    change = np.empty(len(v), dtype=bool)
    change[0] = True
    change[1:] = v[1:] != v[:-1]
    starts = np.flatnonzero(change)
    tokens = v[starts]
    counts = np.diff(np.concatenate([starts, [len(v)]]))
    run_start = pos[starts]
    P = min(cfg.precompute_count, len(tokens))
    order = np.argsort(-counts, kind="stable")[:P]
    order = order[np.argsort(tokens[order], kind="stable")]
    return tokens[order], counts[order], run_start[order]


def precompute_tpu(index, source: SourceCorpus, sa: SAIndex,
                   cfg: ExtractorConfig) -> Precomp:
    tokens, counts, run_start = top_tokens(source, sa, cfg)
    P = len(tokens)
    mrs, mgs = cfg.max_rule_span, cfg.min_gap_size
    sa_host = np.asarray(sa.sa)

    # every occurrence of every top token, once
    tok_idx = np.repeat(np.arange(P), counts)
    offs = np.concatenate([[0], np.cumsum(counts)])[:-1]
    tx = np.arange(int(counts.sum())) - np.repeat(offs, counts)
    gostart = sa_host[np.repeat(run_start, counts) + tx].astype(np.int32)

    rows_parts = []
    missing = np.zeros(P * P, dtype=np.int32)
    for fwd in (True, False):
        fn = _fwd_batch if fwd else _bwd_batch
        ni, g_p = pad_items(gostart)
        scan_ok, temp, gc, start, length = fn(
            index.refstr_padded, index.rlp, index.l_tar, index.r_tar,
            jnp.asarray(g_p), mrs, mgs)
        scan_ok, temp, gc, start, length = (
            x[:ni] for x in jax.device_get((scan_ok, temp, gc, start, length)))
        ii, mm = np.nonzero(scan_ok)
        partners = temp[ii, mm]
        ib = np.searchsorted(tokens, partners)
        member = (ib < P) & (tokens[np.minimum(ib, P - 1)] == partners)
        my = tok_idx[ii]
        cnt_p = counts[np.minimum(ib, P - 1)]
        if fwd:
            owns = member & (cnt_p >= counts[my])
            cell = my * P + ib
        else:
            owns = member & (cnt_p > counts[my])
            cell = ib * P + my
        hit = owns & gc[ii, mm]
        miss = owns & ~gc[ii, mm]
        np.add.at(missing, cell[miss], 1)
        if hit.any():
            rows_parts.append(np.stack([
                cell[hit], start[ii, mm][hit].astype(np.int64),
                length[ii, mm][hit].astype(np.int64)], axis=1))

    if rows_parts:
        rows = np.concatenate(rows_parts, axis=0)
        order = np.lexsort((rows[:, 2], rows[:, 1], rows[:, 0]))
        rows = rows[order]
    else:
        rows = np.empty((0, 3), dtype=np.int64)

    index_start = np.ones(P * P, dtype=np.int32)
    index_end = np.zeros(P * P, dtype=np.int32)
    if len(rows):
        uniq, first_idx, cnts = np.unique(rows[:, 0], return_index=True,
                                          return_counts=True)
        index_start[uniq] = first_idx.astype(np.int32)
        index_end[uniq] = (first_idx + cnts - 1).astype(np.int32)
    return Precomp(
        frequent_list=tokens.astype(np.int32),
        tok_start=run_start.astype(np.int32),
        tok_len=counts.astype(np.int32),
        index_start=index_start, index_end=index_end,
        onegap_start=rows[:, 1].astype(np.int32),
        onegap_length=rows[:, 2].astype(np.int32),
        feature_missing=missing, count=len(rows))
