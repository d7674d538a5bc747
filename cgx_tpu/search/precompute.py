"""TPU frequent-pair precomputation.

Vectorized transcription of the precomp kernel (GappyLook.cu:740-869) and its host
driver (SuffixArray.cu:1132-1340): pick the top-P most frequent source tokens (SA-run
lengths), then for every (a, b) cell scan the rarer token's occurrences for a..X..b
cooccurrences within max_rule_span that pass the target-side gap-consistency check;
failures are tallied per cell in feature_missing (used by the fsample correction at
ExtractPair.c:899-908)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cgx_tpu.config import ExtractorConfig
from cgx_tpu.preproc.corpus import SourceCorpus
from cgx_tpu.preproc.suffix_array import SAIndex
from cgx_tpu.search.lookup import MMOV, _gap_check, _prefix_ok
from cgx_tpu.types import Precomp
from cgx_tpu.utils.batching import pad_items


def _fwd_item(refstr, rlp, l_tar, r_tar, mrs, mgs, gostart, tok_b):
    moves = jnp.arange(MMOV, dtype=jnp.int32)
    gap0_bad = refstr[gostart + mgs] < 2
    pos = gostart + 1 + mgs + moves
    temp = refstr[jnp.minimum(pos, refstr.shape[0] - 1)]
    bad = temp < 2
    span_ok = 1 + mgs + moves + 1 <= mrs
    reach = _prefix_ok(~bad) & span_ok & ~gap0_bad
    cand = reach & ~bad & (temp == tok_b)
    gc = jax.vmap(lambda m: _gap_check(rlp, l_tar, r_tar, gostart + 1,
                                       gostart + m + 1 + mgs - 1, mrs))(moves)
    valid = cand & gc
    miss = cand & ~gc
    start = jnp.broadcast_to(gostart, (MMOV,))
    length = moves + 1 + mgs
    return valid, miss, start, length


def _bwd_item(refstr, rlp, l_tar, r_tar, mrs, mgs, gostart, tok_a):
    moves = jnp.arange(MMOV, dtype=jnp.int32)
    gap0_bad = (gostart - mgs >= 0) & (refstr[jnp.maximum(gostart - mgs, 0)] < 2)
    pos = gostart - 1 - mgs - moves
    oob = pos < 0
    temp = jnp.where(oob, jnp.int32(-1), refstr[jnp.maximum(pos, 0)])
    bad = oob | (temp < 2)
    span_ok = 1 + mgs + moves + 1 <= mrs
    reach = _prefix_ok(~bad) & span_ok & ~gap0_bad
    cand = reach & ~bad & (temp == tok_a)
    gc = jax.vmap(lambda m: _gap_check(rlp, l_tar, r_tar,
                                       gostart - 1 - mgs - m + 1,
                                       gostart - 1, mrs))(moves)
    valid = cand & gc
    miss = cand & ~gc
    start = pos
    length = moves + 1 + mgs
    return valid, miss, start, length


@functools.partial(jax.jit, static_argnames=("mrs", "mgs"))
def _fwd_batch(refstr, rlp, l_tar, r_tar, gostart, tok_b, mrs, mgs):
    f = functools.partial(_fwd_item, refstr, rlp, l_tar, r_tar, mrs, mgs)
    return jax.vmap(f)(gostart, tok_b)


@functools.partial(jax.jit, static_argnames=("mrs", "mgs"))
def _bwd_batch(refstr, rlp, l_tar, r_tar, gostart, tok_a, mrs, mgs):
    f = functools.partial(_bwd_item, refstr, rlp, l_tar, r_tar, mrs, mgs)
    return jax.vmap(f)(gostart, tok_a)


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

    # cell item lists (occurrences of the rarer side)
    cc, jj = np.meshgrid(np.arange(P), np.arange(P), indexing="ij")
    cc, jj = cc.ravel(), jj.ravel()
    reverse = counts[jj] >= counts[cc]
    side = np.where(reverse, cc, jj)
    occ_count = counts[side]
    occ_start = run_start[side]
    cells = cc * P + jj

    def batch_items(mask):
        n = occ_count[mask]
        cell_ids = np.repeat(cells[mask], n)
        offs = np.concatenate([[0], np.cumsum(n)])[:-1]
        tx = np.arange(n.sum()) - np.repeat(offs, n)
        sa_idx = np.repeat(occ_start[mask], n) + tx
        gostart = sa_host[sa_idx].astype(np.int32)
        return cell_ids, gostart

    rows_parts = []
    missing = np.zeros(P * P, dtype=np.int32)
    for fwd in (True, False):
        mask = reverse == fwd
        cell_ids, gostart = batch_items(mask)
        if len(cell_ids) == 0:
            continue
        other = np.repeat(np.where(fwd, tokens[jj], tokens[cc])[mask],
                          occ_count[mask]).astype(np.int32)
        fn = _fwd_batch if fwd else _bwd_batch
        ni, g_p, o_p = pad_items(gostart, other)
        valid, miss, start, length = fn(
            index.refstr_padded, index.rlp, index.l_tar, index.r_tar,
            jnp.asarray(g_p), jnp.asarray(o_p), mrs, mgs)
        valid = np.asarray(valid)[:ni]
        miss = np.asarray(miss)[:ni]
        start = np.asarray(start)[:ni]
        length = np.asarray(length)[:ni]
        mi, _ = np.nonzero(miss)
        np.add.at(missing, cell_ids[mi], 1)
        ii, mm = np.nonzero(valid)
        if len(ii):
            rows_parts.append(np.stack([
                cell_ids[ii], start[ii, mm].astype(np.int64),
                length[ii, mm].astype(np.int64)], axis=1))

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
