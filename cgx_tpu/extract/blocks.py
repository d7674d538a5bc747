"""Shared host stage: contiguous-block dedup (GenerateBlocks, ExtractPair.cu:2742-2903)
and the reference's occurrence-sampling rule.  Used by both engines."""

from __future__ import annotations

import numpy as np

from cgx_tpu.preproc.corpus import QuerySet
from cgx_tpu.preproc.suffix_array import SAIndex
from cgx_tpu.types import Blocks, Pass1Result, Pass2Result

LONGESTCHSOURCE = 5  # max block matchlen (ExtractPair.cu:16, GenerateBlocks :2832)


def generate_blocks(sa: SAIndex, queries: QuerySet, p1: Pass1Result,
                    p2: Pass2Result) -> Blocks:
    key_to_id: dict = {}
    start, end, matchlen, string_start = [], [], [], []
    qry_global = []
    for q in range(queries.qryscount):
        go = []
        seen = set()
        for j in range(int(queries.offsets[q]), queries.query_end(q)):
            lm = int(p1.longestmatch[j])
            if lm > 0:
                key = (int(p1.up[j]), int(p1.down[j]), 1)
                gid = key_to_id.get(key)
                if gid is None:
                    gid = len(start)
                    key_to_id[key] = gid
                    start.append(key[0])
                    end.append(key[1])
                    matchlen.append(1)
                    string_start.append(int(sa.sa[key[0]]))
                    seen.add(gid)
                    go.append(gid)
                elif gid not in seen:
                    seen.add(gid)
                    go.append(gid)
            if lm > 1:
                cc = int(p2.connectoffset[j])
                for ct in range(2, min(lm, LONGESTCHSOURCE) + 1):
                    key = (int(p2.up[cc]), int(p2.down[cc]), ct)
                    cc += 1
                    gid = key_to_id.get(key)
                    if gid is None:
                        gid = len(start)
                        key_to_id[key] = gid
                        start.append(key[0])
                        end.append(key[1])
                        matchlen.append(ct)
                        string_start.append(int(sa.sa[key[0]]))
                        seen.add(gid)
                        go.append(gid)
                    elif gid not in seen:
                        seen.add(gid)
                        go.append(gid)
        qry_global.append(go)
    return Blocks(
        start=np.asarray(start, dtype=np.int32),
        end=np.asarray(end, dtype=np.int32),
        matchlen=np.asarray(matchlen, dtype=np.int32),
        string_start=np.asarray(string_start, dtype=np.int32),
        qry_global=qry_global)


def sample_indices(dis: int, sampler: int, is_sample: bool):
    """The reference's uniform occurrence sampling (ExtractPair.cu:1133-1160):
    occurrence j participates iff j == ROUND(d * stepsize) for some d < sampler,
    with stepsize computed in float32 and ROUND(X) = (int)(X + 0.5)."""
    if not is_sample or dis <= sampler:
        return range(dis)
    step = np.float32(dis) / np.float32(sampler)
    sel = []
    prev = -1
    for d in range(sampler):
        togo = int(np.float64(np.float32(d) * step) + 0.5)
        if togo != prev and togo < dis:
            sel.append(togo)
            prev = togo
    return sel


def occurrence_lists(lo, hi, sampler, is_sample):
    """Vectorized sampled-occurrence work lists.

    ``lo``/``hi`` are per-pattern inclusive ranges (-1/-1 or hi < lo = empty);
    returns (pattern_idx, tx) flat arrays in canonical order (pattern asc, tx asc)
    with the reference's uniform sampling rule applied per pattern
    (ExtractPair.cu:1133-1160).  Only over-sample-sized patterns fall back to the
    per-pattern ``sample_indices`` loop."""
    lo = np.asarray(lo, dtype=np.int64)
    hi = np.asarray(hi, dtype=np.int64)
    dis = np.where((lo >= 0) & (hi >= lo), hi - lo + 1, 0)
    if is_sample:
        large = dis > sampler
        counts = np.where(large, 0, dis)
        large_ids = np.flatnonzero(large)
        sels = {int(i): np.asarray(sample_indices(int(dis[i]), sampler, True),
                                   dtype=np.int64)
                for i in large_ids}
        counts[large_ids] = [len(sels[int(i)]) for i in large_ids]
    else:
        counts = dis
        sels = {}
    total = int(counts.sum())
    pattern_idx = np.repeat(np.arange(len(dis), dtype=np.int64), counts)
    offs = np.concatenate([[0], np.cumsum(counts)])[:-1]
    tx = np.arange(total, dtype=np.int64) - np.repeat(offs, counts)
    for i, sel in sels.items():
        tx[offs[i]:offs[i] + len(sel)] = sel
    return pattern_idx, tx
