"""Shared host stage: lexicon build (dedup + counts + rule strings + features).

Mirrors createLexiconFast / createLexiconGappyFast / createLexiconTwoGapFast
(ExtractPair.c:515-1276) and the per-id up/down print index (extractGlobalPairsUpDown
+ host scans at ExtractPair.cu:3743-3756, 3810-3816).  Used by both engines; all the
float32 conventions of DESIGN.md live here.
"""

from __future__ import annotations

import numpy as np

from cgx_tpu.config import ExtractorConfig
from cgx_tpu.preproc.corpus import SourceCorpus, TargetCorpus
from cgx_tpu.types import (Blocks, ContigRules, FastSpeed, GapOnSA, GapRules,
                           LexTask, OneGapEnum, OneGapSearch, Precomp,
                           TwoGapEnum, TwoGapSearch)

X1 = "[X,1]"
X2 = "[X,2]"


def _fsample_score(fs: int) -> np.float32:
    return np.float32(np.log10(np.float64(1 + fs)))


def _finish_aa_bb(rules):
    for r in rules:
        ratio = np.float32(r.paircount) / np.float32(r.fsample)
        r.aa = np.float32(-np.log10(ratio))
        r.bb = np.float32(np.log10(np.float64(1 + r.paircount)))


def _source_name(source: SourceCorpus, blocks: Blocks, bnum: int) -> str:
    ss = int(blocks.string_start[bnum])
    ml = int(blocks.matchlen[bnum])
    return " ".join(source.vocab.id_to_word[int(source.str_[ss + k])]
                    for k in range(ml))


def create_lexicon_contig(contig: ContigRules, source: SourceCorpus,
                          target: TargetCorpus, blocks: Blocks,
                          cfg: ExtractorConfig, tasks: list):
    """createLexiconFast (ExtractPair.c:515-662)."""
    G = len(blocks.start)
    fsample_arr = np.zeros(G, dtype=np.int64)
    for b in contig.blocknumber:
        fsample_arr[int(b)] += 1
    rules: list = []
    index_of: dict = {}  # combine string -> rule index (global hash `lexic`)
    n = len(contig.blocknumber)
    for i in range(n):
        bnum = int(contig.blocknumber[i])
        ss = int(blocks.string_start[bnum])
        ml = int(blocks.matchlen[bnum])
        t0 = int(contig.tar_start[i])
        t1 = t0 + int(contig.tar_end[i])
        tgt = " ".join(target.vocab.id_to_word[int(target.str_[jj])]
                       for jj in range(t0, t1 + 1))
        combine = _source_name(source, blocks, bnum) + " ||| " + tgt
        idx = index_of.get(combine)
        if idx is None:
            index_of[combine] = len(rules)
            src_pat = [int(source.str_[ss + k]) for k in range(ml)]
            tasks.append(LexTask(fast_speed_id=len(rules), source_pattern=src_pat,
                                 target_start=t0, end=int(contig.tar_end[i]),
                                 kind="contig"))
            fs = 1 + int(blocks.end[bnum]) - int(blocks.start[bnum])
            if cfg.is_sample and fs > cfg.sampler:
                fs = cfg.sampler
            rules.append(FastSpeed(
                blocknumber=bnum, lexical=combine, fsample=fs,
                fsample_score=_fsample_score(fs), f=int(fsample_arr[bnum]),
                paircount=1))
        else:
            rules[idx].paircount += 1
    _finish_aa_bb(rules)
    return rules


def _onegap_source(search1: OneGapSearch, enum1: OneGapEnum, one_id: int,
                   source: SourceCorpus):
    """Source string + token ids of distinct 1-gap pattern (aXb form)."""
    pos = int(search1.position[one_id])
    number = int(enum1.number[pos])
    pat = enum1.pattern[pos]
    parts, ids = [], []
    for jj in range(number):
        p = int(pat[jj])
        if p >= 0:
            ids.append(p)
            parts.append(source.vocab.id_to_word[p])
        else:
            parts.append(X1)
    return " ".join(parts), ids


def _gap_target(target: TargetCorpus, ts, te, g1s, g1e, g2s=None, g2e=None):
    """Target-side stringification with [X,1]/[X,2] gap substitution
    (ExtractPair.c:813-837, 1141-1163)."""
    parts = []
    jj = ts
    while jj <= te:
        if g1s <= jj <= g1e:
            parts.append(X1)
            jj = g1e + 1
            continue
        if g2s is not None and g2s <= jj <= g2e:
            parts.append(X2)
            jj = g2e + 1
            continue
        parts.append(target.vocab.id_to_word[int(target.str_[jj])])
        jj += 1
    return " ".join(parts)


def create_lexicon_onegap(rules1: GapRules, source: SourceCorpus,
                          target: TargetCorpus, blocks: Blocks,
                          search1: OneGapSearch, enum1: OneGapEnum,
                          onegap_sa: GapOnSA, pc: Precomp, separator: int,
                          cfg: ExtractorConfig, tasks: list):
    """createLexiconGappyFast (ExtractPair.c:664-936).

    ``rules1`` holds Xab/abX rows [0, separator) then aXb rows; ids already
    converted per segment at read time (Xab=bnum, abX=G+bnum, aXb=2G+oneId)."""
    G = len(blocks.start)
    D1 = len(search1.qrystart)
    fsample_arr = np.zeros(2 * G + D1, dtype=np.int64)
    n = len(rules1.gappy_index)
    for i in range(n):
        gi = int(rules1.gappy_index[i])
        cid = gi if i < separator else 2 * G + gi
        fsample_arr[cid] += 1

    rules: list = []
    dedup: dict = {}
    cur_src = ""
    cur_ids: list = []
    for i in range(n):
        gi = int(rules1.gappy_index[i])
        if i == 0 or gi != int(rules1.gappy_index[i - 1]) or i == separator:
            dedup = {}
            if i < separator:
                if gi < G:
                    cur_src = X1 + " " + _source_name(source, blocks, gi)
                    base = gi
                else:
                    cur_src = _source_name(source, blocks, gi - G) + " " + X1
                    base = gi - G
                ss = int(blocks.string_start[base])
                ml = int(blocks.matchlen[base])
                cur_ids = [int(source.str_[ss + k]) for k in range(ml)]
            else:
                cur_src, cur_ids = _onegap_source(search1, enum1, gi, source)
        cid = gi if i < separator else 2 * G + gi
        ts = int(rules1.ref_str_start[i])
        te = ts + int(rules1.end[i])
        g1s = ts + int(rules1.gap1[i])
        g1e = ts + int(rules1.gap1_1[i])
        tgt = _gap_target(target, ts, te, g1s, g1e)
        key = tgt
        idx = dedup.get(key)
        if idx is None:
            dedup[key] = len(rules)
            tasks.append(LexTask(
                fast_speed_id=len(rules), source_pattern=list(cur_ids),
                target_start=ts, end=int(rules1.end[i]),
                gap1=int(rules1.gap1[i]), gap1_1=int(rules1.gap1_1[i]),
                kind="onegap"))
            if i < separator:
                base = gi if gi < G else gi - G
                fs = 1 + int(blocks.end[base]) - int(blocks.start[base])
            else:
                fs = (1 + int(search1.end_on_salist[gi])
                      - int(search1.start_on_salist[gi]))
                if fs == 1 and int(onegap_sa.length[int(search1.start_on_salist[gi])]) == 0:
                    pci = int(onegap_sa.str_position[int(search1.start_on_salist[gi])])
                    fs = (1 - int(pc.index_start[pci]) + int(pc.index_end[pci])
                          + int(pc.feature_missing[pci]))
            if cfg.is_sample and fs > cfg.sampler:
                fs = cfg.sampler
            rules.append(FastSpeed(
                blocknumber=cid, lexical=cur_src + " ||| " + tgt, fsample=fs,
                fsample_score=_fsample_score(fs), f=int(fsample_arr[cid]),
                paircount=1))
        else:
            rules[idx].paircount += 1
    _finish_aa_bb(rules)
    return rules


def create_lexicon_twogap(rules2: GapRules, source: SourceCorpus,
                          target: TargetCorpus, blocks: Blocks,
                          search1: OneGapSearch, enum1: OneGapEnum,
                          search2: TwoGapSearch, enum2: TwoGapEnum,
                          onegap_sa: GapOnSA, pc: Precomp,
                          sep1: int, sep2: int,
                          cfg: ExtractorConfig, tasks: list):
    """createLexiconTwoGapFast (ExtractPair.c:939-1276).

    Segments of ``rules2``: [0,sep1) XabX by bnum; [sep1,sep2) aXbXc by twoId;
    [sep2,n) XaXb (oneId) / aXbX (D1+oneId)."""
    G = len(blocks.start)
    D1 = len(search1.qrystart)
    D2 = len(search2.blockid)
    fsample_arr = np.zeros(G + 2 * D1 + D2, dtype=np.int64)
    n = len(rules2.gappy_index)

    def converted(i: int) -> int:
        gi = int(rules2.gappy_index[i])
        if i < sep1:
            return gi
        if i < sep2:
            return G + gi
        return G + D2 + gi

    for i in range(n):
        fsample_arr[converted(i)] += 1

    rules: list = []
    dedup: dict = {}
    cur_src = ""
    cur_ids: list = []
    for i in range(n):
        gi = int(rules2.gappy_index[i])
        if (i == 0 or gi != int(rules2.gappy_index[i - 1])
                or i == sep1 or i == sep2):
            dedup = {}
            cur_ids = []
            if i < sep1:  # XabX
                cur_src = X1 + " " + _source_name(source, blocks, gi) + " " + X2
                ss = int(blocks.string_start[gi])
                ml = int(blocks.matchlen[gi])
                cur_ids = [int(source.str_[ss + k]) for k in range(ml)]
            elif i < sep2:  # aXbXc
                one_id = int(search2.blockid[gi])
                s, ids = _onegap_source(search1, enum1, one_id, source)
                cur_ids = list(ids)
                pos2 = int(search2.position[gi])
                num2 = int(enum2.number[pos2])
                tail = []
                for jj in range(num2):
                    p = int(enum2.pattern[pos2][jj])
                    cur_ids.append(p)
                    tail.append(source.vocab.id_to_word[p])
                cur_src = s + " " + X2 + " " + " ".join(tail)
            else:  # XaXb / aXbX
                if gi >= D1:
                    one_id = gi - D1
                    xaxb = False
                else:
                    one_id = gi
                    xaxb = True
                pos = int(search1.position[one_id])
                number = int(enum1.number[pos])
                pat = enum1.pattern[pos]
                parts = [X1] if xaxb else []
                for jj in range(number):
                    p = int(pat[jj])
                    if p >= 0:
                        cur_ids.append(p)
                        parts.append(source.vocab.id_to_word[p])
                    else:
                        parts.append(X2 if xaxb else X1)
                if not xaxb:
                    parts.append(X2)
                cur_src = " ".join(parts)
        cid = converted(i)
        ts = int(rules2.ref_str_start[i])
        te = ts + int(rules2.end[i])
        g1s = ts + int(rules2.gap1[i])
        g1e = ts + int(rules2.gap1_1[i])
        g2s = ts + int(rules2.gap2[i])
        g2e = ts + int(rules2.gap2_1[i])
        tgt = _gap_target(target, ts, te, g1s, g1e, g2s, g2e)
        idx = dedup.get(tgt)
        if idx is None:
            dedup[tgt] = len(rules)
            tasks.append(LexTask(
                fast_speed_id=len(rules), source_pattern=list(cur_ids),
                target_start=ts, end=int(rules2.end[i]),
                gap1=int(rules2.gap1[i]), gap1_1=int(rules2.gap1_1[i]),
                gap2=int(rules2.gap2[i]), gap2_1=int(rules2.gap2_1[i]),
                kind="twogap"))
            if i < sep1:
                fs = 1 + int(blocks.end[gi]) - int(blocks.start[gi])
            elif i < sep2:
                fs = (1 + int(search2.end_on_salist[gi])
                      - int(search2.start_on_salist[gi]))
            else:
                rid = gi - D1 if gi >= D1 else gi
                fs = (1 + int(search1.end_on_salist[rid])
                      - int(search1.start_on_salist[rid]))
                if fs == 1 and int(onegap_sa.length[int(search1.start_on_salist[rid])]) == 0:
                    pci = int(onegap_sa.str_position[int(search1.start_on_salist[rid])])
                    fs = (1 - int(pc.index_start[pci]) + int(pc.index_end[pci])
                          + int(pc.feature_missing[pci]))
            if cfg.is_sample and fs > cfg.sampler:
                fs = cfg.sampler
            rules.append(FastSpeed(
                blocknumber=cid, lexical=cur_src + " ||| " + tgt, fsample=fs,
                fsample_score=_fsample_score(fs), f=int(fsample_arr[cid]),
                paircount=1))
        else:
            rules[idx].paircount += 1
    _finish_aa_bb(rules)
    return rules


def updown_index(rules, total_ids: int) -> np.ndarray:
    """First/last rule index per id (globalOnPairsUpDown*, ExtractPair.cu:3743-3756);
    [:, 0] = down (first), [:, 1] = up (last); -1 when absent."""
    out = np.full((total_ids, 2), -1, dtype=np.int64)
    for i, r in enumerate(rules):
        b = r.blocknumber
        if out[b, 0] == -1:
            out[b, 0] = i
        out[b, 1] = i
    return out


# ---------------------------------------------------------------------------
# Vectorized lexicon build (production path).
#
# Same observable semantics as the create_lexicon_* loops above (the oracle spec):
# dedup is by the rendered rule string, which is equivalent to a numeric key of the
# target token sequence with each gap span collapsed to a single marker (-1 for
# [X,1], -3 for [X,2]) plus the converted rule id (group boundaries are id
# boundaries).  Counts/fsample/feature plumbing identical; strings are built only
# for distinct rules.  tests/test_fast_host.py enforces equality with the slow spec.
# ---------------------------------------------------------------------------

KEYW = 16  # max rendered target symbols (span < max_rule_span)


def _target_key_rows(tgt_str, ts, te, g1s=None, g1e=None, g2s=None, g2e=None):
    """[n, KEYW] numeric rendering keys; gaps collapse to one marker."""
    n = len(ts)
    i32 = np.int32
    ts = ts.astype(i32)
    te = te.astype(i32)
    pos = ts[:, None] + np.arange(KEYW, dtype=i32)[None, :]
    emit = pos <= te[:, None]
    tok = tgt_str.astype(i32)[np.clip(pos, 0, len(tgt_str) - 1)]
    out_idx = pos - ts[:, None]
    for gs, ge, marker in ((g1s, g1e, -1), (g2s, g2e, -3)):
        if gs is None:
            continue
        gs = gs.astype(i32)[:, None]
        ge = ge.astype(i32)[:, None]
        ing = (pos >= gs) & (pos <= ge)
        np.copyto(tok, i32(marker), where=ing)
        emit &= ~ing | (pos == gs)
        out_idx -= np.where(pos > ge, ge - gs, i32(0))
    key = np.full((n, KEYW + 1), -2, dtype=i32)
    oi = np.where(emit, np.minimum(out_idx, KEYW - 1), KEYW).astype(np.int64)
    np.put_along_axis(key, oi, np.where(emit, tok, i32(-2)), axis=1)
    return key[:, :KEYW]


def _dedup(cid, key_rows):
    """Group+dedup by (cid, key); returns (uniq_first_idx sorted by appearance,
    inverse mapping instance->distinct, counts)."""
    full = np.concatenate([cid[:, None], key_rows], axis=1)
    _, first, inv, counts = np.unique(full, axis=0, return_index=True,
                                      return_inverse=True, return_counts=True)
    order = np.argsort(first, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    return first[order], rank[inv.ravel()], counts[order]


def _render_target(target: TargetCorpus, key_row) -> str:
    parts = []
    for v in key_row:
        if v == -2:
            break
        if v == -1:
            parts.append(X1)
        elif v == -3:
            parts.append(X2)
        else:
            parts.append(target.vocab.id_to_word[int(v)])
    return " ".join(parts)


def _finalize_fast(cids, first_idx, counts, fsample_arr, fsample_of, lex_of,
                   task_of, cfg, tasks, kind):
    rules = []
    for d in range(len(first_idx)):
        i = int(first_idx[d])
        cid = int(cids[i])
        fs = fsample_of(i, cid)
        if cfg.is_sample and fs > cfg.sampler:
            fs = cfg.sampler
        tasks.append(task_of(i, d))
        rules.append(FastSpeed(
            blocknumber=cid, lexical=lex_of(i), fsample=fs,
            fsample_score=_fsample_score(fs), f=int(fsample_arr[cid]),
            paircount=int(counts[d])))
    _finish_aa_bb(rules)
    return rules


def fast_create_lexicon_contig(contig: ContigRules, source: SourceCorpus,
                               target: TargetCorpus, blocks: Blocks,
                               cfg: ExtractorConfig, tasks: list):
    """Vectorized createLexiconFast (ExtractPair.c:515-662)."""
    G = len(blocks.start)
    n = len(contig.blocknumber)
    if n == 0:
        return []
    cid = contig.blocknumber.astype(np.int64)
    fsample_arr = np.bincount(cid, minlength=G)
    ts = contig.tar_start.astype(np.int64)
    te = ts + contig.tar_end.astype(np.int64)
    keys = _target_key_rows(np.asarray(target.str_), ts, te)
    first_idx, inv, counts = _dedup(cid, keys)
    src_names = {}

    def lex_of(i):
        b = int(cid[i])
        if b not in src_names:
            src_names[b] = _source_name(source, blocks, b)
        return (src_names[b] + " ||| "
                + _render_target(target, keys[i]))

    def fsample_of(i, c):
        return 1 + int(blocks.end[c]) - int(blocks.start[c])

    def task_of(i, d):
        b = int(cid[i])
        ss = int(blocks.string_start[b])
        ml = int(blocks.matchlen[b])
        return LexTask(fast_speed_id=d,
                       source_pattern=[int(source.str_[ss + k]) for k in range(ml)],
                       target_start=int(ts[i]), end=int(contig.tar_end[i]),
                       kind="contig")

    return _finalize_fast(cid, first_idx, counts, fsample_arr, fsample_of,
                          lex_of, task_of, cfg, tasks, "contig")


def fast_create_lexicon_onegap(rules1: GapRules, source: SourceCorpus,
                               target: TargetCorpus, blocks: Blocks,
                               search1: OneGapSearch, enum1: OneGapEnum,
                               onegap_sa: GapOnSA, pc: Precomp, separator: int,
                               cfg: ExtractorConfig, tasks: list):
    """Vectorized createLexiconGappyFast (ExtractPair.c:664-936)."""
    G = len(blocks.start)
    D1 = len(search1.qrystart)
    n = len(rules1.gappy_index)
    if n == 0:
        return []
    gi = rules1.gappy_index.astype(np.int64)
    seg2 = np.arange(n) >= separator
    cid = np.where(seg2, 2 * G + gi, gi)
    fsample_arr = np.bincount(cid, minlength=2 * G + D1)
    ts = rules1.ref_str_start.astype(np.int64)
    te = ts + rules1.end.astype(np.int64)
    g1s = ts + rules1.gap1.astype(np.int64)
    g1e = ts + rules1.gap1_1.astype(np.int64)
    keys = _target_key_rows(np.asarray(target.str_), ts, te, g1s, g1e)
    first_idx, inv, counts = _dedup(cid, keys)
    src_cache = {}

    def src_of(i):
        c = int(cid[i])
        if c not in src_cache:
            if not seg2[i]:
                if c < G:
                    src_cache[c] = (X1 + " " + _source_name(source, blocks, c),
                                    _block_ids(source, blocks, c))
                else:
                    src_cache[c] = (_source_name(source, blocks, c - G) + " " + X1,
                                    _block_ids(source, blocks, c - G))
            else:
                s, ids = _onegap_source(search1, enum1, int(gi[i]), source)
                src_cache[c] = (s, ids)
        return src_cache[c]

    def lex_of(i):
        return src_of(i)[0] + " ||| " + _render_target(target, keys[i])

    def fsample_of(i, c):
        if not seg2[i]:
            base = c if c < G else c - G
            return 1 + int(blocks.end[base]) - int(blocks.start[base])
        oid = int(gi[i])
        fs = 1 + int(search1.end_on_salist[oid]) - int(search1.start_on_salist[oid])
        if fs == 1 and int(onegap_sa.length[int(search1.start_on_salist[oid])]) == 0:
            pci = int(onegap_sa.str_position[int(search1.start_on_salist[oid])])
            fs = (1 - int(pc.index_start[pci]) + int(pc.index_end[pci])
                  + int(pc.feature_missing[pci]))
        return fs

    def task_of(i, d):
        return LexTask(fast_speed_id=d, source_pattern=list(src_of(i)[1]),
                       target_start=int(ts[i]), end=int(rules1.end[i]),
                       gap1=int(rules1.gap1[i]), gap1_1=int(rules1.gap1_1[i]),
                       kind="onegap")

    return _finalize_fast(cid, first_idx, counts, fsample_arr, fsample_of,
                          lex_of, task_of, cfg, tasks, "onegap")


def _block_ids(source, blocks, b):
    ss = int(blocks.string_start[b])
    ml = int(blocks.matchlen[b])
    return [int(source.str_[ss + k]) for k in range(ml)]


def fast_create_lexicon_twogap(rules2: GapRules, source: SourceCorpus,
                               target: TargetCorpus, blocks: Blocks,
                               search1: OneGapSearch, enum1: OneGapEnum,
                               search2: TwoGapSearch, enum2: TwoGapEnum,
                               onegap_sa: GapOnSA, pc: Precomp,
                               sep1: int, sep2: int,
                               cfg: ExtractorConfig, tasks: list):
    """Vectorized createLexiconTwoGapFast (ExtractPair.c:939-1276)."""
    G = len(blocks.start)
    D1 = len(search1.qrystart)
    D2 = len(search2.blockid)
    n = len(rules2.gappy_index)
    if n == 0:
        return []
    gi = rules2.gappy_index.astype(np.int64)
    idx = np.arange(n)
    cid = np.where(idx < sep1, gi,
                   np.where(idx < sep2, G + gi, G + D2 + gi))
    fsample_arr = np.bincount(cid, minlength=G + 2 * D1 + D2)
    ts = rules2.ref_str_start.astype(np.int64)
    te = ts + rules2.end.astype(np.int64)
    g1s = ts + rules2.gap1.astype(np.int64)
    g1e = ts + rules2.gap1_1.astype(np.int64)
    g2s = ts + rules2.gap2.astype(np.int64)
    g2e = ts + rules2.gap2_1.astype(np.int64)
    keys = _target_key_rows(np.asarray(target.str_), ts, te, g1s, g1e, g2s, g2e)
    first_idx, inv, counts = _dedup(cid, keys)
    src_cache = {}

    def src_of(i):
        c = int(cid[i])
        if c in src_cache:
            return src_cache[c]
        g = int(gi[i])
        if i < sep1:  # XabX
            s = X1 + " " + _source_name(source, blocks, g) + " " + X2
            ids = _block_ids(source, blocks, g)
        elif i < sep2:  # aXbXc
            one_id = int(search2.blockid[g])
            s0, ids = _onegap_source(search1, enum1, one_id, source)
            ids = list(ids)
            pos2 = int(search2.position[g])
            num2 = int(enum2.number[pos2])
            tail = []
            for jj in range(num2):
                pv = int(enum2.pattern[pos2][jj])
                ids.append(pv)
                tail.append(source.vocab.id_to_word[pv])
            s = s0 + " " + X2 + " " + " ".join(tail)
        else:  # XaXb / aXbX
            xaxb = g < D1
            one_id = g if xaxb else g - D1
            pos = int(search1.position[one_id])
            number = int(enum1.number[pos])
            pat = enum1.pattern[pos]
            parts = [X1] if xaxb else []
            ids = []
            for jj in range(number):
                pv = int(pat[jj])
                if pv >= 0:
                    ids.append(pv)
                    parts.append(source.vocab.id_to_word[pv])
                else:
                    parts.append(X2 if xaxb else X1)
            if not xaxb:
                parts.append(X2)
            s = " ".join(parts)
        src_cache[c] = (s, ids)
        return src_cache[c]

    def lex_of(i):
        return src_of(i)[0] + " ||| " + _render_target(target, keys[i])

    def fsample_of(i, c):
        g = int(gi[i])
        if i < sep1:
            return 1 + int(blocks.end[g]) - int(blocks.start[g])
        if i < sep2:
            return (1 + int(search2.end_on_salist[g])
                    - int(search2.start_on_salist[g]))
        rid = g - D1 if g >= D1 else g
        fs = 1 + int(search1.end_on_salist[rid]) - int(search1.start_on_salist[rid])
        if fs == 1 and int(onegap_sa.length[int(search1.start_on_salist[rid])]) == 0:
            pci = int(onegap_sa.str_position[int(search1.start_on_salist[rid])])
            fs = (1 - int(pc.index_start[pci]) + int(pc.index_end[pci])
                  + int(pc.feature_missing[pci]))
        return fs

    def task_of(i, d):
        return LexTask(fast_speed_id=d, source_pattern=list(src_of(i)[1]),
                       target_start=int(ts[i]), end=int(rules2.end[i]),
                       gap1=int(rules2.gap1[i]), gap1_1=int(rules2.gap1_1[i]),
                       gap2=int(rules2.gap2[i]), gap2_1=int(rules2.gap2_1[i]),
                       kind="twogap")

    return _finalize_fast(cid, first_idx, counts, fsample_arr, fsample_of,
                          lex_of, task_of, cfg, tasks, "twogap")
