"""MaxLex feature scoring.

Transcription of lexicalTaskMaxEF (ExtractPair.cu:2144-2432): per distinct rule,
the max lexical probability per source word over the rule's (non-gap) target words
plus NULL, and vice versa, via binary search of the sorted lexical table
(searchLexFile, ExtractPair.cu:2108-2142); the ``-log10`` accumulation keeps the
reference's exact sequential float32 rounding order, so features are bit-identical
to the oracle.

The probe set is T rules x 5 source words x 16 target positions of int64 keys
against a sorted table — a few MB of batched ``np.searchsorted``, far below the
cost of a device dispatch, so this stage runs vectorized on the host (the one
reference kernel whose arithmetic density never justifies the chip; everything
around it stays on device).
"""

from __future__ import annotations

import numpy as np

from cgx_tpu.config import ExtractorConfig
from cgx_tpu.index.container import pack_lex_key

TPOSW = 16   # target span width (end offset < max_rule_span)
SRCW = 5     # max source words (MAX_rule_symbols)


def _lookup(lex_key, lex_val, keys):
    """Batched searchLexFile: value at key or 0.0 (ExtractPair.cu:2108-2142)."""
    i = np.searchsorted(lex_key, keys)
    ic = np.minimum(i, len(lex_key) - 1)
    found = (i < len(lex_key)) & (lex_key[ic] == keys)
    return np.where(found, lex_val[ic], np.float32(0)).astype(np.float32)


DENSE_LIMIT = 1 << 26  # max dense-matrix entries (256 MB of float32)


def _make_lookup(lex_key, lex_vals):
    """Probe function (val_index, keys) -> float32 values.

    When the (src, tgt) id space is small enough, the sorted-table binary
    search collapses to direct indexing into dense per-direction probability
    matrices (identical values: first table row wins on duplicate pairs, like
    searchsorted); otherwise falls back to batched searchsorted."""
    n = len(lex_key)
    if n:
        src = (lex_key >> 32).astype(np.int64)
        tgt = (lex_key & 0xFFFFFFFF).astype(np.int64) - 2**31
        si = src + 1
        ti = tgt + 1
        ns = int(si.max()) + 1
        nt = int(ti.max()) + 1
        if ns * nt <= DENSE_LIMIT:
            mats = []
            for v in lex_vals:
                M = np.zeros((ns, nt), dtype=np.float32)
                M[si[::-1], ti[::-1]] = np.asarray(v, np.float32)[::-1]
                mats.append(M)

            def lk(vi, keys):
                s = (keys >> 32) + 1
                t = (keys & 0xFFFFFFFF) - 2**31 + 1
                ok = (s >= 0) & (s < ns) & (t >= 0) & (t < nt)
                return np.where(
                    ok, mats[vi][np.clip(s, 0, ns - 1),
                                 np.clip(t, 0, nt - 1)],
                    np.float32(0)).astype(np.float32)
            return lk

    def lk(vi, keys):
        return _lookup(lex_key, lex_vals[vi], keys)
    return lk


def compute_maxlex_tpu(task_arrays: dict, index, rules_one, rules_two,
                       rules_contig, cfg: ExtractorConfig):
    """Scores the families' TaskArrays, accumulates in reference float32 order,
    scatters into the rules (row d of a family's TaskArrays is its distinct
    rule d)."""
    by_kind = {"onegap": rules_one, "twogap": rules_two, "contig": rules_contig}
    kinds = [k for k in ("onegap", "twogap", "contig")
             if len(task_arrays[k].t0)]
    if not kinds:
        return
    src_pat = np.concatenate([task_arrays[k].src_pat for k in kinds])
    t0 = np.concatenate([task_arrays[k].t0 for k in kinds]).astype(np.int64)
    tend = np.concatenate([task_arrays[k].tend for k in kinds]).astype(np.int64)
    g1 = np.concatenate([task_arrays[k].g1 for k in kinds]).astype(np.int64)
    g11 = np.concatenate([task_arrays[k].g11 for k in kinds]).astype(np.int64)
    g2 = np.concatenate([task_arrays[k].g2 for k in kinds]).astype(np.int64)
    g21 = np.concatenate([task_arrays[k].g21 for k in kinds]).astype(np.int64)
    T = len(t0)
    nsrc = (src_pat != -99).sum(axis=1).astype(np.int64)

    tgt_str = index.tgt_str_host
    lex_key = index.lex_key
    lex_val1 = index.lex_val1_host
    lex_val2 = index.lex_val2_host

    pos = t0[:, None] + np.arange(TPOSW, dtype=np.int64)[None, :]
    inside = pos <= (t0 + tend)[:, None]
    out1 = (g1 < 0)[:, None] | (pos < (t0 + g1)[:, None]) | \
        (pos > (t0 + g11)[:, None])
    out2 = (g2 < 0)[:, None] | (pos < (t0 + g2)[:, None]) | \
        (pos > (t0 + g21)[:, None])
    tmask = inside & out1 & out2
    ttok = tgt_str[np.clip(pos, 0, len(tgt_str) - 1)].astype(np.int64)
    any_t = tmask.any(axis=1)

    sp = src_pat.astype(np.int64)
    keys = pack_lex_key(sp[:, :, None], ttok[:, None, :])        # [T, 5, 16]
    lk = _make_lookup(lex_key, (lex_val1, lex_val2))
    v2 = lk(1, keys)                                             # P(t|s) side
    v1 = lk(0, keys)                                             # P(s|t) side
    v2null = lk(1, pack_lex_key(sp, np.full_like(sp, -1)))       # [T, 5]
    v1null = lk(0, pack_lex_key(np.full_like(ttok, -1), ttok))   # [T, 16]

    fge_best = np.max(np.where(tmask[:, None, :], v2, np.float32(0)), axis=2)
    fge_best = np.where(any_t[:, None], np.maximum(fge_best, v2null), fge_best)
    src_valid = src_pat >= -1  # padded entries are -99
    egf_best = np.max(np.where(src_valid[:, :, None], v1, np.float32(0)),
                      axis=1)
    egf_best = np.maximum(egf_best, v1null)

    maxscore = np.float32(cfg.max_score)
    fge = np.zeros(T, dtype=np.float32)
    with np.errstate(divide="ignore"):
        for j in range(SRCW):
            m = j < nsrc
            best = fge_best[:, j]
            term = np.where(best > 0,
                            (-np.log10(np.where(best > 0, best, 1.0))
                             ).astype(np.float32), maxscore)
            fge = np.where(m, (fge + term).astype(np.float32), fge)
        egf = np.zeros(T, dtype=np.float32)
        for p in range(TPOSW):
            m = tmask[:, p]
            best = egf_best[:, p]
            term = np.where(best > 0,
                            (-np.log10(np.where(best > 0, best, 1.0))
                             ).astype(np.float32), maxscore)
            egf = np.where(m, (egf + term).astype(np.float32), egf)

    off = 0
    for k in kinds:
        rules = by_kind[k]  # RuleTable; row d of a family's tasks = rule d
        nk = len(rules)
        rules.max_lex_fge[:] = fge[off:off + nk]
        rules.max_lex_egf[:] = egf[off:off + nk]
        off += nk
