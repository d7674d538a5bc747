"""TPU MaxLex feature scoring.

Split of lexicalTaskMaxEF (ExtractPair.cu:2144-2432): the heavy part — per-rule
max-probability selection over (source word x target word) pairs via binary search of
the sorted lexical table (searchLexFile, ExtractPair.cu:2108-2142) — runs on device
as batched ``searchsorted`` over packed (src, tgt) int64 keys; the cheap
``-log10``-accumulation runs on the host in float32 with the exact sequential
rounding order of the reference (term-by-term ``+=`` in f32), so features are
bit-identical to the oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cgx_tpu.config import ExtractorConfig
from cgx_tpu.utils.batching import chunked_batch, pad_items

TPOSW = 16   # target span width (end offset < max_rule_span)
SRCW = 5     # max source words (MAX_rule_symbols)


def _lookup(lex_key, lex_val, s, t):
    # must match container.pack_lex_key exactly
    key = (s.astype(jnp.int64) << 32) | (t.astype(jnp.int64) + 2**31)
    i = jnp.searchsorted(lex_key, key)
    ic = jnp.clip(i, 0, lex_key.shape[0] - 1)
    found = (i < lex_key.shape[0]) & (lex_key[ic] == key)
    return jnp.where(found, lex_val[ic], jnp.float32(0))


def _task_best(lex_key, lex_val1, lex_val2, tgt_str,
               src_pat, t0, tend, g1, g11, g2, g21):
    pos = t0 + jnp.arange(TPOSW, dtype=jnp.int32)
    inside = pos <= t0 + tend
    out1 = (g1 < 0) | (pos < t0 + g1) | (pos > t0 + g11)
    out2 = (g2 < 0) | (pos < t0 + g2) | (pos > t0 + g21)
    tmask = inside & out1 & out2
    ttok = tgt_str[jnp.clip(pos, 0, tgt_str.shape[0] - 1)]
    any_t = jnp.any(tmask)

    s2 = jnp.broadcast_to(src_pat[:, None], (SRCW, TPOSW))
    t2 = jnp.broadcast_to(ttok[None, :], (SRCW, TPOSW))
    v2 = _lookup(lex_key, lex_val2, s2, t2)          # P(t|s)-side for FgivenE
    v1 = _lookup(lex_key, lex_val1, s2, t2)          # P(s|t)-side for EgivenF
    v2null = _lookup(lex_key, lex_val2, src_pat,
                     jnp.full((SRCW,), -1, jnp.int32))
    v1null = _lookup(lex_key, lex_val1, jnp.full((TPOSW,), -1, jnp.int32), ttok)

    fge_best = jnp.max(jnp.where(tmask[None, :], v2, 0.0), axis=1)
    fge_best = jnp.where(any_t, jnp.maximum(fge_best, v2null), fge_best)
    src_valid = src_pat >= -1  # padded entries are -99
    egf_best = jnp.max(jnp.where(src_valid[:, None], v1, 0.0), axis=0)
    egf_best = jnp.maximum(egf_best, v1null)
    return fge_best, egf_best, tmask


@jax.jit
def _maxlex_batch(lex_key, lex_val1, lex_val2, tgt_str, src_pat, t0, tend,
                  g1, g11, g2, g21):
    f = functools.partial(_task_best, lex_key, lex_val1, lex_val2, tgt_str)
    return jax.vmap(f)(src_pat, t0, tend, g1, g11, g2, g21)


def compute_maxlex_tpu(task_arrays: dict, index, rules_one, rules_two,
                       rules_contig, cfg: ExtractorConfig):
    """Scores the families' TaskArrays on device, accumulates on host, scatters
    into the rules (row d of a family's TaskArrays is its distinct rule d)."""
    by_kind = {"onegap": rules_one, "twogap": rules_two, "contig": rules_contig}
    kinds = [k for k in ("onegap", "twogap", "contig")
             if len(task_arrays[k].t0)]
    if not kinds:
        return
    src_pat = np.concatenate([task_arrays[k].src_pat for k in kinds])
    t0 = np.concatenate([task_arrays[k].t0 for k in kinds])
    tend = np.concatenate([task_arrays[k].tend for k in kinds])
    g1 = np.concatenate([task_arrays[k].g1 for k in kinds])
    g11 = np.concatenate([task_arrays[k].g11 for k in kinds])
    g2 = np.concatenate([task_arrays[k].g2 for k in kinds])
    g21 = np.concatenate([task_arrays[k].g21 for k in kinds])
    T = len(t0)
    nsrc = (src_pat != -99).sum(axis=1).astype(np.int32)

    # int64 packed keys need x64 mode (off by default); scope it to this batch
    with jax.enable_x64(True):
        fge_best, egf_best, tmask = chunked_batch(
            lambda *a: _maxlex_batch(
                jnp.asarray(index.lex_key), index.lex_val1, index.lex_val2,
                index.tgt_str, *(jnp.asarray(x) for x in a)),
            [src_pat, t0, tend, g1, g11, g2, g21])

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
        rules = by_kind[k]
        for d, r in enumerate(rules):
            r.max_lex_fge = fge[off + d]
            r.max_lex_egf = egf[off + d]
        off += len(rules)
