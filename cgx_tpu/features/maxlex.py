"""MaxLex feature scoring.

Transcription of lexicalTaskMaxEF (ExtractPair.cu:2144-2432): per distinct rule,
the max lexical probability per source word over the rule's (non-gap) target words
plus NULL, and vice versa, via binary search of the sorted lexical table
(searchLexFile, ExtractPair.cu:2108-2142); the ``-log10`` accumulation keeps the
reference's exact sequential float32 rounding order, so features are bit-identical
to the oracle.

Two probe backends produce the per-rule best-probability tables (bit-equal float32
values either way — gathers and maxes are exact):

* **device** (default when the index is device-resident and the batch is large):
  the probe set — T rules x 5 source words x 16 target positions against the
  sorted table — runs on the chip as a 32-step branchless lexicographic binary
  search over resident int32 (src, tgt) columns; only the [T,5]+[T,16] float32
  best tables come back.  On a few-core host the equivalent numpy pass is memory-
  bound (~1 GB of temporaries at T~10^5), so the chip wins well before that scale.
* **host** (CPU fallback / sharded-index mode / small batches): dense per-direction
  probability matrices indexed directly when the (src, tgt) id space is small,
  batched ``np.searchsorted`` over packed int64 keys otherwise.

The ``-log10`` accumulation (the only order-sensitive float32 arithmetic) always
runs on the host in the reference's sequential order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cgx_tpu.config import ExtractorConfig
from cgx_tpu.index.container import pack_lex_key

TPOSW = 16   # target span width (end offset < max_rule_span)
SRCW = 5     # max source words (MAX_rule_symbols)

# below this many rules the dispatch round trip beats the host numpy pass
DEVICE_MIN_T = 4096


def _lookup(lex_key, lex_val, keys):
    """Batched searchLexFile: value at key or 0.0 (ExtractPair.cu:2108-2142)."""
    i = np.searchsorted(lex_key, keys)
    ic = np.minimum(i, len(lex_key) - 1)
    found = (i < len(lex_key)) & (lex_key[ic] == keys)
    return np.where(found, lex_val[ic], np.float32(0)).astype(np.float32)


DENSE_LIMIT = 1 << 26  # max dense-matrix entries (256 MB of float32)


def _probe_bests_host(lex_key, lex_val1, lex_val2, src_pat, ttok, tmask,
                      any_t):
    """(fge_best [T,SRCW], egf_best [T,TPOSW]) on the host.

    Dense path: direct int32 row/column indexing into per-direction probability
    matrices — no packed int64 key temporaries (at T~10^5 the key pack plus its
    unpacks cost ~3x the gather itself on a memory-bound host).  Identical
    values: first table row wins on duplicate pairs, like searchsorted."""
    n = len(lex_key)
    dense = False
    if n:
        src = (lex_key >> 32).astype(np.int64)
        tgt = (lex_key & 0xFFFFFFFF).astype(np.int64) - 2**31
        si_t = src + 1
        ti_t = tgt + 1
        ns = int(si_t.max()) + 1
        nt = int(ti_t.max()) + 1
        dense = ns * nt <= DENSE_LIMIT
    if dense:
        M1 = np.zeros((ns, nt), dtype=np.float32)
        M2 = np.zeros((ns, nt), dtype=np.float32)
        M1[si_t[::-1], ti_t[::-1]] = np.asarray(lex_val1, np.float32)[::-1]
        M2[si_t[::-1], ti_t[::-1]] = np.asarray(lex_val2, np.float32)[::-1]
        si = src_pat.astype(np.int32) + 1                       # [T, 5]
        ti = ttok.astype(np.int32) + 1                          # [T, 16]
        oks = (si >= 0) & (si < ns)                             # src id known
        okt = (ti >= 0) & (ti < nt)
        sic = np.where(oks, si, 0)
        tic = np.where(okt, ti, 0)
        okb = oks[:, :, None] & okt[:, None, :]
        z = np.float32(0)
        v2 = np.where(okb, M2[sic[:, :, None], tic[:, None, :]], z)
        fge_best = np.max(np.where(tmask[:, None, :], v2, z), axis=2)
        v2null = np.where(oks, M2[sic, 0], z)                   # tgt NULL = col 0
        fge_best = np.where(any_t[:, None], np.maximum(fge_best, v2null),
                            fge_best)
        v1 = np.where(okb, M1[sic[:, :, None], tic[:, None, :]], z)
        egf_best = np.max(np.where(oks[:, :, None], v1, z), axis=1)
        v1null = np.where(okt, M1[0, tic], z)                   # src NULL = row 0
        egf_best = np.maximum(egf_best, v1null)
        return fge_best, egf_best

    sp = src_pat.astype(np.int64)
    tt = ttok.astype(np.int64)
    keys = pack_lex_key(sp[:, :, None], tt[:, None, :])         # [T, 5, 16]
    v2 = _lookup(lex_key, lex_val2, keys)                       # P(t|s) side
    v1 = _lookup(lex_key, lex_val1, keys)                       # P(s|t) side
    v2null = _lookup(lex_key, lex_val2, pack_lex_key(sp, np.full_like(sp, -1)))
    v1null = _lookup(lex_key, lex_val1, pack_lex_key(np.full_like(tt, -1), tt))
    fge_best = np.max(np.where(tmask[:, None, :], v2, np.float32(0)), axis=2)
    fge_best = np.where(any_t[:, None], np.maximum(fge_best, v2null), fge_best)
    src_valid = src_pat >= -1  # padded entries are -99
    egf_best = np.max(np.where(src_valid[:, :, None], v1, np.float32(0)),
                      axis=1)
    egf_best = np.maximum(egf_best, v1null)
    return fge_best, egf_best


# ---------------------------------------------------------------------------
# Device probe.  TPU gathers cost ~10ns per gathered WORD regardless of stride
# (no per-lane gather hardware; see tools/pallas_probe.py), so the design goal
# is the fewest gathered words per probe:
#   dense mode  — per-direction [ns, nt] probability matrices resident in HBM,
#                 one 2D gather per probe (2 words over both directions);
#   range mode  — a dense per-src row-range table plus a binary search over the
#                 tgt column only (2 + ~log2(max rows per src) words) when the
#                 id-space square is too large for HBM.
# Gathers and maxes are exact, so the float32 bests are bit-equal to the host
# backends (first table row wins on duplicate pairs in both modes).
# ---------------------------------------------------------------------------

# max dense-matrix entries per direction on device (2 x 512 MB of HBM)
DEV_DENSE_LIMIT = 1 << 27


def _tgt_range_lookup(lt, lv, lo0, hi0, t, steps: int):
    """value at tgt ``t`` within the sorted row range [lo0, hi0) or 0.0."""
    shp = jnp.broadcast_shapes(jnp.shape(lo0), jnp.shape(hi0), jnp.shape(t))
    lo = jnp.broadcast_to(lo0, shp).astype(jnp.int32)
    hi = jnp.broadcast_to(hi0, shp).astype(jnp.int32)
    t = jnp.broadcast_to(t, shp)
    hi_init = hi
    n = lt.shape[0]
    for _ in range(steps):
        mid = (lo + hi) >> 1
        ms = lt[jnp.clip(mid, 0, n - 1)]
        less = ms < t
        sel = lo < hi
        lo = jnp.where(sel & less, mid + 1, lo)
        hi = jnp.where(sel & ~less, mid, hi)
    loc = jnp.clip(lo, 0, n - 1)
    found = (lo < hi_init) & (lt[loc] == t)
    return jnp.where(found, lv[loc], jnp.float32(0))


def _probe_masks(tgt_str, t0, tend, g1, g11, g2, g21):
    pos = t0[:, None] + jnp.arange(TPOSW, dtype=jnp.int32)[None, :]
    ttok = tgt_str[jnp.clip(pos, 0, tgt_str.shape[0] - 1)]
    inside = pos <= (t0 + tend)[:, None]
    out1 = (g1 < 0)[:, None] | (pos < (t0 + g1)[:, None]) | \
        (pos > (t0 + g11)[:, None])
    out2 = (g2 < 0)[:, None] | (pos < (t0 + g2)[:, None]) | \
        (pos > (t0 + g21)[:, None])
    tmask = inside & out1 & out2
    return ttok, tmask, tmask.any(axis=1)


def _bests_from_values(v1, v2, v2null, v1null, sp, tmask, any_t):
    z = jnp.float32(0)
    fge_best = jnp.max(jnp.where(tmask[:, None, :], v2, z), axis=2)
    fge_best = jnp.where(any_t[:, None], jnp.maximum(fge_best, v2null),
                         fge_best)
    src_valid = sp >= -1
    egf_best = jnp.max(jnp.where(src_valid[:, :, None], v1, z), axis=1)
    egf_best = jnp.maximum(egf_best, v1null)
    return fge_best, egf_best


@jax.jit
def _probe_batch_dense(M1, M2, tgt_str, sp, t0, tend, g1, g11, g2, g21):
    ttok, tmask, any_t = _probe_masks(tgt_str, t0, tend, g1, g11, g2, g21)
    ns, nt = M1.shape
    si = sp + 1                                      # [T, 5]; NULL src -> row 0
    ti = ttok + 1                                    # [T, 16]; NULL tgt -> col 0
    oks = (si >= 0) & (si < ns)
    okt = (ti >= 0) & (ti < nt)
    sic = jnp.where(oks, si, 0)
    tic = jnp.where(okt, ti, 0)
    okb = oks[:, :, None] & okt[:, None, :]
    z = jnp.float32(0)
    v2 = jnp.where(okb, M2[sic[:, :, None], tic[:, None, :]], z)
    v1 = jnp.where(okb, M1[sic[:, :, None], tic[:, None, :]], z)
    v2null = jnp.where(oks, M2[sic, 0], z)
    v1null = jnp.where(okt, M1[0, tic], z)
    return _bests_from_values(v1, v2, v2null, v1null, sp, tmask, any_t)


@functools.partial(jax.jit, static_argnames=("steps",))
def _probe_batch_range(rs, re, lt, lv1, lv2, tgt_str, sp, t0, tend, g1, g11,
                       g2, g21, steps):
    ttok, tmask, any_t = _probe_masks(tgt_str, t0, tend, g1, g11, g2, g21)
    ns = rs.shape[0]
    si = sp + 1                                      # [T, 5]
    oks = (si >= 0) & (si < ns)
    sic = jnp.where(oks, si, 0)
    lo = jnp.where(oks, rs[sic], 0)                  # empty range when invalid
    hi = jnp.where(oks, re[sic], 0)
    t3 = ttok[:, None, :]
    v2 = _tgt_range_lookup(lt, lv2, lo[:, :, None], hi[:, :, None], t3, steps)
    v1 = _tgt_range_lookup(lt, lv1, lo[:, :, None], hi[:, :, None], t3, steps)
    nullt = jnp.full_like(sp, -1)
    v2null = _tgt_range_lookup(lt, lv2, lo, hi, nullt, steps)
    # src NULL = id -1 = row-range 0
    lo0 = jnp.broadcast_to(rs[0], ttok.shape)
    hi0 = jnp.broadcast_to(re[0], ttok.shape)
    v1null = _tgt_range_lookup(lt, lv1, lo0, hi0, ttok, steps)
    return _bests_from_values(v1, v2, v2null, v1null, sp, tmask, any_t)


def _device_lex_tables(index):
    """Cached device-resident probe tables: dense [ns, nt] matrices when the
    id-space square fits DEV_DENSE_LIMIT, else a dense per-src row-range table
    over the sorted tgt/value columns."""
    cached = getattr(index, "_maxlex_dev", None)
    if cached is not None:
        return cached
    lex_key = index.lex_key
    src = (lex_key >> 32).astype(np.int64)
    tgt = ((lex_key & 0xFFFFFFFF) - 2**31).astype(np.int64)
    n = len(src)
    ns = int(src.max()) + 2 if n else 1
    nt = int(tgt.max()) + 2 if n else 1
    v1 = np.asarray(index.lex_val1_host, np.float32)
    v2 = np.asarray(index.lex_val2_host, np.float32)
    if ns * nt <= DEV_DENSE_LIMIT:
        M1 = np.zeros((ns, nt), dtype=np.float32)
        M2 = np.zeros((ns, nt), dtype=np.float32)
        M1[src[::-1] + 1, tgt[::-1] + 1] = v1[::-1]  # first row wins
        M2[src[::-1] + 1, tgt[::-1] + 1] = v2[::-1]
        out = ("dense", (jnp.asarray(M1), jnp.asarray(M2)))
    else:
        # per-src row ranges over the (src, tgt)-sorted columns
        rs = np.searchsorted(src + 1, np.arange(ns)).astype(np.int32)
        re = np.searchsorted(src + 1, np.arange(ns) + 1).astype(np.int32)
        max_rows = int((re - rs).max()) if n else 1
        steps = max(int(max_rows).bit_length(), 1)
        out = ("range", (jnp.asarray(rs), jnp.asarray(re),
                         jnp.asarray(tgt.astype(np.int32)),
                         jnp.asarray(v1), jnp.asarray(v2), steps))
    try:
        index._maxlex_dev = out
    except Exception:   # frozen containers: rebuild per call (still cheap)
        pass
    return out


def _probe_bests_device(index, src_pat, t0, tend, g1, g11, g2, g21):
    """Chip probe: uploads the [T]-column task arrays, returns the best tables.
    The target string and lexical table are device-resident."""
    from cgx_tpu.utils.batching import chunked_batch

    mode, tabs = _device_lex_tables(index)
    tgt_dev = index.tgt_str
    cols = [np.ascontiguousarray(src_pat, np.int32)] + [
        np.asarray(a, np.int32) for a in (t0, tend, g1, g11, g2, g21)]
    if mode == "dense":
        M1, M2 = tabs
        fn = lambda *a: _probe_batch_dense(M1, M2, tgt_dev, *a)
    else:
        rs, re, lt, lv1, lv2, steps = tabs
        fn = lambda *a: _probe_batch_range(rs, re, lt, lv1, lv2, tgt_dev, *a,
                                           steps=steps)
    # single-device probe programs (the sharded layout scores on the host
    # lex index, never here) — first-time compiles overlap on the pool
    out = chunked_batch(fn, cols, parallel_compile=True)
    return out[0], out[1]


def compute_maxlex_tpu(task_arrays: dict, index, rules_one, rules_two,
                       rules_contig, cfg: ExtractorConfig,
                       use_device: bool = None):
    """Scores the families' TaskArrays, accumulates in reference float32 order,
    scatters into the rules (row d of a family's TaskArrays is its distinct
    rule d).  ``use_device`` overrides the backend choice (None = device when
    the index is device-resident and the batch is large enough)."""
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

    pos = t0[:, None] + np.arange(TPOSW, dtype=np.int64)[None, :]
    inside = pos <= (t0 + tend)[:, None]
    out1 = (g1 < 0)[:, None] | (pos < (t0 + g1)[:, None]) | \
        (pos > (t0 + g11)[:, None])
    out2 = (g2 < 0)[:, None] | (pos < (t0 + g2)[:, None]) | \
        (pos > (t0 + g21)[:, None])
    tmask = inside & out1 & out2
    any_t = tmask.any(axis=1)

    from cgx_tpu.utils.timing import StageMarks
    mk = StageMarks("maxlex")
    mk.mark("prep")
    if use_device is None:
        use_device = (getattr(index, "tgt_str", None) is not None
                      and T >= DEVICE_MIN_T)
    if use_device:
        fge_best, egf_best = _probe_bests_device(index, src_pat, t0, tend,
                                                 g1, g11, g2, g21)
        mk.mark("probe_dev")
        fge_best = np.asarray(fge_best)
        egf_best = np.asarray(egf_best)
    else:
        ttok = tgt_str[np.clip(pos, 0, len(tgt_str) - 1)].astype(np.int64)
        fge_best, egf_best = _probe_bests_host(
            lex_key, index.lex_val1_host, index.lex_val2_host, src_pat, ttok,
            tmask, any_t)
    mk.mark("probe")

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
    mk.mark("accum")
    mk.done()
