"""TPU gappy-pattern SA lookups.

Vectorized transcription of oneGapLookUpSA (GappyLook.cu:128-473), twoGapLookUpSA
(GappyLook.cu:476-737) and the frequent-pair precompute kernel (GappyLook.cu:740-869).

Instead of the reference's divergent per-thread ``while(flager)`` scans, each work
item (pattern-occurrence) evaluates **all** gap sizes as a static ``MMOV``-wide move
axis: per-move kill conditions are combined with a prefix-AND (``cumprod``) to
reproduce the sequential early-exit semantics exactly, and emissions come back as
dense (valid, fields...) slots.  Canonical ordering (DESIGN.md) is restored on the
host by a stable lexsort on (position, str_position, length[, length2]) — provably
equal to sequential emission order because ties share a work item and are emitted in
ascending move order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cgx_tpu.config import ExtractorConfig
from cgx_tpu.types import GapOnSA, OneGapSearch, Precomp, TwoGapSearch
from cgx_tpu.utils.batching import chunked_batch, pad_items
from cgx_tpu.utils.views import make_views

MMOV = 16  # static move-axis width; real moves bounded by max_rule_span - 2


def _prefix_ok(survive):
    """reach[m] = AND of survive[0..m-1] (sequential early-exit emulation)."""
    c = jnp.cumprod(survive.astype(jnp.int32))
    return jnp.concatenate([jnp.ones((1,), jnp.int32), c[:-1]]) == 1


# ---------------------------------------------------------------------------
# forward / backward aXb occurrence scans (GappyLook.cu:335-470)
# ---------------------------------------------------------------------------

def _fwd_item(refstr, rlp, lr_tar, qtokens, mrs, mgs,
              gostart, sl, el, stok):
    """Forward scan from an occurrence of a: emissions over the move axis.
    Returns (valid[MMOV], length[MMOV]); str_position is gostart."""
    moves = jnp.arange(MMOV, dtype=jnp.int32)
    b_first = qtokens[stok]
    gap0_bad = refstr[gostart + sl] < 2
    pos = gostart + sl + mgs + moves
    # one (MMOV+2)-wide window serves the scan and both tail-verify shifts
    wpos = gostart + sl + mgs + jnp.arange(MMOV + 2, dtype=jnp.int32)
    win = refstr[jnp.minimum(wpos, refstr.shape[0] - 1)]
    temp = win[:MMOV]
    bad = temp < 2
    # span gate for entering iteration m: sl + mgs + m + el <= mrs
    span_ok = sl + mgs + moves + el <= mrs
    # tail verify (b tokens beyond the first; el <= 3 so k in {1, 2})
    verify_ok = jnp.ones(MMOV, dtype=bool)
    verify_kill = jnp.zeros(MMOV, dtype=bool)
    is_b = temp == b_first
    for k in (1, 2):
        need = el > k
        in_span = sl + mgs + moves + 1 + k <= mrs
        bo = win[k:MMOV + k]
        want = qtokens[stok + k]
        match_k = bo == want
        # previous tail tokens all matched => this k is actually compared
        prev_ok = verify_ok
        cmp_here = is_b & need & prev_ok & in_span
        verify_ok = verify_ok & jnp.where(need, in_span & match_k, True)
        verify_kill = verify_kill | (cmp_here & ~match_k & (bo < 2))
    survive = ~bad & ~verify_kill
    reach = _prefix_ok(survive) & span_ok & ~gap0_bad
    cand = reach & ~bad & is_b & verify_ok
    gc = _gap_check_grow(rlp, lr_tar, gostart + sl, mgs - 1, mrs, True)
    valid = cand & gc
    length = sl + mgs + moves + el - 1
    return valid, length


def _bwd_item(refstr, rlp, lr_tar, qtokens, mrs, mgs,
              gostart, sl, el, tok):
    """Backward scan from an occurrence of b (GappyLook.cu:397-470).
    Returns (valid[MMOV], str_position[MMOV], length[MMOV])."""
    moves = jnp.arange(MMOV, dtype=jnp.int32)
    a_last = qtokens[tok + sl - 1]
    gap0_bad = refstr[jnp.maximum(gostart - 1, 0)] < 2
    pos = gostart - 1 - mgs - moves
    # one reversed (MMOV+2)-wide window serves the scan and both verify shifts
    wpos = gostart - 1 - mgs - jnp.arange(MMOV + 2, dtype=jnp.int32)
    win = jnp.where(wpos < 0, jnp.int32(-1),
                    refstr[jnp.maximum(wpos, 0)])
    temp = win[:MMOV]
    bad = temp < 2
    span_ok = sl + mgs + moves + el <= mrs
    verify_ok = jnp.ones(MMOV, dtype=bool)
    verify_kill = jnp.zeros(MMOV, dtype=bool)
    is_a = temp == a_last
    for k in (1, 2):
        need = sl > k
        in_span = el + mgs + moves + 1 + k <= mrs
        bo = win[k:MMOV + k]
        want = qtokens[tok + jnp.maximum(sl - 1 - k, 0)]
        match_k = bo == want
        prev_ok = verify_ok
        cmp_here = is_a & need & prev_ok & in_span
        verify_ok = verify_ok & jnp.where(need, in_span & match_k, True)
        verify_kill = verify_kill | (cmp_here & ~match_k & (bo < 2))
    survive = ~bad & ~verify_kill
    reach = _prefix_ok(survive) & span_ok & ~gap0_bad
    cand = reach & ~bad & is_a & verify_ok
    gc = _gap_check_grow(rlp, lr_tar, gostart - 1, mgs - 1, mrs, False)
    valid = cand & gc
    str_position = gostart - 1 - mgs - moves - sl + 1
    length = el + mgs + moves + sl - 1
    return valid, str_position, length


def _pcs_item(refstr, qtokens, mrs, pstart, plen, sl, el, tok, stok):
    """Precomp-seeded verification of an extended aXb (GappyLook.cu:289-334):
    check span budget, the extra a prefix backwards, the extra b suffix forwards.
    Returns (valid, str_position, length) scalars."""
    ok = plen + 1 + sl - 1 + el - 1 <= mrs
    # prefix: backoff = 1..sl-1 (sl <= 3 so unroll 1, 2)
    for k in (1, 2):
        need = sl > k
        p = pstart - k
        good = (p >= 0) & (refstr[jnp.maximum(p, 0)]
                           == qtokens[tok + jnp.maximum(sl - 1 - k, 0)])
        ok = ok & jnp.where(need, good, True)
    # suffix: forward = 2..el
    for k in (2, 3):
        need = el >= k
        good = refstr[pstart + plen + k - 1] == qtokens[stok + k - 1]
        ok = ok & jnp.where(need, good, True)
    return ok, pstart - sl + 1, plen + sl - 1 + el - 1


@functools.partial(jax.jit, static_argnames=("mrs", "mgs"))
def _fwd_batch(refstr, rlp, lr_tar, qtokens, gostart, sl, el, stok,
               offs, mrs, mgs):
    refstr, rlp, lr_tar = make_views(refstr, rlp, lr_tar, offs)
    f = functools.partial(_fwd_item, refstr, rlp, lr_tar, qtokens, mrs, mgs)
    return jax.vmap(f)(gostart, sl, el, stok)


@functools.partial(jax.jit, static_argnames=("mrs", "mgs"))
def _bwd_batch(refstr, rlp, lr_tar, qtokens, gostart, sl, el, tok,
               offs, mrs, mgs):
    refstr, rlp, lr_tar = make_views(refstr, rlp, lr_tar, offs)
    f = functools.partial(_bwd_item, refstr, rlp, lr_tar, qtokens, mrs, mgs)
    return jax.vmap(f)(gostart, sl, el, tok)


@functools.partial(jax.jit, static_argnames=("mrs",))
def _pcs_batch(refstr, qtokens, pstart, plen, sl, el, tok, stok, offs, mrs):
    refstr, _, _ = make_views(refstr, refstr, refstr, offs)
    f = functools.partial(_pcs_item, refstr, qtokens, mrs)
    return jax.vmap(f)(pstart, plen, sl, el, tok, stok)


def one_gap_lookup_tpu(index, sa_host: np.ndarray, queries, p1, p2,
                       search: OneGapSearch, pc: Precomp,
                       cfg: ExtractorConfig, engine=None) -> GapOnSA:
    """Host orchestration + device scans; fills search.start/end_on_salist.
    ``engine`` selects the dispatch/index layout (cgx_tpu.engine); by default
    the replicated single-device layout over ``index``/``sa_host``."""
    if engine is None:
        from cgx_tpu.engine import ReplicatedEngine
        engine = ReplicatedEngine(index, sa_host, cfg)
    D = len(search.qrystart)
    mrs, mgs = cfg.max_rule_span, cfg.min_gap_size
    qtok = np.asarray(queries.tokens)
    sl_all = search.qrystart_len.astype(np.int64)
    el_all = search.qryend_len.astype(np.int64)
    tok_all = search.qrystart.astype(np.int64)
    stok_all = tok_all + search.gap.astype(np.int64) + sl_all

    # precomp cell per pattern (existPrecomputation)
    a_last = qtok[tok_all + sl_all - 1]
    b_first = qtok[stok_all]
    ia = np.searchsorted(pc.frequent_list, a_last)
    ib = np.searchsorted(pc.frequent_list, b_first)
    P = pc.P
    ok_a = (ia < P) & (pc.frequent_list[np.minimum(ia, P - 1)] == a_last)
    ok_b = (ib < P) & (pc.frequent_list[np.minimum(ib, P - 1)] == b_first)
    pci = np.where(ok_a & ok_b, ia * P + ib, -1)

    # ranges for non-precomp patterns
    p2_up = p2.up if len(p2.up) else np.zeros(1, np.int32)
    p2_down = p2.down if len(p2.down) else np.zeros(1, np.int32)

    def rng(tk, ln):
        u = np.where(ln == 1, p1.up[tk], 0)
        d = np.where(ln == 1, p1.down[tk], 0)
        cc = np.where(ln > 1, p2.connectoffset[tk] + ln - 2, 0)
        u = np.where(ln == 1, u, p2_up[cc])
        d = np.where(ln == 1, d, p2_down[cc])
        return u.astype(np.int64), d.astype(np.int64)

    r1u, r1d = rng(tok_all, sl_all)
    r2u, r2d = rng(stok_all, el_all)
    dis1 = r1d - r1u
    dis2 = r2d - r2u
    use_fwd = dis1 <= dis2
    has_pc = pci != -1
    pc_dis = np.where(has_pc,
                      pc.index_end[np.maximum(pci, 0)]
                      - pc.index_start[np.maximum(pci, 0)], -1)
    pc_ref = has_pc & (sl_all == 1) & (el_all == 1) & (pc_dis >= 0)
    pc_seed = has_pc & ~pc_ref

    rows_parts = []

    # 1) precomp references: one row per pattern
    ref_ids = np.flatnonzero(pc_ref)
    if len(ref_ids):
        rows_parts.append(np.stack([
            ref_ids, pci[ref_ids], np.zeros(len(ref_ids), dtype=np.int64)], axis=1))

    # 2) precomp-seeded verification items
    seed_ids = np.flatnonzero(pc_seed)
    if len(seed_ids):
        counts = (pc_dis[seed_ids] + 1).clip(min=0)
        item_pat = np.repeat(seed_ids, counts)
        offs = np.concatenate([[0], np.cumsum(counts)])[:-1]
        tx = np.arange(len(item_pat)) - np.repeat(offs, counts)
        row = pc.index_start[pci[item_pat]] + tx
        ok, spos, length = engine.pcs(
            queries, pc.onegap_start[row], pc.onegap_length[row],
            sl_all[item_pat].astype(np.int32),
            el_all[item_pat].astype(np.int32),
            tok_all[item_pat].astype(np.int32),
            stok_all[item_pat].astype(np.int32))
        ok = ok.astype(bool)
        if ok.any():
            rows_parts.append(np.stack([
                item_pat[ok], spos[ok].astype(np.int64),
                length[ok].astype(np.int64)], axis=1))

    # 3) forward / backward scans
    for fwd in (True, False):
        ids = np.flatnonzero(~has_pc & (use_fwd == fwd))
        if not len(ids):
            continue
        lo = np.where(fwd, r1u, r2u)[ids]
        counts = (np.where(fwd, dis1, dis2)[ids] + 1).clip(min=0)
        item_pat = np.repeat(ids, counts)
        offs = np.concatenate([[0], np.cumsum(counts)])[:-1]
        tx = np.arange(len(item_pat)) - np.repeat(offs, counts)
        gostart = engine.sa_values(np.repeat(lo, counts) + tx)
        if fwd:
            valid, length = engine.fwd(
                queries, gostart, sl_all[item_pat].astype(np.int32),
                el_all[item_pat].astype(np.int32),
                stok_all[item_pat].astype(np.int32))
            ii, mm = np.nonzero(valid)
            if len(ii):
                rows_parts.append(np.stack([
                    item_pat[ii], gostart[ii].astype(np.int64),
                    length[ii, mm].astype(np.int64)], axis=1))
        else:
            valid, spos, length = engine.bwd(
                queries, gostart, sl_all[item_pat].astype(np.int32),
                el_all[item_pat].astype(np.int32),
                tok_all[item_pat].astype(np.int32))
            ii, mm = np.nonzero(valid)
            if len(ii):
                rows_parts.append(np.stack([
                    item_pat[ii], spos[ii, mm].astype(np.int64),
                    length[ii, mm].astype(np.int64)], axis=1))

    if rows_parts:
        rows = np.concatenate(rows_parts, axis=0)
        order = np.lexsort((rows[:, 2], rows[:, 1], rows[:, 0]))
        rows = rows[order]
    else:
        rows = np.empty((0, 3), dtype=np.int64)

    out = GapOnSA(position=rows[:, 0].astype(np.int32),
                  str_position=rows[:, 1].astype(np.int32),
                  length=rows[:, 2].astype(np.int32),
                  length2=np.zeros(len(rows), dtype=np.int32))
    _fill_salist(search.start_on_salist, search.end_on_salist, out.position)
    return out


def _fill_salist(start_arr, end_arr, positions):
    if len(positions):
        uniq, first, counts = np.unique(positions, return_index=True,
                                        return_counts=True)
        start_arr[uniq] = first.astype(np.int32)
        end_arr[uniq] = (first + counts - 1).astype(np.int32)


# ---------------------------------------------------------------------------
# twoGapLookUpSA: extend each aXb core to the right looking for c
# ---------------------------------------------------------------------------

def _two_item(refstr, rlp, lr_tar, mrs, mgs, pstart, plen):
    """Scan one aXb core rightward once; the per-pattern c-token test is hoisted
    to the host (every 2-gap pattern sharing the core sees the same scan)."""
    moves = jnp.arange(MMOV, dtype=jnp.int32)
    gostart = pstart + plen
    gap0_bad = refstr[gostart + mgs] < 2
    pos = gostart + 1 + mgs + moves
    temp = refstr[jnp.minimum(pos, refstr.shape[0] - 1)]
    span_kill = plen + 1 + mgs + moves + 1 > mrs
    bad = temp < 2
    survive = ~bad & ~span_kill
    reach = _prefix_ok(survive) & ~gap0_bad
    cand = reach & ~span_kill & ~bad
    gc = _gap_check_grow(rlp, lr_tar, pstart + plen + 1, mgs - 1, mrs,
                         True)
    length2 = plen + 1 + mgs + moves  # + el - 1 with el == 1
    return cand, temp, gc, length2


@functools.partial(jax.jit, static_argnames=("mrs", "mgs"))
def _two_batch(refstr, rlp, lr_tar, pstart, plen, offs, mrs, mgs):
    refstr, rlp, lr_tar = make_views(refstr, rlp, lr_tar, offs)
    f = functools.partial(_two_item, refstr, rlp, lr_tar, mrs, mgs)
    return jax.vmap(f)(pstart, plen)


def two_gap_lookup_tpu(index, queries, search1: OneGapSearch,
                       onegap_sa: GapOnSA, search2: TwoGapSearch,
                       pc: Precomp, cfg: ExtractorConfig,
                       engine=None) -> GapOnSA:
    from cgx_tpu.extract.device import _onegap_occurrences
    if engine is None:
        from cgx_tpu.engine import ReplicatedEngine
        engine = ReplicatedEngine(index, None, cfg)
    D2 = len(search2.blockid)
    mrs, mgs = cfg.max_rule_span, cfg.min_gap_size
    # Scan every distinct 1-gap pattern's cores ONCE (unsampled, precomp-expanded)
    # and resolve each scan hit's c token against the 2-gap pattern set on the
    # host.  The reference re-scans the shared cores per 2-gap pattern
    # (GappyLook.cu:585-735); the emissions are identical with
    # ~|patterns-per-core|x less device work.
    one_ids_all, css_all, fes_all = _onegap_occurrences(
        search1, onegap_sa, pc, 0, False)
    if len(one_ids_all) == 0 or D2 == 0:
        return GapOnSA(*(np.empty(0, np.int32) for _ in range(4)))
    cand, temp, gc, length2 = engine.two(css_all.astype(np.int32),
                                          fes_all.astype(np.int32))
    cand = cand.astype(bool)
    gc = gc.astype(bool)
    # sorted (oneId, c-token) -> twoId table; distinct patterns are unique pairs
    ctok = np.asarray(queries.tokens)[search2.gap2].astype(np.int64)
    keys = (search2.blockid.astype(np.int64) << 32) | ctok
    korder = np.argsort(keys, kind="stable")
    keys_sorted = keys[korder]
    ii, mm = np.nonzero(cand)
    want = (one_ids_all[ii] << 32) | temp[ii, mm].astype(np.int64)
    ki = np.searchsorted(keys_sorted, want)
    found = (ki < len(keys_sorted)) & \
        (keys_sorted[np.minimum(ki, len(keys_sorted) - 1)] == want)
    hit = found & gc[ii, mm]
    two_id = korder[np.minimum(ki, len(korder) - 1)][hit]
    rows = np.stack([two_id, css_all[ii][hit], fes_all[ii][hit],
                     length2[ii, mm][hit].astype(np.int64)], axis=1)
    order = np.lexsort((rows[:, 3], rows[:, 2], rows[:, 1], rows[:, 0]))
    rows = rows[order]
    out = GapOnSA(position=rows[:, 0].astype(np.int32),
                  str_position=rows[:, 1].astype(np.int32),
                  length=rows[:, 2].astype(np.int32),
                  length2=rows[:, 3].astype(np.int32))
    _fill_salist(search2.start_on_salist, search2.end_on_salist, out.position)
    return out


# ---------------------------------------------------------------------------
# Fused nested-window gap check.
#
# The per-move gap spans of every scan kernel are nested (fixed start growing
# right, or fixed end growing left), so all MMOV checkBoundaryGap evaluations
# share one RLP window: load it once, take prefix (or suffix) min/max of the
# aligned L/R spans, and evaluate every move from the scans.  The back-projection
# windows are nested too — all valid target spans fit in a 16-wide window anchored
# at the widest valid span's min — so the target side is also a single load plus a
# [MMOV, 16] masked reduction.  Equivalent to vmapping _gap_check over moves
# (garbage on moves whose spans cross sentence boundaries, which every caller
# masks out via its scan-kill logic), with ~20x less gather traffic.
# ---------------------------------------------------------------------------

def _gap_check_grow(rlp, lr_tar, fixed, base_off, mrs: int,
                    grow_right: bool):
    """ok[MMOV] for spans [fixed, fixed+base_off+m] (grow_right) or
    [fixed-base_off-m, fixed] (grow_left)."""
    moves = jnp.arange(MMOV, dtype=jnp.int32)
    w = jnp.arange(mrs, dtype=jnp.int32)
    if grow_right:
        ks = fixed + w                       # window left-aligned at fixed
    else:
        ks = fixed - w                       # reversed window ending at fixed
    temp = rlp[jnp.clip(ks, 0, rlp.shape[0] - 1)].astype(jnp.uint32)
    L = ((temp >> 24) & 0xFF).astype(jnp.int32)
    R = ((temp >> 16) & 0xFF).astype(jnp.int32)
    oob = ks < 0
    unal = (L == 255) | (R == 255) | oob
    al = ~unal
    minL_pref = jax.lax.associative_scan(jnp.minimum, jnp.where(al, L, 256))
    maxR_pref = jax.lax.associative_scan(jnp.maximum, jnp.where(al, R, -1))
    span = base_off + moves                  # outer offset of each move's span
    off = jnp.clip(span, 0, mrs - 1)
    minL = minL_pref[off]
    maxR = maxR_pref[off]
    fail0 = unal[0] | jnp.take(unal, off) | (span < 0) | (span > mrs - 1)
    # sentence anchor at each span's start token (constant within a sentence;
    # grow_right: fixed; grow_left: the innermost (m=0) start)
    if grow_right:
        start_tok = fixed
    else:
        start_tok = fixed - base_off
    t0 = rlp[jnp.clip(start_tok, 0, rlp.shape[0] - 1)].astype(jnp.uint32)
    p0 = ((t0 >> 8) & 0xFF).astype(jnp.int32)
    tempind = start_tok - p0 - 1
    stb = jnp.where(tempind == -1, jnp.int32(0),
                    rlp[jnp.clip(tempind, 0, rlp.shape[0] - 1)].astype(jnp.int32))
    ok1 = ~fail0 & (minL <= maxR) & (maxR - minL < mrs)
    ts = minL + stb
    te = maxR + stb
    # target union window: anchored at the min ts over valid moves; every valid
    # span fits within 16 positions of it (see module comment)
    anchor = jnp.min(jnp.where(ok1, ts, 2**30))
    anchor = jnp.where(anchor == 2**30, jnp.int32(0), anchor)
    win = anchor + jnp.arange(MMOV, dtype=jnp.int32)
    winc = jnp.clip(win, 0, lr_tar.shape[0] - 1)
    w2 = lr_tar[winc]
    L2 = w2 >> 8
    R2 = w2 & 255
    al2 = (L2 != 255) & (R2 != 255)
    inb = (win[None, :] >= ts[:, None]) & (win[None, :] <= te[:, None])
    m2 = inb & al2[None, :]
    bmin = jnp.min(jnp.where(m2, L2[None, :], 256), axis=1)
    bmax = jnp.max(jnp.where(m2, R2[None, :], -1), axis=1)
    if grow_right:
        src_start = jnp.broadcast_to(fixed, (MMOV,))
        src_end = fixed + span
    else:
        src_start = fixed - span
        src_end = jnp.broadcast_to(fixed, (MMOV,))
    return ok1 & (tempind + 1 + bmin == src_start) & \
        (tempind + 1 + bmax == src_end)
