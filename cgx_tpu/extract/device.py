"""TPU rule extraction.

Vectorized transcription of the three extraction kernels:

* extractConsistentPairs_Gappy (ExtractPair.cu:1055-1795): ab + Xab/abX/XabX growth
  per contiguous-block occurrence;
* extractConsistentPairs_OneGap (ExtractPair.cu:351-889): aXb + XaXb/aXbX per 1-gap
  pattern occurrence;
* extractConsistentPairs_TwoGap (ExtractPair.cu:891-1053): aXbXc per 2-gap occurrence.

One vmap lane per sampled occurrence; the sequential growth loops (i = 1..14) are
statically unrolled over traced scalar state that mirrors the CUDA flags
(Xab/abX/XabX/XabNoSuccess/...) exactly, with per-step quantities (prefix min/max of
alignment spans, gap/whole-span consistency) precomputed as width-IMAX arrays.
Emissions are fixed slots per lane (each rule family emits at most once per
occurrence), compacted on the host in canonical occurrence order.  Sampling
(ExtractPair.cu:1133-1160) happens host-side when the occurrence lists are built, via
the shared ``sample_indices``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cgx_tpu.config import ExtractorConfig
from cgx_tpu.extract.blocks import sample_indices
from cgx_tpu.types import Blocks, ContigRules, GapOnSA, GapRules, OneGapSearch, Precomp, TwoGapSearch

IMAX = 14   # max growth distance: lm + i <= max_rule_span with lm >= 1
CWID = 16   # static width for masked span loops


def _rlp_LR(rlp, pos):
    """(L, R, aligned) from an RLP word, OOB-guarded to unaligned."""
    oob = pos < 0
    t = rlp[jnp.clip(pos, 0, rlp.shape[0] - 1)].astype(jnp.uint32)
    L = ((t >> 24) & 0xFF).astype(jnp.int32)
    R = ((t >> 16) & 0xFF).astype(jnp.int32)
    L = jnp.where(oob, 255, L)
    R = jnp.where(oob, 255, R)
    return L, R, (L != 255) & (R != 255)


def _consistent_dev(l_tar, r_tar, ts, te, start_chk, end_chk, sentstart):
    """consistent() (ExtractPair.cu:103-133) over a target span <= CWID wide."""
    ks = ts + jnp.arange(CWID, dtype=jnp.int32)
    mask = ks <= te
    ksc = jnp.clip(ks, 0, l_tar.shape[0] - 1)
    L = l_tar[ksc]
    R = r_tar[ksc]
    al = mask & (L != 255) & (R != 255)
    bmin = jnp.min(jnp.where(al, L, 256))
    bmax = jnp.max(jnp.where(al, R, -1))
    return (sentstart + bmin == start_chk) & (sentstart + bmax == end_chk)


def _sent_anchor(rlp, pos):
    """tempind/sen_target_begin computed at a span's first token
    (ExtractPair.cu:1183-1191 et al.).  Returns (sentstart_src=tempind+1, stb)."""
    t = rlp[jnp.clip(pos, 0, rlp.shape[0] - 1)].astype(jnp.uint32)
    p = ((t >> 8) & 0xFF).astype(jnp.int32)
    tempind = pos - p - 1
    stb = jnp.where(tempind == -1, jnp.int32(0),
                    rlp[jnp.clip(tempind, 0, rlp.shape[0] - 1)].astype(jnp.int32))
    return tempind + 1, stb


def _cummin(vals, mask, init):
    x = jnp.where(mask, vals, init)
    return jax.lax.associative_scan(jnp.minimum, x)


def _cummax(vals, mask, init):
    x = jnp.where(mask, vals, init)
    return jax.lax.associative_scan(jnp.maximum, x)


def _grow_side_arrays(refstr, rlp, l_tar, r_tar, base, step, sentstart, stb,
                      span_lo_fn, span_hi_fn):
    """Per-step arrays for one growth side: token, aligned, prefix min/max of the
    X span, and the X-gap consistency result (consistent(gap, [lo_i, hi_i]))."""
    steps = jnp.arange(1, IMAX + 1, dtype=jnp.int32)
    pos = base + step * steps
    oob = pos < 0
    tok = jnp.where(oob, jnp.int32(-1),
                    refstr[jnp.clip(pos, 0, refstr.shape[0] - 1)])
    L, R, al = _rlp_LR(rlp, pos)
    pmin = _cummin(L, al, jnp.int32(255))
    pmax = _cummax(R, al, jnp.int32(0))

    def gap_ok(i0):
        i = i0 + 1
        return _consistent_dev(l_tar, r_tar, stb + pmin[i0], stb + pmax[i0],
                               span_lo_fn(i), span_hi_fn(i), sentstart)

    gconsist = jax.vmap(gap_ok)(jnp.arange(IMAX, dtype=jnp.int32))
    return tok, al, pmin, pmax, gconsist


def _extract_contig_item(refstr, refsa, rlp, l_tar, r_tar, mrs, msym, sa_pos, lm):
    """One sampled occurrence of a contiguous block (ExtractPair.cu:1147-1794)."""
    cs = refsa[sa_pos]
    ender = cs + lm - 1
    sentstart, stb = _sent_anchor(rlp, cs)

    # base span scan (ExtractPair.cu:1178-1231)
    ks = cs + jnp.arange(CWID, dtype=jnp.int32)
    kmask = ks < cs + lm
    L0, R0, al0 = _rlp_LR(rlp, ks)
    first_un = ~al0[0]
    last_off = jnp.clip(lm - 1, 0, CWID - 1)
    last_un = ~jnp.take(al0, last_off)
    min_L = jnp.min(jnp.where(kmask & al0, L0, 256))
    max_R = jnp.max(jnp.where(kmask & al0, R0, -1))
    ab = ~first_un & ~last_un
    abXNoSuccess = ~first_un
    XabNoSuccess = ~last_un
    dead = (min_L > max_R) | (max_R - min_L >= mrs)
    ab &= ~dead
    Xab = ~dead
    abX = ~dead
    XabX = ~dead

    ab_ok = ab & _consistent_dev(l_tar, r_tar, min_L + stb, max_R + stb,
                                 cs, ender, sentstart)
    ab_ts = min_L + stb
    ab_len = max_R - min_L

    Xab &= lm + 1 <= msym
    abX &= lm + 1 <= msym
    XabX &= lm + 2 <= msym

    # per-step side arrays
    ltok, lal, lmin, lmax, lgap = _grow_side_arrays(
        refstr, rlp, l_tar, r_tar, cs, -1, sentstart, stb,
        lambda i: cs - i, lambda i: cs - 1)
    rtok, ral, rmin, rmax, rgap = _grow_side_arrays(
        refstr, rlp, l_tar, r_tar, ender, 1, sentstart, stb,
        lambda i: ender + 1, lambda i: ender + i)

    # whole-span (one X) arrays
    def whole_l(i0):
        ts = stb + jnp.minimum(lmin[i0], min_L)
        te = stb + jnp.maximum(lmax[i0], max_R)
        ok = _consistent_dev(l_tar, r_tar, ts, te, cs - (i0 + 1), ender,
                             sentstart)
        return ts, te, ok

    def whole_r(i0):
        ts = stb + jnp.minimum(rmin[i0], min_L)
        te = stb + jnp.maximum(rmax[i0], max_R)
        ok = _consistent_dev(l_tar, r_tar, ts, te, cs, ender + (i0 + 1),
                             sentstart)
        return ts, te, ok

    ir = jnp.arange(IMAX, dtype=jnp.int32)
    wl_ts, wl_te, wl_ok = jax.vmap(whole_l)(ir)
    wr_ts, wr_te, wr_ok = jax.vmap(whole_r)(ir)

    # 2D XabX whole-span tables: a = left extent, b = right extent (1-based - 1)
    def whole2(a0, b0):
        ts = stb + jnp.minimum(jnp.minimum(lmin[a0], rmin[b0]), min_L)
        te = stb + jnp.maximum(jnp.maximum(lmax[a0], rmax[b0]), max_R)
        ok = _consistent_dev(l_tar, r_tar, ts, te, cs - (a0 + 1),
                             ender + (b0 + 1), sentstart)
        return ts, te, ok

    aa, bb = jnp.meshgrid(ir, ir, indexing="ij")
    w2_ts, w2_te, w2_ok = jax.vmap(jax.vmap(whole2))(aa, bb)

    # sequential growth (unrolled; mirrors ExtractPair.cu:1280-1791)
    XabCount = jnp.int32(0)
    abXCount = jnp.int32(0)
    F = jnp.bool_(False)
    z = jnp.int32(0)
    xab = dict(v=F, ts=z, te=z, g1s=z, g1e=z)
    abx = dict(v=F, ts=z, te=z, g1s=z, g1e=z)
    xabx = dict(v=F, ts=z, te=z, g1s=z, g1e=z, g2s=z, g2e=z)

    for i in range(1, IMAX + 1):
        i0 = i - 1
        active = (lm + i <= mrs) & (abXNoSuccess | XabNoSuccess | XabX)
        # ---- Xab (left)
        l_has = (cs - i >= 0) & (ltok[i0] >= 2)
        l_proc = active & Xab & l_has
        Xab = jnp.where(active & ~l_has, F, Xab)
        nxt = l_proc & lal[i0]
        Xab = jnp.where(l_proc & ~lal[i0] & (i == 1), F, Xab)
        XabX = jnp.where(l_proc & ~lal[i0] & (i == 1), F, XabX)
        spank = lmax[i0] - lmin[i0] >= mrs
        Xab = jnp.where(l_proc & spank, F, Xab)
        nxt &= ~spank
        nxt &= lgap[i0]
        XabCount = jnp.where(nxt, jnp.int32(i), XabCount)
        wkill = l_proc & XabNoSuccess & nxt & (wl_te[i0] - wl_ts[i0] >= mrs)
        Xab = jnp.where(wkill, F, Xab)
        emit = (l_proc & XabNoSuccess & nxt & ~wkill & wl_ok[i0])
        xab = dict(
            v=xab["v"] | emit,
            ts=jnp.where(emit, wl_ts[i0], xab["ts"]),
            te=jnp.where(emit, wl_te[i0], xab["te"]),
            g1s=jnp.where(emit, stb + lmin[i0], xab["g1s"]),
            g1e=jnp.where(emit, stb + lmax[i0], xab["g1e"]))
        XabNoSuccess = jnp.where(emit, F, XabNoSuccess)
        # ---- abX (right)
        r_has = rtok[i0] >= 2
        r_proc = active & abX & r_has
        abX = jnp.where(active & ~r_has, F, abX)
        nxt = r_proc & ral[i0]
        abX = jnp.where(r_proc & ~ral[i0] & (i == 1), F, abX)
        XabX = jnp.where(r_proc & ~ral[i0] & (i == 1), F, XabX)
        spank = rmax[i0] - rmin[i0] >= mrs
        abX = jnp.where(r_proc & spank, F, abX)
        nxt &= ~spank
        nxt &= rgap[i0]
        abXCount = jnp.where(nxt, jnp.int32(i), abXCount)
        wkill = r_proc & abXNoSuccess & nxt & (wr_te[i0] - wr_ts[i0] >= mrs)
        abX = jnp.where(wkill, F, abX)
        emit = (r_proc & abXNoSuccess & nxt & ~wkill & wr_ok[i0])
        abx = dict(
            v=abx["v"] | emit,
            ts=jnp.where(emit, wr_ts[i0], abx["ts"]),
            te=jnp.where(emit, wr_te[i0], abx["te"]),
            g1s=jnp.where(emit, stb + rmin[i0], abx["g1s"]),
            g1e=jnp.where(emit, stb + rmax[i0], abx["g1e"]))
        abXNoSuccess = jnp.where(emit, F, abXNoSuccess)
        # ---- XabX (ExtractPair.cu:1514-1777)
        xcond = active & XabX & (abX | Xab)
        # branch 1: left extent just became i; scan right extents 1..abXCount
        b1 = xcond & (XabCount == i)
        alive = b1
        for k in range(1, IMAX + 1):
            k0 = k - 1
            run = alive & (k <= abXCount) & XabX
            budget = k + i + lm <= mrs
            alive &= ~(run & ~budget)
            nx = run & budget & ral[k0]
            spank2 = rmax[k0] - rmin[k0] >= mrs
            alive &= ~(nx & spank2)
            nx &= ~spank2
            nx &= rgap[k0]
            w_span_bad = w2_te[i0, k0] - w2_ts[i0, k0] >= mrs
            alive &= ~(nx & w_span_bad)
            nx &= ~w_span_bad
            nx &= w2_ok[i0, k0]
            emit = nx & XabX
            xabx = dict(
                v=xabx["v"] | emit,
                ts=jnp.where(emit, w2_ts[i0, k0], xabx["ts"]),
                te=jnp.where(emit, w2_te[i0, k0], xabx["te"]),
                g1s=jnp.where(emit, stb + lmin[i0], xabx["g1s"]),
                g1e=jnp.where(emit, stb + lmax[i0], xabx["g1e"]),
                g2s=jnp.where(emit, stb + rmin[k0], xabx["g2s"]),
                g2e=jnp.where(emit, stb + rmax[k0], xabx["g2e"]))
            XabX = jnp.where(emit, F, XabX)
        # branch 2: right extent just became i; scan left extents 1..XabCount
        b2 = xcond & XabX & (abXCount == i)
        alive = b2
        for k in range(1, IMAX + 1):
            k0 = k - 1
            run = alive & (k <= XabCount) & XabX
            budget = k + i + lm <= mrs
            alive &= ~(run & ~budget)
            nx = run & budget & lal[k0]
            spank2 = lmax[k0] - lmin[k0] >= mrs
            alive &= ~(nx & spank2)
            nx &= ~spank2
            nx &= lgap[k0]
            w_span_bad = w2_te[k0, i0] - w2_ts[k0, i0] >= mrs
            alive &= ~(nx & w_span_bad)
            nx &= ~w_span_bad
            nx &= w2_ok[k0, i0]
            emit = nx & XabX
            xabx = dict(
                v=xabx["v"] | emit,
                ts=jnp.where(emit, w2_ts[k0, i0], xabx["ts"]),
                te=jnp.where(emit, w2_te[k0, i0], xabx["te"]),
                g1s=jnp.where(emit, stb + lmin[k0], xabx["g1s"]),
                g1e=jnp.where(emit, stb + lmax[k0], xabx["g1e"]),
                g2s=jnp.where(emit, stb + rmin[i0], xabx["g2s"]),
                g2e=jnp.where(emit, stb + rmax[i0], xabx["g2e"]))
            XabX = jnp.where(emit, F, XabX)
        XabX = jnp.where(active & ~(abX | Xab), F, XabX)
        # spin sync (ExtractPair.cu:1782-1789)
        sync = active & ~XabX
        XabNoSuccess = jnp.where(sync & ~Xab, F, XabNoSuccess)
        abXNoSuccess = jnp.where(sync & ~abX, F, abXNoSuccess)

    pack = lambda d: tuple(d.values())
    return (ab_ok, ab_ts, ab_len) + pack(xab) + pack(abx) + pack(xabx)


@functools.partial(jax.jit, static_argnames=("mrs", "msym"))
def _contig_batch(refstr, refsa, rlp, l_tar, r_tar, sa_pos, lm, mrs, msym):
    f = functools.partial(_extract_contig_item, refstr, refsa, rlp, l_tar,
                          r_tar, mrs, msym)
    return jax.vmap(f)(sa_pos, lm)


def extract_contiguous_tpu(index, blocks: Blocks, cfg: ExtractorConfig):
    """Host orchestration for extractConsistentPairs_Gappy: sampled occurrence
    list -> device batch -> canonical compaction + stable id sort."""
    G = len(blocks.start)
    bnums, sa_pos, lms = [], [], []
    for bnum in range(G):
        b0, b1 = int(blocks.start[bnum]), int(blocks.end[bnum])
        lm = int(blocks.matchlen[bnum])
        if lm < 1:
            continue
        for rel in sample_indices(b1 - b0 + 1, cfg.sampler, cfg.is_sample):
            bnums.append(bnum)
            sa_pos.append(b0 + rel)
            lms.append(lm)
    bnums = np.asarray(bnums, dtype=np.int64)
    if len(bnums) == 0:
        empty = GapRules(*(np.empty(0, np.int32) for _ in range(7)))
        return (ContigRules(*(np.empty(0, np.int32) for _ in range(3))),
                empty, empty)
    out = _contig_batch(index.refstr_padded, index.sa, index.rlp, index.l_tar,
                        index.r_tar, jnp.asarray(np.asarray(sa_pos, np.int32)),
                        jnp.asarray(np.asarray(lms, np.int32)),
                        cfg.max_rule_span, cfg.max_rule_symbols)
    out = [np.asarray(x) for x in out]
    (ab_v, ab_ts, ab_len,
     x_v, x_ts, x_te, x_g1s, x_g1e,
     a_v, a_ts, a_te, a_g1s, a_g1e,
     t_v, t_ts, t_te, t_g1s, t_g1e, t_g2s, t_g2e) = out

    m = ab_v
    contig = ContigRules(tar_start=ab_ts[m].astype(np.int32),
                         tar_end=ab_len[m].astype(np.int32),
                         blocknumber=bnums[m].astype(np.int32))

    def gaprules(parts):
        rows = []
        for v, ts, te, g1s, g1e, g2s, g2e, gid in parts:
            if not v.any():
                continue
            rows.append(np.stack([
                ts[v], (te - ts)[v], (g1s - ts)[v], (g1e - ts)[v],
                (g2s - ts)[v], (g2e - ts)[v], gid[v]], axis=1).astype(np.int64))
        if not rows:
            return GapRules(*(np.empty(0, np.int32) for _ in range(7)))
        a = np.concatenate(rows, axis=0)
        a = a[np.argsort(a[:, 6], kind="stable")]
        return GapRules(ref_str_start=a[:, 0].astype(np.int32),
                        end=a[:, 1].astype(np.int32),
                        gap1=a[:, 2].astype(np.int32),
                        gap1_1=a[:, 3].astype(np.int32),
                        gap2=a[:, 4].astype(np.int32),
                        gap2_1=a[:, 5].astype(np.int32),
                        gappy_index=a[:, 6].astype(np.int32))

    # one-gap rules carry no second gap: store 0 offsets like the oracle
    rules1 = gaprules([
        (x_v, x_ts, x_te, x_g1s, x_g1e, x_ts, x_ts, bnums),            # Xab
        (a_v, a_ts, a_te, a_g1s, a_g1e, a_ts, a_ts, G + bnums),        # abX
    ])
    rules2 = gaprules([
        (t_v, t_ts, t_te, t_g1s, t_g1e, t_g2s, t_g2e, bnums),          # XabX
    ])
    return contig, rules1, rules2


# ---------------------------------------------------------------------------
# extractConsistentPairs_OneGap (ExtractPair.cu:351-889)
# ---------------------------------------------------------------------------

def _check_boundary_dev(refstr, rlp, l_tar, r_tar, start, ender, mrs):
    """checkBoundary (ExtractPair.cu:252-342) for spans <= CWID:
    returns (code, ts, te) with codes 0/1/2/3/4."""
    ks = start + jnp.arange(CWID, dtype=jnp.int32)
    mask = ks <= ender
    L, R, al = _rlp_LR(rlp, ks)
    span = ender - start
    end_off = jnp.clip(span, 0, CWID - 1)
    first_un = ~al[0]
    last_un = ~jnp.take(al, end_off)
    single = span == 0
    code_fw = jnp.where(
        single & first_un, 4,
        jnp.where(first_un & last_un, 4,
                  jnp.where(first_un, 2, jnp.where(last_un, 3, 0))))
    min_L = jnp.min(jnp.where(mask & al, L, 256))
    max_R = jnp.max(jnp.where(mask & al, R, -1))
    sentstart, stb = _sent_anchor(rlp, start)
    ts = min_L + stb
    te = max_R + stb
    ok_span = (min_L <= max_R) & (max_R - min_L < mrs)
    cons = _consistent_dev(l_tar, r_tar, ts, te, start, ender, sentstart)
    code = jnp.where(code_fw != 0, code_fw,
                     jnp.where(ok_span & cons, 1, 0))
    return code, ts, te, sentstart, stb


def _extract_onegap_item(refstr, rlp, l_tar, r_tar, mrs, msym, cs, first_end,
                         sl, el):
    """One sampled aXb occurrence: aXb + XaXb + aXbX slots."""
    ender = cs + first_end
    # first gap span anchor (checkBoundaryFast on [cs+sl, ender-el])
    gstart = cs + sl
    sentstart, stb = _sent_anchor(rlp, gstart)
    gks = gstart + jnp.arange(CWID, dtype=jnp.int32)
    gmask = gks <= ender - el
    gL, gR, gal = _rlp_LR(rlp, gks)
    gmin = jnp.min(jnp.where(gmask & gal, gL, 256))
    gmax = jnp.max(jnp.where(gmask & gal, gR, -1))
    gap1s = gmin + stb
    gap1e = gmax + stb

    code, ts, te, _, _ = _check_boundary_dev(refstr, rlp, l_tar, r_tar, cs,
                                             ender, mrs)
    min_L = ts - stb
    max_R = te - stb
    axb_v = code == 1
    # code 2 (front unaligned) kills aXbX (right); code 3 (end unaligned) kills
    # XaXb (left); code 4 kills both (ExtractPair.cu:574-588)
    left = (code != 3) & (code != 4)
    right = (code != 2) & (code != 4)

    grow = sl + el + 2 <= msym
    left &= grow
    right &= grow

    ltok, lal, lmin, lmax, lgap = _grow_side_arrays(
        refstr, rlp, l_tar, r_tar, cs, -1, sentstart, stb,
        lambda i: cs - i, lambda i: cs - 1)
    rtok, ral, rmin, rmax, rgap = _grow_side_arrays(
        refstr, rlp, l_tar, r_tar, ender, 1, sentstart, stb,
        lambda i: ender + 1, lambda i: ender + i)

    def whole_l(i0):
        ts2 = stb + jnp.minimum(lmin[i0], min_L)
        te2 = stb + jnp.maximum(lmax[i0], max_R)
        ok = _consistent_dev(l_tar, r_tar, ts2, te2, cs - (i0 + 1), ender,
                             sentstart)
        return ts2, te2, ok

    def whole_r(i0):
        ts2 = stb + jnp.minimum(rmin[i0], min_L)
        te2 = stb + jnp.maximum(rmax[i0], max_R)
        ok = _consistent_dev(l_tar, r_tar, ts2, te2, cs, ender + (i0 + 1),
                             sentstart)
        return ts2, te2, ok

    ir = jnp.arange(IMAX, dtype=jnp.int32)
    wl_ts, wl_te, wl_ok = jax.vmap(whole_l)(ir)
    wr_ts, wr_te, wr_ok = jax.vmap(whole_r)(ir)

    F = jnp.bool_(False)
    z = jnp.int32(0)
    xaxb = dict(v=F, ts=z, te=z, g1s=z, g1e=z)
    axbx = dict(v=F, ts=z, te=z, g2s=z, g2e=z)
    for i in range(1, IMAX + 1):
        i0 = i - 1
        active = (first_end + 1 + i <= mrs) & (left | right)
        # XaXb (prepend X), ExtractPair.cu:639-760
        l_has = (cs - i >= 0) & (ltok[i0] >= 2)
        l_proc = active & left & l_has
        left = jnp.where(active & left & ~l_has, F, left)
        nxt = l_proc & lal[i0]
        left = jnp.where(l_proc & ~lal[i0] & (i == 1), F, left)
        spank = lmax[i0] - lmin[i0] >= mrs
        left = jnp.where(l_proc & spank, F, left)
        nxt &= ~spank
        nxt &= lgap[i0]
        wkill = nxt & (wl_te[i0] - wl_ts[i0] >= mrs)
        left = jnp.where(wkill, F, left)
        emit = nxt & ~wkill & wl_ok[i0]
        xaxb = dict(
            v=xaxb["v"] | emit,
            ts=jnp.where(emit, wl_ts[i0], xaxb["ts"]),
            te=jnp.where(emit, wl_te[i0], xaxb["te"]),
            g1s=jnp.where(emit, stb + lmin[i0], xaxb["g1s"]),
            g1e=jnp.where(emit, stb + lmax[i0], xaxb["g1e"]))
        left = jnp.where(emit, F, left)
        # aXbX (append X), ExtractPair.cu:763-880
        r_has = rtok[i0] >= 2
        r_proc = active & right & r_has
        right = jnp.where(active & right & ~r_has, F, right)
        nxt = r_proc & ral[i0]
        right = jnp.where(r_proc & ~ral[i0] & (i == 1), F, right)
        spank = rmax[i0] - rmin[i0] >= mrs
        right = jnp.where(r_proc & spank, F, right)
        nxt &= ~spank
        nxt &= rgap[i0]
        wkill = nxt & (wr_te[i0] - wr_ts[i0] >= mrs)
        right = jnp.where(wkill, F, right)
        emit = nxt & ~wkill & wr_ok[i0]
        axbx = dict(
            v=axbx["v"] | emit,
            ts=jnp.where(emit, wr_ts[i0], axbx["ts"]),
            te=jnp.where(emit, wr_te[i0], axbx["te"]),
            g2s=jnp.where(emit, stb + rmin[i0], axbx["g2s"]),
            g2e=jnp.where(emit, stb + rmax[i0], axbx["g2e"]))
        right = jnp.where(emit, F, right)

    return (axb_v, ts, te, gap1s, gap1e,
            xaxb["v"], xaxb["ts"], xaxb["te"], xaxb["g1s"], xaxb["g1e"],
            axbx["v"], axbx["ts"], axbx["te"], axbx["g2s"], axbx["g2e"])


@functools.partial(jax.jit, static_argnames=("mrs", "msym"))
def _onegap_batch(refstr, rlp, l_tar, r_tar, cs, first_end, sl, el, mrs, msym):
    f = functools.partial(_extract_onegap_item, refstr, rlp, l_tar, r_tar,
                          mrs, msym)
    return jax.vmap(f)(cs, first_end, sl, el)


def extract_onegap_tpu(index, search1: OneGapSearch, onegap_sa: GapOnSA,
                       pc: Precomp, cfg: ExtractorConfig):
    D1 = len(search1.qrystart)
    ids, css, fes, sls, els = [], [], [], [], []
    for oneId in range(D1):
        lo = int(search1.start_on_salist[oneId])
        hi = int(search1.end_on_salist[oneId])
        if lo == -1 and hi == -1:
            continue
        sl = int(search1.qrystart_len[oneId])
        el = int(search1.qryend_len[oneId])
        dis = 1 + hi - lo
        if dis == 1 and int(onegap_sa.length[lo]) == 0:
            pci = int(onegap_sa.str_position[lo])
            lo = int(pc.index_start[pci])
            hi = int(pc.index_end[pci])
            dis = 1 + hi - lo
            starts = pc.onegap_start
            lens = pc.onegap_length
        else:
            starts = onegap_sa.str_position
            lens = onegap_sa.length
        for tx in sample_indices(dis, cfg.sampler_onegap, cfg.is_sample):
            ids.append(oneId)
            css.append(int(starts[lo + tx]))
            fes.append(int(lens[lo + tx]))
            sls.append(sl)
            els.append(el)
    if not ids:
        empty = GapRules(*(np.empty(0, np.int32) for _ in range(7)))
        return empty, empty
    ids = np.asarray(ids, dtype=np.int64)
    out = _onegap_batch(index.refstr_padded, index.rlp, index.l_tar, index.r_tar,
                        jnp.asarray(np.asarray(css, np.int32)),
                        jnp.asarray(np.asarray(fes, np.int32)),
                        jnp.asarray(np.asarray(sls, np.int32)),
                        jnp.asarray(np.asarray(els, np.int32)),
                        cfg.max_rule_span, cfg.max_rule_symbols)
    out = [np.asarray(x) for x in out]
    (b_v, b_ts, b_te, b_g1s, b_g1e,
     l_v, l_ts, l_te, l_g1s, l_g1e,
     r_v, r_ts, r_te, r_g2s, r_g2e) = out

    def mk(parts):
        rows = []
        for v, ts, te, g1s, g1e, g2s, g2e, gid in parts:
            if not v.any():
                continue
            rows.append(np.stack([
                ts[v], (te - ts)[v], (g1s - ts)[v], (g1e - ts)[v],
                (g2s - ts)[v], (g2e - ts)[v], gid[v]], axis=1).astype(np.int64))
        if not rows:
            return GapRules(*(np.empty(0, np.int32) for _ in range(7)))
        a = np.concatenate(rows, axis=0)
        a = a[np.argsort(a[:, 6], kind="stable")]
        return GapRules(ref_str_start=a[:, 0].astype(np.int32),
                        end=a[:, 1].astype(np.int32),
                        gap1=a[:, 2].astype(np.int32),
                        gap1_1=a[:, 3].astype(np.int32),
                        gap2=a[:, 4].astype(np.int32),
                        gap2_1=a[:, 5].astype(np.int32),
                        gappy_index=a[:, 6].astype(np.int32))

    rules1 = mk([(b_v, b_ts, b_te, b_g1s, b_g1e, b_ts, b_ts, ids)])   # aXb
    # XaXb: gap1 = new left X, gap2 = original aXb gap; aXbX: gap1 = original,
    # gap2 = new right X (ExtractPair.cu:745-757, 866-877)
    rules2 = mk([
        (l_v, l_ts, l_te, l_g1s, l_g1e, b_g1s, b_g1e, ids),
        (r_v, r_ts, r_te, b_g1s, b_g1e, r_g2s, r_g2e,
         len(search1.qrystart) + ids),
    ])
    return rules1, rules2


# ---------------------------------------------------------------------------
# extractConsistentPairs_TwoGap (ExtractPair.cu:891-1053)
# ---------------------------------------------------------------------------

def _extract_twogap_item(refstr, rlp, l_tar, r_tar, mrs, cs, first_end,
                         second_end, sl, el, cl):
    gs1, stb1 = _sent_anchor(rlp, cs + sl)

    def gapspan(start, ender):
        ks = start + jnp.arange(CWID, dtype=jnp.int32)
        mask = ks <= ender
        L, R, al = _rlp_LR(rlp, ks)
        mn = jnp.min(jnp.where(mask & al, L, 256))
        mx = jnp.max(jnp.where(mask & al, R, -1))
        sstart, sb = _sent_anchor(rlp, start)
        return mn + sb, mx + sb

    g1s, g1e = gapspan(cs + sl, cs + first_end - el)
    g2s, g2e = gapspan(cs + first_end + 1, cs + second_end - cl)
    code, ts, te, _, _ = _check_boundary_dev(refstr, rlp, l_tar, r_tar, cs,
                                             cs + second_end, mrs)
    return code == 1, ts, te, g1s, g1e, g2s, g2e


@functools.partial(jax.jit, static_argnames=("mrs",))
def _twogap_batch(refstr, rlp, l_tar, r_tar, cs, fe, se, sl, el, cl, mrs):
    f = functools.partial(_extract_twogap_item, refstr, rlp, l_tar, r_tar, mrs)
    return jax.vmap(f)(cs, fe, se, sl, el, cl)


def extract_twogap_tpu(index, search1: OneGapSearch, search2: TwoGapSearch,
                       twogap_sa: GapOnSA, cfg: ExtractorConfig) -> GapRules:
    D2 = len(search2.blockid)
    ids, css, fes, ses, sls, els, cls = [], [], [], [], [], [], []
    for twoId in range(D2):
        lo = int(search2.start_on_salist[twoId])
        hi = int(search2.end_on_salist[twoId])
        if lo == -1 and hi == -1:
            continue
        oneId = int(search2.blockid[twoId])
        sl = int(search1.qrystart_len[oneId])
        el = int(search1.qryend_len[oneId])
        cl = int(search2.qryend_len[twoId])
        for tx in sample_indices(hi - lo + 1, cfg.sampler_twogap, cfg.is_sample):
            ids.append(twoId)
            css.append(int(twogap_sa.str_position[lo + tx]))
            fes.append(int(twogap_sa.length[lo + tx]))
            ses.append(int(twogap_sa.length2[lo + tx]))
            sls.append(sl)
            els.append(el)
            cls.append(cl)
    if not ids:
        return GapRules(*(np.empty(0, np.int32) for _ in range(7)))
    out = _twogap_batch(index.refstr_padded, index.rlp, index.l_tar, index.r_tar,
                        jnp.asarray(np.asarray(css, np.int32)),
                        jnp.asarray(np.asarray(fes, np.int32)),
                        jnp.asarray(np.asarray(ses, np.int32)),
                        jnp.asarray(np.asarray(sls, np.int32)),
                        jnp.asarray(np.asarray(els, np.int32)),
                        jnp.asarray(np.asarray(cls, np.int32)),
                        cfg.max_rule_span)
    v, ts, te, g1s, g1e, g2s, g2e = [np.asarray(x) for x in out]
    ids = np.asarray(ids, dtype=np.int64)
    m = v
    a = np.stack([ts[m], (te - ts)[m], (g1s - ts)[m], (g1e - ts)[m],
                  (g2s - ts)[m], (g2e - ts)[m], ids[m]], axis=1).astype(np.int64)
    a = a[np.argsort(a[:, 6], kind="stable")]
    return GapRules(ref_str_start=a[:, 0].astype(np.int32),
                    end=a[:, 1].astype(np.int32),
                    gap1=a[:, 2].astype(np.int32),
                    gap1_1=a[:, 3].astype(np.int32),
                    gap2=a[:, 4].astype(np.int32),
                    gap2_1=a[:, 5].astype(np.int32),
                    gappy_index=a[:, 6].astype(np.int32))
