"""Fully-sharded index engine: every O(corpus) array split across the devices
of a mesh, for corpora beyond a single chip's HBM (SURVEY.md section 2.3,
"TP for the index"; replaces the reference's hard single-device residency
constraint, ComTypes.h:23 REF_DEV_BUF_RATIO / Start.cu:496).

Layout
------
* ``sa``            — RANK-sharded: contiguous global-rank chunks, one per
                      device.  Rank-indexed access (occurrence expansion in
                      exact global SA order — the order sampling and rule
                      emission depend on) is a one-hot ``psum`` gather.
* ``refstr``/``rlp``— TOKEN-sharded: contiguous corpus slices plus bounded
                      halos (back: one max sentence + rule span, for the
                      sentence-anchor walk at ExtractPair.cu:1183-1191; front:
                      rule span + scan moves).
* ``lr_tar``        — TARGET-sharded: the target-token range of the sentences
                      overlapping each source slice.
* interval-LCP trees — NOT materialized on device at all (2 of the reference's
                      6 words/token): the sharded search below never reads them.

Search: interval refinement instead of transplanted binary search
-----------------------------------------------------------------
Pass 1/2 outputs (``up``/``down``/``longestmatch``) are functions of
(corpus, queries) only, so the sharded engine computes them with an algorithm
that maps better to distributed memory than the reference's LCP-accelerated
search (SuffixArray.cu:402-767): for a query token, the SA interval of its
length-(L+1) prefix is a sub-interval of its length-L interval, and within
that interval the (L+1)-th suffix tokens are sorted.  Refining therefore needs
only *single-token* lookups ``refstr[sa[M] + L]`` — each a pair of one-hot
psum gathers over ICI — instead of whole-suffix window comparisons.  Two
integer lower-bound searches per depth yield the exact global interval; every
device executes the identical lockstep search (replicated compute over sharded
memory), so results are bit-equal to the replicated path by construction
(enforced by tests/test_sharded_engine.py).

Downstream scans (gappy lookups, extraction) are owner-computes: work items
are partitioned by the corpus position they read around, and each device runs
the unchanged kernels (cgx_tpu.search.lookup / cgx_tpu.extract.device) over
its slice through global->local OffsetViews (cgx_tpu.utils.views).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cgx_tpu.config import ExtractorConfig
from cgx_tpu.search import passes
from cgx_tpu.utils.batching import Pending, chunked_batch

import warnings

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    from jax.experimental.shard_map import shard_map  # check_rep supported

MMOV = 16          # scan move width (search.lookup.MMOV)
# The refinement depth ladder and the host seed tables (depths 0-1 with no
# device dispatch) are shared with the replicated engine — see
# cgx_tpu.search.passes (DEPTH_CHUNK*, build_seed_tables, drive_refinement).


def make_mesh(n_devices: int = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), axis_names=("sa",))


@dataclasses.dataclass
class ShardedGrammarIndex:
    mesh: Mesh
    S: int
    reflen: int          # global rank count (= corpus token count)
    ref_glen: int        # padded refstr global length
    rlp_glen: int
    tgt_glen: int
    B: int               # owned source tokens per shard
    BR: int              # owned ranks per shard
    BH: int              # source back halo
    sa_l: jax.Array      # int32 [S, BR] rank-sharded global SA
    ref_l: jax.Array     # int32 [S, tlen] token slices of refstr_padded
    rlp_l: jax.Array     # uint32 [S, tlen]
    lrt_l: jax.Array     # int32 [S, ttlen] target slices of lr_tar
    src_off: np.ndarray  # int64 [S] global index of ref_l[s][0]
    tgt_off: np.ndarray  # int64 [S] global index of lrt_l[s][0]
    rmeta: jax.Array     # int32 [S, 1, 2] (rank_start, rank_count), sharded
    smeta: jax.Array     # int32 [S, 1, 3] (src_off, own_lo, own_hi), sharded
    # host-side seed tables answering refinement depths 0-2 without any device
    # dispatch (VERDICT r3 #3 — the top of the SA tree is tiny and replicable):
    # refstr[sa] is nondecreasing, so depth-1 intervals are bucket boundaries
    # (exclusive bincount cumsum); packed (first << 32 | second) keys are
    # globally sorted, so depth-2 intervals are one vectorized searchsorted,
    # and packed 21-bit trigram keys extend it to depth 3 (id space
    # permitting) so the device ladder starts at depth 3.
    seed_lo1: np.ndarray = None    # int64 [maxtok+2] bucket starts
    seed_hi1: np.ndarray = None    # int64 [maxtok+2] bucket ends
    seed_pk: np.ndarray = None     # int64 [reflen] packed depth-2 keys
    seed_pk3: np.ndarray = None    # int64 [reflen] packed depth-3 keys (opt)
    # per-shard device-local handles (populated lazily)
    _shards: dict = dataclasses.field(default_factory=dict)

    def owner_of(self, pos: np.ndarray) -> np.ndarray:
        """Owning shard of a corpus position (uniform chunks)."""
        return np.clip(np.asarray(pos, np.int64) // self.B, 0, self.S - 1)

    def local_shards(self) -> list:
        """Global shard ids whose device is addressable from this process
        (all of them single-process; a partition of [0, S) across hosts in a
        multi-process run)."""
        return sorted((sh.index[0].start or 0)
                      for sh in self.sa_l.addressable_shards)

    def shard_arrays(self, s: int):
        """(ref, rlp, lrt, offs) device-local views for shard ``s`` (must be
        locally addressable — see ``local_shards``)."""
        if s not in self._shards:
            def piece(arr):
                for sh in arr.addressable_shards:
                    if (sh.index[0].start or 0) == s:
                        return sh.data.reshape(sh.data.shape[1:])
                raise KeyError(f"shard {s} is not addressable here")
            offs = (jnp.int32(self.src_off[s]), jnp.int32(self.tgt_off[s]),
                    jnp.int32(self.ref_glen), jnp.int32(self.rlp_glen),
                    jnp.int32(self.tgt_glen))
            self._shards[s] = (piece(self.ref_l), piece(self.rlp_l),
                               piece(self.lrt_l), offs)
        return self._shards[s]

    def device_of(self, s: int):
        return self.mesh.devices.reshape(-1)[s]

    def qtok_on(self, s: int, queries):
        # cached on the QuerySet instance per device (lifetime-tied)
        return queries.device_tokens(self.device_of(s))

    def memory_per_device(self) -> dict:
        """Bytes of index state per device (the beyond-HBM story in numbers)."""
        per = {
            "sa": self.sa_l.dtype.itemsize * self.sa_l.shape[1],
            "refstr": self.ref_l.dtype.itemsize * self.ref_l.shape[1],
            "rlp": self.rlp_l.dtype.itemsize * self.rlp_l.shape[1],
            "lr_tar": self.lrt_l.dtype.itemsize * self.lrt_l.shape[1],
        }
        per["total"] = sum(per.values())
        per["replicated_equiv"] = 4 * (
            self.ref_glen + self.reflen * 3 + self.rlp_glen + self.tgt_glen)
        return per


def build_sharded_index(source, target, sa, align, cfg: ExtractorConfig,
                        mesh: Mesh = None,
                        n_devices: int = None) -> ShardedGrammarIndex:
    """Slice the corpus index across a mesh.  All slices are materialized from
    the host artifact arrays; in a multi-host deployment each host materializes
    only its processes' slices (the artifact is build-once, query-many)."""
    mesh = mesh or make_mesh(n_devices)
    S = mesh.devices.size
    mrs = cfg.max_rule_span
    refstr_padded = passes.pad_refstr(np.asarray(source.str_),
                                      cfg.qry_max_length)
    rlp_padded = np.concatenate([
        np.asarray(align.RLP, dtype=np.uint32),
        np.full(mrs + 2, 0xFFFF0000, dtype=np.uint32)])
    tgt_pad = np.full(mrs + 2, 255, dtype=np.int32)
    l_tar = np.concatenate([align.L_tar.astype(np.int32), tgt_pad])
    r_tar = np.concatenate([align.R_tar.astype(np.int32), tgt_pad])
    lr_tar = (l_tar << 8) | r_tar

    reflen = source.toklen
    ref_glen = len(refstr_padded)
    rlp_glen = len(rlp_padded)
    tgt_glen = len(lr_tar)

    # ---- token-sharded source slices (uniform length, bounded halos)
    BH = 256 + mrs + 16                 # sentence-anchor walk + span + slack
    FH = mrs + MMOV + 2 * mrs + 32      # scans + growth windows + slack
    B = -(-ref_glen // S)
    own_lo = np.arange(S, dtype=np.int64) * B
    own_hi = np.minimum(own_lo + B, ref_glen)
    src_off = own_lo - BH
    tlen = B + BH + FH
    cols = src_off[:, None] + np.arange(tlen)[None, :]
    inb = (cols >= 0) & (cols < ref_glen)
    ref_l = np.where(inb, refstr_padded[np.clip(cols, 0, ref_glen - 1)],
                     0).astype(np.int32)
    inb_r = (cols >= 0) & (cols < rlp_glen)
    rlp_l = np.where(inb_r, rlp_padded[np.clip(cols, 0, rlp_glen - 1)],
                     np.uint32(0xFFFF0000)).astype(np.uint32)

    # ---- target slices: sentences overlapping each source slice (+slack)
    src_sent = np.asarray(source.sentenceind, dtype=np.int64)
    tgt_sent = np.asarray(target.sentenceind, dtype=np.int64)
    n_sent = len(src_sent) - 1

    def sent_of(pos):
        return np.clip(np.searchsorted(src_sent, pos, side="right") - 1,
                       0, n_sent - 1)
    s_first = sent_of(np.maximum(own_lo - BH, 0))
    s_last = sent_of(np.minimum(own_hi + FH, reflen - 1))
    TH = MMOV + 2
    tgt_lo = np.maximum(tgt_sent[s_first] - TH, 0)
    tgt_hi = np.minimum(tgt_sent[np.minimum(s_last + 1, n_sent)] + TH,
                        tgt_glen)
    tgt_hi[-1] = tgt_glen              # last shard sees the global pad rows
    ttlen = int((tgt_hi - tgt_lo).max())
    tcols = tgt_lo[:, None] + np.arange(ttlen)[None, :]
    tinb = (tcols >= 0) & (tcols < tgt_glen)
    lrt_l = np.where(tinb, lr_tar[np.clip(tcols, 0, tgt_glen - 1)],
                     (255 << 8) | 255).astype(np.int32)

    # ---- rank-sharded global SA
    BR = -(-reflen // S)
    rstart = np.arange(S, dtype=np.int64) * BR
    rcount = np.minimum(rstart + BR, reflen) - rstart
    rcols = rstart[:, None] + np.arange(BR)[None, :]
    sa_np = np.asarray(sa.sa, dtype=np.int32)
    sa_l = sa_np[np.clip(rcols, 0, reflen - 1)]

    # ---- host seed tables for refinement depths 0-2 (no device dispatch)
    seed_lo1, seed_hi1, seed_pk, seed_pk3 = passes.build_seed_tables(
        refstr_padded, sa_np.astype(np.int64))

    shard = NamedSharding(mesh, P("sa"))
    rmeta = np.stack([rstart, rcount], axis=1).astype(np.int32)[:, None, :]
    smeta = np.stack([src_off, own_lo, own_hi], axis=1).astype(
        np.int32)[:, None, :]

    def dput(host):
        # multi-process: the mesh spans devices this process cannot address;
        # materialize only the locally-owned rows (each host computes the
        # same global slices deterministically)
        if jax.process_count() > 1:
            return jax.make_array_from_callback(host.shape, shard,
                                                lambda idx: host[idx])
        return jax.device_put(host, shard)

    return ShardedGrammarIndex(
        mesh=mesh, S=S, reflen=reflen, ref_glen=ref_glen, rlp_glen=rlp_glen,
        tgt_glen=tgt_glen, B=B, BR=BR, BH=BH,
        sa_l=dput(sa_l),
        ref_l=dput(ref_l),
        rlp_l=dput(rlp_l),
        lrt_l=dput(lrt_l),
        src_off=src_off, tgt_off=tgt_lo,
        rmeta=dput(rmeta),
        smeta=dput(smeta),
        seed_lo1=seed_lo1, seed_hi1=seed_hi1, seed_pk=seed_pk,
        seed_pk3=seed_pk3)


# ---------------------------------------------------------------------------
# distributed single-token gathers + the interval-refinement search
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("mesh", "depths"))
def _refine_chunk(sa_l, ref_l, rmeta, smeta, qtok, toks, sls, lo, hi, d0, *,
                  mesh, depths):
    def body(sa_s, ref_s, rmeta_s, smeta_s, qtok_r, toks_r, sls_r, lo_r,
             hi_r, d0_r):
        sa_s = sa_s[0]
        ref_s = ref_s[0]
        rstart = rmeta_s[0, 0, 0]
        rcount = rmeta_s[0, 0, 1]
        soff = smeta_s[0, 0, 0]
        olo = smeta_s[0, 0, 1]
        ohi = smeta_s[0, 0, 2]

        def g_sa(r):
            loc = r - rstart
            ok = (loc >= 0) & (loc < rcount)
            v = jnp.where(ok, sa_s[jnp.clip(loc, 0, sa_s.shape[0] - 1)], 0)
            return jax.lax.psum(v, "sa")

        def g_ref(p):
            ok = (p >= olo) & (p < ohi)
            v = jnp.where(ok, ref_s[jnp.clip(p - soff, 0,
                                             ref_s.shape[0] - 1)], 0)
            return jax.lax.psum(v, "sa")

        def lane(tok, sl, lo0, hi0):
            def lb(l0, h0, key, depth):
                def cond(st):
                    return st[1] > st[0]

                def step(st):
                    l, h = st
                    M = (l + h) >> 1
                    t = g_ref(g_sa(M) + depth)
                    ge = t >= key
                    return jnp.where(ge, l, M + 1), jnp.where(ge, M, h)
                return jax.lax.while_loop(cond, step, (l0, h0))[0]

            def dstep(c, st):
                lo_c, hi_c, ups, downs = st
                depth = d0_r + c
                qt = jnp.where(depth < sl, qtok_r[tok + depth], jnp.int32(-1))
                nlo = lb(lo_c, hi_c, qt, depth)
                nhi = lb(nlo, hi_c, qt + jnp.int32(1), depth)
                ups = ups.at[c].set(nlo)
                downs = downs.at[c].set(nhi - 1)
                return nlo, nhi, ups, downs

            z = jnp.zeros(depths, jnp.int32)
            lo_f, hi_f, ups, downs = jax.lax.fori_loop(
                0, depths, dstep, (lo0, hi0, z, z))
            return ups, downs, lo_f, hi_f

        return jax.vmap(lane)(toks_r, sls_r, lo_r, hi_r)

    return shard_map(
        body, mesh=mesh,
        in_specs=(P("sa"), P("sa"), P("sa"), P("sa"),
                  P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P()), check_rep=False)(
            sa_l, ref_l, rmeta, smeta, qtok, toks, sls, lo, hi, d0)


@functools.partial(jax.jit, static_argnames=("mesh",))
def _gather_sa_chunk(sa_l, rmeta, rows, *, mesh):
    def body(sa_s, rmeta_s, rows_r):
        rstart = rmeta_s[0, 0, 0]
        rcount = rmeta_s[0, 0, 1]
        loc = rows_r - rstart
        ok = (loc >= 0) & (loc < rcount)
        v = jnp.where(ok, sa_s[0][jnp.clip(loc, 0, sa_s.shape[1] - 1)], 0)
        return jax.lax.psum(v, "sa")
    return shard_map(body, mesh=mesh, in_specs=(P("sa"), P("sa"), P()),
                     out_specs=P(), check_rep=False)(sa_l, rmeta, rows)


def gather_sa(sidx: ShardedGrammarIndex, rows: np.ndarray) -> np.ndarray:
    """SA values at global ranks from the rank-sharded storage (exact global
    rank order — the canonical occurrence order downstream depends on)."""
    rows = np.asarray(rows, np.int32)
    if len(rows) == 0:
        return np.empty(0, np.int32)
    out = chunked_batch(
        lambda r: (_gather_sa_chunk(sidx.sa_l, sidx.rmeta, jnp.asarray(r),
                                    mesh=sidx.mesh),), [rows])
    return out[0].astype(np.int32)


def sharded_passes(sidx: ShardedGrammarIndex, queries):
    """Pass 1 + pass 2 via interval refinement over the distributed arrays;
    bit-equal to passes.pass1_tpu / pass2_tpu (search-path internals
    firstfindhit* are reported as -1 — they are not semantic outputs).
    Seed tables, depth ladder, and the driving loop are shared with the
    replicated engine (passes.drive_refinement); only the gathers differ
    (one-hot psum over the rank/token-sharded arrays)."""
    qtok_dev = jnp.asarray(queries.padded_tokens())

    def dispatch(toks_p, sls_p, lo_p, hi_p, depth, dchunk):
        return _refine_chunk(
            sidx.sa_l, sidx.ref_l, sidx.rmeta, sidx.smeta, qtok_dev,
            jnp.asarray(toks_p), jnp.asarray(sls_p), jnp.asarray(lo_p),
            jnp.asarray(hi_p), jnp.int32(depth),
            mesh=sidx.mesh, depths=dchunk)

    return passes.drive_refinement(
        queries, sidx.reflen,
        (sidx.seed_lo1, sidx.seed_hi1, sidx.seed_pk, sidx.seed_pk3),
        dispatch)


# ---------------------------------------------------------------------------
# owner-computes dispatch of the scan/extraction kernels
# ---------------------------------------------------------------------------

class ShardedEngine:
    """Drop-in engine for the device stages of the pipeline: same methods as
    cgx_tpu.engine.ReplicatedEngine, but every dispatch is partitioned by the
    owning shard of the position each work item reads around, and runs on that
    shard's device against its local slices."""

    def __init__(self, sidx: ShardedGrammarIndex, cfg: ExtractorConfig):
        self.sidx = sidx
        self.cfg = cfg

    # -- SA value access (global rank order preserved)
    def sa_values(self, rows: np.ndarray) -> np.ndarray:
        return gather_sa(self.sidx, rows)

    def _partitioned(self, pos_key, items, run_one, out_specs, fetch=True):
        """Partition items by owner shard, run ``run_one(s, *items_s)`` per
        shard, reassemble outputs in original item order.

        ``run_one`` must return a deferred handle (``Pending``, from
        ``chunked_batch(..., fetch=False)``): ALL shards' chunks dispatch
        before any fetch blocks, so the S devices compute concurrently — the
        sharded analog of the reference saturating its one device
        (SuffixArray.cu:1374-1378) instead of a 1/S-utilization serial walk.

        ``fetch=False`` defers the fetch+assembly too (returns a ``Pending``):
        the per-shard chunks are dispatched NOW, so independent kernel groups
        (the lookup's pcs/scan groups, the three extraction kernels) overlap
        their device work and round trips instead of serializing — without
        this the pipeline's dispatch-then-fetch pattern was a no-op in
        sharded mode.

        Multi-host composition: only locally-addressable shards dispatch here;
        every process runs the same deterministic item list (queries are
        replicated through the device path), fills the rows its shards own,
        and the rows exchange with one sum-allgather per output (each row is
        owned by exactly one process; the others contribute zeros).  Both the
        dispatches (call order) and the allgathers (fetch order) follow the
        same deterministic code path on every process.

        ``out_specs``: list of (trailing_shape, dtype) per output.
        Returns list of np arrays [N, *shape] (or a Pending of it).
        """
        import os
        serial = bool(os.environ.get("CGX_SHARDED_SERIAL"))  # A/B diagnostic
        sidx = self.sidx
        N = len(pos_key)
        outs = [np.zeros((N,) + tuple(sh), dt) for sh, dt in out_specs]
        dispatched = []
        if N:
            owner = sidx.owner_of(pos_key)
            for s in sidx.local_shards():
                sel = np.flatnonzero(owner == s)
                if not len(sel):
                    continue
                pend = run_one(s, *[a[sel] for a in items])
                if serial:
                    pend.get()
                dispatched.append((sel, pend))

        def _finish():
            for sel, pend in dispatched:
                for o, r in zip(outs, pend.get()):
                    o[sel] = r
            import jax as _jax
            if _jax.process_count() > 1:
                from jax.experimental import multihost_utils
                return [np.asarray(multihost_utils.process_allgather(o))
                        .sum(axis=0).astype(o.dtype) for o in outs]
            return outs
        return _finish() if fetch else Pending(_finish)

    # -- expanded entry points: ownership needs per-item positions anyway, so
    #    materialize the item list on the host and reuse the partitioned paths
    @staticmethod
    def _materialize(counts):
        counts = np.asarray(counts, np.int64)
        item_pat = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        cum = np.cumsum(counts)
        tx = np.arange(len(item_pat), dtype=np.int64) \
            - np.repeat(cum - counts, counts)
        return item_pat, tx

    def pcs_expanded(self, queries, pc, base, counts, sl, el, tok, stok, fetch=True):
        item_pat, tx = self._materialize(counts)
        row = np.asarray(base, np.int64)[item_pat] + tx
        return self.pcs(
            queries, pc.onegap_start[row], pc.onegap_length[row],
            np.asarray(sl, np.int64)[item_pat].astype(np.int32),
            np.asarray(el, np.int64)[item_pat].astype(np.int32),
            np.asarray(tok, np.int64)[item_pat].astype(np.int32),
            np.asarray(stok, np.int64)[item_pat].astype(np.int32),
            fetch=fetch)

    def scan_expanded(self, queries, fwd, lo, counts, sl, el, side,
                      fetch=True, do_gap=True):
        item_pat, tx = self._materialize(counts)
        gostart = self.sa_values(np.asarray(lo, np.int64)[item_pat] + tx)
        m = self.fwd if fwd else self.bwd
        return m(queries, gostart,
                 np.asarray(sl, np.int64)[item_pat].astype(np.int32),
                 np.asarray(el, np.int64)[item_pat].astype(np.int32),
                 np.asarray(side, np.int64)[item_pat].astype(np.int32),
                 fetch=fetch, do_gap=do_gap)

    def two_expanded(self, onegap_sa, pc, lo, counts, pcmode, fetch=True,
                     do_gap=True):
        item_pat, tx = self._materialize(counts)
        row = np.asarray(lo, np.int64)[item_pat] + tx
        pcm = np.asarray(pcmode, bool)[item_pat]
        og_sp = onegap_sa.str_position if len(onegap_sa.str_position) \
            else np.zeros(1, np.int32)
        og_len = onegap_sa.length if len(onegap_sa.length) \
            else np.zeros(1, np.int32)
        pc_sp = pc.onegap_start if len(pc.onegap_start) \
            else np.zeros(1, np.int32)
        pc_len = pc.onegap_length if len(pc.onegap_length) \
            else np.zeros(1, np.int32)
        row_sa = np.clip(row, 0, len(og_sp) - 1)
        row_pc = np.clip(row, 0, len(pc_sp) - 1)
        css = np.where(pcm, pc_sp[row_pc], og_sp[row_sa])
        fes = np.where(pcm, pc_len[row_pc], og_len[row_sa])
        return self.two(css.astype(np.int32), fes.astype(np.int32),
                        fetch=fetch, do_gap=do_gap)

    # -- lookup kernels ----------------------------------------------------
    def fwd(self, queries, gostart, sl, el, stok, fetch=True, do_gap=True):
        from cgx_tpu.search.lookup import _fwd_batch
        cfg = self.cfg

        def run_one(s, g, a, b, c):
            ref, rlp, lrt, offs = self.sidx.shard_arrays(s)
            qt = self.sidx.qtok_on(s, queries)
            return chunked_batch(
                lambda *x: _fwd_batch(ref, rlp, lrt, qt,
                                      *(jnp.asarray(v) for v in x), offs,
                                      cfg.max_rule_span, cfg.min_gap_size,
                                      do_gap=do_gap),
                [g, a, b, c], fetch=False)
        return self._partitioned(gostart, [gostart, sl, el, stok], run_one,
                                 [((), np.int32)], fetch=fetch)

    def bwd(self, queries, gostart, sl, el, tok, fetch=True, do_gap=True):
        from cgx_tpu.search.lookup import _bwd_batch
        cfg = self.cfg

        def run_one(s, g, a, b, c):
            ref, rlp, lrt, offs = self.sidx.shard_arrays(s)
            qt = self.sidx.qtok_on(s, queries)
            return chunked_batch(
                lambda *x: _bwd_batch(ref, rlp, lrt, qt,
                                      *(jnp.asarray(v) for v in x), offs,
                                      cfg.max_rule_span, cfg.min_gap_size,
                                      do_gap=do_gap),
                [g, a, b, c], fetch=False)
        return self._partitioned(gostart, [gostart, sl, el, tok], run_one,
                                 [((), np.int32)], fetch=fetch)

    def pcs(self, queries, pstart, plen, sl, el, tok, stok, fetch=True):
        from cgx_tpu.search.lookup import _pcs_batch
        cfg = self.cfg

        def run_one(s, *its):
            ref, rlp, lrt, offs = self.sidx.shard_arrays(s)
            qt = self.sidx.qtok_on(s, queries)
            return chunked_batch(
                lambda *x: _pcs_batch(ref, qt, *(jnp.asarray(v) for v in x),
                                      offs, cfg.max_rule_span),
                list(its), fetch=False)
        return self._partitioned(pstart, [pstart, plen, sl, el, tok, stok],
                                 run_one, [((), bool)], fetch=fetch)

    def two(self, pstart, plen, fetch=True, do_gap=True):
        from cgx_tpu.search.lookup import _two_batch
        cfg = self.cfg

        def run_one(s, p, q):
            ref, rlp, lrt, offs = self.sidx.shard_arrays(s)
            return chunked_batch(
                lambda *x: _two_batch(ref, rlp, lrt,
                                      *(jnp.asarray(v) for v in x), offs,
                                      cfg.max_rule_span, cfg.min_gap_size,
                                      do_gap=do_gap),
                [p, q], fetch=False)
        return self._partitioned(pstart, [pstart, plen], run_one,
                                 [((), np.int32)] * 2, fetch=fetch)

    def gap_check(self, gostart, fwd, fetch=True):
        """Owner-computes precompute gap checks (the one device stage of the
        one-time precompute build): each occurrence's RLP/target window is read
        on the shard owning its corpus position, so building the artifact with
        ``sa_shards > 0`` never materializes a replicated O(corpus) device
        array (reference analog: the build fits the device budget,
        Start.cu:496 / GappyLook.cu:740-869)."""
        from cgx_tpu.search.precompute import _gc_batch
        cfg = self.cfg
        gostart = np.asarray(gostart, np.int32)

        def run_one(s, g):
            ref, rlp, lrt, offs = self.sidx.shard_arrays(s)
            return chunked_batch(
                lambda x: (_gc_batch(rlp, lrt, jnp.asarray(x), offs,
                                     cfg.max_rule_span, cfg.min_gap_size,
                                     fwd),),
                [g], fetch=False)
        return self._partitioned(gostart, [gostart], run_one,
                                 [((), np.uint32)], fetch=fetch)

    # -- extraction kernels ------------------------------------------------
    def contig(self, sa_pos, lm, fetch=True):
        from cgx_tpu.extract.device import _contig_batch_pos
        cfg = self.cfg
        cs_all = self.sa_values(np.asarray(sa_pos, np.int32))

        def run_one(s, c, l):
            ref, rlp, lrt, offs = self.sidx.shard_arrays(s)
            return chunked_batch(
                lambda *x: _contig_batch_pos(ref, rlp, lrt,
                                             *(jnp.asarray(v) for v in x),
                                             offs, cfg.max_rule_span,
                                             cfg.max_rule_symbols),
                [c, l], fetch=False)
        return self._partitioned(cs_all, [cs_all, np.asarray(lm, np.int32)],
                                 run_one, [((), np.int32)] * 8, fetch=fetch)

    def onegap(self, css, fes, sls, els, fetch=True):
        from cgx_tpu.extract.device import _onegap_batch
        cfg = self.cfg

        def run_one(s, *its):
            ref, rlp, lrt, offs = self.sidx.shard_arrays(s)
            return chunked_batch(
                lambda *x: _onegap_batch(ref, rlp, lrt,
                                         *(jnp.asarray(v) for v in x), offs,
                                         cfg.max_rule_span,
                                         cfg.max_rule_symbols),
                list(its), fetch=False)
        return self._partitioned(css, [css, fes, sls, els], run_one,
                                 [((), np.int32)] * 6, fetch=fetch)

    def twogap(self, css, fes, ses, sls, els, cls, fetch=True):
        from cgx_tpu.extract.device import _twogap_batch
        cfg = self.cfg

        def run_one(s, *its):
            ref, rlp, lrt, offs = self.sidx.shard_arrays(s)
            return chunked_batch(
                lambda *x: _twogap_batch(ref, rlp, lrt,
                                         *(jnp.asarray(v) for v in x), offs,
                                         cfg.max_rule_span),
                list(its), fetch=False)
        return self._partitioned(css, [css, fes, ses, sls, els, cls],
                                 run_one, [((), np.int32)] * 2, fetch=fetch)
