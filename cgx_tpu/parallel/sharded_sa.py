"""Sharded-SA mode: the suffix array + interval-LCP tree split by rank range
across the devices of a mesh ("TP for the index", SURVEY.md section 2.3), for
corpora whose rank-indexed arrays don't fit one chip's HBM.

Design
------
Token-indexed arrays (refstr, RLP, L/R_tar — needed by every consistency check)
stay replicated; the rank-indexed arrays (sa, lcpleft, lcpright — 3 of the 6
words/token of device index state, and the only ones the pass-1/2 binary search
touches) are sharded into S contiguous rank slices with a ONE-RANK HALO on each
side.  Every query-token search runs on every shard against its local slice
(replicated work, sharded memory); per-shard results combine exactly:

* suffixes matching a given query prefix form one contiguous global rank
  interval, so its intersection with a shard's owned range is contiguous, and
  the global interval is the (min-up, max-down) union of per-shard intervals;
* the halo makes every OWNED rank interior to its shard's local slice, so the
  reference's elided SA-boundary probe (see cgx_tpu.search.passes) stays dead:
  the local binary search (midpoints are exclusive of the slice ends) can reach
  every owned rank, and its up/down walks can only return owned ranks;
* per-shard interval-LCP trees are rebuilt over each local slice with the same
  recursion as the reference (recursion_lcp, SuffixArray.c:131-141) from the
  global Kasai LCP array (duplicated clamp rows at the corpus ends get their
  true LCP — the full suffix length).

Downstream stages (lookups, extraction, features) read SA *values* from the
host copy (built on the host anyway), so pass-1/2 are the only device
consumers of rank-indexed state; `gather_rows` is provided for deployments
that keep occurrence expansion on device.

Combined Pass1Result/Pass2Result carry the semantic outputs (longestmatch +
per-length up/down ranges, bit-equal to the single-chip path — enforced by
tests/test_sharded_sa.py); the search-path-dependent firstfindhit fields are
per-shard internals and are reported as -1.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cgx_tpu.preproc.suffix_array import SAIndex, interval_lcp_tree
from cgx_tpu.search import passes
from cgx_tpu.types import Pass1Result, Pass2Result
from cgx_tpu.utils.batching import pad_items


def make_sa_mesh(n_devices: int = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), axis_names=("sa",))


@dataclasses.dataclass
class ShardedSAIndex:
    S: int                  # number of shards
    m: int                  # local slice length (owned + 2 halo ranks)
    owned: int              # owned ranks per shard
    n: int                  # global rank count (corpus length)
    gstart: np.ndarray      # int64 [S] global rank of local index 0
    sa_l: jax.Array         # int32 [S, m], sharded over "sa"
    lcpleft_l: jax.Array
    lcpright_l: jax.Array
    mesh: Mesh


def build_sharded_sa(sa: SAIndex, mesh: Mesh) -> ShardedSAIndex:
    """Slice the global SA/LCP-tree into equal rank ranges with VIRTUAL boundary
    rows — global rank 0 (the separator-initial suffix, the global minimum) on the
    left and rank n-1 (the sentinel suffix, the global maximum) on the right — so
    each local slice satisfies the same invariant as the global SA: its boundary
    rows sort outside every owned row and can never match a query (separator < 2,
    sentinel > any vocab id).  The reference's COMP1 boundary probe
    (SuffixArray.cu:484-514) therefore stays dead per shard, exactly as in the
    replicated path.  Local LCPs are honest: consecutive ranks reuse the global
    Kasai array; the virtual edges use prefix/suffix range-mins of it; duplicated
    rows (rank-0 on shard 0, sentinel tail padding) get their true self-LCP."""
    S = mesh.devices.size
    n = len(sa.sa)
    owned = -(-n // S)
    m = owned + 2
    gstart = np.arange(S, dtype=np.int64) * owned - 1
    rows = np.clip(gstart[:, None] + np.arange(m)[None, :], 0, n - 1)
    rows[:, 0] = 0          # virtual left boundary: global minimum suffix
    rows[:, -1] = n - 1     # virtual right boundary: sentinel suffix
    sa_np = np.asarray(sa.sa, dtype=np.int32)
    sa_l = sa_np[rows]
    lcp_g = np.asarray(sa.lcp, dtype=np.int32).astype(np.int64)
    # pm[r] = LCP(rank 0, rank r) = min(lcp[1..r]); sm[r] = LCP(rank r, n-1)
    pm = np.minimum.accumulate(
        np.concatenate([[2 ** 31], lcp_g[1:]]))
    sm = np.minimum.accumulate(
        np.concatenate([[2 ** 31], lcp_g[1:][::-1]]))[::-1]
    lcp_l = np.zeros((S, m), dtype=np.int32)
    prev, cur = rows[:, :-1], rows[:, 1:]
    vals = np.where(prev == cur, (n - sa_np[cur]).astype(np.int64),
                    np.where(prev == 0, pm[cur],
                             np.where(cur == n - 1, sm[prev],
                                      lcp_g[np.clip(cur, 0, n - 1)])))
    lcp_l[:, 1:] = vals.astype(np.int32)
    ll = np.zeros((S, m), dtype=np.int32)
    lr = np.zeros((S, m), dtype=np.int32)
    for s in range(S):
        ll[s], lr[s] = interval_lcp_tree(lcp_l[s])
    shard = NamedSharding(mesh, P("sa"))
    return ShardedSAIndex(
        S=S, m=m, owned=owned, n=n, gstart=gstart,
        sa_l=jax.device_put(sa_l, shard),
        lcpleft_l=jax.device_put(ll, shard),
        lcpright_l=jax.device_put(lr, shard), mesh=mesh)


@functools.partial(jax.jit, static_argnames=("mesh", "m"))
def _pass1_step(refstr, qtokens, sa_l, ll_l, lr_l, toks, suffixlens, *,
                mesh, m):
    from jax.experimental.shard_map import shard_map

    def step(refstr_r, qtok_r, sa_s, ll_s, lr_s, toks_s, sl_s):
        f = functools.partial(passes._pass1_token, refstr_r, sa_s[0], ll_s[0],
                              lr_s[0], qtok_r, m)
        out = jax.vmap(f)(toks_s, sl_s)
        return tuple(x[None] for x in out)

    return shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P("sa"), P("sa"), P("sa"), P(), P()),
        out_specs=(P("sa"),) * 6, check_rep=False)(
            refstr, qtokens, sa_l, ll_l, lr_l, toks, suffixlens)


@functools.partial(jax.jit, static_argnames=("mesh",))
def _pass2_step(refstr, qtokens, sa_l, ll_l, lr_l, seeds, toks, matches, *,
                mesh):
    from jax.experimental.shard_map import shard_map

    def step(refstr_r, qtok_r, sa_s, ll_s, lr_s, seeds_s, toks_s, match_s):
        ffh, ffl, ffr = seeds_s[0]
        f = functools.partial(passes._pass2_item, refstr_r, sa_s[0], ll_s[0],
                              lr_s[0], qtok_r)
        up, down = jax.vmap(f)(toks_s, match_s, ffl[toks_s], ffh[toks_s],
                               ffr[toks_s])
        return up[None], down[None]

    return shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P("sa"), P("sa"), P("sa"), P("sa"), P(), P()),
        out_specs=(P("sa"), P("sa")), check_rep=False)(
            refstr, qtokens, sa_l, ll_l, lr_l, seeds, toks, matches)


def _combine(gstart, up_s, down_s, valid):
    """(min up, max down) union of per-shard local rank intervals -> global."""
    gup = np.where(valid, gstart[:, None] + up_s, np.int64(2 ** 62))
    gdn = np.where(valid, gstart[:, None] + down_s, np.int64(-1))
    up = gup.min(axis=0)
    down = gdn.max(axis=0)
    any_v = valid.any(axis=0)
    return (np.where(any_v, up, -1).astype(np.int32),
            np.where(any_v, down, -1).astype(np.int32))


def pass1_sharded(ssa: ShardedSAIndex, index, queries):
    """Sharded-SA pass 1: returns (combined Pass1Result, per-shard seeds for
    pass 2).  up/down/longestmatch are bit-equal to pass1_tpu."""
    n = queries.totaltokens
    ends = np.array([queries.query_end(int(q)) for q in queries.tok_to_qry],
                    dtype=np.int32)
    toks = np.arange(n, dtype=np.int32)
    _, toks_p, sl_p = pad_items(toks, (ends - toks).astype(np.int32))
    out = _pass1_step(
        index.refstr_padded, index.device_query_tokens(queries),
        ssa.sa_l, ssa.lcpleft_l, ssa.lcpright_l,
        jnp.asarray(toks_p), jnp.asarray(sl_p), mesh=ssa.mesh, m=ssa.m)
    lm_s, up_s, down_s, ffh_s, ffl_s, ffr_s = (
        np.asarray(x)[:, :n] for x in jax.device_get(out))
    lm = lm_s.max(axis=0).astype(np.int32)
    up, down = _combine(ssa.gstart, up_s, down_s, up_s >= 0)
    neg = np.full(n, -1, dtype=np.int32)
    p1 = Pass1Result(up=up, down=down, firstfindhit=neg.copy(),
                     firstfindhitL=neg.copy(), firstfindhitR=neg.copy(),
                     longestmatch=lm)
    return p1, (ffh_s, ffl_s, ffr_s)


def pass2_sharded(ssa: ShardedSAIndex, index, queries, p1: Pass1Result,
                  seeds) -> Pass2Result:
    """Sharded-SA pass 2: every (token, length) item re-searches each shard from
    that shard's own first-hit window; ranges combine as in pass 1."""
    connectoffset, toks, matches = passes.pass2_work_items(p1)
    total = len(toks)
    if total == 0:
        return Pass2Result(connectoffset=connectoffset,
                           up=np.empty(0, np.int32),
                           down=np.empty(0, np.int32))
    ffh_s, ffl_s, ffr_s = seeds
    seeds_dev = jax.device_put(
        np.stack([np.stack([ffh_s[s], ffl_s[s], ffr_s[s]])
                  for s in range(ssa.S)]),
        NamedSharding(ssa.mesh, P("sa")))
    _, toks_p, match_p = pad_items(toks, matches)
    up_s, down_s = (np.asarray(x)[:, :total] for x in jax.device_get(
        _pass2_step(index.refstr_padded, index.device_query_tokens(queries),
                    ssa.sa_l, ssa.lcpleft_l, ssa.lcpright_l, seeds_dev,
                    jnp.asarray(toks_p), jnp.asarray(match_p), mesh=ssa.mesh)))
    up, down = _combine(ssa.gstart, up_s, down_s, up_s >= 0)
    return Pass2Result(connectoffset=connectoffset, up=up, down=down)


@functools.partial(jax.jit, static_argnames=("mesh", "owned"))
def _gather_step(sa_l, rows, gstart_dev, *, mesh, owned):
    from jax.experimental.shard_map import shard_map

    def step(sa_s, rows_s, gs_s):
        g0 = gs_s[0, 0] + 1       # first owned global rank of this shard
        local = rows_s - g0 + 1   # +1: local index of the first owned rank
        own = (rows_s >= g0) & (rows_s < g0 + owned)
        v = jnp.where(own, sa_s[0][jnp.clip(local, 0, sa_s.shape[1] - 1)], 0)
        return jax.lax.psum(v, "sa")

    return shard_map(step, mesh=mesh,
                     in_specs=(P("sa"), P(), P("sa")),
                     out_specs=P(), check_rep=False)(sa_l, rows, gstart_dev)


def gather_rows(ssa: ShardedSAIndex, rows: np.ndarray) -> np.ndarray:
    """SA values at global ranks from sharded storage (each rank owned by
    exactly one shard; psum combines the one-hot contributions over ICI)."""
    if len(rows) == 0:
        return np.empty(0, np.int32)
    _, rows_p = pad_items(np.asarray(rows, np.int32))
    gstart_dev = jax.device_put(ssa.gstart.astype(np.int32)[:, None],
                                NamedSharding(ssa.mesh, P("sa")))
    out = _gather_step(ssa.sa_l, jnp.asarray(rows_p), gstart_dev,
                       mesh=ssa.mesh, owned=ssa.owned)
    return np.asarray(out)[: len(rows)]
