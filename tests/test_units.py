"""Unit tests for the dispatch/packing machinery introduced by the
transfer-optimization work: emission-family packing, hit expansion,
global->local offset views, and chunk planning."""

import numpy as np
import jax.numpy as jnp

from cgx_tpu.engine import expand_hits, _offsets
from cgx_tpu.extract.device import _pack_family, unpack_family
from cgx_tpu.utils.batching import chunk_plan, chunked_indices, bucket_size
from cgx_tpu.utils.views import OffsetView


def test_pack_family_roundtrip():
    rng = np.random.default_rng(0)
    n = 257
    v = rng.random(n) < 0.5
    ts = rng.integers(0, 1 << 28, n).astype(np.int32)
    te = ts + rng.integers(0, 15, n)
    g1s = ts + rng.integers(0, 15, n)
    g1e = ts + rng.integers(0, 15, n)
    g2s = ts + rng.integers(0, 15, n)
    g2e = ts + rng.integers(0, 15, n)
    o_ts, pk = _pack_family(jnp.asarray(v), jnp.asarray(ts), jnp.asarray(te),
                            jnp.asarray(g1s), jnp.asarray(g1e),
                            jnp.asarray(g2s), jnp.asarray(g2e))
    uv, uts, ute, ug1s, ug1e, ug2s, ug2e = unpack_family(
        np.asarray(o_ts), np.asarray(pk), two_gaps=True)
    np.testing.assert_array_equal(uv, v)
    np.testing.assert_array_equal(uts, ts)
    # offsets only defined where valid (masked to 0 otherwise)
    np.testing.assert_array_equal(ute[v], te[v])
    np.testing.assert_array_equal(ug1s[v], g1s[v])
    np.testing.assert_array_equal(ug1e[v], g1e[v])
    np.testing.assert_array_equal(ug2s[v], g2s[v])
    np.testing.assert_array_equal(ug2e[v], g2e[v])
    np.testing.assert_array_equal(ute[~v], ts[~v])


def test_expand_hits_matches_repeat():
    rng = np.random.default_rng(1)
    counts = rng.integers(0, 7, 50)
    ids = rng.integers(100, 200, 50)
    item_pat = np.repeat(ids, counts)
    offs = np.concatenate([[0], np.cumsum(counts)])[:-1]
    tx_all = np.arange(counts.sum()) - np.repeat(offs, counts)
    hits = np.flatnonzero(rng.random(int(counts.sum())) < 0.3)
    pat, tx, pi = expand_hits(hits, counts, ids)
    np.testing.assert_array_equal(pat, item_pat[hits])
    np.testing.assert_array_equal(tx, tx_all[hits])
    assert _offsets(counts)[-1] == counts.sum()


def test_offset_view_matches_global():
    g = np.arange(1000, dtype=np.int32) * 3
    off = 100
    local = jnp.asarray(g[off:400])
    view = OffsetView(local, jnp.int32(off), jnp.int32(len(g)))
    assert view.shape[0] == len(g)
    idx = jnp.asarray([100, 150, 399, 250])
    np.testing.assert_array_equal(np.asarray(view[idx]), g[np.asarray(idx)])


def test_chunk_plan_covers_and_is_pow2():
    for n in (0, 1, 63, 64, 4095, 4096, 131072, 131073, 1_000_001):
        sizes = chunk_plan(n)
        assert sum(sizes) == n
        for sz in sizes[:-1]:
            assert sz & (sz - 1) == 0


def test_chunked_indices_item_div():
    # call returns one packed word per 32 items: the helper must slice and
    # concatenate packed outputs correctly, including the padded tail
    def call(start, n):
        g = start + np.arange(n)
        bits = (g % 5 == 0).astype(np.uint32)
        return (jnp.asarray(
            bits.reshape(-1, 32) << np.arange(32, dtype=np.uint32)).sum(
                axis=1, dtype=jnp.uint32),)
    N = 70000
    (words,) = chunked_indices(call, N, chunk=16384, item_div=32)
    got = ((np.asarray(words)[:, None] >> np.arange(32)) & 1).ravel()[:N]
    np.testing.assert_array_equal(got, (np.arange(N) % 5 == 0).astype(int))
