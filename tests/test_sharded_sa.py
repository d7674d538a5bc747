"""Sharded-SA mode: rank-range shards over an 8-device mesh must reproduce the
single-chip pass-1/pass-2 results (and hence the whole downstream pipeline)."""

import numpy as np
import jax
import pytest

from cgx_tpu.config import ExtractorConfig
from cgx_tpu.index import container as ic
from cgx_tpu.preproc import corpus as cp
from cgx_tpu.preproc import suffix_array as sab
from cgx_tpu.oracle import search as se
from cgx_tpu.parallel import sharded_sa as ss

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def world(toy_fixture):
    cfg = ExtractorConfig(precompute_count=30)
    src = cp.load_source_corpus(cp.read_lines(str(toy_fixture / "corpus.f")))
    tgt = cp.load_target_corpus(cp.read_lines(str(toy_fixture / "corpus.e")))
    al = cp.load_alignment(cp.read_lines(str(toy_fixture / "corpus.a")), src,
                           tgt)
    lex = cp.load_lex_table(cp.read_tokens(str(toy_fixture / "lex.txt")),
                            src.vocab, tgt.vocab)
    qs = cp.load_queries(cp.read_lines(str(toy_fixture / "query.f")),
                         src.vocab)
    sa = sab.build_index(src.str_)
    idx = ic.build_index(src, tgt, sa, al, lex, cfg)
    return cfg, src, tgt, qs, sa, idx


@needs8
def test_pass12_sharded_matches_single_chip(world):
    cfg, src, tgt, qs, sa, idx = world
    p1_ref = se.pass1(src, sa, qs)
    p2_ref = se.pass2(src, sa, qs, p1_ref)

    mesh = ss.make_sa_mesh(8)
    ssa = ss.build_sharded_sa(sa, mesh)
    assert ssa.S == 8 and ssa.owned * 8 >= ssa.n
    p1, seeds = ss.pass1_sharded(ssa, idx, qs)
    np.testing.assert_array_equal(p1.longestmatch, p1_ref.longestmatch)
    np.testing.assert_array_equal(p1.up, p1_ref.up)
    np.testing.assert_array_equal(p1.down, p1_ref.down)

    p2 = ss.pass2_sharded(ssa, idx, qs, p1, seeds)
    np.testing.assert_array_equal(p2.connectoffset, p2_ref.connectoffset)
    np.testing.assert_array_equal(p2.up, p2_ref.up)
    np.testing.assert_array_equal(p2.down, p2_ref.down)


@needs8
def test_gather_rows(world):
    cfg, src, tgt, qs, sa, idx = world
    mesh = ss.make_sa_mesh(8)
    ssa = ss.build_sharded_sa(sa, mesh)
    rng = np.random.default_rng(7)
    rows = rng.integers(0, ssa.n, size=257).astype(np.int32)
    got = ss.gather_rows(ssa, rows)
    np.testing.assert_array_equal(got, np.asarray(sa.sa)[rows])


@needs8
def test_pipeline_with_sharded_sa_matches(world, toy_fixture):
    """End-to-end: grammars produced with sharded-SA pass 1/2 equal the
    replicated-index pipeline byte for byte."""
    from cgx_tpu import pipeline as tpl

    cfg = ExtractorConfig(precompute_count=30)
    args = (cp.read_lines(str(toy_fixture / "corpus.f")),
            cp.read_lines(str(toy_fixture / "corpus.e")),
            cp.read_lines(str(toy_fixture / "corpus.a")),
            cp.read_tokens(str(toy_fixture / "lex.txt")),
            cp.read_lines(str(toy_fixture / "query.f")))
    ref = tpl.run_pipeline(*args, cfg)
    got = tpl.run_pipeline(*args, cfg, sa_shards=8)
    assert got.per_query_lines == ref.per_query_lines
