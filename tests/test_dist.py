"""Query-DP sharding: the 8-device mesh path must reproduce single-chip results."""

import numpy as np
import jax
import pytest

from cgx_tpu.config import ExtractorConfig
from cgx_tpu.index import container as ic
from cgx_tpu.preproc import corpus as cp
from cgx_tpu.preproc import suffix_array as sab
from cgx_tpu.oracle import search as se
from cgx_tpu.extract.blocks import generate_blocks
from cgx_tpu.parallel import dist


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_search_matches_single_chip(toy_fixture):
    cfg = ExtractorConfig(precompute_count=30)
    src = cp.load_source_corpus(cp.read_lines(str(toy_fixture / "corpus.f")))
    tgt = cp.load_target_corpus(cp.read_lines(str(toy_fixture / "corpus.e")))
    al = cp.load_alignment(cp.read_lines(str(toy_fixture / "corpus.a")), src, tgt)
    lex = cp.load_lex_table(cp.read_tokens(str(toy_fixture / "lex.txt")),
                            src.vocab, tgt.vocab)
    qs = cp.load_queries(cp.read_lines(str(toy_fixture / "query.f")), src.vocab)
    sa = sab.build_index(src.str_)
    idx = ic.build_index(src, tgt, sa, al, lex, cfg)
    p1 = se.pass1(src, sa, qs)
    p2 = se.pass2(src, sa, qs, p1)
    blocks = generate_blocks(sa, qs, p1, p2)

    mesh = dist.make_mesh(8)
    lm, n_match, n_rules = dist.run_sharded_search(mesh, idx, qs, blocks, cfg)
    np.testing.assert_array_equal(lm, p1.longestmatch)
    # pad lanes carry suffixlen 0 / matchlen 0 and contribute nothing
    assert n_match == int((p1.longestmatch > 0).sum())
    assert n_rules > 0


def test_multihost_query_slicing(toy_fixture, tmp_path):
    """Simulated 2-host run: per-host shards' grammar files must equal the
    single-host output exactly."""
    from cgx_tpu.parallel import multihost as mh
    from cgx_tpu import pipeline as tpl
    from cgx_tpu.preproc import corpus as cp

    cfg = ExtractorConfig(precompute_count=30)
    args = (cp.read_lines(str(toy_fixture / "corpus.f")),
            cp.read_lines(str(toy_fixture / "corpus.e")),
            cp.read_lines(str(toy_fixture / "corpus.a")),
            cp.read_tokens(str(toy_fixture / "lex.txt")),
            cp.read_lines(str(toy_fixture / "query.f")))
    full = tpl.run_pipeline(*args, cfg)
    n = len(args[4])
    got = {}
    for pid in range(2):
        lo, hi = mh.query_slice(n, process_id=pid, process_count=2)
        res = tpl.run_pipeline(args[0], args[1], args[2], args[3],
                               args[4][lo:hi], cfg)
        for ql, lines in enumerate(res.per_query_lines):
            got[lo + ql] = lines
    assert len(got) == n
    for q in range(n):
        assert got[q] == full.per_query_lines[q], f"query {q} differs across hosts"
