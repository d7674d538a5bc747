"""Oracle validation against brute-force definitions + end-to-end smoke run."""

import numpy as np
import pytest

from cgx_tpu.config import ExtractorConfig
from cgx_tpu.preproc import corpus as cp
from cgx_tpu.preproc import suffix_array as sab
from cgx_tpu.oracle import search as se
from cgx_tpu.oracle import pipeline as pl


def _mini_world(seed=0, nsent=40, nq=4):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(30)]
    f_lines = [" ".join(rng.choice(words, size=rng.integers(3, 9)))
               for _ in range(nsent)]
    src = cp.load_source_corpus(f_lines)
    q_lines = []
    for _ in range(nq):
        toks = list(rng.choice(words, size=rng.integers(2, 7)))
        if rng.random() < 0.5:
            toks.insert(int(rng.integers(0, len(toks))), "OOV")
        q_lines.append(" ".join(toks))
    qs = cp.load_queries(q_lines, src.vocab)
    sa = sab.build_index(src.str_, use_native=False)
    return src, qs, sa


def _brute_longest(src, qs, t):
    """Longest common prefix between query suffix at t and any corpus position,
    stopping at corpus separators / query end / OOV."""
    q = int(qs.tok_to_qry[t])
    end = qs.query_end(q)
    best = 0
    s = src.str_
    for pos in range(src.toklen):
        m = 0
        while (t + m < end and int(qs.tokens[t + m]) != -1
               and pos + m < src.toklen and int(s[pos + m]) == int(qs.tokens[t + m])
               and int(s[pos + m]) != 1):
            m += 1
        best = max(best, m)
    return best


def test_pass1_longest_and_range_bruteforce():
    src, qs, sa = _mini_world()
    p1 = se.pass1(src, sa, qs)
    first = src.str_[sa.sa]
    for t in range(qs.totaltokens):
        tok = int(qs.tokens[t])
        expect = _brute_longest(src, qs, t)
        assert int(p1.longestmatch[t]) == expect, f"token {t}"
        if expect > 0:
            hits = np.flatnonzero(first == tok)
            assert int(p1.up[t]) == int(hits[0])
            assert int(p1.down[t]) == int(hits[-1])


def test_pass2_ranges_bruteforce():
    src, qs, sa = _mini_world(seed=1)
    p1 = se.pass1(src, sa, qs)
    p2 = se.pass2(src, sa, qs, p1)
    s = src.str_
    for t in range(qs.totaltokens):
        lm = int(p1.longestmatch[t])
        if lm <= 1:
            continue
        base = int(p2.connectoffset[t])
        for match in range(2, lm + 1):
            # brute-force SA range of the match-length prefix
            lo = hi = None
            for r in range(src.toklen):
                pos = int(sa.sa[r])
                okm = all(pos + k < src.toklen
                          and int(s[pos + k]) == int(qs.tokens[t + k])
                          for k in range(match))
                if okm:
                    if lo is None:
                        lo = r
                    hi = r
            assert lo is not None
            cc = base + match - 2
            assert int(p2.up[cc]) == lo and int(p2.down[cc]) == hi


def test_onegap_lookup_bruteforce():
    """Every reported aXb occurrence must really match the pattern and pass the
    gap-consistency check; and all brute-force occurrences must be reported."""
    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(12)]
    f_lines = [" ".join(rng.choice(words, size=rng.integers(3, 9)))
               for _ in range(25)]
    e_lines, a_lines = [], []
    for f in f_lines:
        n = len(f.split())
        e_lines.append(" ".join(f"t{w[1:]}" for w in f.split()))
        a_lines.append(" ".join(f"{i}-{i}" for i in range(n)))  # diagonal alignment
    src = cp.load_source_corpus(f_lines)
    tgt = cp.load_target_corpus(e_lines)
    al = cp.load_alignment(a_lines, src, tgt)
    qs = cp.load_queries([f_lines[0], f_lines[5]], src.vocab)
    sa = sab.build_index(src.str_, use_native=False)
    cfg = ExtractorConfig(precompute_count=5)
    pc = se.precompute(src, sa, al, cfg)
    p1 = se.pass1(src, sa, qs)
    p2 = se.pass2(src, sa, qs, p1)
    e1, s1 = se.sort_and_dedup_onegap(se.one_gap_enumeration(qs, p1, cfg), qs)
    og = se.one_gap_lookup(src, sa, al, qs, p1, p2, s1, pc, cfg)

    s = src.str_
    for d in range(len(s1.qrystart)):
        sl, el = int(s1.qrystart_len[d]), int(s1.qryend_len[d])
        tok = int(s1.qrystart[d])
        stok = tok + int(s1.gap[d]) + sl
        a = [int(qs.tokens[tok + k]) for k in range(sl)]
        b = [int(qs.tokens[stok + k]) for k in range(el)]
        # brute-force occurrences
        brute = set()
        for pos in range(src.toklen - 1):
            if [int(x) for x in s[pos:pos + sl]] != a:
                continue
            for gap in range(cfg.min_gap_size, cfg.max_rule_span):
                endb = pos + sl + gap + el  # exclusive
                if endb - pos > cfg.max_rule_span:
                    break
                seg = [int(x) for x in s[pos + sl:pos + sl + gap]]
                if any(x < 2 for x in seg):
                    break
                if [int(x) for x in s[pos + sl + gap:endb]] != b:
                    continue
                if any(int(x) < 2 for x in s[pos + sl + gap:endb]):
                    continue
                if se.check_boundary_gap(pos + sl, pos + sl + gap - 1,
                                         al.L_tar, al.R_tar, al.RLP,
                                         cfg.max_rule_span):
                    brute.add((pos, sl + gap + el - 1))
        # with diagonal alignment every hit position is unique per (d)
        got = set()
        lo, hi = int(s1.start_on_salist[d]), int(s1.end_on_salist[d])
        if lo != -1:
            for i in range(lo, hi + 1):
                if int(og.length[i]) == 0:
                    # precomp reference: expand the cell
                    pci = int(og.str_position[i])
                    for r in range(int(pc.index_start[pci]),
                                   int(pc.index_end[pci]) + 1):
                        got.add((int(pc.onegap_start[r]),
                                 int(pc.onegap_length[r])))
                else:
                    got.add((int(og.str_position[i]), int(og.length[i])))
        assert got == brute, f"pattern {d}: got {got} expected {brute}"


@pytest.fixture(scope="module")
def oracle_toy(toy_fixture):
    cfg = ExtractorConfig(precompute_count=30)
    return pl.run_oracle(
        cp.read_lines(str(toy_fixture / "corpus.f")),
        cp.read_lines(str(toy_fixture / "corpus.e")),
        cp.read_lines(str(toy_fixture / "corpus.a")),
        cp.read_tokens(str(toy_fixture / "lex.txt")),
        cp.read_lines(str(toy_fixture / "query.f")),
        cfg), cfg


def test_oracle_end_to_end_smoke(oracle_toy):
    res, cfg = oracle_toy
    assert res.queries.qryscount == 8
    total = sum(len(x) for x in res.per_query_lines)
    assert total > 100, f"expected some rules, got {total}"
    # every line is well-formed cdec
    for lines in res.per_query_lines:
        for ln in lines:
            assert ln.startswith("[X] ||| ")
            assert ln.count(" ||| ") == 3  # [X] ||| src ||| tgt ||| feats
            assert "EgivenFCoherent=" in ln
    # rule families present
    joined = "\n".join(l for ls in res.per_query_lines for l in ls)
    assert "[X,1]" in joined
    assert "[X,2]" in joined


def test_oracle_deterministic(oracle_toy, toy_fixture):
    res, cfg = oracle_toy
    res2 = pl.run_oracle(
        cp.read_lines(str(toy_fixture / "corpus.f")),
        cp.read_lines(str(toy_fixture / "corpus.e")),
        cp.read_lines(str(toy_fixture / "corpus.a")),
        cp.read_tokens(str(toy_fixture / "lex.txt")),
        cp.read_lines(str(toy_fixture / "query.f")),
        cfg)
    assert res.per_query_lines == res2.per_query_lines
