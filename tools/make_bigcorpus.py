"""Europarl-scale synthetic corpus generator (numpy-vectorized).

The toy fixture generator (tools/make_fixture.py) is pure Python and has a
120-word vocabulary — fine up to ~100k sentences, degenerate and slow at
Europarl scale (~1M sentences).  This generator produces the same cdec input
format (source, target, giza alignments, lex file) with a Zipf vocabulary that
scales with the corpus, built from numpy ops so 1M sentences materialize in
seconds.  Deterministic per (n_sentences, vocab, seed)."""

from __future__ import annotations

import numpy as np


def make_big_corpus(n_sentences: int, vocab: int = 20000,
                    seed: int = 20260817):
    """Returns (f_text, e_text, a_lines, lex_tokens) — texts as whole strings
    (the pipeline's fast native-tokenizer path), alignments as line list."""
    rng = np.random.default_rng(seed)
    slen = rng.integers(3, 13, size=n_sentences)
    total = int(slen.sum())
    sent_of = np.repeat(np.arange(n_sentences), slen)
    starts = np.concatenate([[0], np.cumsum(slen)])[:-1]
    pos_in_sent = np.arange(total) - np.repeat(starts, slen)

    w = 1.0 / np.arange(1, vocab + 1) ** 0.8
    p = w / w.sum()
    src_ids = rng.choice(vocab, size=total, p=p)

    # target side: aligned 1:1 in order, 8% of source tokens unaligned;
    # every sentence keeps at least its first token aligned
    aligned = rng.random(total) >= 0.08
    aligned[starts] = True
    tpos = np.full(total, -1, np.int64)
    # target position = rank of aligned token within its sentence
    acs = np.cumsum(aligned)
    sent_base = np.concatenate([[0], acs])[:-1][starts]
    tpos[aligned] = (acs - 1 - np.repeat(sent_base, slen))[aligned]

    src_words = np.array([f"f{i}" for i in range(vocab)])
    tgt_words = np.array([f"e{i}" for i in range(vocab)])

    def join_lines(tokens, sent_ids, n_lines):
        """One text blob with newlines between sentences."""
        parts = []
        bounds = np.flatnonzero(np.diff(sent_ids)) + 1
        pieces = np.split(tokens, bounds)
        return "\n".join(" ".join(p) for p in pieces)

    f_text = join_lines(src_words[src_ids], sent_of, n_sentences)
    e_text = join_lines(tgt_words[src_ids[aligned]], sent_of[aligned],
                        n_sentences)

    # alignment lines "s-t s-t ..."
    al_tok = np.char.add(np.char.add(
        pos_in_sent[aligned].astype("U4"), "-"),
        tpos[aligned].astype("U4"))
    a_bounds = np.flatnonzero(np.diff(sent_of[aligned])) + 1
    a_lines = [" ".join(p) for p in np.split(al_tok, a_bounds)]

    # lex table: aligned pairs are identity f_i -> e_i with prob 1; add NULL
    # rows for a fraction of the vocabulary so the NULL path is exercised
    used = np.unique(src_ids)
    lex_tokens = []
    for i in used[:  len(used)]:
        lex_tokens += [f"f{i}", f"e{i}", "0.9000000", "0.9000000"]
    for i in used[: max(1, len(used) // 20)]:
        lex_tokens += ["NULL", f"e{i}", "0.0500000", "0.0500000"]
        lex_tokens += [f"f{i}", "NULL", "0.0500000", "0.0500000"]
    return f_text, e_text, a_lines, lex_tokens


def make_big_queries(f_text: str, n_queries: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    lines = f_text.split("\n")
    picks = rng.integers(0, len(lines), size=n_queries * 2)
    out = []
    for qi in range(n_queries):
        base = lines[picks[2 * qi]].split()
        other = lines[picks[2 * qi + 1]].split()
        cut = int(rng.integers(0, len(base)))
        q = base[:cut] + other[: int(rng.integers(1, 5))] + base[cut:]
        if qi % 3 == 0:
            q.insert(int(rng.integers(0, len(q) + 1)), f"oov{qi}")
        out.append(" ".join(q[:20]))
    return out
