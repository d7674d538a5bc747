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


def make_hard_corpus(n_sentences: int, vocab: int = 20000,
                     seed: int = 20260819):
    """Adversarial-realism variant (VERDICT r2 weak #3): non-monotone
    alignments with local reordering (reversed windows), one-to-many source
    fan-out, and ~30% unaligned tokens — so the consistency-check kill paths
    (the semantics of ExtractPair.cu:103-133 `consistent` and
    GappyLook.cu:43-126 `checkBoundaryGap`) are actually exercised at scale
    instead of trivially passing on 1:1 monotone data.

    Returns (f_text, e_text, a_lines, lex_tokens)."""
    rng = np.random.default_rng(seed)
    slen = rng.integers(4, 13, size=n_sentences)
    total = int(slen.sum())
    sent_of = np.repeat(np.arange(n_sentences), slen)
    starts = np.concatenate([[0], np.cumsum(slen)])[:-1]
    pos_in_sent = np.arange(total) - np.repeat(starts, slen)

    w = 1.0 / np.arange(1, vocab + 1) ** 0.8
    p = w / w.sum()
    src_ids = rng.choice(vocab, size=total, p=p)

    # ~30% of source tokens unaligned; every sentence keeps its first aligned
    aligned = rng.random(total) >= 0.30
    aligned[starts] = True
    # one-to-many fan-out: ~15% of aligned tokens produce 2 target tokens
    fan = np.where(aligned, 1 + (rng.random(total) < 0.15), 0)

    # base monotone target position per source token = cumsum of fan
    fcs = np.cumsum(fan)
    sent_base = np.concatenate([[0], fcs])[:-1][starts]
    tpos0 = (fcs - fan - np.repeat(sent_base, slen))  # first tgt slot
    tlen_sent = np.add.reduceat(fan, starts)          # target sentence lengths

    # local reordering: reverse the target mapping inside windows of 2-4
    # source positions for ~40% of sentences (keeps target positions a
    # permutation per sentence, so the target text stays well-formed)
    tpos = tpos0.copy()
    reorder_sent = rng.random(n_sentences) < 0.4
    # per-sentence window reversal over aligned tokens: vectorized per
    # sentence via python loop over only the reordered sentences' windows
    # (cheap: ~0.4 * n_sentences iterations of pure-numpy slicing)
    for si in np.flatnonzero(reorder_sent):
        lo, hi = starts[si], starts[si] + slen[si]
        idx = np.flatnonzero(aligned[lo:hi]) + lo
        if len(idx) < 3:
            continue
        wlo = int(rng.integers(0, len(idx) - 2))
        whi = min(wlo + int(rng.integers(2, 5)), len(idx))
        win = idx[wlo:whi]
        # reverse the target SLOTS of these source tokens: token k takes the
        # slot span of token (win reversed)[k]; fan sizes move with the slot
        slots = tpos[win]
        widths = fan[win]
        new_order = win[::-1]
        new_widths = fan[new_order]
        new_slots = slots[0] + np.concatenate(
            [[0], np.cumsum(new_widths)[:-1]])
        tpos[new_order] = new_slots
        # target tokens are emitted in slot order below, so ids follow

    # target ids: slot-ordered per sentence; each aligned source token emits
    # `fan` copies (identity shift for the first, +vocab marker word for the
    # second -> many-to-one target words exist via the shared shift)
    amask = aligned
    rep_src = np.repeat(src_ids[amask], fan[amask])
    rep_tpos = np.repeat(tpos[amask], fan[amask])
    within = np.arange(len(rep_src)) - np.repeat(
        np.concatenate([[0], np.cumsum(fan[amask])])[:-1], fan[amask])
    rep_tpos = rep_tpos + within
    rep_sent = np.repeat(sent_of[amask], fan[amask])
    # order target tokens by (sentence, target position)
    t_order = np.lexsort((rep_tpos, rep_sent))
    tgt_ids = (rep_src + within * 7919) % vocab   # 2nd token differs
    tgt_ids_sorted = tgt_ids[t_order]
    tsent_sorted = rep_sent[t_order]

    src_words = np.array([f"f{i}" for i in range(vocab)])
    tgt_words = np.array([f"e{i}" for i in range(vocab)])

    def join(tokens, sent_ids):
        bounds = np.flatnonzero(np.diff(sent_ids)) + 1
        return "\n".join(" ".join(piece)
                         for piece in np.split(tokens, bounds))

    f_text = join(src_words[src_ids], sent_of)
    e_text = join(tgt_words[tgt_ids_sorted], tsent_sorted)

    # alignment lines: source token -> each of its fan slots
    al_s = np.repeat(pos_in_sent[amask], fan[amask])
    al_t = rep_tpos
    al_sent = rep_sent
    # many-to-one: ~8% of aligned tokens also lend their first target slot to
    # the NEXT source token of the same sentence (two source positions ->
    # one target position)
    a_idx = np.flatnonzero(amask)
    lend = (rng.random(len(a_idx)) < 0.08) & \
        (pos_in_sent[a_idx] + 1 < slen[sent_of[a_idx]])
    li = a_idx[lend]
    al_s = np.concatenate([al_s, pos_in_sent[li] + 1])
    al_t = np.concatenate([al_t, tpos[li]])
    al_sent = np.concatenate([al_sent, sent_of[li]])
    a_order = np.lexsort((al_t, al_s, al_sent))
    al_tok = np.char.add(np.char.add(
        al_s[a_order].astype("U4"), "-"), al_t[a_order].astype("U4"))
    a_bounds = np.flatnonzero(np.diff(al_sent[a_order])) + 1
    a_lines = [" ".join(piece) for piece in np.split(al_tok, a_bounds)]
    # sentences with zero... every sentence has >= 1 aligned token (starts)
    assert len(a_lines) == n_sentences

    # lex table over observed (src, tgt) pairs + NULL rows
    pair = np.unique((rep_src.astype(np.int64) << 32)
                     | tgt_ids.astype(np.int64))
    ps = (pair >> 32).astype(np.int64)
    pt = (pair & 0xFFFFFFFF).astype(np.int64)
    lex_tokens = []
    for s_, t_ in zip(ps, pt):
        lex_tokens += [f"f{s_}", f"e{t_}", "0.7000000", "0.7000000"]
    used = np.unique(src_ids)
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
