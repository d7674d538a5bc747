"""Build the real-language fixture: natural French-English parallel text with
IBM-Model-1 word alignments and a cdec-format lex table.

The sentences (tools/real_text.py) are genuine natural language authored for
this repo; alignments come from a small IBM Model 1 EM aligner run in both
directions and symmetrized with grow-diag — the same pipeline family
(GIZA++ / fast_align -> grow-diag-final) that produced the reference's
hansards fixture (/root/reference/README.md:57-77), so the alignments carry
real asymmetry: NULL-aligned function words, 1:N and N:1 fan-out, and
crossing links from French adjective postposition.  Everything is
deterministic — regeneration is byte-stable (no RNG anywhere).

Outputs (cdec input contract, Main.c:29-62): corpus.f corpus.e corpus.a
lex.txt query.f under tests/fixtures/real/.
"""

from __future__ import annotations

import collections
import math
import os


def tokenize(s: str) -> list[str]:
    """Lowercase whitespace split with French elision split (l' -> l' + word),
    keeping the apostrophe on the clitic as its own token like standard MT
    tokenizers do."""
    out = []
    for w in s.lower().split():
        while "'" in w:
            i = w.index("'")
            out.append(w[: i + 1])
            w = w[i + 1:]
        if w:
            out.append(w)
    return out


def train_ibm1(pairs, iters: int = 12):
    """IBM Model 1 EM: returns t[(f, e)] = p(f | e) with a NULL target word."""
    t = collections.defaultdict(float)
    # uniform init over co-occurring pairs
    cooc = collections.defaultdict(set)
    for fs, es in pairs:
        for f in fs:
            for e in es + ["NULL"]:
                cooc[f].add(e)
    for f, es in cooc.items():
        for e in es:
            t[(f, e)] = 1.0 / len(es)
    for _ in range(iters):
        cnt = collections.defaultdict(float)
        tot = collections.defaultdict(float)
        for fs, es in pairs:
            es_null = es + ["NULL"]
            for f in fs:
                z = sum(t[(f, e)] for e in es_null)
                if z <= 0:
                    continue
                for e in es_null:
                    c = t[(f, e)] / z
                    cnt[(f, e)] += c
                    tot[e] += c
        t = collections.defaultdict(float)
        for (f, e), c in cnt.items():
            if tot[e] > 0:
                t[(f, e)] = c / tot[e]
    return t


def viterbi_links(fs, es, t_fe):
    """Best target position (or NULL) for each source token under model 1."""
    links = []
    for i, f in enumerate(fs):
        best_j, best_p = -1, t_fe[(f, "NULL")]
        for j, e in enumerate(es):
            p = t_fe[(f, e)]
            if p > best_p:
                best_j, best_p = j, p
        if best_j >= 0:
            links.append((i, best_j))
    return links


def grow_diag(n_f, n_e, fwd, bwd):
    """Symmetrize: intersection, then grow with neighbouring union links."""
    union = set(fwd) | set(bwd)
    aligned = set(fwd) & set(bwd)
    af = {i for i, _ in aligned}
    ae = {j for _, j in aligned}
    changed = True
    neigh = [(-1, 0), (0, -1), (1, 0), (0, 1), (-1, -1), (-1, 1), (1, -1), (1, 1)]
    while changed:
        changed = False
        for (i, j) in sorted(aligned):
            for di, dj in neigh:
                ni, nj = i + di, j + dj
                if 0 <= ni < n_f and 0 <= nj < n_e and (ni, nj) in union:
                    if (ni not in af or nj not in ae) and (ni, nj) not in aligned:
                        aligned.add((ni, nj))
                        af.add(ni)
                        ae.add(nj)
                        changed = True
    # final: add union links for still-unaligned words (grow-diag-final)
    for (i, j) in sorted(union):
        if i not in af and j not in ae:
            aligned.add((i, j))
            af.add(i)
            ae.add(j)
    return sorted(aligned)


def build(out_dir: str):
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    from tools.real_text import PAIRS, QUERIES

    f_sents = [tokenize(f) for f, _ in PAIRS]
    e_sents = [tokenize(e) for _, e in PAIRS]
    pairs_fe = list(zip(f_sents, e_sents))
    pairs_ef = list(zip(e_sents, f_sents))
    t_fe = train_ibm1(pairs_fe)   # p(f | e)
    t_ef = train_ibm1(pairs_ef)   # p(e | f)

    a_lines = []
    for fs, es in pairs_fe:
        fwd = viterbi_links(fs, es, t_fe)                       # f -> e
        bwd = [(i, j) for j, i in viterbi_links(es, fs, t_ef)]  # e -> f, flipped
        links = grow_diag(len(fs), len(es), fwd, bwd)
        a_lines.append(" ".join(f"{i}-{j}" for i, j in links))

    # cdec lex file: "f e p(e|f) p(f|e)" plus NULL rows in both directions
    # (same shape as the toy fixture / reference lex.0-0 loader).
    lex_rows = []
    f_vocab = sorted({w for fs in f_sents for w in fs})
    e_vocab = sorted({w for es in e_sents for w in es})
    for f in f_vocab:
        rows = [(e, t_ef[(e, f)], t_fe[(f, e)]) for e in e_vocab
                if t_ef[(e, f)] > 1e-6 or t_fe[(f, e)] > 1e-6]
        for e, pef, pfe in rows:
            lex_rows.append(f"{f} {e} {max(pef, 1e-7):.7f} {max(pfe, 1e-7):.7f}")
        pnull = t_fe[(f, "NULL")]
        if pnull > 1e-6:
            lex_rows.append(f"{f} NULL {1e-7:.7f} {pnull:.7f}")
    for e in e_vocab:
        pnull = t_ef[(e, "NULL")]
        if pnull > 1e-6:
            lex_rows.append(f"NULL {e} {pnull:.7f} {1e-7:.7f}")

    os.makedirs(out_dir, exist_ok=True)
    def w(name, lines):
        with open(os.path.join(out_dir, name), "w", encoding="utf-8") as fh:
            fh.write("\n".join(lines) + "\n")
    w("corpus.f", [" ".join(s) for s in f_sents])
    w("corpus.e", [" ".join(s) for s in e_sents])
    w("corpus.a", a_lines)
    w("lex.txt", lex_rows)
    w("query.f", [" ".join(tokenize(q)) for q in QUERIES])
    return out_dir


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "tests", "fixtures", "real"))
    args = ap.parse_args()
    d = build(args.out)
    print(f"wrote real-language fixture to {d}")
