"""Single-node pure-Python/numpy oracle: tokenize -> tf/df -> BM25 -> top-k.

The correctness yardstick for the Spark engine (SURVEY.md §5.2 item 2;
north_star "reproducing moogle's reference query set rank-identically in
both top-k docIDs and BM25 scores"). Shares the exact analyzer
(analyzer.py) and the exact scoring expressions (scoring.py) with the
engine, accumulating per-doc sums in ascending term order, so agreement is
bit-level, not just atol.

doc_id rule (frozen, SURVEY.md §7.3): 1-based rank of (repo, path, commit)
in lexicographic order — ASCII keys, so Python tuple sort == Spark string
sort.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from .analyzer import term_freqs_positions, tokenize_doc, tokenize_query
from .scoring import bm25_idf, bm25_tfpart


@dataclass
class OracleIndex:
    n_docs: int
    sum_dl: int
    doc_len: np.ndarray  # index = doc_id - 1
    postings: dict[str, tuple[np.ndarray, np.ndarray]]  # term -> (doc_ids, tfs)
    df: dict[str, int]
    meta: pd.DataFrame  # doc_id, repo, path, commit, lang
    positions: dict[str, list[np.ndarray]] = field(default_factory=dict)

    @property
    def avgdl(self) -> float:
        return float(self.sum_dl) / float(self.n_docs) if self.n_docs else 1.0


def build_oracle_index(docs: pd.DataFrame) -> OracleIndex:
    """docs: columns (repo, path, commit, lang, content)."""
    d = docs.sort_values(["repo", "path", "commit"], kind="mergesort").reset_index(drop=True)
    d["doc_id"] = np.arange(1, len(d) + 1, dtype=np.int64)
    doc_len = np.zeros(len(d), dtype=np.int64)
    acc: dict[str, list[tuple[int, int]]] = {}
    posacc: dict[str, list[np.ndarray]] = {}
    for i, content in enumerate(d["content"]):
        tfp = term_freqs_positions(content or "")
        doc_len[i] = sum(v[0] for v in tfp.values())
        for t, (tf, pos) in tfp.items():
            acc.setdefault(t, []).append((i + 1, tf))
            posacc.setdefault(t, []).append(np.asarray(pos, dtype=np.int64))
    postings = {
        t: (
            np.asarray([p[0] for p in lst], dtype=np.int64),
            np.asarray([p[1] for p in lst], dtype=np.int64),
        )
        for t, lst in acc.items()
    }
    return OracleIndex(
        n_docs=len(d),
        sum_dl=int(doc_len.sum()),
        doc_len=doc_len,
        postings=postings,
        df={t: len(v[0]) for t, v in postings.items()},
        meta=d[["doc_id", "repo", "path", "commit", "lang"]],
        positions=posacc,
    )


def oracle_search(idx: OracleIndex, query: str, k: int = 20) -> pd.DataFrame:
    """Top-k BM25: columns (rank, doc_id, score, match_count).
    Tie-break (score desc, doc_id asc) — SURVEY.md §7.3."""
    terms = sorted(set(tokenize_query(query)))
    scores = np.zeros(idx.n_docs, dtype=np.float64)
    matches = np.zeros(idx.n_docs, dtype=np.int64)
    avgdl = idx.avgdl
    for t in terms:  # ascending term order — frozen accumulation order
        if t not in idx.postings:
            continue
        doc_ids, tfs = idx.postings[t]
        idf = bm25_idf(idx.n_docs, idx.df[t])
        contrib = idf * bm25_tfpart(tfs, idx.doc_len[doc_ids - 1], avgdl)
        scores[doc_ids - 1] += contrib
        matches[doc_ids - 1] += 1
    hit = np.flatnonzero(matches > 0)
    if hit.size == 0:
        return pd.DataFrame(columns=["rank", "doc_id", "score", "match_count"])
    order = np.lexsort((hit, -scores[hit]))[:k]  # score desc, doc_id asc
    sel = hit[order]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(sel) + 1, dtype=np.int64),
            "doc_id": (sel + 1).astype(np.int64),
            "score": scores[sel],
            "match_count": matches[sel],
        }
    )


def oracle_phrase_search(idx: OracleIndex, phrase: str, k: int = 20) -> pd.DataFrame:
    """Exact phrase top-k using the positions arrays: a doc matches iff
    the phrase's tokens appear at consecutive positions in the
    post-filter token stream (doc-mode analysis on both sides, so
    stopword removal affects the phrase and the docs identically).
    match_count = number of phrase occurrences; score = BM25 over the
    phrase's distinct terms, accumulated in ascending term order (the
    frozen float order, bit-identical to the engine)."""
    terms = tokenize_doc(phrase)
    cols = ["rank", "doc_id", "score", "match_count"]
    if not terms:
        return pd.DataFrame(columns=cols)
    uniq = sorted(set(terms))
    if any(t not in idx.postings for t in uniq):
        return pd.DataFrame(columns=cols)
    posmap = {
        t: dict(zip(idx.postings[t][0], idx.positions[t])) for t in uniq
    }
    cands = set(posmap[uniq[0]])
    for t in uniq[1:]:
        cands &= set(posmap[t])
    avgdl = idx.avgdl
    rows = []
    for doc in sorted(cands):
        occ = posmap[terms[0]][doc]
        for t in terms[1:]:
            occ = np.intersect1d(occ + 1, posmap[t][doc])
            if occ.size == 0:
                break
        if occ.size == 0:
            continue
        score = 0.0
        dl = idx.doc_len[doc - 1]
        for t in uniq:  # ascending term order — frozen accumulation
            tf = posmap[t][doc].size
            score += float(
                bm25_idf(idx.n_docs, idx.df[t])
                * bm25_tfpart(np.asarray([tf]), np.asarray([dl]), avgdl)[0]
            )
        rows.append((doc, score, int(occ.size)))
    if not rows:
        return pd.DataFrame(columns=cols)
    rows.sort(key=lambda r: (-r[1], r[0]))
    rows = rows[:k]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(rows) + 1, dtype=np.int64),
            "doc_id": [r[0] for r in rows],
            "score": [r[1] for r in rows],
            "match_count": [r[2] for r in rows],
        }
    )


def oracle_pagerank(
    edges: pd.DataFrame, iterations: int = 10, damping: float = 0.85
) -> pd.DataFrame:
    """Direct port of the reference PageRank loop
    (services/page-rank/cmd/page-rank/main.go:96-128). Faithful semantics:
    N = count of nodes WITH outlinks (`main.go:57-58` counts the outlinks
    collection); ranks are initialized 1/N over those nodes only, and the
    iteration's key set never grows (`for url := range pageRank`,
    main.go:110) — sink-only nodes never receive a rank. Contributions
    come only from backlinks that both hold a rank and an outdegree
    (main.go:115-121)."""
    src = edges["src"].to_numpy(dtype=np.int64)
    dst = edges["dst"].to_numpy(dtype=np.int64)
    out_nodes = np.unique(src)
    n = len(out_nodes)
    if n == 0:
        return pd.DataFrame(columns=["doc_id", "rank"])
    outdeg = {int(s): int(c) for s, c in zip(*np.unique(src, return_counts=True))}
    rank = {int(p): 1.0 / n for p in out_nodes}
    back: dict[int, list[int]] = {}
    for s, t in zip(src, dst):
        back.setdefault(int(t), []).append(int(s))
    for _ in range(iterations):
        new = {}
        for p in rank:  # key set frozen to outlink-holders, as in main.go:110
            contrib = 0.0
            for b in sorted(back.get(p, ())):  # fixed order -> deterministic fp sum
                if b in rank:
                    contrib += rank[b] / outdeg[b]
            new[p] = (1.0 - damping) / n + damping * contrib
        rank = new
    items = sorted(rank.items())
    return pd.DataFrame(
        {"doc_id": [i[0] for i in items], "rank": [i[1] for i in items]}
    )
