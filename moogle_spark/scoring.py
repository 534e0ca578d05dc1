"""Frozen BM25 math, shared verbatim by the index builder, the query
scorer, and the single-node oracle so scores are bit-identical.

Okapi BM25 with the Lucene idf form (BASELINE.json: k1=1.2, b=0.75;
SURVEY.md §7.3):

    idf(t)    = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfpart    = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score(d)  = Σ_{t ∈ sorted(unique query terms)} idf(t) * tfpart(t, d)

All floats are IEEE float64; the per-doc sum is accumulated in ascending
term order everywhere (scorer and oracle), making scores independent of
partitioning / cluster size (SURVEY.md §7.3 float determinism).

The reference's TF-IDF weighting (services/tfidf/main.py:53,63:
``tf * log10(N / (1 + df))``) is kept as `tfidf_weight` for the behavioral
compatibility mode.
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75


def bm25_idf(n_docs: int, df) -> np.ndarray | float:
    """Lucene-form BM25 idf; np.log so builder/scorer/oracle share bits."""
    df = np.asarray(df, dtype=np.float64)
    out = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return out if out.shape else float(out)


def bm25_tfpart(tf, dl, avgdl: float) -> np.ndarray:
    """Length-normalized tf component (idf-independent, so per-block max
    upper bounds stay valid under any N)."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def tfidf_weight(tf, n_docs: int, df) -> np.ndarray:
    """Reference weighting, services/tfidf/main.py:53,63."""
    tf = np.asarray(tf, dtype=np.float64)
    df = np.asarray(df, dtype=np.float64)
    return tf * np.log10(n_docs / (1.0 + df))
