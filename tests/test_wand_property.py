"""Property test: block-max WAND == exhaustive scoring on randomized
posting sets (SURVEY.md §5.2 item 4) — unit-level, no Spark session.

Randomized docs/terms/tfs/dls, blocks built exactly like the build
pipeline (128-doc chunks, delta+varint, accurate block maxes), then both
scorers must agree on doc ids, bit-exact scores, and match counts for
every k.
"""

import numpy as np
import pandas as pd
import pytest

from moogle_spark import codec
from moogle_spark.query import _score_bmw, _score_exhaustive

BLOCK = 128


def _make_pdf(rng, n_docs, terms, avgdl):
    rows = []
    for t in terms:
        df = rng.integers(1, n_docs + 1)
        ids = np.sort(rng.choice(np.arange(1, n_docs + 1), size=df, replace=False))
        tfs = rng.integers(1, 9, size=df).astype(np.int64)
        dls = rng.integers(5, 1200, size=df).astype(np.int64)
        for b0 in range(0, df, BLOCK):
            b1 = min(b0 + BLOCK, df)
            rows.append(
                {
                    "shard": 0,
                    "term": t,
                    "block_id": b0 // BLOCK,
                    "n_docs": b1 - b0,
                    "first_doc": int(ids[b0]),
                    "last_doc": int(ids[b1 - 1]),
                    "doc_ids": codec.encode_doc_ids(ids[b0:b1]),
                    "tfs": codec.encode_tfs(tfs[b0:b1]),
                    "dls": codec.varint_encode(dls[b0:b1]),
                    "max_tf": int(tfs[b0:b1].max()),
                    "min_dl": int(dls[b0:b1].min()),
                }
            )
    return pd.DataFrame(rows)


@pytest.mark.parametrize("seed", range(12))
def test_bmw_equals_exhaustive_random(seed):
    rng = np.random.default_rng(seed)
    n_docs = int(rng.integers(5, 800))
    n_terms = int(rng.integers(1, 7))
    terms = sorted(f"t{j}" for j in range(n_terms))
    avgdl = float(rng.integers(50, 900))
    pdf = _make_pdf(rng, n_docs, terms, avgdl)
    idf = {t: float(rng.uniform(0.1, 4.0)) for t in terms}
    lo, span = 1, n_docs
    for k in (1, 5, 50):
        ed, es, em = _score_exhaustive(pdf, terms, idf, avgdl, lo, span, k)
        bd, bs, bm = _score_bmw(pdf, terms, idf, avgdl, lo, span, k)
        assert list(ed) == list(bd)
        assert [repr(x) for x in es] == [repr(x) for x in bs]  # bit-exact
        assert list(em) == list(bm)
