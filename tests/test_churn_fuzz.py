"""Randomized churn-sequence fuzz: ANY interleaving of incremental
strategies and maintenance ops must stay exact.

The deterministic segment/stable tests pin one scripted scenario each.
Real operation is a SEQUENCE — change/delete/add batches landing via
whichever strategy the auto-picker chooses, with merges and partial
compacts interleaved at arbitrary points.  This test drives seeded
random sequences of

    corpus edit   (~random subset changed, removed, added)
    incremental   (strategy random in {shards, segment, auto})
    maintenance   (randomly: none | merge_generations |
                   compact_segments(max_shards=1..3) | full compact)

over a small stable-id warehouse and, after every step, asserts the
LIVE corpus manifest matches; at the end it compares full-depth search
results (and, once fully compacted, the decoded postings fingerprint)
against a from-scratch stable build of the final corpus.  Seeds are
fixed — failures reproduce.

Each step also randomizes the DELIVERY mode: full snapshot
(mode="full") vs delta feed (mode="upsert" with only the changed/added
docs plus the removed keys as ``deletes``) — both must land the
identical live corpus."""

import random

import pandas as pd
from pyspark.sql import functions as F
from test_stable_incremental import _decoded_postings_fp

N0 = 60
N_SHARDS = 8
WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
]


def _mk_corpus(rng: random.Random, n: int) -> dict[str, str]:
    return {
        f"src/f{i}.py": " ".join(rng.choices(WORDS, k=rng.randint(5, 30)))
        for i in range(n)
    }


def _to_df(spark, corpus: dict[str, str]):
    rows = [
        {"repo": "org/r", "path": p, "commit": "c0", "lang": "python",
         "content": c}
        for p, c in sorted(corpus.items())
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def _edit(
    rng: random.Random, corpus: dict[str, str], step: int,
    recent: list[str] = (),
) -> dict[str, str]:
    out = dict(corpus)
    targets = rng.sample(sorted(out), k=min(len(out), rng.randint(1, 8)))
    # bias toward re-touching RECENTLY churned docs: after a segment run
    # they live in generation partitions, and the staleness gate must
    # still see them (regression class: gen-resident docs invisible to a
    # mis-pruned gate -> silent duplicates / missed deletes)
    rec = [p for p in recent if p in out]
    if rec:
        targets += rng.sample(rec, k=min(len(rec), rng.randint(1, 3)))
    for p in dict.fromkeys(targets):
        op = rng.random()
        if op < 0.5:
            out[p] = out[p] + f" fuzz{step}tok " + rng.choice(WORDS)
        elif op < 0.75 and len(out) > 10:
            del out[p]
    for _ in range(rng.randint(0, 3)):
        out[f"src/new{step}_{rng.randint(0, 99)}.py"] = (
            f"added{step}tok " + " ".join(rng.choices(WORDS, k=10))
        )
    return out


def _full_results(spark, wh_path, queries):
    from moogle_spark.query import SearchEngine

    eng = SearchEngine(spark, wh_path, cache=False)
    sig = {}
    for q in queries:
        rows = eng.search(q, k=10_000, enrich=True).collect()
        sig[q] = sorted(
            (r["path"], round(r["score"], 9), r["match_count"]) for r in rows
        )
    return sig


def test_random_churn_sequences_stay_exact(spark, tmp_path):
    from moogle_spark.build import build_index, incremental_build
    from moogle_spark.segments import compact_segments, merge_generations
    from moogle_spark.tables import Warehouse

    for seed in (7, 23):
        rng = random.Random(seed)
        corpus = _mk_corpus(rng, N0)
        wh = str(tmp_path / f"wh{seed}")
        build_index(
            spark, _to_df(spark, corpus), wh, n_shards=N_SHARDS,
            doc_id_mode="stable",
        )

        recent: list[str] = []
        for step in range(1, 6):
            prev = corpus
            corpus = _edit(rng, corpus, step, recent=recent)
            recent = sorted(
                p for p in corpus
                if p not in prev or prev[p] != corpus[p]
            )
            strategy = rng.choice(["shards", "segment", "auto"])
            if rng.random() < 0.5:
                incremental_build(
                    spark, _to_df(spark, corpus), wh, strategy=strategy
                )
            else:
                # delta feed: only changed/added docs + removed keys
                batch = {
                    p: c for p, c in corpus.items()
                    if p not in prev or prev[p] != c
                }
                removed = sorted(p for p in prev if p not in corpus)
                dels = None
                if removed:
                    dels = spark.createDataFrame(
                        pd.DataFrame(
                            [{"repo": "org/r", "path": p, "commit": "c0"}
                             for p in removed]
                        )
                    )
                batch_df = (
                    _to_df(spark, batch) if batch
                    else spark.createDataFrame(
                        [], "repo string, path string, commit string, "
                            "lang string, content string"
                    )
                )
                incremental_build(
                    spark, batch_df, wh, mode="upsert", strategy=strategy,
                    deletes=dels,
                )
            maint = rng.random()
            if maint < 0.25:
                merge_generations(spark, wh)
            elif maint < 0.5:
                compact_segments(spark, wh, max_shards=rng.randint(1, 3))
            elif maint < 0.65:
                compact_segments(spark, wh)
            man = Warehouse(wh).manifest("analyzed")
            assert int(man["n_docs"]) == len(corpus), (seed, step, strategy)

        queries = ["alpha", "delta echo", "fuzz3tok", "added5tok",
                   "golf hotel india", "zzabsent"]
        scratch = str(tmp_path / f"scr{seed}")
        build_index(
            spark, _to_df(spark, corpus), scratch, n_shards=N_SHARDS,
            doc_id_mode="stable",
        )
        assert _full_results(spark, wh, queries) == _full_results(
            spark, scratch, queries
        ), seed

        # after a final full compact the physical index is bit-identical
        compact_segments(spark, wh)
        merge_generations(spark, wh)  # no-op on a compacted warehouse
        assert _decoded_postings_fp(spark, wh) == _decoded_postings_fp(
            spark, scratch
        ), seed
