"""Inverted-index operators over a generic (doc_id, text) documents table,
expressed purely with built-in JVM-side column functions (no Python UDFs).

This is the SQL-expressible twin of the core engine: the same operator
semantics the reference implements (tf A1, df A8, idf A9, tf-idf weight
A10, group-sum ranking A11, total-hits A12, vocabulary A5, per-doc top-k
A2, boost A3 — SURVEY.md §2 numbering, citations inline below), but over
the driver's ``documents`` parquet and with a simplified frozen tokenizer
that both Spark and ANSI SQL (DuckDB oracle) can evaluate identically:

    tokens(text) = non-empty pieces of lower(text) split on runs of
                   characters outside [a-z0-9]

Every function returns a DataFrame whose computed columns are explicitly
aliased so the driver's column-name-keyed comparison matches the oracle
SQL in __spark_entry__.py.  All of this stays inside WholeStageCodegen —
split/explode/agg/window are Catalyst-native, so the plans scale to the
full corpus (the scan prunes to (doc_id, text), filters push into the
parquet reader).

Reference citations: services/indexer/main.py:162-180 (tf + boost),
services/tfidf/main.py:49-64 (df/idf/weight),
services/query-engine/app/Http/Controllers/QuerySearchController.php:
255-282 (match/group/sort/limit pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .scoring import B, K1

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens_col(text_col: str = "text"):
    """array<string> of non-empty lowercase alnum tokens — frozen spec."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE), lambda x: x != F.lit("")
    )


def doc_terms(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per token occurrence: (doc_id, term)."""
    return docs.select("doc_id", F.explode(tokens_col(text_col)).alias("term"))


def term_frequencies(docs: DataFrame) -> DataFrame:
    """A1 (indexer/main.py:162-163): per-(doc,term) tf."""
    return (
        doc_terms(docs)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(docs: DataFrame) -> DataFrame:
    """(doc_id, dl) — token count per doc under the frozen tokenizer."""
    return docs.select("doc_id", F.size(tokens_col()).alias("dl"))


def document_frequency(docs: DataFrame) -> DataFrame:
    """A8 (tfidf/data/mongo_client.py:86-93): df(t) for every term, one
    shuffle for all terms (vs the reference's O(V) per-term queries)."""
    return (
        term_frequencies(docs)
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )


def idf_reference(docs: DataFrame) -> DataFrame:
    """A9 (tfidf/main.py:53): idf = log10(N / (1 + df)), reference form."""
    n = docs.count()
    return document_frequency(docs).select(
        "term",
        "df",
        F.round(F.log10(F.lit(float(n)) / (F.col("df") + F.lit(1))), 6).alias("idf"),
    )


def tfidf_weights(docs: DataFrame, min_tf: int = 2) -> DataFrame:
    """A10 (tfidf/main.py:60-64): weight = tf * log10(N/(1+df)).
    min_tf bounds output size for the contract check."""
    n = docs.count()
    tf = term_frequencies(docs).filter(F.col("tf") >= min_tf)
    df = document_frequency(docs)
    return (
        tf.join(df, "term")
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log10(F.lit(float(n)) / (F.col("df") + F.lit(1))), 6
            ).alias("weight"),
        )
    )


def search_group_sum(docs: DataFrame, query_terms: list[str], k: int = 20) -> DataFrame:
    """A11+T1+T2 (QuerySearchController.php:269-282): the reference's exact
    query pipeline — $match {word $in} -> $group by doc (sum weight,
    count matched terms) -> $sort {matchCount desc, cumWeight desc} ->
    $limit.  Weight here is the reference tf-idf form.  The query-term
    list is a broadcast literal (J1)."""
    n = docs.count()
    tf = term_frequencies(docs).filter(F.col("term").isin(query_terms))
    df = document_frequency(docs).filter(F.col("term").isin(query_terms))
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        (F.col("tf") * F.log10(F.lit(float(n)) / (F.col("df") + F.lit(1)))).alias("w"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("match_count"),
            F.round(F.sum("w"), 6).alias("cum_weight"),
        )
        .orderBy(F.desc("match_count"), F.desc("cum_weight"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_search(docs: DataFrame, query_terms: list[str], k: int = 20) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75, Lucene idf — scoring.py) as a pure
    DataFrame plan over the generic documents table: the flagship ranked
    retrieval re-expressed with built-ins only (the compressed-postings
    engine in query.py is the scale path; this is the declarative twin
    Catalyst can fully optimize, and the one DuckDB can mirror)."""
    n = docs.count()
    dl = doc_lengths(docs)
    avgdl = dl.agg(F.sum("dl")).collect()[0][0]
    avgdl = float(avgdl) / float(n) if n else 1.0
    tf = term_frequencies(docs).filter(F.col("term").isin(query_terms))
    df = document_frequency(docs).filter(F.col("term").isin(query_terms))
    idf = F.log(F.lit(1.0) + (F.lit(float(n)) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tfpart = (F.col("tf") * (K1 + 1.0)) / (
        F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.lit(avgdl))
    )
    contrib = tf.join(F.broadcast(df), "term").join(dl, "doc_id").select(
        "doc_id", (idf * tfpart).alias("c")
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.round(F.sum("c"), 6).alias("score"),
            F.count(F.lit(1)).cast("int").alias("match_count"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_search_many(
    docs: DataFrame, query_sets: list[list[str]], k: int = 20
) -> DataFrame:
    """Batched BM25 — the declarative twin of SearchEngine.search_many
    (query.py): ONE tf/df/dl pass serves every query in the batch; a tiny
    broadcast (query_id, term) relation fans each term's contributions
    out to the queries that asked for it; one groupBy(query_id, doc_id)
    and one PARTITIONED rank window emit all top-ks in a single job.
    At scale this replaces |queries| separate scans (and |queries| job
    scheduling floors) with one — the query-log-replay shape."""
    spark = docs.sparkSession
    n = docs.count()
    dl = doc_lengths(docs)
    avgdl = dl.agg(F.sum("dl")).collect()[0][0]
    avgdl = float(avgdl) / float(n) if n else 1.0
    pairs = [(qid, t) for qid, ts in enumerate(query_sets) for t in sorted(set(ts))]
    q = F.broadcast(spark.createDataFrame(pairs, "query_id int, term string"))
    all_terms = sorted({t for _, t in pairs})
    tf = term_frequencies(docs).filter(F.col("term").isin(all_terms))
    df = document_frequency(docs).filter(F.col("term").isin(all_terms))
    idf = F.log(F.lit(1.0) + (F.lit(float(n)) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tfpart = (F.col("tf") * (K1 + 1.0)) / (
        F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.lit(avgdl))
    )
    contrib = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .join(q, "term")
        .select("query_id", "doc_id", (idf * tfpart).alias("c"))
    )
    agg = contrib.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("c"), 6).alias("score"),
        F.count(F.lit(1)).cast("int").alias("match_count"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score", "match_count")
        .orderBy("query_id", "rank")
    )


def search_behavioral(
    docs: DataFrame,
    query_terms: list[str],
    page: int = 1,
    per_page: int = 20,
    ranks: DataFrame | None = None,
    w_text: float = 0.6,
    w_rank: float = 0.4,
) -> DataFrame:
    """T2+T3+J3 behavioral mode — the reference's full result pipeline
    with its quirks preserved (QuerySearchController.php:279-341):

      1. GLOBAL order is (matchCount desc, cumWeight desc)  (`:279`)
      2. offset pagination: skip (page-1)*per_page, take per_page
         (`:280-281`, perPage=20 `:252`)
      3. blend combined = 0.6*cumWeight + 0.4*pagerank (`:332`) — but the
         reference's `:325` reads an undefined $pageRankByUrl, so rank is
         effectively ALWAYS 0: ranks=None reproduces that bug
         bit-for-bit (combined = 0.6*cumWeight); pass a (doc_id, rank)
         DataFrame for the fixed behavior
      4. the blend re-sorts ONLY within the fetched page (PHP usort,
         `:339-341`) — a lower-matchCount/higher-weight doc can outrank
         within its page but never cross pages.

    Scalable pagination: the global sort materializes only the first
    page*per_page rows (TakeOrderedAndProject), then the row_number
    window runs on that tiny set — no full-result single-partition
    window."""
    top_n = page * per_page
    base = search_group_sum(docs, query_terms, k=top_n)
    w = Window.orderBy(F.desc("match_count"), F.desc("cum_weight"), F.asc("doc_id"))
    paged = (
        base.withColumn("rank_global", F.row_number().over(w).cast("int"))
        .filter(F.col("rank_global") > (page - 1) * per_page)
    )
    if ranks is not None:
        paged = paged.join(ranks, "doc_id", "left")
        r = F.coalesce(F.col("rank"), F.lit(0.0))
    else:
        r = F.lit(0.0)  # the `:325` dead-pagerank bug, faithfully
    return (
        paged.select(
            "doc_id",
            "match_count",
            "cum_weight",
            "rank_global",
            F.round(w_text * F.col("cum_weight") + w_rank * r, 6).alias("combined"),
        )
        .orderBy(F.desc("combined"), F.asc("doc_id"))
    )


def total_hits(docs: DataFrame, query_terms: list[str]) -> DataFrame:
    """A12 (QuerySearchController.php:255-266): distinct matching docs."""
    hits = (
        doc_terms(docs)
        .filter(F.col("term").isin(query_terms))
        .select("doc_id")
        .distinct()
        .count()
    )
    return docs.sparkSession.createDataFrame([(int(hits),)], "total_hits long")


def vocabulary_stats(docs: DataFrame) -> DataFrame:
    """A5 (indexer/main.py:198-200): distinct vocabulary, here rolled up
    per lang (distinct term count + total token count)."""
    dt = docs.select("doc_id", "lang", F.explode(tokens_col()).alias("term"))
    return (
        dt.groupBy("lang")
        .agg(
            F.countDistinct("term").cast("long").alias("vocab_size"),
            F.count(F.lit(1)).cast("long").alias("token_count"),
        )
        .orderBy("lang")
    )


def top_terms_per_doc(docs: DataFrame, top_k: int = 5, max_doc: int = 100) -> DataFrame:
    """A2 (indexer/main.py:165-166, MAX_INDEX_WORDS semantics): per-doc
    top-k terms by tf via a ranking window; tie-break term asc (frozen)."""
    tf = term_frequencies(docs.filter(F.col("doc_id") < max_doc))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("term"))
    return (
        tf.withColumn("term_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("term_rank") <= top_k)
        .select("doc_id", "term", "tf", "term_rank")
    )


def source_boosted_tf(docs: DataFrame, factor: int = 50, default_tf: int = 10) -> DataFrame:
    """A3 (indexer/main.py:168-180): the URL-token boost — tf*50 when the
    term also appears in the doc's source/url tokens, else the source-only
    term is inserted at tf=10 (the code writes 10; the comment says 100 —
    we follow the code).  Source tokens come from the same frozen split."""
    tf = term_frequencies(docs)
    src = docs.select(
        "doc_id", F.explode(tokens_col("source")).alias("term")
    ).distinct()
    joined = tf.join(src.withColumn("in_src", F.lit(True)), ["doc_id", "term"], "full")
    return joined.select(
        "doc_id",
        "term",
        F.when(F.col("in_src").isNotNull() & F.col("tf").isNotNull(), F.col("tf") * factor)
        .when(F.col("in_src").isNotNull(), F.lit(default_tf))
        .otherwise(F.col("tf"))
        .cast("long")
        .alias("boosted_tf"),
    ).filter(F.col("in_src").isNotNull())  # bound output: boosted rows only


def summary_text(docs: DataFrame, max_words: int = 500, text_col: str = "text") -> DataFrame:
    """F9 (indexer/utils/utils.py:117-123): summary = the first
    ``max_words`` whitespace-separated words, space-joined (the
    reference's stored summary_text).  Pure column plan: split on
    whitespace runs, slice, re-join."""
    words = F.filter(
        F.split(F.col(text_col), "\\s+"), lambda x: x != F.lit("")
    )
    return docs.select(
        "doc_id",
        F.array_join(F.slice(words, 1, max_words), " ").alias("summary_text"),
        F.least(F.size(words), F.lit(max_words)).cast("int").alias("summary_words"),
    )


def deterministic_sample(docs: DataFrame, n: int = 1) -> DataFrame:
    """T8 (QuerySearchController.php:429-455 $sample): seeded/deterministic
    'random' doc — order by md5(doc_id) so Spark and the SQL oracle pick
    the identical row."""
    return (
        docs.select("doc_id", "lang", "source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.asc("doc_id"))
        .limit(n)
    )
