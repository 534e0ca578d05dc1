"""Deduplication operators for large-scale training-data pipelines:
exact (hash groupBy), n-gram Jaccard, MinHash+LSH, SimHash.

All operators are pure DataFrame plans over a (doc_id, text) table using
built-in JVM-side functions only — deterministic, so the DuckDB oracle in
__spark_entry__.py can mirror them exactly:

  * hashing primitive = md5 hex (identical in Spark and ANSI SQL); a
    MinHash "permutation" is the lexicographic min of md5(seed || shingle)
    — md5 restricted to a fixed-length hex alphabet is a uniform order,
    so min-over-shingles is a valid MinHash estimator.
  * shingles = word n-grams under the frozen textops tokenizer.
  * SimHash uses a 16-bit fingerprint (first 4 md5 nibbles per term,
    tf-weighted) — wide enough to demo hamming-bucketing, cheap in SQL.

Scale notes (the whole point of MinHash/SimHash): the exact-Jaccard
self-join is quadratic in docs sharing a shingle and exists as the
small-scale oracle; the LSH band join only shuffles (band_id, band_hash)
keys, so candidate generation is linear in docs and the expensive
verification runs on candidates only.  At 100 TB you'd band into
r=4,b=16 and bucket the band join; both knobs are parameters here.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops import tokens_col


def exact_duplicate_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup via content-hash groupBy: one row per distinct content,
    with the canonical (min) doc_id and the duplicate count."""
    return (
        docs.select("doc_id", F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).cast("long").alias("dup_count"),
        )
    )


def shingle_col(n: int, text_col: str = "text") -> Column:
    """array<string> of word n-gram shingles (space-joined), empty when the
    doc has fewer than n tokens.  Sequence is guarded: Spark's sequence()
    runs DESCENDING when start > stop, which would fabricate shingles."""
    t = tokens_col(text_col)
    return F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(t, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def doc_shingles(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) — distinct shingle set per doc."""
    return docs.select(
        "doc_id", F.explode(shingle_col(n, text_col)).alias("shingle")
    ).distinct()


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (a < b):
    J = |A∩B| / (|A|+|B|-|A∩B|) >= threshold.  The shingle self-join is
    the small-scale oracle for MinHash-LSH below."""
    sh = doc_shingles(docs, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def minhash_signatures(
    docs: DataFrame, n: int = 3, num_hashes: int = 8, text_col: str = "text"
) -> DataFrame:
    """(doc_id, sig:array<string>) — sig[s] = min over shingles of
    md5(s || ':' || shingle).  Docs with < n tokens get an empty sig."""
    sh = doc_shingles(docs, n, text_col)
    mins = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")))).alias(f"h{s}")
            for s in range(num_hashes)
        ]
    )
    return mins.select(
        "doc_id", F.array(*[F.col(f"h{s}") for s in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """MinHash-LSH candidate pairs: split the signature into `bands` bands
    of r = num_hashes/bands rows; docs sharing any band hash are
    candidates.  Returns distinct (doc_a, doc_b) with doc_a < doc_b.
    The band join shuffles only (band_id, band_hash) — linear in corpus
    size; exact Jaccard verification then runs on candidates only."""
    r = num_hashes // bands
    sig = minhash_signatures(docs, n, num_hashes, text_col)
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_id"),
                        F.md5(
                            F.array_join(F.slice("sig", bi * r + 1, r), "|")
                        ).alias("band_hash"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bh"),
    ).select("doc_id", "bh.band_id", "bh.band_hash")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def _check_bits(bits: int) -> None:
    """Hash-width guard: bits must be a multiple of 4 (the md5 prefix is
    taken in whole hex chars — a non-multiple would silently truncate)
    and <= 60 (15 hex chars keeps the conv result inside a positive
    signed long; 64 would overflow the cast and corrupt every hash)."""
    if bits % 4 != 0 or not (0 < bits <= 60):
        raise ValueError(
            f"bits={bits} unsupported: must be a positive multiple of 4 and <= 60"
        )


def _term_hash(term_col: Column, bits: int) -> Column:
    """First ``bits`` bits of md5(term) as a long, via base-16 conv —
    identical to the SQL oracle's cast(concat('0x', substr(md5(t),1,k))
    as int)."""
    _check_bits(bits)
    return F.conv(F.substring(F.md5(term_col), 1, bits // 4), 16, 10).cast("long")


def simhash(docs: DataFrame, text_col: str = "text", bits: int = 16) -> DataFrame:
    """tf-weighted SimHash fingerprint per doc: bit b is set iff
    Σ_terms tf(t) · (±1 per md5-bit b of t) > 0.  Returns
    (doc_id, simhash:long).  The bit sum is done in LONG (cast inside the
    sum), so prints are exact up to bits=60 — 16 keeps the DuckDB oracle
    cheap; 64-bit-class prints are what you'd ship at 100 TB.

    Shuffle shape: ONE groupBy(doc_id) carrying ``bits`` conditional-sum
    columns (S_b = Σ tf·bit_b(h)) plus Σ tf — no per-bit row explode (the
    earlier form multiplied the shuffle by bits×; at bits=60 that is a
    60× row blow-up for identical output).  Bit b is then set iff
    2·S_b − Σtf > 0, folded into the print with shifts, all map-side
    partial-aggregated JVM work."""
    _check_bits(bits)
    tf = (
        docs.select("doc_id", F.explode(tokens_col(text_col)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", _term_hash(F.col("term"), bits))
    )
    # pure integer bit test (shiftright + AND): exact at every width,
    # unlike float division which corrupts bits for hashes >= 2^53
    bit_sums = [
        F.sum(
            F.when(F.expr(f"shiftright(h, {b}) & 1") == 1, F.col("tf")).otherwise(
                F.lit(0)
            )
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    sums = tf.groupBy("doc_id").agg(*bit_sums, F.sum("tf").alias("t"))
    print_col = None
    for b in range(bits):
        term = F.when(
            F.col(f"s{b}") * 2 > F.col("t"), F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        print_col = term if print_col is None else print_col + term
    return sums.select("doc_id", print_col.alias("simhash")).orderBy("doc_id")


def simhash_near_pairs(
    docs: DataFrame, max_hamming: int = 3, bits: int = 16
) -> DataFrame:
    """SimHash near-dup pairs by hamming distance — the QUADRATIC all-pairs
    form, kept only as the small-scale oracle for the bucketed plan below
    (tests assert bucketed == all-pairs)."""
    s = simhash(docs, bits=bits)
    a = s.alias("a")
    b = s.alias("b")
    x = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(x).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("doc_a", "doc_b")
    )


def simhash_near_pairs_bucketed(
    docs: DataFrame, max_hamming: int = 3, bits: int = 16
) -> DataFrame:
    """SimHash near-dup pairs via pigeonhole chunk bucketing — the scale
    path, EXACT (same output as the all-pairs form): split each print
    into max_hamming+1 bit chunks; a pair within hamming <= max_hamming
    differs in at most max_hamming chunks, so it MUST agree on at least
    one chunk and is found by the equi-join on (chunk_id, chunk_val).
    Shuffles only (chunk_id, chunk_val) keys — linear in docs plus the
    within-bucket candidate pairs; hamming is then verified exactly.
    At 16 bits the 4-bit chunks give only 16 buckets apiece (demo scale);
    at 100 TB use bits=60 (15-bit chunks, 32k buckets each) — the plan is
    identical."""
    s = simhash(docs, bits=bits)
    n_chunks = max_hamming + 1
    widths = [bits // n_chunks + (1 if i < bits % n_chunks else 0) for i in range(n_chunks)]
    offsets = [sum(widths[:i]) for i in range(n_chunks)]
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk_id"),
                F.shiftright(F.col("simhash"), offsets[i])
                .bitwiseAND(F.lit((1 << widths[i]) - 1))
                .alias("chunk_val"),
            )
            for i in range(n_chunks)
        ]
    )
    banded = s.select(
        "doc_id", "simhash", F.explode(chunks).alias("c")
    ).select("doc_id", "simhash", "c.chunk_id", "c.chunk_val")
    a = banded.alias("a")
    b = banded.alias("b")
    x = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(x).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()  # a pair can agree on several chunks
        .orderBy("doc_a", "doc_b")
    )


def near_dup_pairs_lsh(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """The composed reference-quality dedup pipeline: MinHash-LSH
    candidate generation (linear band join) -> exact n-gram Jaccard
    verification ON CANDIDATES ONLY.  Returns (doc_a, doc_b, jaccard)
    for candidates with jaccard >= threshold.  Equivalent to
    ngram_jaccard_pairs restricted to LSH-candidate pairs — the all-pairs
    shingle self-join never runs."""
    cand = minhash_lsh_pairs(docs, n, num_hashes, bands, text_col)
    sh = doc_shingles(docs, n, text_col)
    return _jaccard_verify(cand, sh, threshold)


def _jaccard_verify(cand: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """Exact n-gram Jaccard over CANDIDATE pairs only (shared by the LSH
    pipeline above and by callers that bring their own candidate set)."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Pair -> cluster canonicalization: connected components over the near-dup
# pair graph + a deterministic keep-one survivor per cluster.  This is the
# stage that turns candidate PAIRS (the outputs above) into the thing an
# LLM-corpus dedup run actually ships: one document per duplicate cluster.


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14 — public algorithm): for every node u,
    connect each strictly-LARGER neighbor v to m = min(N(u) ∪ {u}).
    Input/output edges keep the canonical u > v orientation.  Pure
    equi-joins and one groupBy — no cartesian anywhere."""
    nbr = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = (
        nbr.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", "u").alias("m"))
    )
    return (
        nbr.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: for every node u (edges oriented u > v, so
    u's listed neighbors are all SMALLER), connect each neighbor — and u
    itself — to m = min(N_<(u)).  Output keeps u > v."""
    m = e.groupBy("u").agg(F.min("v").alias("m"))
    e1 = e.join(m, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    e2 = m.select("u", F.col("m").alias("v"))
    return e1.union(e2).filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int | None = None,
    _stats: dict | None = None,
) -> DataFrame:
    """Connected components over an undirected pair graph via alternating
    large-star / small-star rounds.  Returns (doc_id, cluster_id) for
    every node appearing in ``pairs``, cluster_id = MIN doc_id of the
    component — deterministic, so the DuckDB recursive-CTE oracle can
    mirror it exactly.

    Scale shape (the reason this is not one-hop label propagation): each
    round is two equi-joins plus a groupBy on node id — shuffle keys are
    node ids, never pair enumerations — and the round count converges in
    O(log n) (paper bound; a path graph, the worst case for plain
    min-label propagation's O(diameter), closes in ~log rounds here).
    Per-round results are eagerly localCheckpoint'ed so the plan stays
    O(1) deep instead of compounding joins across rounds (same idiom as
    pagerank.py; on a real cluster use a reliable checkpoint dir).
    Convergence is detected by (edge count, xxhash64 bit_xor digest)
    stabilizing — set equality up to a 2^-64 hash collision.

    ``max_rounds`` guards against a non-converging loop (default
    2·ceil(log2 n) + 8); ``_stats`` (if a dict) receives
    {"rounds": r, "n_nodes": n} for the scale-shape tests."""
    e = (
        pairs.select(F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = (
        e.select(F.col("u").alias("x"))
        .union(e.select(F.col("v").alias("x")))
        .distinct()
        .count()
    )
    if _stats is not None:
        _stats["n_nodes"] = n_nodes
    if n_nodes == 0:
        if _stats is not None:
            _stats["rounds"] = 0
        return pairs.sparkSession.createDataFrame([], "doc_id long, cluster_id long")
    cap = max_rounds if max_rounds is not None else 2 * math.ceil(math.log2(max(n_nodes, 2))) + 8
    prev_sig = None
    rounds = 0
    for rounds in range(1, cap + 1):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # bit_xor: order-independent set digest that cannot overflow
        # under ANSI mode (sum of 64-bit hashes would); edges are
        # distinct, so xor-cancellation of repeated rows cannot occur
        row = e.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        sig = (int(row["cnt"]), int(row["h"]) if row["h"] is not None else 0)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {cap} rounds "
            f"({n_nodes} nodes) — raise max_rounds"
        )
    if _stats is not None:
        _stats["rounds"] = rounds
    # fixed point is a star forest: every non-root has exactly one edge
    # (u -> component min); roots map to themselves
    members = e.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
    roots = e.select(F.col("v").alias("doc_id"), F.col("v").alias("cluster_id")).distinct()
    return members.union(roots).distinct()


def near_dup_clusters(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """The composed pair→cluster pipeline over a corpus: MinHash-LSH
    candidates -> exact-Jaccard verification -> connected components.
    Returns (doc_id, cluster_id) for every doc that belongs to a
    NON-TRIVIAL cluster (docs with no verified near-dup don't appear —
    join back to the corpus for singleton rows, as dedup_keep_one does).
    Ordered by doc_id for the oracle compare."""
    pairs = near_dup_pairs_lsh(docs, n, num_hashes, bands, threshold, text_col)
    return connected_components(pairs).orderBy("doc_id")


def dedup_keep_one(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    quality: DataFrame | None = None,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Keep-one survivor selection: every doc lands in a cluster
    (near-dup component, or a singleton cluster of itself), and exactly
    one doc per cluster survives — the HIGHEST quality_score, ties broken
    by MIN doc_id.  Returns survivors only:
    (doc_id, cluster_id, cluster_size, quality_score), ordered by doc_id.

    ``pairs`` defaults to the verified LSH pipeline above;
    ``quality`` defaults to textstats.quality_scores(docs) (frozen
    6-decimal composite, so survivor choice is deterministic and
    oracle-mirrorable).  The curation pipeline consumes this as its
    near-dup stage: join survivors back to ``docs`` to materialize the
    kept corpus.

    Scale: components over pairs (linear, see connected_components) +
    a membership join + ONE groupBy(cluster_id) whose aggregates
    (struct-max survivor + count) both have map-side partials — no
    window, so a pathological mega-cluster (the same boilerplate page
    duplicated 10^8 times) costs a combine-reduced agg, never a single
    hot sort partition."""
    if pairs is None:
        pairs = near_dup_pairs_lsh(docs, n, num_hashes, bands, threshold, text_col)
    if quality is None:
        from .textstats import quality_scores

        quality = quality_scores(docs, text_col=text_col)
    cc = connected_components(pairs)
    membership = (
        docs.select("doc_id")
        .join(cc, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
        )
    )
    scored = membership.join(
        quality.select("doc_id", "quality_score"), "doc_id"
    )
    # survivor via struct-max: max (quality_score, -doc_id) = highest
    # quality, ties to the SMALLEST doc_id — identical to the oracle's
    # row_number() over (quality DESC, doc_id ASC) = 1, but as a plain
    # aggregate with partial (map-side) combination
    best = F.max(
        F.struct(
            F.col("quality_score"),
            (-F.col("doc_id")).alias("neg_id"),
        )
    ).alias("best")
    return (
        scored.groupBy("cluster_id")
        .agg(best, F.count(F.lit(1)).cast("long").alias("cluster_size"))
        .select(
            (-F.col("best.neg_id")).alias("doc_id"),
            "cluster_id",
            "cluster_size",
            F.col("best.quality_score").alias("quality_score"),
        )
        .orderBy("doc_id")
    )
