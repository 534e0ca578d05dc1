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
