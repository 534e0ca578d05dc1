"""moogle_spark — a PySpark-native inverted-index + BM25 query engine.

A from-scratch rebuild of the semantics of the reference engine
(Moukhtar-youssef/moogle, read-only snapshot at /root/reference) as an
idiomatic Spark pipeline:

- analyzer: code-aware tokenizer (vectorized Arrow/pandas UDF), mirroring
  the reference's lowercase + stopword + isalnum analyzer chain
  (services/indexer/utils/utils.py:129-133) extended for source code.
- index build: docs -> tokenized doc rows (mapInPandas) -> zero-shuffle
  vectorized block encode into document-sharded, delta+varint
  block-compressed posting lists (with positions) and per-block
  max-score metadata.
- query: Okapi BM25 (k1=1.2, b=0.75) top-k via block-max WAND over the
  compressed postings; exhaustive numpy scorer as the verified fallback;
  exact-phrase search over the stored position streams.
- extras: PageRank (services/page-rank/cmd/page-rank/main.go:96-128
  semantics), fuzzy spell rewrite (FuzzySearch.php:122 rule), search
  analytics (StoreSearchTerm.php / RedisController.php semantics), and
  large-scale training-data ops (dedup, minhash/simhash, ANN, quality).

Everything is DataFrame API + vectorized pandas UDFs; no per-row Python
UDFs, no RDDs.
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
BLOCK_SIZE = 128
