"""Deterministic synthetic corpus matching BASELINE.json input_hint:
an input table of source-code repositories with columns
(repo:string, path:string, commit:string, lang:string, content:string).

Generation follows FIXTURES.md §1: seed-fixed, Zipf(s≈1.1) base vocabulary
rendered as code identifiers (snake_case / camelCase / dotted paths),
per-lang keywords, comments containing English stopwords, ≥3 deliberately
hot terms (df > 30% of docs) to exercise skew handling, and unique-to-one-doc
terms. Every doc's content is a pure function of (seed, doc index) so the
corpus is identical no matter how generation is partitioned.

Generation itself is distributed (spark.range -> mapInPandas) so the same
code synthesizes the 10^12-file-scale corpus on a real cluster; the sandbox
uses small n_docs.

Also provides the column-mapping shim for the driver-provided
documents.parquet (doc_id,text,lang,source,n_chars) -> the docs shape
(FIXTURES.md §1 note).
"""

from __future__ import annotations

import hashlib
import random
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
VOCAB_SIZE = 20_000
HOT_TERMS = ["hotterm0", "hotterm1", "hotterm2"]  # df > 30% by construction
N_UNIQUE_DOCS = 60  # docs 0..59 each carry a term unique to that doc

LANGS = ["python", "go", "php", "javascript", "rust", "markdown"]
LANG_WEIGHTS = [0.30, 0.20, 0.15, 0.15, 0.10, 0.10]  # ≈ reference service mix
LANG_EXT = {
    "python": "py",
    "go": "go",
    "php": "php",
    "javascript": "js",
    "rust": "rs",
    "markdown": "md",
}
LANG_KEYWORDS = {
    "python": ["def", "return", "import", "class", "self", "none"],
    "go": ["func", "package", "struct", "defer", "chan", "nil"],
    "php": ["function", "echo", "public", "namespace", "array"],
    "javascript": ["const", "let", "function", "async", "await"],
    "rust": ["fn", "impl", "match", "trait", "mut", "crate"],
    "markdown": ["readme", "install", "usage", "license"],
}
_COMMENT_WORDS = (
    "this is the value we return for each of those because it has been "
    "done before and should not be here again"
).split()  # heavy in stopwords on purpose

_SYL_A = "br cl dr fl gr kl pr sl tr vl st sh ch th qu".split()
_SYL_B = "a e i o u ai ea io ou".split()
_SYL_C = "b d k l m n p r s t x z nd st".split()


def _word(i: int) -> str:
    """Deterministic identifier-ish rendering of vocab index i."""
    a = _SYL_A[i % len(_SYL_A)]
    b = _SYL_B[(i // len(_SYL_A)) % len(_SYL_B)]
    c = _SYL_C[(i // (len(_SYL_A) * len(_SYL_B))) % len(_SYL_C)]
    d = i // (len(_SYL_A) * len(_SYL_B) * len(_SYL_C))
    return f"{a}{b}{c}{d}" if d else f"{a}{b}{c}"


VOCAB = [_word(i) for i in range(VOCAB_SIZE)]

# Zipf(s=1.1) pmf over vocab ranks, precomputed once per executor.
_ZIPF_S = 1.1
_zipf_w = 1.0 / np.power(np.arange(1, VOCAB_SIZE + 1, dtype=np.float64), _ZIPF_S)
_ZIPF_P = _zipf_w / _zipf_w.sum()
_ZIPF_CDF = np.cumsum(_ZIPF_P)


def _gen_one(i: int, n_docs: int) -> dict:
    rng = random.Random((SEED << 32) ^ i)
    nrng = np.random.default_rng((SEED << 32) ^ i)
    lang = rng.choices(LANGS, weights=LANG_WEIGHTS)[0]
    repo = f"org{i % 7}/repo{i % 23}"
    commit = hashlib.sha1(f"{SEED}:{repo}:{i % 3}".encode()).hexdigest()
    module = VOCAB[rng.randrange(200)]
    name = VOCAB[rng.randrange(2000)]
    path = f"src/{module}/{name}_{i}.{LANG_EXT[lang]}"

    n_tokens = rng.randint(50, 1200)
    idx = np.searchsorted(_ZIPF_CDF, nrng.random(n_tokens))
    parts: list[str] = []
    kw = LANG_KEYWORDS[lang]
    for j, v in enumerate(idx):
        w = VOCAB[int(v)]
        style = rng.random()
        if style < 0.08:
            parts.append(f"{w}_{VOCAB[int(idx[(j + 1) % n_tokens])]}")
        elif style < 0.14:
            w2 = VOCAB[int(idx[(j + 1) % n_tokens])]
            parts.append(f"{w}{w2.capitalize()}")
        elif style < 0.18:
            parts.append(f"{w}.{VOCAB[int(idx[(j + 1) % n_tokens])]}")
        elif style < 0.24:
            parts.append(kw[j % len(kw)])
        else:
            parts.append(w)
        if rng.random() < 0.02:
            parts.append("// " + " ".join(rng.choices(_COMMENT_WORDS, k=6)))
        if rng.random() < 0.015:
            parts.append("\n")
    for h, p in zip(HOT_TERMS, (0.40, 0.36, 0.33)):
        if rng.random() < p:
            parts.insert(rng.randrange(len(parts)), f"{h}({h})")
    if i < N_UNIQUE_DOCS:
        parts.append(f"uniqdoc{i}x")
    return {
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": " ".join(parts),
    }


DOCS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def generate_docs(spark: SparkSession, n_docs: int = 500, parallelism: int | None = None) -> DataFrame:
    """Distributed deterministic corpus: content is a pure function of the
    row index, so any partitioning yields the identical table."""
    parallelism = parallelism or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [_gen_one(int(i), n_docs) for i in b["id"]]
            yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])

    return spark.range(0, n_docs, 1, parallelism).mapInPandas(gen, DOCS_SCHEMA)


def generate_docs_local(n_docs: int = 500) -> pd.DataFrame:
    """Single-process twin of generate_docs for the Python oracle/tests."""
    return pd.DataFrame([_gen_one(i, n_docs) for i in range(n_docs)])


def reference_queries(n_docs: int = 500) -> list[dict]:
    """The frozen reference query set (FIXTURES.md §2): single/multi-term,
    '+'-separated, stopword-only, absent terms, misspellings, hot terms,
    uppercase."""
    qs = [
        "hotterm0",                      # hot single term
        "hotterm1 hotterm2",             # two hot terms
        VOCAB[0],                        # most frequent zipf term
        VOCAB[5],
        f"{VOCAB[1]}+{VOCAB[7]}",        # '+' separated (X8)
        f"{VOCAB[2]} {VOCAB[11]} {VOCAB[31]}",
        "the and of",                    # stopword-only (query analyzer keeps them; df=0)
        "zzqqxxnosuchterm",              # absent from corpus
        VOCAB[3][:-1] + "q",             # misspelling, edit distance 1
        VOCAB[12].upper(),               # uppercase input
        f"{VOCAB[4]} {'zz' + VOCAB[9]}",  # one good + one bad term
        "uniqdoc7x",                     # unique-to-one-doc term
        f"{VOCAB[6]} hotterm0",          # rare + hot mix
        "def return import",             # code keywords
        f"{VOCAB[8]}+{VOCAB[13]}+{VOCAB[21]}+{VOCAB[34]}+{VOCAB[55]}",  # 5 terms
    ]
    qs += [VOCAB[17 * (k + 1)] for k in range(25)]
    return [{"query_id": qi + 1, "query": q, "k": 20} for qi, q in enumerate(qs)]


def docs_from_driver_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-mapping shim: driver documents.parquet -> docs shape
    (FIXTURES.md §1: text→content, source→repo, constant commit)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.lit("0" * 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


CORPUS_COLUMNS = {
    "repo": "string",
    "path": "string",
    "commit": "string",
    "lang": "string",
    "content": "string",
}


def load_corpus(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Schema-validated corpus loader for the BASELINE input_hint shape
    (repo, path, commit, lang, content — all strings).

    Accepts parquet (the native layout; an Iceberg table's data files
    read identically here), json (one object per line), or csv (with
    header).  Extra columns are PRUNED (so the build never scans them);
    missing required columns raise immediately with the full expected
    shape instead of failing deep inside the tokenizer; non-string
    arrivals (e.g. csv inference) are cast.  Pure column plan — the
    projection pushes into the scan."""
    readers = {
        "parquet": lambda: spark.read.parquet(path),
        "json": lambda: spark.read.json(path),
        # multiLine + escape: source-code `content` embeds newlines and
        # quotes in essentially every row; a default csv read would split
        # records at embedded newlines into silently corrupt rows that
        # still pass the column check
        "csv": lambda: spark.read.option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path),
    }
    if fmt not in readers:
        raise ValueError(f"fmt={fmt!r}: expected one of {sorted(readers)}")
    df = readers[fmt]()
    missing = [c for c in CORPUS_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"corpus at {path} is missing column(s) {missing}; expected "
            f"the input_hint shape {dict(CORPUS_COLUMNS)} (extra columns "
            "are allowed and pruned)"
        )
    return df.select(
        *[F.col(c).cast(t).alias(c) for c, t in CORPUS_COLUMNS.items()]
    )
