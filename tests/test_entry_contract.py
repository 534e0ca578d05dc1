"""Light in-repo twin of the driver's correctness gate: a sample of
queries() vs oracle_sql() pairs at sf0.001 (full sweep:
tools/check_contract.py at sf0.01)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tools.check_contract import TABLES, compare

SF_DIR = "/root/testdata/sf0.001"

SAMPLE = [
    "df",
    "search_bm25",
    "search_tfidf",
    "fuzzy_suggest",
    "top_searches",
    "dedup_exact",
    "lsh_pairs",
    "knn_brute",
    "quality",
    "random_page",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return c


def test_every_query_has_callable():
    qs = entrymod.queries()
    assert len(qs) >= 30
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # all but the one declared non-SQL-expressible op have oracles
    # (engine_bm25 = the compressed-postings WAND engine; it is verified
    # against the in-repo Python oracle instead)
    assert set(qs) - set(oracles) == {"engine_bm25"}


@pytest.mark.parametrize("name", SAMPLE)
def test_contract_pair(spark, con, name):
    sdf = entrymod.queries()[name](spark, SF_DIR).toPandas()
    odf = con.sql(entrymod.oracle_sql()[name]).df()
    errs = compare(name, sdf, odf)
    assert not errs, errs
