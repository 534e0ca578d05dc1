"""spark-submit surface: the `python -m moogle_spark` job entry must
build and query an index end-to-end in a fresh process (the same driver
script spark-submit would run on a cluster)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args: str, timeout: int = 420) -> str:
    env = dict(os.environ, PYTHONPATH=REPO, MOOGLE_MASTER="local[4]")
    p = subprocess.run(
        [sys.executable, "-m", "moogle_spark", *args],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    return p.stdout


def test_cli_build_then_search(tmp_path, spark):
    from moogle_spark.corpus import generate_docs

    src = str(tmp_path / "docs.parquet")
    generate_docs(spark, 120).write.parquet(src)
    wh = str(tmp_path / "wh")

    out = _run("build", "--input", src, "--warehouse", wh)
    assert "BUILD_OK n_docs=120" in out

    out = _run("search", "--warehouse", wh, "--query", "hotterm0", "--k", "3")
    assert out.count("'rank'") == 3 and "'score'" in out

    # resume: second build skips every stage
    out = _run("build", "--input", src, "--warehouse", wh)
    assert "run=[]" in out

    out = _run("expire", "--warehouse", wh)
    assert "EXPIRED []" in out


def test_cli_maintenance_commands(tmp_path, spark):
    """stable build -> segment refresh -> merge -> partial compact ->
    stats, all through the spark-submit entry."""
    import json

    from pyspark.sql import functions as F

    from moogle_spark.corpus import generate_docs

    docs = generate_docs(spark, 120)
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    src2 = str(tmp_path / "docs2.parquet")
    docs.withColumn(
        "content",
        F.when(
            F.pmod(F.xxhash64("path"), F.lit(4)) == 0,
            F.concat(F.col("content"), F.lit(" clichurntok")),
        ).otherwise(F.col("content")),
    ).write.parquet(src2)
    wh = str(tmp_path / "wh")

    out = _run("build", "--input", src, "--warehouse", wh,
               "--doc-id-mode", "stable", "--shards", "16")
    assert "BUILD_OK n_docs=120" in out
    out = _run("build", "--input", src2, "--warehouse", wh,
               "--incremental", "--strategy", "segment")
    assert "BUILD_OK n_docs=120" in out

    stats = json.loads(_run("stats", "--warehouse", wh).strip().splitlines()[-1])
    assert stats["max_gen"] == 1 and stats["n_tombstones"] > 0
    assert stats["doc_id_mode"] == "stable"
    assert stats["table_bytes"]["postings"] > 0

    out = _run("merge", "--warehouse", wh)
    assert "MERGE_OK" in out
    out = _run("compact", "--warehouse", wh, "--max-shards", "4")
    assert "COMPACT_OK" in out and "postings" in out
    out = _run("compact", "--warehouse", wh)  # fold the rest
    assert "COMPACT_OK" in out

    stats = json.loads(_run("stats", "--warehouse", wh).strip().splitlines()[-1])
    assert stats["max_gen"] == 0 and stats["n_tombstones"] == 0

    out = _run("search", "--warehouse", wh, "--query", "clichurntok", "--k", "3")
    assert out.count("'rank'") == 3

    # takedown through the CLI: 10 keys removed without content
    keys_src = str(tmp_path / "delkeys.parquet")
    docs.select("repo", "path", "commit").orderBy("path").limit(10) \
        .write.parquet(keys_src)
    out = _run("delete", "--keys", keys_src, "--warehouse", wh)
    assert "DELETE_OK n_docs=110" in out
    stats = json.loads(_run("stats", "--warehouse", wh).strip().splitlines()[-1])
    assert stats["n_docs"] == 110


def test_load_corpus_formats_and_validation(tmp_path, spark):
    """corpus.load_corpus: schema-validated, column-pruned, multi-format."""
    import pytest as _pytest

    from moogle_spark.corpus import generate_docs, load_corpus

    docs = generate_docs(spark, 20)
    pq = str(tmp_path / "c.parquet")
    js = str(tmp_path / "c.json")
    docs.withColumn("extra", docs["repo"]).write.parquet(pq)  # extra col
    docs.write.json(js)

    cs = str(tmp_path / "c.csv")
    docs.write.option("header", "true").option("escape", '"').csv(cs)
    for path, fmt in ((pq, "parquet"), (js, "json"), (cs, "csv")):
        got = load_corpus(spark, path, fmt=fmt)
        assert got.columns == ["repo", "path", "commit", "lang", "content"]
        assert got.count() == 20
    # multi-line content must survive csv round-trip intact (the
    # multiLine/escape options — a default read would shred the rows)
    ml = spark.createDataFrame(
        [("r", "p", "c", "py", 'def f():\n    return "x"')],
        "repo string, path string, commit string, lang string, content string",
    )
    mlp = str(tmp_path / "ml.csv")
    ml.write.option("header", "true").option("escape", '"').csv(mlp)
    back = load_corpus(spark, mlp, fmt="csv").collect()
    assert len(back) == 1
    assert back[0]["content"] == 'def f():\n    return "x"'
    with _pytest.raises(ValueError, match="missing column"):
        bad = str(tmp_path / "bad.parquet")
        docs.drop("content").write.parquet(bad)
        load_corpus(spark, bad)
    with _pytest.raises(ValueError, match="fmt="):
        load_corpus(spark, pq, fmt="orc")


def test_cli_replay(tmp_path, spark):
    from moogle_spark.corpus import generate_docs

    src = str(tmp_path / "docs.parquet")
    generate_docs(spark, 120).write.parquet(src)
    wh = str(tmp_path / "wh")
    _run("build", "--input", src, "--warehouse", wh)

    qfile = tmp_path / "queries.txt"
    qfile.write_text("hotterm0\ndef return\n\nimport\n")
    out = _run("replay", "--warehouse", wh, "--queries", str(qfile), "--k", "3")
    assert "REPLAY_OK queries=3" in out
    outp = str(tmp_path / "res.parquet")
    out = _run(
        "replay", "--warehouse", wh, "--queries", str(qfile),
        "--k", "3", "--enrich", "--out", outp,
    )
    assert "REPLAY_OK queries=3" in out and f"out={outp}" in out
    res = spark.read.parquet(outp)
    assert "repo" in res.columns and res.count() > 0
