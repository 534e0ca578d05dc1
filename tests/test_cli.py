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
