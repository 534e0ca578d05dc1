"""Real kill/resume: SIGKILL a build subprocess mid-pipeline, resume in a
fresh process, and assert the final warehouse is identical to an
uninterrupted build (SURVEY.md §5.2 item 5 — the north_star "a killed job
resumes from the last committed stage" clause, exercised with an actual
kill instead of simulated manifest removal)."""

import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BUILD_SNIPPET = """
import sys
sys.path.insert(0, {repo!r})
from moogle_spark.build import build_index
from moogle_spark.corpus import generate_docs
from moogle_spark.session import get_spark
spark = get_spark(app="killres", cores=4, shuffle_partitions=4)
build_index(spark, generate_docs(spark, 400), {wh!r})
print("BUILD_DONE", flush=True)
"""

FINGERPRINT_SNIPPET = """
import sys
sys.path.insert(0, {repo!r})
import hashlib
from pyspark.sql import functions as F
from moogle_spark.session import get_spark
from moogle_spark.tables import Warehouse
spark = get_spark(app="killres_fp", cores=4, shuffle_partitions=4)
wh = Warehouse({wh!r})
rows = (
    wh.read(spark, "postings")
    .select("shard", "term", "first_doc", F.sha2(F.col("doc_ids"), 256).alias("h"))
    .orderBy("shard", "term", "first_doc")
    .collect()
)
h = hashlib.sha256()
for r in rows:
    h.update((str(r["shard"]) + ":" + r["term"] + ":" + str(r["first_doc"]) + ":" + r["h"] + ";").encode())
fp = h.hexdigest()
cs = wh.read(spark, "corpus_stats").collect()[0]
print("FP", fp, cs["n_docs"], cs["sum_dl"], cs["n_terms"], flush=True)
"""


def _run(code: str, timeout: int = 420) -> str:
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=timeout, cwd=REPO,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    return p.stdout


def test_sigkill_mid_build_then_resume(tmp_path):
    wh_killed = str(tmp_path / "wh_killed")
    wh_clean = str(tmp_path / "wh_clean")
    code = BUILD_SNIPPET.format(repo=REPO, wh=wh_killed)

    # start a build and SIGKILL it as soon as the first stage commits
    proc = subprocess.Popen(
        [sys.executable, "-c", code], cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    marker = os.path.join(wh_killed, "analyzed", "_MANIFEST.json")
    deadline = time.time() + 300
    killed = False
    while time.time() < deadline:
        if proc.poll() is not None:
            break  # build finished before we could kill — still a valid run
        if os.path.exists(marker):
            os.kill(proc.pid, signal.SIGKILL)
            proc.wait()
            killed = True
            break
        time.sleep(0.2)
    assert killed or proc.poll() == 0

    # resume in a fresh process; must complete
    out = _run(BUILD_SNIPPET.format(repo=REPO, wh=wh_killed))
    assert "BUILD_DONE" in out

    # the resumed warehouse must be byte-equivalent (postings content
    # fingerprint + corpus scalars) to an uninterrupted build
    _run(BUILD_SNIPPET.format(repo=REPO, wh=wh_clean))
    fp1 = _run(FINGERPRINT_SNIPPET.format(repo=REPO, wh=wh_killed))
    fp2 = _run(FINGERPRINT_SNIPPET.format(repo=REPO, wh=wh_clean))
    line1 = [ln for ln in fp1.splitlines() if ln.startswith("FP ")][0]
    line2 = [ln for ln in fp2.splitlines() if ln.startswith("FP ")][0]
    assert line1 == line2
