"""spark-submit --py-files deployment smoke test — the north rule's
exact submission mode ("run via spark-submit --py-files on a
multi-executor cluster").

Packages the library into dist/webcollector_spark.zip, submits a crawl
job in a clean subprocess whose import path does NOT contain the repo
(cwd is a temp dir; PYTHONPATH is scrubbed), and asserts the job
completes and resumes. If the zip were not actually shipped to the
driver/executors via --py-files, the `import webcollector_spark` inside
tools/submit_crawl.py would fail — so this pins the deployment
packaging itself, not just the library.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]


def _spark_submit() -> str | None:
    import pyspark

    cand = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    if cand.exists():
        return str(cand)
    return shutil.which("spark-submit")


def _submit(tmp: Path, zip_path: Path, *extra: str) -> subprocess.CompletedProcess:
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_HOME")
    }
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    return subprocess.run(
        [
            _spark_submit(),
            "--master",
            "local[4]",
            "--conf",
            "spark.sql.shuffle.partitions=4",
            "--py-files",
            str(zip_path),
            str(ROOT / "tools" / "submit_crawl.py"),
            "--crawl-path",
            str(tmp / "crawl"),
            "--synthetic-pages",
            "200",
            "--seeds",
            "4",
            "--per-host-top-k",
            "20",
            "--resume",
            *extra,
        ],
        cwd=tmp,  # NOT the repo: import must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )


@pytest.mark.skipif(_spark_submit() is None, reason="spark-submit not found")
def test_py_files_submit_and_resume(tmp_path):
    # package (same artifact tools/package.py documents)
    out = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "package.py")],
        cwd=ROOT,
        capture_output=True,
        text=True,
        check=True,
    )
    zip_path = ROOT / "dist" / "webcollector_spark.zip"
    assert zip_path.exists(), out.stdout + out.stderr

    r1 = _submit(tmp_path, zip_path, "--depth", "2")
    assert r1.returncode == 0, r1.stdout[-2000:] + r1.stderr[-2000:]
    rounds1 = [
        json.loads(line)
        for line in r1.stdout.splitlines()
        if line.startswith('{"round"')
    ]
    assert [m["round"] for m in rounds1] == [0, 1]
    assert rounds1[0]["generated"] == 4  # the 4 seeds
    assert all(m["fetched"] > 0 for m in rounds1)

    # resume: a fresh submission on the same crawl-path must continue
    # from round 2, not restart at 0 (checkpoint-resume north-rule
    # requirement, exercised through the real deployment path).
    # --depth is the TOTAL depth bound, so deepening 2 -> 3 must run
    # exactly one more round, numbered 2.
    r2 = _submit(tmp_path, zip_path, "--depth", "3")
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    rounds2 = [
        json.loads(line)
        for line in r2.stdout.splitlines()
        if line.startswith('{"round"')
    ]
    assert [m["round"] for m in rounds2] == [2]
