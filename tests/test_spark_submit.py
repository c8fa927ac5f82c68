"""North-rule shipping smoke: the job REALLY runs via spark-submit
--py-files from outside the repo, and a resubmit resumes from checkpoint.

This is the evidence for the "ships as spark-submit --py-files" clause:
the package is consumed from dist/biokg_spark.zip only (cwd is a temp
dir, repo not on sys.path), the master comes from submit-time conf, and
the job prints one JSON line of per-stage metrics.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_end_to_end_and_resume(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH in this environment")

    # build the --py-files zip fresh (fast: pure zipfile)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package_pyfiles.py")],
        check=True,
        capture_output=True,
    )
    shutil.copy(os.path.join(REPO, "dist", "biokg_spark.zip"), tmp_path)
    shutil.copy(os.path.join(REPO, "jobs", "kg_pipeline_job.py"), tmp_path)

    def submit():
        out = subprocess.run(
            [
                spark_submit,
                "--master",
                "local[4]",
                "--conf",
                "spark.sql.shuffle.partitions=4",
                "--py-files",
                "biokg_spark.zip",
                "kg_pipeline_job.py",
                "--workdir",
                str(tmp_path / "wd"),
                "--synth-conversations",
                "50",
                "--run-key",
                "smoke",
            ],
            cwd=tmp_path,  # NOT the repo: the zip must provide the package
            capture_output=True,
            text=True,
            timeout=600,
        )
        assert out.returncode == 0, out.stderr[-4000:]
        return json.loads(out.stdout.strip().splitlines()[-1])["stages"]

    stages = submit()
    expected = {
        "ingest", "extracted", "mentions", "turn_sets", "links", "quads",
        "action_quads", "expr_quads", "phos_quads", "metadata", "properties",
    }
    assert expected <= set(stages)
    assert all(s["rows"] > 0 for s in stages.values())
    assert not any(s["skipped"] for s in stages.values())

    # idempotent resubmit: same input fingerprint -> every stage resumes
    # from its checkpoint instead of recomputing (north rule: resumable)
    stages2 = submit()
    assert all(s["skipped"] for s in stages2.values()), stages2
    assert {k: s["rows"] for k, s in stages2.items()} == {
        k: s["rows"] for k, s in stages.items()
    }
