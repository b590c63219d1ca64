"""North-rule deployment shape: the job must run via spark-submit
--py-files with the package imported ONLY from the zip artifact."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_pyfiles(tmp_path):
    from document_extractor_spark.sources.generator import write_corpus_parquet

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    write_corpus_parquet(src, 120, seed=17, rows_per_file=32)

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import package as pkg

    zip_path = pkg.build(str(tmp_path / "dep.zip"))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--py-files", zip_path,
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         os.path.join(REPO, "scripts", "extract_job.py"), src, out],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path),  # NOT the repo — forces import from the zip
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["docs"] == 120
    assert summary["partitions_processed"] >= 1
    assert os.path.isdir(os.path.join(out, "_manifests"))
