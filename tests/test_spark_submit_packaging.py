"""The north rule's ship-form, proven for real: zip the package, launch a
SEPARATE JVM via `spark-submit --py-files dqm.zip`, run the resumable
filter mode, and check the output table + manifest + metrics landed."""

import json
import subprocess
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"

RUNNER = """\
from data_quality_monitoring_spark.plans.submit import main
main()
"""


@pytest.mark.slow
def test_spark_submit_py_files_roundtrip(spark, tmp_path):
    # stage input with the ALREADY-RUNNING session (separate JVM comes next)
    from data_quality_monitoring_spark.datagen import generate_pages

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    generate_pages(spark, 240, partitions=4).write.parquet(in_dir)

    pkg_zip = tmp_path / "dqm.zip"
    src = REPO / "data_quality_monitoring_spark"
    with zipfile.ZipFile(pkg_zip, "w") as z:
        for f in src.rglob("*"):
            if f.is_file() and "__pycache__" not in f.parts:
                z.write(f, f.relative_to(REPO))
    runner = tmp_path / "runner.py"
    runner.write_text(RUNNER)

    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.ui.showConsoleProgress=false",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--py-files", str(pkg_zip),
            str(runner),
            "--input", in_dir,
            "--output", out_dir,
            "--n-buckets", "8",
            "--chunk-buckets", "4",
        ],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["chunks_run"] == 2

    data = spark.read.parquet(f"{out_dir}/data")
    assert data.count() == 240
    assert {"url", "keep", "verdict", "text_scrubbed", "bucket"} <= set(data.columns)
    assert (Path(out_dir) / "_manifest" / "current").exists()
    for t in ("rule_fire_counts", "lang_distribution", "ppl_histogram"):
        assert spark.read.parquet(f"{out_dir}/_metrics/{t}").count() > 0
