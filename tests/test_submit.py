"""spark-submit CLI (ontograph_spark/pipeline/submit.py).

The north rule's production shape is `spark-submit --py-files <pkg.zip>
submit_construct.py ...`; these tests drive `main()` in-process (its
`getOrCreate()` picks up the suite's session, exactly as it picks up the
spark-submit-provided session on a cluster). The zip + real spark-submit
path is exercised by the bench harness smoke, not here.
"""

from __future__ import annotations

import json
import os

import pytest

from ontograph_spark.pipeline.submit import build_parser, main


def test_parser_rejects_missing_source(capsys):
    with pytest.raises(SystemExit):
        build_parser().parse_args(["--output", "/tmp/x"])


def test_parser_defaults():
    a = build_parser().parse_args(["--input", "in", "--output", "out"])
    assert (a.buckets, a.format, a.no_canonicalize) == (64, "parquet", False)


def test_single_shot_synthesize(spark, tmp_path, capsys):
    out = str(tmp_path / "quads")
    rc = main(["--synthesize", "300", "--output", out, "--buckets", "0"])
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["mode"] == "single-shot"
    assert metrics["triples"] > 0
    assert metrics["triples"] == spark.read.parquet(out).count()


def test_resumable_run_then_skip(spark, tmp_path, capsys):
    out = str(tmp_path / "quads")
    argv = ["--synthesize", "300", "--output", out, "--buckets", "2"]
    assert main(argv) == 0
    m1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m1["mode"] == "resumable" and m1["buckets_skipped"] == 0
    assert m1["triples"] > 0 and m1["input_rows"] == 300
    assert os.path.isdir(os.path.join(out, "_manifests"))
    # identical re-invocation resumes: every bucket skips
    assert main(argv) == 0
    m2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m2["buckets_skipped"] == 2
    assert m2["triples"] == m1["triples"]


def test_missing_columns_rejected(spark, tmp_path, capsys):
    bad = str(tmp_path / "bad.parquet")
    spark.range(3).selectExpr("'r' as repo", "'p' as path").write.parquet(bad)
    rc = main(["--input", bad, "--output", str(tmp_path / "q")])
    assert rc == 2
    assert "missing required columns" in capsys.readouterr().err
