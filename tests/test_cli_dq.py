"""CLI `dq` command: profile + constraint audit over a parquet table."""

from __future__ import annotations

import json

from legendary_data_pipeline_spark import cli


def _run(spark, argv):
    args = cli.build_parser().parse_args(argv)
    return args.fn(spark, args)


def _write_table(spark, path):
    spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (2, -3.0, "B"),
            (2, 5.0, None),
        ],
        "id long, price double, status string",
    ).write.parquet(path)


def test_dq_reports_and_exit_codes(spark, tmp_path, capsys):
    wh = str(tmp_path / "wh")
    table = str(tmp_path / "t")
    _write_table(spark, table)

    rc = _run(spark, [
        "dq", "--warehouse", wh, "--input", table,
        "--not-null", "status",
        "--unique-key", "id",
        "--check", "price_positive:price > 0",
    ])
    assert rc == 1  # all three checks fail on this table
    out = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(out)
    assert summary["rows"] == 3
    assert summary["checks"] == 3
    assert summary["checks_failed"] == 3

    prof = {
        r.column: r for r in spark.read.parquet(f"{wh}/dq_profile").collect()
    }
    assert set(prof) == {"id", "price", "status"}
    assert prof["status"].n_null == 1
    assert prof["id"].n_distinct == 2

    checks = {
        r.check_name: r
        for r in spark.read.parquet(f"{wh}/dq_checks").collect()
    }
    assert checks["status_not_null"].n_violations == 1
    assert checks["price_positive"].n_violations == 1
    assert checks["unique(id)"].n_violations == 1
    # run log records the failed audit
    runs = spark.read.parquet(f"{wh}/pipeline_runs")
    assert runs.filter("job = 'dq' and status = 'failed'").count() == 1


def test_dq_passes_on_clean_table(spark, tmp_path, capsys):
    wh = str(tmp_path / "wh")
    table = str(tmp_path / "clean")
    spark.createDataFrame(
        [(1, 2.0), (2, 3.0)], "id long, price double"
    ).write.parquet(table)
    rc = _run(spark, [
        "dq", "--warehouse", wh, "--input", table,
        "--not-null", "id,price",
        "--unique-key", "id",
        "--check", "price_positive:price > 0",
        "--columns", "id",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["checks_failed"] == 0
    assert summary["columns_profiled"] == 1


def test_dq_profile_only_no_checks(spark, tmp_path, capsys):
    wh = str(tmp_path / "wh")
    table = str(tmp_path / "t2")
    _write_table(spark, table)
    rc = _run(spark, ["dq", "--warehouse", wh, "--input", table])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["checks"] == 0 and summary["checks_failed"] == 0
