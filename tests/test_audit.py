"""Observation-based scan audits: metrics ride the action, no re-scan."""

from pyspark.sql import functions as F

from batch_process_spark.operators.audit import audited_write_parquet, scan_audit


def test_scan_audit_default_metrics(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)], "k long, v string"
    )
    observed, obs = scan_audit(df)
    assert observed.count() == 4  # the action that fills the metrics
    got = dict(obs.get)
    assert got == {"n_rows": 4, "null_k": 0, "null_v": 2}


def test_scan_audit_dotted_column_names(spark):
    """Top-level names containing dots (legal in parquet/JSON intake)
    must audit as columns, not parse as struct-field access."""
    df = spark.createDataFrame([(1, None), (2, "x")], ["user.id", "geo.city"])
    observed, obs = scan_audit(df)
    assert observed.count() == 2
    got = dict(obs.get)
    assert got == {"n_rows": 2, "null_user.id": 0, "null_geo.city": 1}


def test_scan_audit_custom_metrics_see_attachment_point(spark):
    """Metrics observe rows AT THE POINT OF ATTACHMENT: attached before
    a filter they count what the filter will drop — the shape that lets
    one job report input AND output volumes."""
    df = spark.range(100).select(F.col("id").alias("k"))
    observed, obs = scan_audit(
        df, {"n_in": F.count(F.lit(1)), "sum_in": F.sum("k")}
    )
    kept = observed.filter(F.col("k") % 10 == 0).count()
    assert kept == 10
    got = dict(obs.get)
    assert got["n_in"] == 100 and got["sum_in"] == 4950


def test_audited_write_parquet_single_job(spark, tmp_path):
    df = spark.createDataFrame([(1, None), (2, "x")], "k long, v string")
    path = str(tmp_path / "out")
    audit = audited_write_parquet(df, path)
    assert audit == {"n_rows": 2, "null_k": 0, "null_v": 1}
    assert spark.read.parquet(path).count() == 2


def test_observation_is_fresh_per_call(spark):
    df = spark.range(5)
    a, oa = scan_audit(df)
    b, ob = scan_audit(df)
    a.count()
    b.count()
    assert dict(oa.get)["n_rows"] == 5 and dict(ob.get)["n_rows"] == 5
