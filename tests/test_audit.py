"""Data-quality audit operator: per-check violation counts from one
aggregation pass."""

from __future__ import annotations

from pyspark.sql import functions as F

from garmin_performance_analysis_spark.pipelines import audit as a
from garmin_performance_analysis_spark.plans import checks


def test_audit_single_pass_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "en", 5),
            (1, "en", 5),      # duplicate id
            (2, "xx", 5),      # bad lang
            (None, "en", -1),  # null id + out-of-range + not-five
        ],
        "doc_id long, lang string, n int",
    )
    out = a.audit(
        df,
        [
            a.not_null("doc_id"),
            a.unique("doc_id"),
            a.in_set("lang", ["en", "de"]),
            a.in_range("n", 0, 10),
            a.satisfies("n_is_five", F.col("n") == 5),
        ],
    )
    rows = {r["check_name"]: r for r in out.collect()}
    assert rows["doc_id_not_null"]["violations"] == 1
    assert rows["doc_id_unique"]["violations"] == 1  # one surplus row
    assert rows["lang_in_set"]["violations"] == 1
    assert rows["n_in_range"]["violations"] == 1  # only the -1 row
    assert rows["n_is_five"]["violations"] == 1
    assert all(r["total"] == 4 for r in rows.values())
    assert not rows["doc_id_unique"]["passed"]
    # ONE pass: a single scan feeds the whole report (AQE's formatted
    # output repeats the tree — count within the final plan only)
    plan = checks.formatted_plan(out)
    final = plan.split("== Initial Plan")[0].split("==== Subqueries")[0]
    assert final.count("Scan ") <= 1


def test_audit_all_green_on_clean_table(spark):
    df = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    out = a.audit(df, [a.not_null("doc_id"), a.unique("doc_id")]).collect()
    assert all(r["passed"] for r in out)
    assert all(r["violations"] == 0 and r["total"] == 100 for r in out)
