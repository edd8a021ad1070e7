"""textstats operator checks that parity alone can't express — above all
that the PII redaction query actually EXERCISES every pattern class (a
mis-shaped plant once left the phone path vacuously green)."""

from __future__ import annotations

from pyspark.sql import functions as F

from watchman_spark.queries_text import text_redact_pii


def test_redact_query_exercises_every_pii_class(spark):
    out = text_redact_pii(spark, "/root/testdata/sf0.001")
    hits = out.agg(
        *[
            F.sum(F.when(F.col("redacted").contains(tok), 1).otherwise(0)).alias(tok)
            for tok in ("<EMAIL>", "<PHONE>", "<IPV4>")
        ]
    ).collect()[0]
    n = out.count()
    assert hits["<EMAIL>"] == n  # every row's planted email redacted
    assert hits["<PHONE>"] == n  # every row's planted phone redacted
    assert hits["<IPV4>"] == n  # every row's planted ip redacted
    # and no raw planted PII survives
    leaked = out.filter(
        F.col("redacted").rlike(r"@example\.com|555-\d{3}-\d{4}|10\.0\.\d+\.\d+")
    ).count()
    assert leaked == 0
