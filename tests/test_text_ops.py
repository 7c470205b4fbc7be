"""Text-pipeline ops not otherwise unit-covered (oracle entries gate
txt_stats end to end; redact gets direct semantics checks here)."""

from pyspark.sql import functions as F

from bloomsearch_spark.functions.text import redact


def test_redact_global_ordered_null_safe(spark):
    df = spark.createDataFrame(
        [
            (1, "call 555 then 777 done"),
            (2, "vector fast and vector slow and vector mid"),
            (3, None),
            (4, "clean"),
        ],
        "id long, text string",
    )
    out = {
        r.id: r.red
        for r in df.select(
            "id",
            redact(F.col("text"), (r"vector (fast|slow)", r"[0-9]+")).alias("red"),
        ).collect()
    }
    # global: every match replaced, not just the first
    assert out[1] == "call [REDACTED] then [REDACTED] done"
    # ordered patterns; non-matching variants survive
    assert out[2] == "[REDACTED] and [REDACTED] and vector mid"
    assert out[3] is None  # null passes through
    assert out[4] == "clean"
    # ordered-chain semantics: LATER patterns see earlier replacements
    # (documented; pick patterns/replacement that cannot interact if that
    # matters for the pipeline)
    one = (
        spark.createDataFrame([("x9y",)], "t string")
        .select(redact(F.col("t"), (r"[0-9]", r"x\[",)).alias("red"))
        .first()
        .red
    )
    assert one == "[REDACTED]REDACTED]y"
