

def test_redact_pii_null_text_counts_zero(spark):
    """NULL text must yield n_redactions = 0, not NULL — a numeric
    quality gate downstream would silently mistreat NULL rows."""
    from csce438_distributed_password_cracker_spark.operators.textops import (
        redact_pii,
    )

    df = spark.createDataFrame(
        [(1, "mail me at a@b.com"), (2, None)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in df.select("doc_id", *redact_pii()).collect()}
    assert rows[1].n_redactions == 1
    assert rows[2].n_redactions == 0
    assert rows[2].text_redacted is None
