"""PII scrub (functions/pii.py): chain-order semantics and Java-vs-RE2
pattern agreement (the full engine-vs-DuckDB parity is the pii_scrub
contract query)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from mapchete_spark.functions.pii import (
    PII_PATTERNS,
    pii_count_cols,
    pii_count_sql,
    redact_col,
    redact_sql,
)

CASES = [
    # email digits must not also count as phone/ip (chain order)
    ("reach me at bob123-456-7890@mail.example.org now",
     dict(n_email=1, n_id=0, n_ip=0, n_phone=0)),
    ("ssn 123-45-6789 and phone 555-123-4567",
     dict(n_email=0, n_id=1, n_ip=0, n_phone=1)),
    ("server 192.168.0.1 and 10.0.0.2", dict(n_email=0, n_id=0, n_ip=2,
                                             n_phone=0)),
    ("call 555 123 4567 or 555-123-4567",
     dict(n_email=0, n_id=0, n_ip=0, n_phone=2)),
    ("clean text with numbers 12345 and date 2026-08-17",
     dict(n_email=0, n_id=0, n_ip=0, n_phone=0)),
    ("two mails a@b.co c.d@e-f.org", dict(n_email=2, n_id=0, n_ip=0,
                                          n_phone=0)),
]


def test_counts_and_redaction_spark(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(CASES)], "i long, text string"
    )
    out = df.select(
        "i",
        *[v.alias(k) for k, v in pii_count_cols(F.col("text")).items()],
        redact_col(F.col("text")).alias("red"),
    ).collect()
    for row, (text, expect) in zip(sorted(out, key=lambda r: r["i"]), CASES):
        for k, v in expect.items():
            assert row[k] == v, (text, k, row[k], v)
        # nothing PII-shaped survives redaction
        for _, pat, _repl in PII_PATTERNS:
            import re

            assert not re.search(pat, row["red"]), (text, pat, row["red"])


def test_sql_twin_agrees_rowwise():
    duck = duckdb.connect()
    duck.execute("CREATE TABLE t (i INT, text VARCHAR)")
    duck.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(i, t) for i, (t, _) in enumerate(CASES)],
    )
    cols = ", ".join(f"{v} AS {k}" for k, v in pii_count_sql("text").items())
    rows = duck.execute(
        f"SELECT i, {cols}, {redact_sql('text')} AS red FROM t ORDER BY i"
    ).fetchall()
    for (i, ne, nid, nip, nph, red), (text, expect) in zip(rows, CASES):
        assert (ne, nid, nip, nph) == (
            expect["n_email"], expect["n_id"], expect["n_ip"],
            expect["n_phone"],
        ), text
        assert "@" not in red or "<EMAIL>" in red


def test_chain_order_is_fixed():
    names = [n for n, _, _ in PII_PATTERNS]
    assert names == ["email", "id", "ip", "phone"]
