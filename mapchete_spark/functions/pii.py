"""PII detection and redaction over document text.

A standard stage of web-corpus training pipelines (CCNet, Dolma,
RefinedWeb all scrub emails/phones/IPs before training); the engine
implements it as pure Column regexps — map-only, zero shuffle,
whole-stage codegen at any corpus size — with a DuckDB SQL twin for
the oracle.

Pattern notes: every pattern here restricts itself to the regex subset
with IDENTICAL semantics in Java's engine (Spark) and RE2 (DuckDB):
character classes, bounded repetition, ``\\b`` word boundaries, no
backreferences or lookaround. They are deliberately conservative
(high-precision) patterns — the scale posture is "cheap first pass in
the scan"; a recall-tuned NER model would slot in as a Pandas-UDF
stage downstream, like the media decoders.

Redaction applies in a FIXED order (email, then id, then ip, then
phone) because the classes can nest textually (an email contains
digits); both engines apply the same chain.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: ordered (name, pattern, replacement) — ORDER IS SEMANTIC
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("id", r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[- ]\d{3}[- ]\d{4}\b", "<PHONE>"),
)


def pii_count_cols(text: Column) -> dict:
    """name -> count Column. Counts run on the ORIGINAL text but
    respect the chain order (each pattern counts on the text with the
    EARLIER classes already redacted, so a digit run inside an email
    is an email, not also a phone) — byte-identical rule in the SQL
    twin."""
    out = {}
    cur = text
    for name, pat, repl in PII_PATTERNS:
        # idx=0 (whole match): Spark's default group index is 1, DuckDB's
        # is 0 — pin both to the full match
        out[f"n_{name}"] = F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
        cur = F.regexp_replace(cur, pat, repl)
    return out


def redact_col(text: Column) -> Column:
    """Text with every PII class replaced by its tag, in chain order."""
    cur = text
    for _, pat, repl in PII_PATTERNS:
        cur = F.regexp_replace(cur, pat, repl)
    return cur


def _sql_quote(pat: str) -> str:
    return "'" + pat.replace("'", "''") + "'"


def pii_count_sql(text: str = "text") -> dict:
    """name -> DuckDB expression twin of :func:`pii_count_cols`."""
    out = {}
    cur = text
    for name, pat, repl in PII_PATTERNS:
        out[f"n_{name}"] = (
            f"CAST(len(regexp_extract_all({cur}, {_sql_quote(pat)})) AS INT)"
        )
        cur = f"regexp_replace({cur}, {_sql_quote(pat)}, '{repl}', 'g')"
    return out


def redact_sql(text: str = "text") -> str:
    cur = text
    for _, pat, repl in PII_PATTERNS:
        cur = f"regexp_replace({cur}, {_sql_quote(pat)}, '{repl}', 'g')"
    return cur
