"""Text-analysis Column builders + DuckDB SQL twins.

Training-data pipeline ops over the documents table: token counting
(whitespace + regex), quality scoring (length / stopword ratios),
language-ID (stopword-dictionary heuristic), and document
fingerprinting (order-sensitive rolling token hash).  Everything is
built-in Column functions — codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword dictionaries for the n-gram/stopword
# language heuristic (deterministic; scores are exact counts)
LANG_STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu"),
    "fr": ("le", "la", "et", "les", "des", "un", "est"),
    "es": ("el", "la", "de", "y", "los", "es", "un"),
}

QUALITY_STOPWORDS = ("a", "the", "and", "of", "to", "in", "is")

# word-or-single-punctuation tokens ('BPE-ish' regex segmentation)
TOKEN_REGEX = r"[a-zA-Z0-9_]+|[^a-zA-Z0-9_\s]"


def tokens_col(text: Column) -> Column:
    return F.split(text, " ")


def n_tokens_col(text: Column) -> Column:
    return F.size(tokens_col(text))


def regex_token_count_col(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), F.lit(0)))


def stopword_count_col(text: Column, words=QUALITY_STOPWORDS) -> Column:
    toks = tokens_col(text)
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wl, t)))


def quality_cols(text: Column) -> dict:
    """length / punctuation / stopword quality features
    (alias-ready dict for withColumns)."""
    n_tok = n_tokens_col(text)
    n_char = F.length(text)
    return {
        "n_tokens": n_tok.cast("long"),
        "n_chars_text": n_char.cast("long"),
        "mean_token_len": ((n_char - (n_tok - 1)) / n_tok).cast("double"),
        "stopword_ratio": (stopword_count_col(text) / n_tok).cast("double"),
        "uniq_token_ratio": (
            F.size(F.array_distinct(tokens_col(text))) / n_tok
        ).cast("double"),
    }


def langid_col(text: Column) -> Column:
    """Predicted language = argmax of per-language stopword hits
    (deterministic tie-break by dictionary order; 'und' if no hits)."""
    toks = tokens_col(text)
    scores = []
    for lang in sorted(LANG_STOPWORDS):
        wl = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
        scores.append(
            (lang, F.size(F.filter(toks, lambda t: F.array_contains(wl, t))))
        )
    # fold with strict-greater so the FIRST language (ascending order)
    # wins ties; mirrored exactly by langid_case_sql
    expr = F.lit("und")
    score_expr = F.lit(0)
    for lang, score in scores:  # ascending lang order; strict > keeps first
        expr = F.when(score > score_expr, F.lit(lang)).otherwise(expr)
        score_expr = F.greatest(score_expr, score)
    return expr


def fingerprint_col(text: Column) -> Column:
    """Order-sensitive doc fingerprint: md5 of the concatenated per-token
    md5 stream (rolling-hash analog, exact in SQL on both engines)."""
    return F.md5(
        F.array_join(F.transform(tokens_col(text), lambda t: F.md5(t)), "")
    )


# ---- DuckDB SQL twins --------------------------------------------------------


def _in_list(words) -> str:
    return "(" + ", ".join(f"'{w}'" for w in words) + ")"


def tokens_sql(text: str = "text") -> str:
    return f"string_split({text}, ' ')"


def n_tokens_sql(text: str = "text") -> str:
    return f"len({tokens_sql(text)})"


def regex_token_count_sql(text: str = "text") -> str:
    return f"len(regexp_extract_all({text}, '{TOKEN_REGEX}'))"


def stopword_count_sql(text: str = "text", words=QUALITY_STOPWORDS) -> str:
    return (
        f"len(list_filter({tokens_sql(text)}, t -> t IN {_in_list(words)}))"
    )


def quality_sql(text: str = "text") -> dict:
    n_tok = n_tokens_sql(text)
    return {
        "n_tokens": f"CAST({n_tok} AS BIGINT)",
        "n_chars_text": f"CAST(length({text}) AS BIGINT)",
        "mean_token_len": f"CAST((length({text}) - ({n_tok} - 1)) AS DOUBLE) / {n_tok}",
        "stopword_ratio": f"CAST({stopword_count_sql(text)} AS DOUBLE) / {n_tok}",
        "uniq_token_ratio": f"CAST(len(list_distinct({tokens_sql(text)})) AS DOUBLE) / {n_tok}",
    }


def langid_sql(text: str = "text") -> str:
    parts = []
    for lang in sorted(LANG_STOPWORDS):
        parts.append(
            f"len(list_filter({tokens_sql(text)}, "
            f"t -> t IN {_in_list(LANG_STOPWORDS[lang])})) AS score_{lang}"
        )
    # chained CASE replicating the Column fold (first lang wins ties)
    return parts


def langid_case_sql() -> str:
    """CASE expression over precomputed score_<lang> columns, same
    strict-greater fold as langid_col (ascending language order)."""
    langs = sorted(LANG_STOPWORDS)
    expr = "'und'"
    score = "0"
    for lang in langs:
        expr = f"CASE WHEN score_{lang} > {score} THEN '{lang}' ELSE {expr} END"
        score = f"GREATEST({score}, score_{lang})"
    return expr


def fingerprint_sql(text: str = "text") -> str:
    return (
        f"md5(array_to_string(list_transform({tokens_sql(text)}, t -> md5(t)), ''))"
    )
