"""Text-analysis functions for the training-data pipeline operators.

All JVM-side expressions (regex + array functions) so they run at scan
speed over a 100 TB ``documents`` table. Deterministic formulas are kept
simple enough to restate in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny embedded stopword list — deterministic, shared with the oracle SQL.
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]

# BPE-ish token regex: words, numbers, or single non-space symbols.
BPE_TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _as_str(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ws_tokens(col: Column | str) -> Column:
    """Whitespace tokens (empty strings removed)."""
    return F.filter(F.split(F.trim(_as_str(col)), r"\s+"), lambda x: x != "")


def ws_token_count(col: Column | str) -> Column:
    return F.size(ws_tokens(col))


def bpe_token_count(col: Column | str) -> Column:
    """Count of BPE-ish regex tokens (words / numbers / symbols)."""
    return F.size(F.regexp_extract_all(_as_str(col), F.lit(BPE_TOKEN_REGEX), F.lit(0)))


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    s = _as_str(col)
    n = F.length(s)
    p = n - F.length(F.regexp_replace(s, r"[^\w\s]", ""))
    return F.when(n > 0, p.cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str) -> Column:
    """Stopword tokens / total tokens, over the embedded list."""
    toks = F.transform(ws_tokens(col), lambda x: F.lower(x))
    stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    total = F.size(toks)
    return F.when(total > 0, stop.cast("double") / total).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Composite quality score in [0,1]:

    0.4·length_score + 0.3·(1−punct_ratio) + 0.3·stopword_presence,
    where length_score = least(1, n_ws_tokens/100) and
    stopword_presence = least(1, 5·stopword_ratio). Deterministic and
    SQL-expressible; thresholding it is the reference-style "row
    validity filter" generalized to document quality.
    """
    length_score = F.least(F.lit(1.0), ws_token_count(col).cast("double") / 100.0)
    return (
        0.4 * length_score
        + 0.3 * (1.0 - punct_ratio(col))
        + 0.3 * F.least(F.lit(1.0), 5.0 * stopword_ratio(col))
    )


def lang_id(col: Column | str) -> Column:
    """Character-n-gram language heuristic → {en, de, es, zh, other}.

    Scores each language by counts of characteristic character
    patterns; deterministic and restatable in SQL. (A real system plugs
    fastText/cld3 in via a pandas UDF; the Spark-side shape is what
    matters here.)
    """
    s = F.lower(_as_str(col))

    def count(pat: str) -> Column:
        return F.size(F.regexp_extract_all(s, F.lit(pat), F.lit(0)))

    zh = count(r"[一-鿿]")
    de = count(r"\b(der|die|das|und|ist|nicht|ein)\b") + count(r"[äöüß]")
    es = count(r"\b(el|la|los|las|que|de|es|un|una)\b") + count(r"[ñ¡¿]")
    en = count(r"\b(the|and|is|of|to|that|it)\b")
    best = F.greatest(zh, de, es, en)
    return (
        F.when(best == 0, F.lit("other"))
        .when(zh == best, F.lit("zh"))
        .when(en == best, F.lit("en"))
        .when(de == best, F.lit("de"))
        .otherwise(F.lit("es"))
    )


def fingerprint_md5(col: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.

    SQL-parity version (DuckDB has ``md5``); the scale path is
    ``fingerprint64`` below.
    """
    norm = F.lower(F.regexp_replace(F.trim(_as_str(col)), r"\s+", " "))
    return F.md5(norm)


def fingerprint64(col: Column | str) -> Column:
    """64-bit xxhash fingerprint of normalized text (8 bytes vs 32 —
    the form you'd actually key 10^11 documents on)."""
    norm = F.lower(F.regexp_replace(F.trim(_as_str(col)), r"\s+", " "))
    return F.xxhash64(norm)


def shingles(col: Column | str, k: int = 3) -> Column:
    """Word k-shingles as an array of strings (for MinHash / Jaccard).

    Built from the whitespace token array with ``F.transform`` +
    ``F.slice`` — no UDF. Documents shorter than k words get a single
    shingle of the full text.
    """
    toks = F.transform(ws_tokens(col), lambda x: F.lower(x))
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))
