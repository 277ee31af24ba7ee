"""Join-family operators.

The reference has no relational joins; its join-like constructs are the
seen-set membership test (``schemas/entity_mapping_crawler.py:219-223``),
the slug↔name map (``schemas/entity_mapping.py:258-288``) and the
ValueDicts dictionary-index lookup (``crawler/crawler.py:856-876``).
Each becomes an explicit Spark join with the right physical strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_tjce_spark.functions.slug import slugify_expr


def seen_anti_join(candidates: DataFrame, seen: DataFrame, key: str) -> DataFrame:
    """Exact not-already-seen filter: ``left_anti`` on the key.

    At 10^10-seen-set scale this is a shuffle on ``key`` — the bloom
    prefilter in ``plans.seen`` prunes most candidates first so the
    anti-join shuffles only survivors. The anti-join stays authoritative
    (bloom false positives must never drop a URL).
    """
    return candidates.join(seen.select(key).distinct(), key, "left_anti")


def slug_lookup(df: DataFrame, mapping: DataFrame, slug_col: str = "slug") -> DataFrame:
    """slug → official name via a broadcast dimension join; rows missing
    from the mapping fall back to ``unslugify``-style derivation
    (ref ``entity_mapping.py:278-288`` falls back to computed slugs).
    """
    m = F.broadcast(mapping.select(F.col("slug").alias(slug_col), "official_name"))
    return df.join(m, slug_col, "left").withColumn(
        "official_name",
        F.coalesce(F.col("official_name"), F.upper(F.regexp_replace(F.col(slug_col), "-", " "))),
    )


def name_to_slug(df: DataFrame, mapping: DataFrame, name_col: str = "official_name") -> DataFrame:
    """name → slug; unmapped names get ``slugify(name)`` (computed slug)."""
    m = F.broadcast(
        mapping.select(F.col("official_name").alias(name_col), F.col("slug").alias("_mapped"))
    )
    return (
        df.join(m, name_col, "left")
        .withColumn("slug", F.coalesce(F.col("_mapped"), slugify_expr(name_col)))
        .drop("_mapped")
    )


def dict_decode_join(
    indexed: DataFrame, dictionary: DataFrame, index_col: str, dict_id_col: str = "dict_idx"
) -> DataFrame:
    """Decode dictionary-index columns (wire format ``ValueDicts``): the
    fact side holds small-int indices, the dictionary is tiny →
    broadcast hash join. Parquet does this natively at scan time; this
    operator exists for the DSR golden-compatibility path.
    """
    d = F.broadcast(dictionary)
    return indexed.join(d, indexed[index_col] == d[dict_id_col], "left").drop(dict_id_col)
