"""Join-family operators.

The reference has no relational joins; its join-like constructs are the
seen-set membership test (``schemas/entity_mapping_crawler.py:219-223``),
the slug↔name map (``schemas/entity_mapping.py:258-288``) and the
ValueDicts dictionary-index lookup (``crawler/crawler.py:856-876``).
Each becomes an explicit Spark join with the right physical strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def asof_join_timeline(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    partition_by: list[str] | None = None,
) -> DataFrame:
    """As-of join: each left row gets the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` (DuckDB/kdb ASOF semantics; Spark has no
    native operator).

    Union-timeline construction: tag both sides, sort the union by
    (ts, tag) — right rows sort before left rows at equal ts so an
    equal-timestamp right row is visible — and fill the right columns
    forward. One pass, no range explosion. ``partition_by`` keys the
    timeline (per-entity as-of); without it the window is global —
    fine for bounded dimensions, repartition-by-range at scale.
    """
    keys = partition_by or []
    lt = left.withColumn("_ts", F.col(left_ts).cast("timestamp")).withColumn(
        "_tag", F.lit(1)
    )
    rt = right.select(
        F.col(right_ts).cast("timestamp").alias("_ts"),
        F.lit(0).alias("_tag"),
        *[F.col(c) for c in keys],
        *[F.col(c) for c in right_cols],
    )
    for c in right_cols:
        lt = lt.withColumn(c, F.lit(None).cast(dict(rt.dtypes)[c]))
    lcols = [c for c in lt.columns if c not in ("_ts", "_tag")]
    merged = lt.select("_ts", "_tag", *lcols).unionByName(
        rt, allowMissingColumns=True
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = merged
    for c in right_cols:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return filled.filter(F.col("_tag") == 1).drop("_ts", "_tag")


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
