"""Entity dimension builder (reference S2/S8).

The reference crawls the distinct entity list with a last-value keyset
token (``schemas/entity_mapping_crawler.py:36-121``), dedups in a
Python set, drops the ``'--- Selecione'`` placeholder, sorts, writes a
utf-8-sig CSV and derives the slug↔name mapping
(``entity_mapping.py:32-288``). In Spark the whole loop is one
declarative plan: distinct → sentinel filter → slugify → sort. Keyset
pagination is unnecessary (partitioned scan replaces it); the IR
translator (``plans/ir.py``) covers that mechanism where parity needs
it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_tjce_spark.functions.slug import slugify_expr

PLACEHOLDER_PREFIX = "--- "  # ref entity_mapping_crawler.py:144-147


def build_entity_mapping(names: DataFrame, name_col: str = "official_name") -> DataFrame:
    """names(official_name) → sorted (slug, official_name) dimension.

    Distinct + placeholder filter + computed slug; deterministic order.
    Duplicate slugs keep the lexicographically-first name (stable).
    """
    cleaned = (
        names.select(F.trim(F.col(name_col)).alias("official_name"))
        .filter(F.col("official_name").isNotNull() & (F.col("official_name") != ""))
        .filter(~F.col("official_name").startswith(PLACEHOLDER_PREFIX))
        .distinct()
    )
    mapped = cleaned.withColumn("slug", slugify_expr("official_name"))
    from pyspark.sql import Window

    w = Window.partitionBy("slug").orderBy("official_name")
    return (
        mapped.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
        .select("slug", "official_name")
        .orderBy("slug")
    )


def write_entities_csv(mapping: DataFrame, out_path: str) -> None:
    """utf-8-sig single CSV (the reference writes a BOM for Excel —
    ``entity_mapping_crawler.py:284-310``)."""
    import csv
    import io
    import os

    rows = mapping.orderBy("official_name").collect()  # dimension: small by contract
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(["official_name", "slug"])
    for r in rows:
        w.writerow([r["official_name"], r["slug"]])
    with open(out_path, "w", encoding="utf-8-sig", newline="") as f:
        f.write(buf.getvalue())


def write_entities_list_csv(names: DataFrame, out_path: str,
                            name_col: str = "official_name") -> None:
    """Reference-LAYOUT entities artifact: single ``entidade`` column.

    Byte-parity target is ``data/entidades_tjce.csv`` (written by
    ``schemas/entity_mapping_crawler.py:284-310`` from the raw fetched
    list): utf-8-sig BOM, header ``entidade``, the raw entries INCLUDING
    the ``--- Selecione a Entidade`` placeholder (the reference saves
    the list before filtering it for the mapping), codepoint-sorted,
    CRLF line endings (csv.writer defaults, like the reference). The
    two-column ``official_name,slug`` mapping file
    (:func:`write_entities_csv`) is this engine's own derived dimension
    artifact; this writer reproduces the reference's bytes.
    """
    import csv
    import os

    rows = (
        names.select(F.trim(F.col(name_col)).alias("entidade"))
        .filter(F.col("entidade").isNotNull() & (F.col("entidade") != ""))
        .distinct()
        .orderBy("entidade")  # UTF8_BINARY collation == Python codepoint sort
        .collect()
    )
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w", encoding="utf-8-sig", newline="") as f:
        w = csv.writer(f)
        w.writerow(["entidade"])
        for r in rows:
            w.writerow([r["entidade"]])
