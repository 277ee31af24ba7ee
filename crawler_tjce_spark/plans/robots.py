"""Robots rules as a broadcast dimension join.

The robots table is per-host (tiny even for the whole web: ~10^8 hosts
≪ frontier size) → broadcast equi-join on ``host``, then a prefix
predicate on the URL path. Blocked URLs are *seen* but never fetched
(crawl contract §5) — callers split on ``robots_ok``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_robots(df: DataFrame, robots: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach ``host_budget`` and ``robots_ok`` to URL rows.

    ``robots_ok`` = path does not start with the host's disallow prefix.
    Unknown hosts: allowed, default budget 4 (matches refsim).
    """
    r = F.broadcast(robots.select("host", "disallow_prefix", "host_budget"))
    path = F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/?#]*(/.*)?$", 1)
    path = F.when(path == "", "/").otherwise(path)
    return (
        df.join(r, "host", "left")
        .withColumn("host_budget", F.coalesce(F.col("host_budget"), F.lit(4)))
        .withColumn(
            "robots_ok",
            F.when(F.col("disallow_prefix").isNull(), F.lit(True)).otherwise(
                ~path.startswith(F.col("disallow_prefix"))
            ),
        )
        .drop("disallow_prefix")
    )
