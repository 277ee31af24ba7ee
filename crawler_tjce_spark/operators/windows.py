"""Sequential/window operators.

The reference threads a global ``ordem`` counter through its paginated
crawl (``crawler/crawler.py:538-543,1056-1057``) and reconstructs rows
by inheriting the previous row's column values via the ``R`` bitmask
(``crawler/crawler.py:897-1048``). Both are window functions in Spark.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_ordem(df: DataFrame, order_by: Sequence[Column | str], name: str = "ordem") -> DataFrame:
    """Assign a 1..N global sequence number in ``order_by`` order.

    NOTE (scale): ``Window.orderBy`` without ``partitionBy`` funnels all
    rows through one task. Use this form only for final, already-reduced
    outputs (the reference's CSV is exactly that). For big tables use
    :func:`scalable_global_ordem`.
    """
    w = Window.orderBy(*order_by)
    return df.withColumn(name, F.row_number().over(w))


def scalable_global_ordem(
    df: DataFrame,
    partition_col: str,
    order_by: Sequence[Column | str],
    name: str = "ordem",
    range_partition_offsets: bool = False,
) -> DataFrame:
    """Global sequence number without a single-task window.

    Two-pass: (1) rank within each ``partition_col`` group — a parallel
    window; (2) compute per-group counts (tiny), prefix-sum them with a
    window over the *group* table, and broadcast-join the offsets back.
    Total order = (partition_col asc, order_by) — callers pick a
    partition column that is the leading sort key (e.g. ``wave``).

    The offsets window runs over ONE ROW PER GROUP — fine to ~10^6
    groups; beyond that set ``range_partition_offsets=True`` to use
    :func:`scalable_prefix_offsets` (identical output, parallel bucket
    prefix sums).
    """
    w_in = Window.partitionBy(partition_col).orderBy(*order_by)
    ranked = df.withColumn("_rn", F.row_number().over(w_in))
    counts = df.groupBy(partition_col).agg(F.count(F.lit(1)).alias("_cnt"))
    if range_partition_offsets:
        offsets = scalable_prefix_offsets(counts, partition_col)
    else:
        w_off = Window.orderBy(partition_col).rowsBetween(Window.unboundedPreceding, -1)
        offsets = counts.withColumn(
            "_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0))
        ).drop("_cnt")
    return (
        ranked.join(F.broadcast(offsets), partition_col)
        .withColumn(name, (F.col("_off") + F.col("_rn")).cast("long"))
        .drop("_rn", "_off")
    )


def scalable_prefix_offsets(
    counts: DataFrame,
    key_col: str,
    cnt_col: str = "_cnt",
    off_col: str = "_off",
    num_ranges: int | None = None,
) -> DataFrame:
    """Cumulative (exclusive) prefix sums over a one-row-per-key counts
    table WITHOUT a single-task global window — the 10^6+-keys form of
    the offsets step in :func:`scalable_global_ordem` /
    ``plans.frontier.politeness_pick_ordem`` (their default
    ``Window.orderBy(key)`` is fine while the key table is ~MBs; this
    is the documented range-partitioned two-pass beyond that).

    Pass 1: range-partition the keys into ``num_ranges`` ordered
    buckets (RangePartitioner assigns ascending key ranges to ascending
    partition ids) and prefix-sum WITHIN each bucket — parallel, task
    size ~keys/num_ranges. Pass 2: prefix-sum the ≤num_ranges bucket
    totals (a bounded, driver-sized window) and broadcast the bucket
    base offsets back. Sampling-based range boundaries affect only the
    bucket SPLIT, never the result."""
    spark = counts.sparkSession
    p = num_ranges or spark.sparkContext.defaultParallelism
    # `_pid` must be IDENTICAL in both consumers below (the per-bucket
    # window and the bucket-totals agg). Range boundaries are
    # sample-based, so two independently planned range exchanges could
    # legally disagree; don't rely on ReuseExchange (ADVICE r4) —
    # localCheckpoint materializes the bucketed counts once (one row
    # per key, ~MBs even at 10^7 keys) and both branches read the same
    # partitioning from the cached blocks.
    parted = (
        counts.repartitionByRange(p, F.col(key_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_in = Window.partitionBy("_pid").orderBy(key_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = parted.withColumn("_loff", F.coalesce(F.sum(cnt_col).over(w_in), F.lit(0)))
    totals = parted.groupBy("_pid").agg(F.sum(cnt_col).alias("_pt"))
    w_p = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    base = totals.withColumn(
        "_pbase", F.coalesce(F.sum("_pt").over(w_p), F.lit(0))
    ).select("_pid", "_pbase")
    return (
        local.join(F.broadcast(base), "_pid")
        .withColumn(off_col, (F.col("_loff") + F.col("_pbase")).cast("long"))
        .select(key_col, off_col)
    )


def fill_forward(
    df: DataFrame,
    cols: Sequence[str],
    partition_by: Sequence[Column | str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Inherit the previous non-null value within a partition.

    Spark restatement of the reference's delta-bitmask ("Rulifier")
    inheritance: ``last(c, ignorenulls=True)`` over rows
    unboundedPreceding..current. Partition = DSR page (rows are
    sequential only within a page), so it parallelizes per page.
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def group_topk(
    df: DataFrame,
    partition_by: Sequence[Column | str],
    order_by: Sequence[Column | str],
    k: int,
    rank_name: str = "rk",
) -> DataFrame:
    """Top-k rows per group (the per-host priority-queue primitive).

    ``row_number`` (not rank) → exactly k rows, deterministic given a
    total ``order_by``. This is also the politeness budget pick.

    The map-side partial ``WindowGroupLimit`` (Spark 3.5+) already keeps
    the shuffle at ~k rows per group per task; the wall cost is the
    per-task partial sort, so the input is spread to the session's
    parallelism when its scan is row-group-bound (no-op at scale).
    """
    from crawler_tjce_spark.parallel import ensure_min_parallelism

    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        ensure_min_parallelism(df)
        .withColumn(rank_name, F.row_number().over(w))
        .filter(F.col(rank_name) <= k)
    )
