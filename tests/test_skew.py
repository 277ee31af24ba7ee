"""Skew hardening (SURVEY §7.1 step 9): one host owns 50% of the
frontier; the salted politeness window must stay correct (exact
reference parity, budget never exceeded) and the salted pick must agree
with the unsalted one."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_tjce_spark import refsim
from crawler_tjce_spark.datagen import WorldConfig, write_world
from crawler_tjce_spark.plans.frontier import politeness_pick
from crawler_tjce_spark.streaming.runner import CrawlRunner


@pytest.fixture(scope="module")
def hot_world(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hotworld"))
    write_world(
        WorldConfig(n_hosts=6, n_pages=400, n_seeds=6, hot_host_share=0.5), d
    )
    return d


def test_salted_pick_equals_unsalted(spark):
    rows = [
        (f"https://h{i % 3}.example/p/{i}", f"h{i % 3}.example", i * 7 % 97, 5 + (i % 3))
        for i in range(3000)
    ]
    fr = spark.createDataFrame(rows, "url string, host string, score int, host_budget int")
    salted = politeness_pick(fr, salt_buckets=16)
    unsalted = politeness_pick(fr, salt_buckets=1)
    a = sorted(r["url"] for r in salted.collect())
    b = sorted(r["url"] for r in unsalted.collect())
    assert a == b and len(a) > 0


def test_hot_host_crawl_parity(spark, hot_world, tmp_path):
    ref = refsim.simulate(hot_world, max_waves=25)
    runner = CrawlRunner(spark, hot_world, str(tmp_path / "store"), max_waves=25)
    runner.run(resume=False)
    got = sorted(
        (r["ordem"], r["url"]) for r in runner.visits_df().select("ordem", "url").collect()
    )
    assert got == [(o, u) for o, u, _, _ in ref.visits]
    # budget invariant under skew
    robots = spark.read.parquet(f"{hot_world}/robots.parquet")
    over = (
        runner.visits_df()
        .groupBy("wave", "host")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(robots.select("host", "host_budget"), "host")
        .filter(F.col("n") > F.col("host_budget"))
    )
    assert over.count() == 0
