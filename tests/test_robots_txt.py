"""robots.txt parsing + longest-match semantics (RFC 9309 subset)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_tjce_spark.plans.robots_txt import (
    crawl_delay_budgets,
    parse_robots_txt,
    robots_ok_join,
)

ROBOTS_A = """\
# site a
User-agent: googlebot
User-agent: tjce-spark
Disallow: /private/
Allow: /private/public*.html
Crawl-delay: 2

User-agent: *
Disallow: /
Allow: /open/
"""

ROBOTS_B = """\
User-agent: *
Disallow: /tmp
Disallow: /*.pdf$
Allow:
Crawl-delay: 0.5
"""


def _rules(spark):
    bodies = spark.createDataFrame(
        [("a.example", ROBOTS_A), ("b.example", ROBOTS_B)], "host string, robots_txt string"
    )
    return parse_robots_txt(bodies)


def test_parse_groups_agents_and_rules(spark):
    rules = _rules(spark).collect()
    by = {}
    for r in rules:
        by.setdefault((r["host"], r["agent"]), []).append((r["rule"], r["path"]))
    # consecutive UA lines share one rule block
    assert sorted(by[("a.example", "googlebot")]) == sorted(by[("a.example", "tjce-spark")])
    assert ("disallow", "/private/") in by[("a.example", "googlebot")]
    assert ("allow", "/private/public*.html") in by[("a.example", "googlebot")]
    # '*' group of a.example is separate
    assert ("disallow", "/") in by[("a.example", "*")]
    # empty Disallow: emits no rule
    assert all(p for _, p in by[("b.example", "*")] if p is not None)
    delays = {(r["host"], r["agent"]): r["crawl_delay"] for r in rules}
    assert delays[("a.example", "googlebot")] == 2.0
    assert delays[("b.example", "*")] == 0.5


def test_longest_match_wildcards_and_agent_groups(spark):
    rules = _rules(spark)
    urls = spark.createDataFrame(
        [
            ("a.example", "https://a.example/private/secret.html"),
            ("a.example", "https://a.example/private/public123.html"),
            ("a.example", "https://a.example/anything"),
            ("b.example", "https://b.example/tmp/x"),
            ("b.example", "https://b.example/docs/file.pdf"),
            ("b.example", "https://b.example/docs/file.pdf?x=1"),
            ("b.example", "https://b.example/ok"),
            ("c.example", "https://c.example/no-robots"),
        ],
        "host string, url string",
    )
    # as tjce-spark: a.example uses the exact group; b/c fall back to */none
    got = {
        r["url"]: r["robots_ok"]
        for r in robots_ok_join(urls, rules, agent="tjce-spark").collect()
    }
    assert got["https://a.example/private/secret.html"] is False
    # Allow /private/public*.html is longer than Disallow /private/ → wins
    assert got["https://a.example/private/public123.html"] is True
    assert got["https://a.example/anything"] is True  # exact group has no / rule
    assert got["https://b.example/tmp/x"] is False
    assert got["https://b.example/docs/file.pdf"] is False  # $ anchors
    assert got["https://b.example/docs/file.pdf?x=1"] is True  # not at end
    assert got["https://b.example/ok"] is True
    assert got["https://c.example/no-robots"] is True  # unknown host → allow

    # as an unknown agent: a.example's '*' group (Disallow / with Allow /open/)
    got2 = {
        r["url"]: r["robots_ok"]
        for r in robots_ok_join(
            spark.createDataFrame(
                [("a.example", "https://a.example/open/x"),
                 ("a.example", "https://a.example/else")],
                "host string, url string",
            ),
            rules,
            agent="randombot",
        ).collect()
    }
    assert got2["https://a.example/open/x"] is True
    assert got2["https://a.example/else"] is False


def test_crawl_delay_budgets(spark):
    rules = _rules(spark)
    b = {r["host"]: r["host_budget"] for r in
         crawl_delay_budgets(rules, wave_seconds=60, agent="tjce-spark").collect()}
    assert b["a.example"] == 30  # 60 / 2
    assert b["b.example"] == 120  # 60 / 0.5


def test_parsed_rules_feed_with_robots(spark):
    """The ingestion path composes with the hot-path broadcast join: a
    parsed single-prefix host reproduces plans/robots.with_robots."""
    from crawler_tjce_spark.plans.robots import with_robots

    bodies = spark.createDataFrame(
        [("h.example", "User-agent: *\nDisallow: /blocked/\nCrawl-delay: 6\n")],
        "host string, robots_txt string",
    )
    rules = parse_robots_txt(bodies)
    budgets = crawl_delay_budgets(rules, wave_seconds=60)
    host_table = (
        rules.filter(F.col("rule") == "disallow")
        .select("host", F.col("path").alias("disallow_prefix"))
        .join(budgets.select("host", "host_budget"), "host")
    )
    urls = spark.createDataFrame(
        [("h.example", "https://h.example/blocked/x"),
         ("h.example", "https://h.example/fine")],
        "host string, url string",
    )
    got = {r["url"]: (r["robots_ok"], r["host_budget"])
           for r in with_robots(urls, host_table).collect()}
    assert got["https://h.example/blocked/x"] == (False, 10)
    assert got["https://h.example/fine"] == (True, 10)


def test_literal_robots_equals_broadcast_join(spark, tmp_path):
    """with_robots_literal (create_map literals, zero jobs per use) is
    row-identical to the broadcast-join form on a real world's robots
    table — including unknown hosts (default budget 4, allowed) and
    NULL disallow prefixes."""
    from crawler_tjce_spark.datagen import WorldConfig, write_world
    from crawler_tjce_spark.plans.robots import with_robots, with_robots_literal

    world = str(tmp_path / "world_lit")
    write_world(WorldConfig(n_hosts=7, n_pages=200, n_seeds=7), world)
    robots = spark.read.parquet(f"{world}/robots.parquet")
    rules = [
        (r["host"], r["disallow_prefix"], r["host_budget"])
        for r in robots.select("host", "disallow_prefix", "host_budget").collect()
    ]
    urls = spark.read.parquet(f"{world}/pages.parquet").select("url").withColumn(
        "host",
        __import__("pyspark.sql.functions", fromlist=["F"]).regexp_extract(
            "url", r"^[a-z][a-z0-9+.-]*://([^/:?#]*)", 1
        ),
    )
    # add an unknown host to exercise the defaults
    extra = spark.createDataFrame(
        [("https://unknown.example/x", "unknown.example")], "url string, host string"
    )
    urls = urls.unionByName(extra)
    a = sorted(
        (r["url"], r["host_budget"], r["robots_ok"])
        for r in with_robots(urls, robots).collect()
    )
    b = sorted(
        (r["url"], r["host_budget"], r["robots_ok"])
        for r in with_robots_literal(urls, rules).collect()
    )
    assert a == b and len(a) > 0
    # and the literal plan really is join-free and job-free to build
    plan = with_robots_literal(urls, rules)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan


def test_literal_robots_empty_rules_defaults(spark):
    """No rules → every URL allowed with default budget 4 (the literal
    path's analog of the join's unknown-host behavior)."""
    from crawler_tjce_spark.plans.robots import with_robots_literal

    df = spark.createDataFrame(
        [("https://a.example/x", "a.example")], "url string, host string"
    )
    r = with_robots_literal(df, []).collect()[0]
    assert r["host_budget"] == 4 and r["robots_ok"] is True
