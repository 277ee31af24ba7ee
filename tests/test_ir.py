"""Semantic-query IR translator tests: literals round-trip, keyset
pagination chain equivalence (paging through the whole table via
restart tokens reproduces the plain ordered scan), and operator parity
with direct DataFrame code."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crawler_tjce_spark.plans import ir


# ---------------------------------------------------------------------------
# literal syntax
# ---------------------------------------------------------------------------

def test_parse_literals_from_real_token():
    # values from the captured fixture's RT (examples/response.json)
    assert ir.parse_literal("500L") == 500
    assert ir.parse_literal("'0001637-12.2021.8.06.0000'") == "0001637-12.2021.8.06.0000"
    assert ir.parse_literal("datetime'2021-06-22T00:00:00'") == dt.datetime(2021, 6, 22)
    assert ir.parse_literal("33043.15D") == 33043.15
    assert ir.parse_literal("'R$52.472,42'") == "R$52.472,42"


@settings(max_examples=60, deadline=None)
@given(
    st.one_of(
        st.integers(-(10**12), 10**12),
        st.floats(-1e9, 1e9, allow_nan=False).map(lambda f: round(f, 4)).filter(
            lambda f: f != int(f)
        ),
        st.text(
            alphabet=st.characters(blacklist_characters="'", blacklist_categories=("Cs",)),
            max_size=30,
        ),
        st.datetimes(dt.datetime(1970, 1, 1), dt.datetime(2100, 1, 1)),
        st.booleans(),
        st.none(),
    )
)
def test_literal_roundtrip(v):
    assert ir.parse_literal(ir.render_literal(v)) == v


# ---------------------------------------------------------------------------
# IR → DataFrame
# ---------------------------------------------------------------------------

def _scan_ir(restart=None, count=200):
    return {
        "Query": {
            "From": [{"Name": "o", "Entity": "orders"}],
            "Select": [
                {"Column": {"Property": "o_orderkey"}, "Name": "o.o_orderkey"},
                {"Column": {"Property": "o_orderdate"}, "Name": "o.o_orderdate"},
                {"Column": {"Property": "o_orderpriority"}, "Name": "o.o_orderpriority"},
            ],
            "Where": [
                {
                    "Condition": {
                        "In": {
                            "Expressions": [{"Column": {"Property": "o_orderpriority"}}],
                            "Values": [
                                [{"Literal": {"Value": "'1-URGENT'"}}],
                                [{"Literal": {"Value": "'2-HIGH'"}}],
                            ],
                        }
                    }
                }
            ],
            "OrderBy": [
                {"Direction": 1, "Expression": {"Column": {"Property": "o_orderdate"}}},
                {"Direction": 1, "Expression": {"Column": {"Property": "o_orderkey"}}},
            ],
            "Binding": {
                "DataReduction": {
                    "Primary": {"Window": {"Count": count, "RestartTokens": restart}}
                }
            },
        }
    }


def test_ir_pagination_chain_covers_table(spark, sf_dir):
    """Page through the whole filtered table via restart tokens; the
    concatenation must equal the plain ordered scan — the reference's
    fetch_all loop contract (crawler/crawler.py:556-677)."""
    order_cols = [("o_orderdate", True), ("o_orderkey", True)]
    pages = []
    token = None
    for _ in range(100):  # max_pages guard (ref :271-275)
        df = ir.to_dataframe(spark, _scan_ir(restart=[token] if token else None, count=137),
                             sf_dir=sf_dir)
        rows = df.collect()
        if not rows:
            break
        pages.extend((r["o_orderkey"],) for r in rows)
        new_token = ir.restart_token_of(df, order_cols)
        if new_token == token:  # duplicate-token stall guard (ref :633-639)
            break
        token = [ir.parse_literal(t) for t in new_token] and new_token
    full = ir.to_dataframe(spark, _scan_ir(count=10**9), sf_dir=sf_dir).collect()
    assert [p[0] for p in pages] == [r["o_orderkey"] for r in full]
    assert len(full) > 137  # exercised >1 page


def test_ir_agg_min_probe(spark, sf_dir):
    """The reference's 1-row Min probe (edital_crawler.py:270-313)."""
    probe = {
        "Query": {
            "From": [{"Name": "e", "Entity": "events"}],
            "Select": [
                {
                    "Aggregation": {
                        "Expression": {"Column": {"Property": "ts"}},
                        "Function": 3,
                    },
                    "Name": "min_ts",
                }
            ],
            "Binding": {"DataReduction": {"Primary": {"Top": {}}}},
        }
    }
    got = ir.to_dataframe(spark, probe, sf_dir=sf_dir).collect()
    expected = (
        spark.read.parquet(f"{sf_dir}/events.parquet").agg(F.min("ts")).first()[0]
    )
    assert len(got) == 1 and got[0]["min_ts"] == expected


def test_ir_grouped_agg(spark, sf_dir):
    q = {
        "Query": {
            "From": [{"Name": "l", "Entity": "lineitem"}],
            "Select": [
                {"Column": {"Property": "l_returnflag"}, "Name": "l_returnflag"},
                {
                    "Aggregation": {
                        "Expression": {"Column": {"Property": "l_quantity"}},
                        "Function": 0,
                    },
                    "Name": "sum_qty",
                },
                {
                    "Aggregation": {
                        "Expression": {"Column": {"Property": "l_orderkey"}},
                        "Function": 2,
                    },
                    "Name": "n",
                },
            ],
        }
    }
    got = {
        r["l_returnflag"]: (round(r["sum_qty"], 2), r["n"])
        for r in ir.to_dataframe(spark, q, sf_dir=sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    expected = {
        r["l_returnflag"]: (round(r["s"], 2), r["n"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count("l_orderkey").alias("n"))
        .collect()
    }
    assert got == expected


def test_ir_comparison_filter(spark, sf_dir):
    q = {
        "Query": {
            "From": [{"Name": "o", "Entity": "orders"}],
            "Select": [{"Column": {"Property": "o_orderkey"}, "Name": "o_orderkey"}],
            "Where": [
                {
                    "Condition": {
                        "Comparison": {
                            "ComparisonKind": 2,
                            "Left": {"Column": {"Property": "o_totalprice"}},
                            "Right": {"Literal": {"Value": "400000D"}},
                        }
                    }
                }
            ],
        }
    }
    n = ir.to_dataframe(spark, q, sf_dir=sf_dir).count()
    expected = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_totalprice") >= 400000)
        .count()
    )
    assert n == expected > 0
