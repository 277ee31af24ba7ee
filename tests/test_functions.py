"""Property + example tests for the scalar function surface (§2.8).

Properties compare the Spark expressions against straight Python
restatements of the reference semantics (``crawler/crawler.py:99-250``,
``schemas/entity_mapping.py:7-28``) on generated inputs.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crawler_tjce_spark.functions import ptbr, slug, text, urlkit
from crawler_tjce_spark.functions.slug import _slugify_py


def _one(spark, col, value=None, typ="string"):
    df = spark.createDataFrame([(value,)], f"v {typ}")
    return df.select(col.alias("out")).first()["out"]


# ---------------------------------------------------------------------------
# pt-BR numbers
# ---------------------------------------------------------------------------

def test_ptbr_number_examples(spark):
    cases = {
        "R$ 1.234,56": 1234.56,
        "1,234.56": 1234.56,
        "1234.56": 1234.56,
        "12,5": 12.5,
        "R$52.472,42": 52472.42,
        "": 0.0,
        None: 0.0,
        "abc": 0.0,
        "-1.234,50": -1234.50,
    }
    df = spark.createDataFrame([(k,) for k in cases], "v string")
    out = dict(
        df.select("v", ptbr.parse_ptbr_number("v").alias("n")).collect()
    )
    for k, expected in cases.items():
        assert out[k] == expected, (k, out[k], expected)


def _ref_parse_number(s: str | None) -> float:
    """Reference semantics of crawler/crawler.py:119-139."""
    if s is None or not str(s).strip() or str(s).lower() == "none":
        return 0.0
    t = str(s).replace("R$", "").strip()
    if "," in t and "." in t:
        if t.rfind(".") < t.rfind(","):
            t = t.replace(".", "").replace(",", ".")
        else:
            t = t.replace(",", "")
    elif "," in t:
        t = t.replace(",", ".")
    try:
        return float(t)
    except ValueError:
        return 0.0


@settings(max_examples=30, deadline=None)
@given(
    st.one_of(
        st.integers(-10**9, 10**9).map(lambda n: f"{n / 100:,.2f}"),  # US format
        st.integers(-10**9, 10**9).map(
            lambda n: ("R$ " + f"{n / 100:,.2f}").replace(",", "X").replace(".", ",").replace("X", ".")
        ),  # pt-BR format
        st.floats(-1e6, 1e6, allow_nan=False).map(lambda f: f"{f:.4f}"),
    )
)
def test_ptbr_number_property(spark_global, s):
    got = _one(spark_global, ptbr.parse_ptbr_number(F.col("v")), s)
    assert abs(got - _ref_parse_number(s)) < 1e-9, s


# hypothesis can't take function-scoped fixtures; alias the module-scoped
# spark (conftest recycles the underlying session every few modules)
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


# ---------------------------------------------------------------------------
# dates
# ---------------------------------------------------------------------------

def test_multiformat_dates(spark):
    cases = {
        "datetime(2023,5,17,10,30,0)": dt.datetime(2023, 5, 17, 10, 30, 0),
        "datetime(2023,5,17)": dt.datetime(2023, 5, 17),
        "datetime(2023,0,17)": dt.datetime(2023, 1, 17),  # 0-month guard
        "1715558400000": dt.datetime(2024, 5, 13, 0, 0),  # epoch ms (UTC)
        "1715558400": dt.datetime(2024, 5, 13, 0, 0),  # epoch s (fixed dead branch)
        "45123": dt.datetime(2023, 7, 16),  # Excel serial
        "45123.5": dt.datetime(2023, 7, 16, 12, 0),  # Excel serial + fraction
        "garbage": None,
        "": None,
    }
    df = spark.createDataFrame([(k,) for k in cases], "v string")
    out = dict(df.select("v", ptbr.parse_multiformat_date("v").alias("t")).collect())
    for k, expected in cases.items():
        assert out[k] == expected, (k, out[k], expected)


def test_excel_serial_property(spark):
    # round-trip: day n from 1899-12-30 epoch
    rows = [(str(n),) for n in (1000, 10000, 30000, 60000, 79999)]
    df = spark.createDataFrame(rows, "v string")
    out = df.select("v", ptbr.parse_multiformat_date("v").alias("t")).collect()
    for r in out:
        expected = dt.datetime(1899, 12, 30) + dt.timedelta(days=int(r["v"]))
        assert r["t"] == expected


# ---------------------------------------------------------------------------
# slugify
# ---------------------------------------------------------------------------

def test_slugify_matches_reference(spark):
    names = [
        "MUNICÍPIO DE FORTALEZA",
        "ESTADO DE SÃO PAULO",
        "FUNDAÇÃO UNIVERSIDADE DO AMAZONAS",
        "INSTITUTO - IPMBV  (TESTE)",
        "--- Selecione",
        "A  B---C",
    ]
    df = spark.createDataFrame([(n,) for n in names], "v string")
    out = df.select(
        "v",
        slug.slugify_expr("v").alias("expr"),
        slug.slugify_udf(F.col("v")).alias("udf"),
    ).collect()
    for r in out:
        expected = _slugify_py(r["v"])
        assert r["expr"] == expected, r
        assert r["udf"] == expected, r


def test_slugify_unslugify_roundtrip(spark):
    # on the accent-free uppercase domain, slugify(unslugify(s)) == s
    slugs = ["municipio-de-fortaleza", "estado-do-ceara", "a-b-c"]
    df = spark.createDataFrame([(s,) for s in slugs], "v string")
    out = df.select("v", slug.slugify_expr(slug.unslugify_expr("v")).alias("rt")).collect()
    for r in out:
        assert r["rt"] == r["v"]


# ---------------------------------------------------------------------------
# processo / CNJ / cpf
# ---------------------------------------------------------------------------

def test_processo_and_cnj(spark):
    df = spark.createDataFrame(
        [("1637",), ("0001637-81.2022.8.06.0000",), ("ab c!d",), ("",)], "v string"
    )
    out = df.select(
        "v",
        ptbr.clean_processo("v").alias("p"),
        ptbr.is_cnj_processo("v").alias("cnj"),
    ).collect()
    res = {r["v"]: r for r in out}
    assert res["1637"]["p"] == "0" * 16 + "1637"
    assert res["0001637-81.2022.8.06.0000"]["p"] == "0001637-81.2022.8.06.0000"
    assert res["0001637-81.2022.8.06.0000"]["cnj"] is True
    assert res["1637"]["cnj"] is False
    assert res["ab c!d"]["p"] == "abcd"
    assert res[""]["p"] == "-"


def test_cpf_and_currency(spark):
    assert _one(spark, ptbr.clean_cpf_cnpj(F.col("v")), "123.456.789-00") == "12345678900"
    assert _one(spark, ptbr.format_currency_ptbr(F.col("v")), 1234.56, "double") == "R$ 1.234,56"
    assert _one(spark, ptbr.format_date_ptbr(F.col("v")), dt.datetime(2023, 5, 17), "timestamp") == "17/05/2023"
    assert _one(spark, ptbr.strip_agg_wrapper(F.col("v")), "Sum(tbl.dfslcp_num_ano)") == "dfslcp_num_ano"


# ---------------------------------------------------------------------------
# urlkit
# ---------------------------------------------------------------------------

def test_canonicalize_url(spark):
    cases = {
        "https://WWW.Example.COM:443/a//b/?z=1&a=2#frag": "https://www.example.com/a/b/?a=2&z=1",
        "example.com/": "https://example.com",
        "http://a.com:80/x": "http://a.com/x",
        "HTTP://A.com/Path/To?b=2&a=1": "http://a.com/Path/To?a=1&b=2",
    }
    df = spark.createDataFrame([(k,) for k in cases], "v string")
    out = dict(df.select("v", urlkit.canonicalize_url("v").alias("c")).collect())
    for k, expected in cases.items():
        assert out[k] == expected, (k, out[k])


def test_canonicalize_idempotent(spark):
    urls = [
        "https://WWW.Example.COM:443/a//b/?z=1&a=2#frag",
        "example.com/x/y?q=1",
        "http://h.com:80//a//b",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "v string")
    once = urlkit.canonicalize_url("v")
    out = df.select(once.alias("c1"), urlkit.canonicalize_url(once).alias("c2")).collect()
    for r in out:
        assert r["c1"] == r["c2"]


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def test_text_functions(spark):
    s = "The quick brown fox, and the lazy dog!"
    df = spark.createDataFrame([(s,)], "v string")
    r = df.select(
        text.ws_token_count("v").alias("n"),
        text.bpe_token_count("v").alias("bpe"),
        F.round(text.punct_ratio("v"), 6).alias("pr"),
        F.round(text.stopword_ratio("v"), 6).alias("sr"),
        text.fingerprint_md5("v").alias("fp"),
        text.shingles("v", 3).alias("sh"),
    ).first()
    assert r["n"] == 8
    assert r["bpe"] == 10  # 8 words + ',' + '!'
    assert r["pr"] == round(2 / len(s), 6)
    assert r["sr"] == round(3 / 8, 6)  # the, and, the
    import hashlib

    assert r["fp"] == hashlib.md5(s.lower().encode()).hexdigest()
    assert len(r["sh"]) == 6 and r["sh"][0] == "the quick brown"


def test_lang_id_on_documents(spark, sf_dir):
    # lang_id should be deterministic and produce only known labels
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    labels = {
        r["l"]
        for r in docs.select(text.lang_id("text").alias("l")).distinct().collect()
    }
    assert labels <= {"en", "de", "es", "zh", "other"}
