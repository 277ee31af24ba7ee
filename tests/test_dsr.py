"""DSR decoder golden tests against the reference's captured fixture
(``/root/reference/examples/response.json`` — a real 500-row Power BI
response) plus encode→decode round-trip properties.

Ground truth for the last row comes from the server itself: the
restart token ``DS[0].RT`` is the composite sort key of the LAST row
served, written by Power BI — an oracle independent of any decoder.
"""

from __future__ import annotations

import datetime as dt
import json
from decimal import Decimal

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_tjce_spark.sources import dsr

FIXTURE = "/root/reference/examples/response.json"


@pytest.fixture(scope="module")
def payload():
    with open(FIXTURE) as f:
        return json.load(f)


def test_decode_row_count_and_schema(payload):
    rows = dsr.decode_page(payload)
    assert len(rows) == 500
    expected_keys = {f for f, _, _ in dsr.PRECATORIO_FIELDS} | {"row_idx"}
    assert set(rows[0]) == expected_keys


def test_first_row_against_dictionaries(payload):
    """Row 0 is dense: every dict column holds index 0 etc. — check the
    decode against the fixture's own ValueDicts."""
    data = payload["results"][0]["result"]["data"]
    vd = data["dsr"]["DS"][0]["ValueDicts"]
    r = dsr.decode_page(payload)[0]
    assert r["processo"] == vd["D0"][0]
    assert r["natureza"] == vd["D1"][0]
    assert r["tipo_classificacao"] == vd["D2"][0]
    assert r["situacao"] == vd["D3"][0]
    assert r["comarca"] == vd["D4"][0]
    assert r["valor_atual"] == Decimal(str(round(dsr.parse_number(vd["D5"][0]), 2)))
    assert r["ano_orcamento"] == 2026
    assert r["ordem"] == 1
    assert r["valor_original"] == 207680.84
    assert r["data_cadastro"] == dt.datetime(2024, 5, 13)


def test_last_row_matches_server_restart_token(payload):
    """The RT token IS the last row's sort key, produced by the server —
    the strongest independent decode oracle available."""
    rt = payload["results"][0]["result"]["data"]["dsr"]["DS"][0]["RT"][0]
    # RT layout mirrors the OrderBy/Select: ordem, processo, ano, natureza,
    # data, tipo, valor_original, situacao, comarca, valor_atual
    last = dsr.decode_page(payload)[-1]
    assert last["ordem"] == int(rt[0].rstrip("L"))
    assert last["processo"] == rt[1].strip("'")
    assert last["ano_orcamento"] == int(rt[2].rstrip("L"))
    assert last["natureza"] == rt[3].strip("'")
    iso = rt[4].removeprefix("datetime'").rstrip("'")
    assert last["data_cadastro"] == dt.datetime.fromisoformat(iso)
    assert last["tipo_classificacao"] == rt[5].strip("'")
    assert last["valor_original"] == float(rt[6].rstrip("D"))
    assert last["situacao"] == rt[7].strip("'")
    assert last["comarca"] == rt[8].strip("'")
    assert last["valor_atual"] == Decimal(
        str(round(dsr.parse_number(rt[9].strip("'")), 2))
    )


def test_inheritance_monotonic_ordem(payload):
    """ordem (G6) increments 1..500 across delta rows — exercises the
    R-mask consume-vs-inherit logic on every row."""
    rows = dsr.decode_page(payload)
    assert [r["ordem"] for r in rows] == list(range(1, 501))


def test_spark_distributed_decode_matches_local(spark, payload):
    """applyInPandas decode over (page replicated 3×) ≡ 3× the local
    decode, with page-stable row_idx."""
    raw = json.dumps(payload)
    pages = spark.createDataFrame([(i, raw) for i in range(3)], "page_id long, payload string")
    out = dsr.decode_pages_df(spark, pages)
    assert out.count() == 1500
    local = dsr.decode_page(payload)
    got = out.filter("page_id = 1").orderBy("row_idx").collect()
    assert len(got) == 500
    for g, l in zip(got[:20], local[:20]):
        assert g["processo"] == l["processo"]
        assert g["ordem"] == l["ordem"]
        assert g["valor_original"] == l["valor_original"]
        assert g["data_cadastro"] == l["data_cadastro"]


def test_empty_subtotal_page(payload):
    p = json.loads(json.dumps(payload))
    p["results"][0]["result"]["data"]["dsr"]["DS"][0]["PH"][0]["DM0"] = [{}]
    assert dsr.decode_page(p) == []


# ---------------------------------------------------------------------------
# encode→decode round-trip (Rulifier property)
# ---------------------------------------------------------------------------

@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),  # dict index for a D-column of size 4
            st.integers(1900, 2100),  # literal int column
            st.floats(0, 1e6, allow_nan=False).map(lambda f: round(f, 2)),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_rulifier_roundtrip(rows):
    schema = [{"N": "G0", "T": 1, "DN": "D0"}, {"N": "G1", "T": 4}, {"N": "G2", "T": 3}]
    dm0 = dsr.encode_dm0([list(r) for r in rows], schema)
    payload = {
        "results": [
            {
                "result": {
                    "data": {
                        "descriptor": {
                            "Select": [
                                {"Value": "G0", "Name": "t.dfslcp_dsc_natureza"},
                                {"Value": "G1", "Name": "Sum(t.dfslcp_num_ano_orcamento)"},
                                {"Value": "G2", "Name": "Sum(t.dfslcp_vlr_original)"},
                            ]
                        },
                        "dsr": {
                            "DS": [
                                {
                                    "ValueDicts": {"D0": ["A", "B", "C", "D"]},
                                    "PH": [{"DM0": dm0}],
                                }
                            ]
                        },
                    }
                }
            }
        ]
    }
    decoded = dsr.decode_page(payload)
    assert len(decoded) == len(rows)
    for got, (d0, year, val) in zip(decoded, rows):
        assert got["natureza"] == ["A", "B", "C", "D"][d0]
        assert got["ano_orcamento"] == year
        assert got["valor_original"] == val
