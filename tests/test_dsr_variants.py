"""Golden decode tests for the editais and pagamentos DSR fixtures
(positional bindings — ref edital_crawler.py:472-487,
pagamentos_crawler.py:482-516). The pagamentos restart token is again a
server-generated last-row oracle."""

from __future__ import annotations

import json
from decimal import Decimal

import pytest

from crawler_tjce_spark.sources import dsr


@pytest.fixture(scope="module")
def edital():
    with open("/root/reference/examples/response_edital.json") as f:
        return json.load(f)


@pytest.fixture(scope="module")
def pagamentos():
    with open("/root/reference/examples/response_pagamentos.json") as f:
        return json.load(f)


def test_edital_decode(edital):
    rows = dsr.decode_page(edital, positional_fields=dsr.EDITAL_FIELDS_POS)
    assert len(rows) == 158
    vd = edital["results"][0]["result"]["data"]["dsr"]["DS"][0]["ValueDicts"]
    first = rows[0]
    # first row is dense: C = [158, 0, 0, 0, 0, 0, 1152313.01]
    assert first["ordem"] == 158
    assert first["ano_orcamento"] == int(dsr.parse_number(vd["D0"][0]))
    assert first["natureza"] == vd["D1"][0]
    assert first["data_cadastro"] == str(vd["D2"][0]).strip()
    assert first["precatorio"] == vd["D3"][0]
    assert first["status"] == vd["D4"][0]
    assert first["valor"] == Decimal("1152313.01")
    # ordem is the remote sort key, descending (Direction:2). The
    # fixture's own data skips ordem 10 and repeats one value — assert
    # monotonic order, not density (the server decides the contents).
    ordens = [r["ordem"] for r in rows]
    assert ordens == sorted(ordens, reverse=True)
    assert ordens[0] == 158 and ordens[-1] == 1
    # natureza restricted to the IN-list filter the reference pushes (P4)
    assert {r["natureza"] for r in rows} <= {"ALIMENTAR", "COMUM"}


def test_pagamentos_decode_matches_restart_token(pagamentos):
    # WIRE-TRUTH mode (pagamentos_semantics=False): row 0 is data and the
    # server restart token — the true last-row state — is the oracle for
    # every field, validating the R-mask/dict machinery end to end.
    # REFERENCE-PARITY mode (the default for table='pagamento') skips row
    # 0 like the reference does and is pinned against the reference's own
    # production CSV in tests/test_round2.py.
    rows = dsr.decode_page(pagamentos, positional_fields=dsr.PAGAMENTO_FIELDS_POS)
    assert len(rows) == 500
    rt = pagamentos["results"][0]["result"]["data"]["dsr"]["DS"][0]["RT"][0]
    last = rows[-1]
    assert last["quantidade"] == int(rt[0].rstrip("L"))
    assert last["modalidade"] == rt[1].strip("'")
    assert last["natureza"] == rt[2].strip("'")
    assert last["exercicio"] == int(rt[3].strip("'"))
    assert last["data_protocolo"] == rt[4].strip("'")
    assert last["precatorio"] == rt[5].strip("'")
    assert last["credor_beneficiario"] == rt[6].strip("'")
    assert last["tipo"] == rt[7].strip("'")
    assert last["data_pagamento"] == rt[8].strip("'")
    assert last["cpf_cnpj"] == rt[9].strip("'")
    for field, tok in [
        ("valor_bruto", rt[10]),
        ("previdencia", rt[11]),
        ("irrf", rt[12]),
        ("honorarios", rt[13]),
        ("valor_bruto_contratual", rt[14]),
        ("rra", rt[15]),
        ("valor_liquido", rt[16]),
    ]:
        assert last[field] == Decimal(str(round(float(tok.rstrip("D")), 2))), field


def test_variants_distributed(spark, edital, pagamentos):
    e = spark.createDataFrame([(0, json.dumps(edital))], "page_id long, payload string")
    p = spark.createDataFrame([(0, json.dumps(pagamentos))], "page_id long, payload string")
    de = dsr.decode_pages_df(spark, e, table="edital")
    dp = dsr.decode_pages_df(spark, p, table="pagamento")
    assert de.count() == 158 and dp.count() == 499
    assert "valor" in de.columns and "valor_liquido" in dp.columns
