"""Entity dimension + artifact sink + CSV sink tests."""

from __future__ import annotations

import pytest

from crawler_tjce_spark.sources import ipfs
from crawler_tjce_spark.sources.entities import build_entity_mapping, write_entities_csv


def test_entity_mapping(spark, tmp_path):
    names = spark.createDataFrame(
        [
            ("MUNICÍPIO DE FORTALEZA",),
            ("MUNICÍPIO DE FORTALEZA",),  # dup
            ("ESTADO DO CEARÁ",),
            ("--- Selecione",),  # placeholder sentinel
            ("  ",),
            (None,),
            ("ESTADO DO CEARA",),  # slug collision with accented form
        ],
        "official_name string",
    )
    m = build_entity_mapping(names)
    rows = {r["slug"]: r["official_name"] for r in m.collect()}
    assert rows == {
        "municipio-de-fortaleza": "MUNICÍPIO DE FORTALEZA",
        # collision resolved to lexicographically-first name
        "estado-do-ceara": "ESTADO DO CEARA",
    }
    out = tmp_path / "entidades.csv"
    write_entities_csv(m, str(out))
    data = out.read_bytes()
    assert data.startswith(b"\xef\xbb\xbf")  # utf-8-sig BOM (ref parity)
    assert b"municipio-de-fortaleza" in data


def test_ipfs_sink_content_addressed(tmp_path):
    f = tmp_path / "artifact.csv"
    f.write_bytes(b"ordem,processo\n1,x\n")
    uri1 = ipfs.artifact_uri(str(f))
    uri2 = ipfs.artifact_uri(str(f))
    assert uri1 == uri2 and uri1.endswith("/artifact.csv")
    f.write_bytes(b"different")
    assert ipfs.artifact_uri(str(f)) != uri1  # content-addressed


def test_ipfs_upload_pins_idempotently(tmp_path):
    store = ipfs.LocalCAS(str(tmp_path / "cas"))
    f = tmp_path / "artifact.csv"
    f.write_bytes(b"ordem,processo\n1,x\n")
    r1 = ipfs.upload(str(f), store=store)
    assert not r1["already_pinned"]
    assert open(r1["pinned_path"], "rb").read() == f.read_bytes()
    assert r1["cid"] in r1["pinned_path"] and r1["cid"] in r1["uri"]
    # re-pin of identical bytes: IPFS semantics, a no-op
    r2 = ipfs.upload(str(f), store=store)
    assert r2["already_pinned"] and r2["pinned_path"] == r1["pinned_path"]
    # changed bytes pin under a new cid; the old pin survives
    f.write_bytes(b"changed")
    r3 = ipfs.upload(str(f), store=store)
    assert r3["cid"] != r1["cid"] and not r3["already_pinned"]
    assert open(r1["pinned_path"], "rb").read() == b"ordem,processo\n1,x\n"


def test_csv_sink_ptbr(spark, tmp_path):
    import datetime as dt
    from decimal import Decimal

    from crawler_tjce_spark.sources.dsr import write_csv_ptbr

    df = spark.createDataFrame(
        [
            (1, "0001-x", "COMARCA A", 2025, "Alimentar", dt.datetime(2023, 8, 10),
             "Orçamentário", 8314.73, Decimal("10758.54"), "Cadastrado"),
            (2, "0002-y", "COMARCA B", 2024, "Comum", None,
             "Preferencial", 2.0, None, "Cadastrado"),
        ],
        "ordem int, processo string, comarca string, ano_orcamento int, natureza string,"
        " data_cadastro timestamp, tipo_classificacao string, valor_original double,"
        " valor_atual decimal(18,2), situacao string",
    )
    out = tmp_path / "csvout"
    write_csv_ptbr(df, str(out))
    files = [p for p in out.iterdir() if p.suffix == ".csv"]
    assert len(files) == 1
    text = files[0].read_text()
    lines = sorted(text.strip().splitlines())
    assert any("10/08/2023" in l and "R$ 10.758,54" in l and "8314.73" in l for l in lines)
    # null date → empty field (Spark quotes it), null money → R$ 0,00
    assert any(',"",' in l and "R$ 0,00" in l for l in lines)
