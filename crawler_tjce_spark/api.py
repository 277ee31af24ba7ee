"""Reference API semantics as DataFrame plan builders.

The reference exposes its data through a Flask/Swagger API
(``main.py``). The HTTP/caching/rate-limit plumbing is not an analytics
engine concern, but the QUERY semantics of those endpoints are — this
module is the param→plan translation a reference user needs to switch:

* ``resolve_entity`` — ``main.py:866-893``: accept a slug or an official
  name; invalid slugs get one conversion attempt via the entity mapping
  before a 400/404;
* ``apply_filters`` — ``main.py:698-728``: ano_min/ano_max (int,
  inclusive), valor_min/valor_max (float, inclusive on ``valor_atual``),
  natureza (case-insensitive equality);
* ``sort_rows`` — ``main.py:731-739``: single-key sort, ``asc``/``desc``;
* ``serialize_editais`` — ``main.py:186-210``: the /editais response
  coercions (valor ``"-"``/empty/unparseable → 0.0; field defaults).

All of it stays declarative (filters/sorts reach Catalyst and push into
the scan); only the entity resolution touches the driver, and only for
a bounded 1-row lookup against the broadcastable entity dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ApiError(Exception):
    """Reference ``api.abort`` analog: carries the HTTP status."""

    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status
        self.message = message


def resolve_entity(mapping: DataFrame, entity: str) -> tuple[str, str]:
    """slug-or-name → (slug, official_name); 400 on unknown slug, 404 when
    a valid slug has no official name (ref main.py:866-893)."""
    if not entity:
        raise ApiError(400, "O parâmetro 'entity' (slug da entidade) é obrigatório.")
    hit = mapping.filter(F.col("slug") == entity).select("slug", "official_name").head(1)
    if not hit:
        # one conversion attempt: maybe an official name was passed
        conv = (
            mapping.filter(F.lower(F.col("official_name")) == entity.lower())
            .select("slug", "official_name")
            .head(1)
        )
        if not conv:
            raise ApiError(400, f"Slug de entidade inválido ou não encontrado: {entity}")
        hit = conv
    slug, name = hit[0]["slug"], hit[0]["official_name"]
    if not name:
        raise ApiError(404, f"Nome oficial não encontrado para o slug: {slug}")
    return slug, name


def apply_filters(
    df: DataFrame,
    ano_min: int | None = None,
    ano_max: int | None = None,
    valor_min: float | None = None,
    valor_max: float | None = None,
    natureza: str | None = None,
    ano_col: str = "ano_orcamento",
    valor_col: str = "valor_atual",
    natureza_col: str = "natureza",
) -> DataFrame:
    """Declarative twin of ``main.py:apply_filters`` (same inclusivity and
    the case-insensitive natureza match)."""
    if ano_min is not None:
        df = df.filter(F.col(ano_col) >= int(ano_min))
    if ano_max is not None:
        df = df.filter(F.col(ano_col) <= int(ano_max))
    if valor_min is not None:
        df = df.filter(F.col(valor_col) >= float(valor_min))
    if valor_max is not None:
        df = df.filter(F.col(valor_col) <= float(valor_max))
    if natureza is not None:
        df = df.filter(F.lower(F.col(natureza_col)) == natureza.lower())
    return df


def sort_rows(df: DataFrame, sort_by: str | None = None, order: str = "asc") -> DataFrame:
    """``main.py:sort_rows``: no-op without a key; ``desc`` is anything
    spelled 'desc' case-insensitively, everything else sorts ascending."""
    if not sort_by:
        return df
    col = F.col(sort_by)
    return df.orderBy(col.desc() if order.lower() == "desc" else col.asc())


def serialize_editais(df: DataFrame) -> DataFrame:
    """/editais response coercions (ref main.py:186-210): valor that is
    '-', blank, or unparseable → 0.0; missing strings → '-', ints → 0."""
    valor = F.coalesce(
        F.nullif(F.trim(F.col("valor").cast("string")), F.lit("-")).try_cast("double"),
        F.lit(0.0),
    )
    return df.select(
        F.coalesce(F.col("ordem"), F.lit(0)).alias("ordem"),
        F.coalesce(F.col("ano_orcamento"), F.lit(0)).alias("ano_orcamento"),
        F.coalesce(F.col("natureza"), F.lit("-")).alias("natureza"),
        F.coalesce(F.col("data_cadastro"), F.lit("-")).alias("data_cadastro"),
        F.coalesce(F.col("precatorio"), F.lit("-")).alias("precatorio"),
        F.coalesce(F.col("status"), F.lit("-")).alias("status"),
        valor.alias("valor"),
    )


def fetch_precatorios(
    precatorios: DataFrame,
    mapping: DataFrame,
    entity: str,
    year: int | None = None,
    entity_col: str = "entity_slug",
) -> DataFrame:
    """/fetch semantics: resolve the entity (slug or official name), then
    filter; the reference's internal pagination is the keyset scan the IR
    translator covers — on a table it is just a filter Catalyst pushes
    down."""
    slug, _name = resolve_entity(mapping, entity)
    out = precatorios.filter(F.col(entity_col) == slug)
    if year is not None:
        out = out.filter(F.col("ano_orcamento") == int(year))
    return out
