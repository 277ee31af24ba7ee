"""crawler_tjce_spark — a PySpark-native analytics + crawl-scheduling engine.

Brand-new implementation (NOT a port) with the query and data-processing
capabilities of the reference crawler (``fernandozoomp/crawler-tjce``):

* a URL-frontier + fetch scheduler (per-host priority queue, politeness
  budgets, robots filtering, bloom-accelerated exact URL-seen set),
  resumable from checkpointed wave snapshots — ``plans/`` + ``streaming/``;
* the reference's full normalization function surface (pt-BR money/date
  parsing, slugify, CNJ process ids, ...) as native Spark expressions —
  ``functions/``;
* its operator inventory (windowed scans, filters, windows, sorts,
  set ops, aggregations) re-expressed Spark-first — ``operators/``;
* large-scale training-data operators (dedup families, ANN similarity,
  text quality, multimodal payload plumbing) — ``operators/`` +
  ``payload.py``;
* Iceberg-style snapshot tables (parquet + manifest) — ``sources/``.

Everything is DataFrame/SQL-first: Catalyst handles pushdown, pruning and
join strategy; Python appears only in vectorized pandas/Arrow UDFs.
"""

__version__ = "0.1.0"
