"""Custom stateful streaming operator: per-host politeness limiting.

The batch engine enforces politeness with a salted grouped window per
wave (``plans/frontier.py``). The continuous-ingestion twin is a
stateful stream: fetch requests arrive as a stream, and each host's
lifetime served-count lives in the state store —
``applyInPandasWithState`` (Arrow-batched per group, exactly the
"custom stateful operator" escape hatch Structured Streaming provides
when windows can't express the semantics).

Semantics: for each host, pass requests through until ``budget`` total
have been served; drop the rest. Emitted rows carry the running
``served_seq`` (1-based) — the streaming analogue of the per-wave
host_rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("url", StringType()),
        StructField("served_seq", LongType()),
    ]
)
STATE_SCHEMA = StructType([StructField("served", LongType()), StructField("budget", IntegerType())])


def politeness_limit_stream(requests: DataFrame, default_budget: int = 4) -> DataFrame:
    """requests(host, url[, host_budget]) stream → served requests only.

    State per host: (served_count, budget). Budget comes from the first
    row's ``host_budget`` column when present, else ``default_budget``.
    """
    has_budget_col = "host_budget" in requests.columns

    def limit(key, pdfs, state: GroupState):
        (host,) = key
        if state.exists:
            served, budget = state.get
        else:
            served, budget = 0, None
        import pandas as pd

        out = []
        for pdf in pdfs:
            if budget is None:
                budget = (
                    int(pdf["host_budget"].iloc[0]) if has_budget_col else default_budget
                )
            for url in pdf["url"]:
                if served >= budget:
                    break
                served += 1
                out.append({"host": host, "url": url, "served_seq": served})
        state.update((served, int(budget if budget is not None else default_budget)))
        yield pd.DataFrame(out, columns=["host", "url", "served_seq"])

    return requests.groupBy("host").applyInPandasWithState(
        limit,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
