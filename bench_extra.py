"""Extra measurement harness for the optimization rounds (guide §1).

NOT part of the frozen driver contract — ``bench.py`` stays the graded
harness. This file exists so plan captures and noop-sink isolation runs
(guide §1.4) are reproducible commands instead of ad-hoc snippets:

* ``--explain OUTDIR [--suffix before|after]`` writes
  ``OUTDIR/<query>_<suffix>.txt`` with ``explain("formatted")`` for each
  headline query (the judge checks plan claims against these files);
* ``--time [--reps N]`` times each headline query with the noop sink
  (computes every column, discards the result — ``.count()`` would let
  the optimizer prune) in ONE warm JVM, reporting every rep;
* ``--jobs`` additionally prints per-query job counts/executor run_s via
  ``perf.stage_attribution`` so shuffle bytes are visible per query.

Env: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (default 32) — same contract as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "q01_pushdown_agg",
    "q08_topk_per_group",
    "q10_fill_forward",
    "q14_broadcast_join",
    "q18_ptbr_money",
    "q26_quality",
    "q29_emb_topk",
    "q30_emb_neardup",
    "q31_minhash_pairs",
    "q33_ngram_jaccard",
    "q35_frontier_pick",
    "q36_sessionize",
    "q47_fetch_lineage",
    "q48_api_filters",
]


def _spark():
    from crawler_tjce_spark.session import get_spark

    spark = get_spark(app_name="bench_extra", cores=CPUS)
    spark.range(1000).count()
    return spark


def _queries(names):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    return [(n, qs[n]) for n in (names or HEADLINE)]


def do_explain(outdir: str, suffix: str, names) -> None:
    os.makedirs(outdir, exist_ok=True)
    spark = _spark()
    # Plan capture must see the REAL computation plan. q31/q33 end in an
    # eager localCheckpoint (so their returned DF is just a checkpoint
    # scan) — neutralize it for explain only; timing paths are untouched.
    import pyspark.sql.classic.dataframe as _dfmod

    _orig_lc = _dfmod.DataFrame.localCheckpoint
    _dfmod.DataFrame.localCheckpoint = lambda self, eager=True, storageLevel=None: self
    try:
        _do_explain_inner(outdir, suffix, names, spark)
    finally:
        _dfmod.DataFrame.localCheckpoint = _orig_lc
    spark.stop()


def _do_explain_inner(outdir: str, suffix: str, names, spark) -> None:
    for name, fn in _queries(names):
        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"# wrote {path} ({len(plan.splitlines())} lines)", file=sys.stderr)


def do_time(reps: int, names, jobs: bool) -> None:
    spark = _spark()
    from crawler_tjce_spark.perf import job_group, stage_attribution

    out: dict[str, list[float]] = {}
    for name, fn in _queries(names):
        samples = []
        for r in range(reps):
            with job_group(spark.sparkContext, f"{name}#r{r}"):
                t0 = time.time()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                samples.append(round(time.time() - t0, 3))
        out[name] = samples
        print(f"# {name}: {samples}", file=sys.stderr)
    if jobs:
        att = stage_attribution(spark)
        for name in out:
            for r in range(reps):
                g = att.get(f"{name}#r{r}")
                if g:
                    print(f"# attr {name}#r{r}: {g}", file=sys.stderr)
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "noop_times": out}))


def main() -> None:
    args = sys.argv[1:]
    names = None
    if "--names" in args:
        i = args.index("--names")
        names = args[i + 1].split(",")
    if "--explain" in args:
        i = args.index("--explain")
        outdir = args[i + 1]
        suffix = "before"
        if "--suffix" in args:
            suffix = args[args.index("--suffix") + 1]
        do_explain(outdir, suffix, names)
        return
    reps = 3
    if "--reps" in args:
        reps = int(args[args.index("--reps") + 1])
    do_time(reps, names, "--jobs" in args)


if __name__ == "__main__":
    main()
