"""Local replica of the driver's correctness gate.

Runs every ``queries()[name]`` through Spark and the matching
``oracle_sql()[name]`` through DuckDB over the same parquet tables,
then compares row count, column-name set, and an order-insensitive
value hash (columns sorted by name, rows sorted, values stringified).

Usage: python tools/oracle_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# The driver records at most this many queries() entries per round, in
# registration order — in r3 the 51st (the flagship, registered last)
# silently fell out of the correctness gate (VERDICT r3 missing #1).
DRIVER_WINDOW = 50


def completeness_report(repo: str = "/root/repo") -> tuple[list[str], list[str]]:
    """Registration-contract self-check (VERDICT r3 task 2).

    Returns (problems, warnings). Problems fail the suite:
    * an ``oracle_sql()`` key with no ``queries()`` entry (dead oracle);
    * a ``queries()`` entry with no oracle (this repo keeps full SQL
      oracles for every query — a missing one is a regression to the
      weaker rows-only gate);
    * more than ``DRIVER_WINDOW`` registered queries (the overflow would
      silently skip the driver gate).
    Warnings (printed, non-fatal): any currently-registered query absent
    from the latest recorded CORRECTNESS_r*.json — expected for queries
    added since that round, but it is exactly the signal that was missed
    in r3.
    """
    import glob
    import json

    import __spark_entry__ as entrymod

    problems: list[str] = []
    warnings: list[str] = []
    qnames = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    dead = sorted(set(oracles) - set(qnames))
    if dead:
        problems.append(f"oracle_sql() keys with no queries() entry: {dead}")
    weak = sorted(set(qnames) - set(oracles))
    if weak:
        problems.append(f"queries() entries with no oracle_sql(): {weak}")
    if len(qnames) > DRIVER_WINDOW:
        problems.append(
            f"{len(qnames)} registered queries exceed the driver's "
            f"{DRIVER_WINDOW}-entry window; beyond it: {qnames[DRIVER_WINDOW:]}"
        )
    recs = sorted(glob.glob(f"{repo}/CORRECTNESS_r*.json"))
    if recs:
        with open(recs[-1]) as f:
            recorded = json.load(f)
        absent = [n for n in qnames[:DRIVER_WINDOW] if n not in recorded]
        if absent:
            warnings.append(
                f"registered but absent from {recs[-1].rsplit('/', 1)[-1]} "
                f"(new since that round, or silently skipped): {absent}"
            )
    return problems, warnings


def norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v:
            return "nan"
        return repr(round(v, 9))
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted("|".join(norm_val(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in canon:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    problems, warnings = completeness_report()
    for w in warnings:
        print(f"WARN: {w}")
    for p in problems:
        print(f"CONTRACT FAIL: {p}")
    if problems:
        sys.exit(2)

    import __spark_entry__ as entrymod
    from crawler_tjce_spark.session import get_spark

    spark = get_spark(app_name="oracle_check", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures, no_oracle = [], []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            no_oracle.append(name)
            print(f"{name:24s} rows={len(srows):6d}  (rows-only: no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"{name:24s} ORACLE SQL ERROR: {e}")
            continue
        ok_n = len(srows) == len(orows)
        ok_c = sorted(scols) == sorted(ocols)
        ok_v = ok_n and ok_c and value_hash(scols, srows) == value_hash(ocols, orows)
        status = "OK" if (ok_n and ok_c and ok_v) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{name:24s} {status}  rows={len(srows)}/{len(orows)}"
            f" cols={'ok' if ok_c else f'{sorted(scols)} vs {sorted(ocols)}'}"
            f" hash={'ok' if ok_v else 'MISMATCH'}"
        )
        if status == "FAIL" and ok_n and ok_c:
            # show a few differing rows for debugging
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            sset = {"|".join(norm_val(r[i]) for i in order) for r in srows}
            oord = sorted(range(len(ocols)), key=lambda i: ocols[i])
            oset = {"|".join(norm_val(r[i]) for i in oord) for r in orows}
            for d in list(sset - oset)[:3]:
                print(f"    spark-only: {d}")
            for d in list(oset - sset)[:3]:
                print(f"    duck-only:  {d}")

    print(f"\n{len(qs) - len(failures) - len(no_oracle)} OK, "
          f"{len(failures)} FAIL, {len(no_oracle)} rows-only")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
