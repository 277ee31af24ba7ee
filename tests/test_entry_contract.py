"""Driver-contract self-checks (VERDICT r3 task 2): every registered
query must sit inside the driver's recording window and carry a full
SQL oracle, and the flagship must be registered first so it can never
again fall off the end of the gate (r3's q35 regression)."""

import sys

sys.path.insert(0, "/root/repo")

from tools.oracle_check import DRIVER_WINDOW, completeness_report  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def test_every_query_has_oracle_and_fits_driver_window():
    problems, _warnings = completeness_report()
    assert problems == [], "\n".join(problems)


def test_flagship_registered_first():
    names = list(entrymod.queries())
    assert names[0] == "q35_frontier_pick"
    assert len(names) <= DRIVER_WINDOW
