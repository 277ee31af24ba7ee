import os

import pytest

from crawler_tjce_spark.session import get_spark

SF_TEST = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Recycle the Spark JVM every N test modules (VERDICT r4 #9): the full
# ~15-minute suite in ONE session died mid-run once with the JVM gone
# (ConnectionRefusedError cascade; every affected test green on
# re-run), i.e. accumulated driver-side state eventually killed the
# long-lived JVM. No test shares Spark state across modules (module
# fixtures rebuild their DataFrames), so a module boundary is a safe
# restart point. ~22 modules / 8 → the suite runs in ≥3 fresh
# sessions, each well under the observed failure horizon, at the cost
# of ~10 s JVM warmup per restart.
RECYCLE_EVERY_MODULES = int(os.environ.get("SPARK_GRAFT_TEST_RECYCLE", "8"))

_sess: dict = {"spark": None, "modules": 0}


@pytest.fixture(scope="module")
def spark():
    _sess["modules"] += 1
    if (
        _sess["spark"] is not None
        and RECYCLE_EVERY_MODULES > 0
        and (_sess["modules"] - 1) % RECYCLE_EVERY_MODULES == 0
        and _sess["modules"] > 1
    ):
        _sess["spark"].stop()
        _sess["spark"] = None
    if _sess["spark"] is None:
        _sess["spark"] = get_spark(app_name="tests", cores=8)
    s = _sess["spark"]
    yield s
    # inter-module hygiene: drop anything a module left cached so the
    # next module starts from a clean executor-memory baseline
    try:
        s.catalog.clearCache()
    except Exception:
        pass


@pytest.fixture(scope="session", autouse=True)
def _stop_spark_at_exit():
    yield
    if _sess["spark"] is not None:
        _sess["spark"].stop()
        _sess["spark"] = None


@pytest.fixture(scope="session")
def sf_dir():
    return SF_TEST
