import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_deep_learning_with_apache_spark_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slowtier: deep-verification tier skipped in the default run "
        "(set SPARK_GRAFT_FULL_TESTS=1 to include); see conftest note",
    )


def pytest_collection_modifyitems(config, items):
    """Tiered suite (r12 verdict #2b): the full suite no longer fits a
    driver round on slow hosts (measured ~5500 s single-process; the r12
    driver run timed out at 61% with zero failures). The default tier
    skips exactly the modules whose coverage is REDUNDANT with
    independent per-round gates, keeping them runnable and run:

    - test_oracle_parity + test_driver_sweep_r4 (42% of suite time):
      registered-query-vs-DuckDB parity — re-verified from scratch every
      round by the driver's own 50-slot oracle gate AND by
      tools/sweep_all.py (full 338-name registry, fresh process, hash
      parity at sf0.01; run and recorded in TESTRUNS each round).
    - test_corpus_fuzz_differential + test_tpch_table_fuzz (16%):
      drawn-corpus fuzz tiers — deep periodic gates, not per-commit
      gates; run at round close (TESTRUNS_r13.md records this round's
      full-tier green: 1521 passed / 0 failed).

    SPARK_GRAFT_FULL_TESTS=1 restores the complete suite (used for the
    round-close record)."""
    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="slowtier (redundant with driver oracle gate / periodic fuzz); "
        "SPARK_GRAFT_FULL_TESTS=1 runs it"
    )
    slow_modules = {
        "test_oracle_parity",
        "test_driver_sweep_r4",
        "test_corpus_fuzz_differential",
        "test_tpch_table_fuzz",
    }
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in slow_modules:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ddl_spark_tests", cpus="8")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
