"""Oracle gate for the demoted pytest-tier queries.

The rotation ledger (plans/__init__.py policy 4) demotes
thrice-driver-certified trivial queries out of the 50-row driver
window so the window covers every still-registered query within two
rounds. Demotion must not weaken their correctness signal: this test
replays each demoted query against its DuckDB oracle on the same
parquet — the exact comparison tools/check.py (the local replica of
the driver gate) applies, at sf0.001 so the whole tier stays cheap
enough to run on every pytest invocation.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from garmin_data_pipeline_spark.plans import PYTEST_QUERIES  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from check import TABLES, compare  # noqa: E402


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def test_tier_is_nonempty_and_all_oracled():
    """Every demoted query must still carry its oracle — rows-only
    queries may never be demoted (they'd lose their only signal)."""
    assert PYTEST_QUERIES, "pytest tier unexpectedly empty"
    missing = [n for n, q in PYTEST_QUERIES.items() if not q.oracle]
    assert not missing, f"demoted without oracle: {missing}"


@pytest.mark.parametrize("name", sorted(PYTEST_QUERIES))
def test_demoted_query_matches_oracle(name, spark, sf_dir, duck):
    q = PYTEST_QUERIES[name]
    sdf = q.fn(spark, sf_dir).toPandas()
    odf = duck.execute(q.oracle).df()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: {problems}"
