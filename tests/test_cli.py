"""Package CLI: list/run/explain over the query registry (the ad-hoc
entry style the reference's notebook users expect)."""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from garmin_data_pipeline_spark.__main__ import main  # noqa: E402


def _capture(argv):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(argv)
    return rc, buf.getvalue()


def test_list_names_every_registered_query():
    from garmin_data_pipeline_spark import plans

    rc, out = _capture(["list"])
    assert rc == 0
    for name in plans.QUERIES:
        assert name in out
    rc, out_all = _capture(["list", "--tier", "all"])
    assert rc == 0
    for name in plans.PYTEST_QUERIES:
        assert name in out_all and name not in out


def test_run_csv_and_explain(spark, sf_dir):
    rc, out = _capture(
        ["run", "e4_funnel_stages", "--sf-dir", sf_dir, "--csv"]
    )
    assert rc == 0
    lines = out.strip().splitlines()
    assert lines[0] == "stage,n_users"
    assert len(lines) == 4  # header + 3 stages
    rc, out = _capture(
        ["explain", "a1_pricing_summary", "--sf-dir", sf_dir]
    )
    assert rc == 0
    assert "HashAggregate" in out


def test_unknown_query_suggests():
    with pytest.raises(SystemExit, match="a1_pricing_summary"):
        main(["run", "a1_pricing_sumary"])
