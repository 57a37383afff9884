"""Package CLI: ``python -m garmin_data_pipeline_spark <command>``.

The reference is driven as ``python etl_pipeline.py`` plus ad-hoc
notebook cells; this gives its users the same two entry styles on
Spark — the ETL runner (``pipeline``, delegating to
``pipelines.runner``) and ad-hoc queries over a warehouse of parquet
tables (``list``/``run``/``explain``), without writing a script.

Commands
--------
pipeline <base_dir> [...]   full ETL (see pipelines/runner.py --help)
corpus <sf_dir> <out_dir>   full corpus production (crawl front-end →
                            dedup → excision → decontamination →
                            quality gate → mixture → split → packing
                            → sharded export; see pipelines/corpus.py)
list [--tier all]           registered queries (name + one-line doc)
run <query> [--sf-dir DIR] [--limit N] [--csv]
explain <query> [--sf-dir DIR]   formatted physical plan
"""

from __future__ import annotations

import sys


def _queries(tier: str):
    from garmin_data_pipeline_spark import plans

    out = dict(plans.QUERIES)
    if tier == "all":
        out.update(plans.PYTEST_QUERIES)
    return out


def _lookup(name: str):
    qs = _queries("all")
    if name not in qs:
        import difflib

        close = difflib.get_close_matches(name, qs, n=3)
        hint = f" (did you mean: {', '.join(close)}?)" if close else ""
        raise SystemExit(f"unknown query {name!r}{hint}")
    return qs[name]


def main(argv: list[str] | None = None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        prog="python -m garmin_data_pipeline_spark",
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser(
        "pipeline", add_help=False
    )  # everything after `pipeline` goes to the runner untouched

    lp = sub.add_parser("list", help="list registered queries")
    lp.add_argument(
        "--tier",
        default="driver",
        choices=["driver", "all"],
        help="'driver' = the rotation-registered set; 'all' adds the "
        "pytest-tier queries",
    )

    corp = sub.add_parser(
        "corpus",
        help="full corpus production: crawl front-end -> dedup -> "
        "excision -> decontamination -> quality gate -> mixture -> "
        "split -> packing -> sharded parquet export",
    )
    corp.add_argument("sf_dir")
    corp.add_argument("out_dir")

    for cmd in ("run", "explain"):
        cp = sub.add_parser(cmd)
        cp.add_argument("query")
        cp.add_argument(
            "--sf-dir", default="/root/testdata/sf0.001"
        )
        if cmd == "run":
            cp.add_argument("--limit", type=int, default=20)
            cp.add_argument(
                "--csv",
                action="store_true",
                help="machine-readable CSV on stdout instead of show()",
            )

    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "pipeline":
        from garmin_data_pipeline_spark.pipelines.runner import (
            main as runner_main,
        )

        return runner_main(argv[1:])
    args = p.parse_args(argv)

    if args.cmd == "list":
        for name, q in _queries(args.tier).items():
            doc = " ".join((q.doc or "").split())
            print(f"{name:<32} {doc[:80]}")
        return 0

    if args.cmd == "corpus":
        from garmin_data_pipeline_spark.pipelines.corpus import (
            run_corpus,
        )
        from garmin_data_pipeline_spark.session import get_spark

        counts = run_corpus(
            get_spark("corpus"), args.sf_dir, args.out_dir
        )
        for split, n in sorted(counts.items()):
            print(f"{split}\t{n}")
        return 0

    from garmin_data_pipeline_spark.session import get_spark

    q = _lookup(args.query)
    spark = get_spark("cli")
    df = q.fn(spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain(mode="formatted")
        return 0
    if args.csv:
        import csv

        rows = df.limit(args.limit).collect()
        w = csv.writer(sys.stdout)
        w.writerow(df.columns)
        w.writerows([list(r) for r in rows])
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # `... | head` is a normal way to use us
        raise SystemExit(0)
