"""CLI entry point: ``python -m etl_tool_spark -config playbook.yaml``.

Flag-compatible with the reference CLI (internal/app/app.go:74-89;
cmd/etl-tool/main.go:14-59): -config -input -output -db -loglevel
-dry-run -fips. Flags override playbook values, and the DB connection
string falls back to $DB_CREDENTIALS exactly like app.go:105. Exit codes
follow the reference: 2 for usage/config errors, 1 for runtime failures
(docs/etl-tool.1.man.txt:361-367)."""

from __future__ import annotations

import argparse
import logging
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="etl_tool_spark",
        description="PySpark-native ETL/analytics engine (playbook-driven)")
    p.add_argument("-config", "--config", help="playbook YAML path")
    p.add_argument("-profile", "--profile", metavar="PATH",
                   help="print one-pass per-column statistics for a "
                        "parquet/csv/json table and exit")
    p.add_argument("-compact", "--compact", nargs=2, metavar=("SRC", "DST"),
                   help="compact a fragmented parquet directory into DST "
                        "at -target-file-mb, then exit")
    p.add_argument("-target-file-mb", "--target-file-mb", type=int,
                   default=128, help="target file size for -compact")
    p.add_argument("-sort", "--sort", metavar="COLS",
                   help="comma-separated columns: -compact lays output "
                        "in global order (range-partitioned files)")
    p.add_argument("-zorder", "--zorder", metavar="COLS",
                   help="comma-separated columns: -compact clusters "
                        "output by Morton code over quantile ranks")
    p.add_argument("-compact-store", "--compact-store", metavar="STORE",
                   dest="compact_store",
                   help="compact an incremental dedup/embedding store or "
                        "ANN index dir in place (crash-safe manifest "
                        "promotion), then exit")
    p.add_argument("-versions", "--versions", metavar="SNAP",
                   help="list a CDC snapshot store's retained versions")
    p.add_argument("-vacuum", "--vacuum", metavar="SNAP",
                   help="trim a CDC snapshot store's history and collect "
                        "unreferenced data dirs")
    p.add_argument("-keep-last", "--keep-last", type=int, default=2,
                   help="versions to retain for -vacuum")
    p.add_argument("-min-age-s", "--min-age-s", type=float, default=3600.0,
                   help="only collect unreferenced dirs older than this "
                        "(guards in-flight merges) for -vacuum")
    p.add_argument("-diff", "--diff", nargs=3,
                   metavar=("SNAP", "FROM_V", "TO_V"),
                   help="row-level changes between two CDC snapshot versions")
    p.add_argument("-restore", "--restore", nargs=2, metavar=("SNAP", "V"),
                   help="rewind a CDC snapshot to version V "
                        "(zero-copy manifest commit)")
    p.add_argument("-input", "--input", help="override source file path")
    p.add_argument("-output", "--output", help="override destination file path")
    p.add_argument("-db", "--db", help="database connection string "
                   "(default: $DB_CREDENTIALS)")
    p.add_argument("-loglevel", "--loglevel", default=None,
                   choices=["none", "error", "warn", "info", "debug"])
    p.add_argument("-dry-run", "--dry-run", dest="dry_run", action="store_true",
                   help="run the pipeline but skip the load stage")
    p.add_argument("-explain", "--explain", action="store_true",
                   help="print the optimized physical plan (formatted) "
                        "for the playbook's clean output and exit — "
                        "nothing executes")
    p.add_argument("-fips", "--fips", action="store_true",
                   help="FIPS mode: forbid md5 hashing")
    return p


_LEVELS = {"none": logging.CRITICAL, "error": logging.ERROR,
           "warn": logging.WARNING, "info": logging.INFO, "debug": logging.DEBUG}


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.loglevel:
        logging.basicConfig(level=_LEVELS[args.loglevel])

    from etl_tool_spark.plans.config import ConfigError, load_config
    from etl_tool_spark.session import get_spark
    from etl_tool_spark.util import mask_credentials

    # session first: plan-time validation pre-compiles filter/branch
    # expressions into Catalyst Columns, which needs an active session
    spark = get_spark("etl_tool_spark_cli")

    if args.profile:
        from etl_tool_spark.operators.profile import profile

        ext = os.path.splitext(args.profile)[1].lstrip(".").lower()
        fmt = ext if ext in ("csv", "json", "parquet", "orc") else "parquet"
        reader = spark.read.option("header", "true") if fmt == "csv" \
            else spark.read
        try:
            df = getattr(reader, fmt)(args.profile)
            profile(df).show(200, truncate=False)
        except Exception as e:
            print(f"profile failed: {e}", file=sys.stderr)
            return 1
        return 0

    if args.compact:
        from etl_tool_spark.operators.maintenance import compact_parquet

        split = (lambda s: [c.strip() for c in s.split(",") if c.strip()])
        try:
            stats = compact_parquet(spark, args.compact[0], args.compact[1],
                                    target_file_mb=args.target_file_mb,
                                    sort_by=split(args.sort) if args.sort
                                    else None,
                                    zorder_by=split(args.zorder)
                                    if args.zorder else None)
        except Exception as e:
            print(f"compact failed: {e}", file=sys.stderr)
            return 1
        print(f"compacted {stats['files_before']} files -> "
              f"{stats['files_after']} ({stats['rows']} rows, "
              f"{stats['bytes']} bytes)")
        return 0

    if args.compact_store:
        from etl_tool_spark.llm.store import compact_store

        try:
            stats = compact_store(spark, args.compact_store)
        except Exception as e:
            print(f"compact-store failed: {e}", file=sys.stderr)
            return 1
        if not stats:
            print(f"no store tables found under {args.compact_store}",
                  file=sys.stderr)
            return 1
        for table, s in sorted(stats.items()):
            print(f"{table}: {s['before']} files -> {s['after']}")
        return 0

    if args.versions or args.vacuum or args.diff or args.restore:
        from etl_tool_spark.streaming.cdc import (list_versions,
                                                  restore_version,
                                                  snapshot_diff, vacuum)

        # bad version NUMBERS are usage errors (exit 2), not runtime ones
        try:
            if args.diff:
                int(args.diff[1]), int(args.diff[2])
            if args.restore:
                int(args.restore[1])
        except ValueError as e:
            print(f"config error: version must be an integer: {e}",
                  file=sys.stderr)
            return 2
        try:
            if args.versions:
                for v in list_versions(spark, args.versions):
                    print(v)
            elif args.vacuum:
                removed = vacuum(spark, args.vacuum,
                                 keep_last=args.keep_last,
                                 min_age_s=args.min_age_s)
                print(f"vacuum: removed {removed} data dir(s), kept last "
                      f"{args.keep_last} version(s)")
            elif args.diff:
                snap, fv, tv = args.diff
                snapshot_diff(spark, snap, int(fv), int(tv)) \
                    .orderBy("change_type").show(1000, truncate=False)
            else:
                snap, v = args.restore
                new_v = restore_version(spark, snap, int(v))
                print(f"restored version {v} as new version {new_v}")
        except Exception as e:
            print(f"snapshot maintenance failed: {e}", file=sys.stderr)
            return 1
        return 0

    if not args.config:
        print("config error: -config is required (or use -profile/-compact/"
              "-versions/-vacuum/-diff/-restore)", file=sys.stderr)
        return 2

    try:
        cfg = load_config(args.config)
    except (OSError, ConfigError) as e:
        print(f"config error: {e}", file=sys.stderr)
        return 2

    if args.input and cfg.source is not None:
        cfg.source.file = args.input
    if args.output and cfg.destination:
        cfg.destination.file = args.output
    if args.fips:
        cfg.fipsMode = True
        # flag arrives after the load-time validation pass — re-validate so
        # e.g. md5-under-FIPS fails as a config error (exit 2), matching
        # the reference's config-time check (validation.go:310-326)
        from etl_tool_spark.plans.config import validate_config

        try:
            validate_config(cfg)
        except ConfigError as e:
            print(f"config error: {e}", file=sys.stderr)
            return 2
    db = args.db or os.environ.get("DB_CREDENTIALS")
    if db:
        for ep in (cfg.source, cfg.destination):
            if ep is not None and ep.type in ("postgres", "jdbc"):
                ep.options.setdefault("url", db)
        logging.info("db connection: %s", mask_credentials(db))

    from etl_tool_spark.plans.pipeline import build_pipeline, run_pipeline

    if args.explain:
        # plan-only path: compile the playbook and print what Catalyst
        # would execute (PushedFilters/ReadSchema/join strategies) —
        # the tuning loop for the 100 TB checklist, no data touched
        try:
            clean, _, _ = build_pipeline(spark, cfg)
        except Exception as e:
            print(f"pipeline failed: {e}", file=sys.stderr)
            return 1
        print(spark._jvm.PythonSQLUtils.explainString(
            clean._jdf.queryExecution(), "formatted"))
        return 0

    try:
        result = run_pipeline(spark, cfg, dry_run=args.dry_run)
    except Exception as e:
        print(f"pipeline failed: {e}", file=sys.stderr)
        return 1
    # the load action already observed the output count — don't re-execute
    # the whole pipeline just to report it
    n = (result.metrics or {}).get("rows_out")
    if n is None:
        n = result.output.count()
    print(f"{'dry-run: would write' if not result.written else 'wrote'} {n} records")
    return 0


if __name__ == "__main__":
    sys.exit(main())
