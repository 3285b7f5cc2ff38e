"""Local stand-in for the driver's t2 correctness gate: run every
catalog query on Spark and its oracle on DuckDB, compare row count +
column names + order-insensitive value hash. Usage:

    python scripts/check_oracle.py [sf_dir] [name_filter...]

Round-4 hardening: the round-3 driver report had 8 red rows that this
script's previous revision could not reproduce — DuckDB returns HUGEINT
for sum() over integer columns, and the driver's pandas-based
canonicalizer renders that as float ("150.0") against Spark's BIGINT
("150"); one query returned an array column pandas cannot factorize at
all. This revision reproduces the driver's view of the data:

* BOTH sides go through pandas the way the driver sees them: the oracle
  via ``fetchdf()`` (HUGEINT and NULL-padded integer columns surface as
  float64) and Spark via ``toPandas()`` (NULL-padded integer columns
  also become float64 — which is why a nullable-int query like
  etl_coerce_loose is driver-green while a HUGEINT sum is driver-red:
  only the latter drifts on one side);
* cell rendering keeps the int/float distinction (``150`` vs ``150.0``)
  instead of stripping trailing ``.0``;
* any complex-typed output column (ArrayType/MapType/StructType on the
  Spark side, list/dict/ndarray cells on either side) is a hard FAIL —
  the driver's canonicalizer crashes on them, so no gate query may emit
  one.
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    """Render one cell the way a pandas-based canonicalizer distinguishes
    values: ints and floats are DIFFERENT renderings (the driver's hash
    treats 150 != 150.0), Decimals collapse to the float rendering (all
    driver-green decimal queries hash-match, so the driver's canon and
    DuckDB's float64 coincide), complex cells raise."""
    import datetime
    import decimal
    import math

    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "<NULL>"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v)).lower()
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return _float_repr(float(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "<NULL>"
        return _float_repr(f)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple, dict, set)) or type(v).__name__ == "ndarray":
        raise TypeError(f"complex cell {type(v).__name__} is not driver-hashable")
    return str(v)


def _float_repr(f: float) -> str:
    # repr keeps the trailing .0 (150.0 stays "150.0" — the driver-visible
    # difference from BIGINT "150"); round to 6 significant decimals the
    # way the old gate did so float noise doesn't flip hashes
    if f == int(f) and abs(f) < 1e15:
        return f"{f:.1f}"
    return f"{f:.6f}".rstrip("0").rstrip(".")


def frame_lines(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)


def frame_hash(lines):
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


COMPLEX_TYPES = ("ArrayType", "MapType", "StructType")


def main():
    args = sys.argv[1:]
    window = "--window" in args
    if window:
        args.remove("--window")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    filters = args[1:]

    from etl_tool_spark.catalog import ORACLE, SPARK
    from etl_tool_spark.session import get_spark

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    if window:
        # exactly what the driver will sample next round: the first 50
        # entries of __spark_entry__.queries() under the current
        # CORRECTNESS_r*.json reports on disk
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "entry_for_window",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "__spark_entry__.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        names = list(mod.queries())[:50]
        print(f"# driver window replay: {len(names)} queries")
    else:
        names = [n for n in SPARK if not filters or any(f in n for f in filters)]
    ok = bad = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = SPARK[name](spark, sf_dir)
            complex_cols = [f.name for f in sdf.schema.fields
                            if type(f.dataType).__name__ in COMPLEX_TYPES]
            if complex_cols:
                print(f"FAIL {name}: complex-typed output column(s) "
                      f"{complex_cols} — driver canonicalizer cannot hash them")
                bad += 1
                continue
            # toPandas(), NOT collect(): the driver canonicalizes the
            # Spark result through pandas too, so a NULL-padded BIGINT
            # column must surface as float64 here exactly as it does
            # there (collect() would keep Python ints and flag green
            # queries as red)
            spdf = sdf.toPandas()
            scols = list(spdf.columns)
            srows = list(spdf.itertuples(index=False, name=None))
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:200]}")
            bad += 1
            continue
        if name not in ORACLE:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s) [no oracle]")
            ok += 1
            continue
        try:
            # fetchdf(), NOT fetchall(): the driver canonicalizes through
            # pandas, where DuckDB HUGEINT (integer sum()) and NULL-padded
            # integer columns surface as float64 — fetchall() hides that.
            odf = con.sql(ORACLE[name]).fetchdf()
            ocols = [c.lower() for c in odf.columns]
            orows = list(odf.itertuples(index=False, name=None))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            bad += 1
            continue
        problems = []
        if sorted(c.lower() for c in scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            try:
                ls = frame_lines([c.lower() for c in scols], srows)
                lo = frame_lines(ocols, orows)
            except TypeError as e:
                problems.append(f"unhashable cell: {e}")
                ls = lo = []
            if not problems and frame_hash(ls) != frame_hash(lo):
                problems.append("value hash mismatch")
                for a, b in zip(ls, lo):
                    if a != b:
                        problems.append(f"  spark : {a[:160]}")
                        problems.append(f"  oracle: {b[:160]}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print("      " + p)
            bad += 1
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            ok += 1
    print(f"\n{ok} ok, {bad} failing")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
