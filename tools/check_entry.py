"""Local emulation of the driver's correctness gate: run each
__spark_entry__.queries() entry on Spark and its oracle_sql() twin on DuckDB
at the same sf dir; compare row count, column names, and order-insensitive
values. Usage: python tools/check_entry.py [sf_dir]."""

from __future__ import annotations

import decimal
import math
import sys
import time

sys.path.insert(0, ".")


def canon(rows, cols, tolerant: bool):
    """tolerant=False emulates the driver's exact-representation value hash:
    values are stringified as-is (so DuckDB HUGEINT->float64 '13917.0' vs
    Spark bigint '13917' is a FAIL, exactly like the driver).  tolerant=True
    is the old numeric-equality compare, used only to label a failure as
    'representation-only' vs 'wrong values'."""
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c]
            if tolerant:
                if isinstance(v, decimal.Decimal):
                    v = float(v)
                if isinstance(v, float):
                    v = "nan" if math.isnan(v) else round(v, 6)
            vals.append((c, str(v)))
        out.append(tuple(vals))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None

    import duckdb

    import __spark_entry__ as entrymod
    from ocr_toolkit_spark.session import get_spark

    spark = get_spark(app_name="check_entry", master="local[8]")

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oq = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()  # driver compares pandas frames
            srows = spdf.to_dict("records")
            scols = list(spdf.columns)
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failed.append(name)
            continue
        dt = time.time() - t0
        if name not in oq:
            print(f"rows  {name}: {len(srows)} rows ({dt:.1f}s) [rows-only]")
            if len(srows) == 0:
                print(f"      WARNING: zero rows")
            continue
        try:
            dpdf = con.sql(oq[name]).df()  # pandas path: HUGEINT -> float64, like the driver
            dcols = list(dpdf.columns)
            drows = dpdf.to_dict("records")
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failed.append(name)
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: cols {sorted(scols)} vs {sorted(dcols)}")
            failed.append(name)
            continue
        a, b = canon(srows, scols, False), canon(drows, dcols, False)
        if len(a) != len(b):
            print(f"FAIL  {name}: rowcount {len(a)} vs {len(b)}")
            failed.append(name)
            continue
        if a != b:
            ta, tb = canon(srows, scols, True), canon(drows, dcols, True)
            kind = "REPR-ONLY (values equal, stringification differs — driver hash WILL fail)" \
                if ta == tb else "VALUE MISMATCH"
            diffs = [(x, y) for x, y in zip(a, b) if x != y]
            print(f"FAIL  {name}: {kind}; {len(diffs)} differing rows; first:")
            print("   spark:", diffs[0][0])
            print("   duck :", diffs[0][1])
            failed.append(name)
            continue
        print(f"OK    {name}: {len(a)} rows match ({dt:.1f}s)")

    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
