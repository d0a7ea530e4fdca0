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


def canon(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c]
            if isinstance(v, decimal.Decimal):
                v = float(v)
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 6)
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
            srows = [r.asDict() for r in sdf.collect()]
            scols = sdf.columns
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
            drel = con.sql(oq[name])
            dcols = drel.columns
            drows = [dict(zip(dcols, row)) for row in drel.fetchall()]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failed.append(name)
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: cols {sorted(scols)} vs {sorted(dcols)}")
            failed.append(name)
            continue
        a, b = canon(srows, scols), canon(drows, dcols)
        if len(a) != len(b):
            print(f"FAIL  {name}: rowcount {len(a)} vs {len(b)}")
            failed.append(name)
            continue
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y]
            print(f"FAIL  {name}: {len(diffs)} differing rows; first: ")
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
