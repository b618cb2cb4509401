"""Local stand-in for the driver's correctness gate: run every
__spark_entry__ query on Spark and its oracle on DuckDB over the same
sf dir, compare row count, column names, and order-insensitive values.

Usage: python scripts/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from clp_core_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    spark = get_spark("check-entry")
    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = sorted(
                tuple(norm(r[c]) for c in scols) for r in sdf.collect()
            )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(srows)} (no oracle — rows-only)")
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = sorted(d[0] for d in ores.description)
            raw = ores.fetchall()
            names = [d[0] for d in ores.description]
            order = [names.index(c) for c in ocols]
            orows = sorted(tuple(norm(r[i]) for i in order) for r in raw)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns {scols} != {ocols}")
            failures += 1
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rows {len(srows)} != {len(orows)}")
            print(f"  spark[:2]={srows[:2]}\n  duck[:2]={orows[:2]}")
            failures += 1
        elif srows != orows:
            bad = next(
                (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
            )
            print(f"FAIL {name}: value mismatch at sorted row {bad[0]}:")
            print(f"  spark={bad[1]}\n  duck ={bad[2]}")
            failures += 1
        else:
            print(f"ok   {name}: {len(srows)} rows match")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
