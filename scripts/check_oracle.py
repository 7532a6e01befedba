"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB, compare row sets.

Usage: python scripts/check_oracle.py [sf_dir] [name_substring ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from content_rw_elasticsearch_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 4)
            if isinstance(v, list):
                v = tuple(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr), [cols[i] for i in order]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir  # golden-table oracles
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and not any(sub in name for sub in only):
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows, scols = normalize([tuple(r) for r in sdf.collect()], sdf.columns)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {e}")
            failures += 1
            continue
        if name not in osql:
            print(f"ROWS-ONLY {name}: {len(srows)} rows")
            continue
        try:
            res = con.sql(osql[name])
            orows, ocols = normalize(res.fetchall(), res.columns)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {e}")
            failures += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: schema {scols} vs {ocols}")
            failures += 1
        elif srows != orows:
            print(f"FAIL {name}: values differ (spark {len(srows)} rows, oracle {len(orows)} rows)")
            for a, b in list(zip(srows, orows))[:5]:
                if a != b:
                    print(f"   spark={a}  oracle={b}")
            extra_s = [r for r in srows if r not in orows][:3]
            extra_o = [r for r in orows if r not in srows][:3]
            if extra_s:
                print(f"   only-spark: {extra_s}")
            if extra_o:
                print(f"   only-oracle: {extra_o}")
            failures += 1
        else:
            print(f"OK   {name}: {len(srows)} rows")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
