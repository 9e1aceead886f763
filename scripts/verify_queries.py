"""Targeted driver-style oracle check for named queries.

Same compare as scripts/full_sweep.py (vanilla session vs DuckDB) but
for an explicit query list — the per-change equivalence gate of the
optimization rounds.

Usage:
    python scripts/verify_queries.py [--sf-dir DIR] q_name [q_name ...]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    import __spark_entry__ as entry

    qs, osql = entry.queries(), entry.oracle_sql()
    bad = 0
    for name in args.queries:
        try:
            spdf = qs[name](spark, args.sf_dir).toPandas()
            if name not in osql:
                print(f"{name}: rows_only ({len(spdf)})")
                continue
            odf = con.sql(osql[name]).df()
            s = (
                spdf[sorted(spdf.columns)]
                .astype(str)
                .sort_values(by=sorted(spdf.columns))
                .reset_index(drop=True)
            )
            o = (
                odf[sorted(odf.columns)]
                .astype(str)
                .sort_values(by=sorted(odf.columns))
                .reset_index(drop=True)
            )
            if list(s.columns) != list(o.columns):
                print(f"{name}: SCHEMA MISMATCH {list(s.columns)} vs {list(o.columns)}")
                bad += 1
            elif len(s) != len(o):
                print(f"{name}: ROWS MISMATCH {len(s)} vs {len(o)}")
                bad += 1
            elif not s.equals(o):
                diff = (s != o).any(axis=1)
                print(f"{name}: VALUE MISMATCH on {int(diff.sum())}/{len(s)} rows")
                print("  spark:", s[diff].head(3).to_dict("records"))
                print("  oracle:", o[diff].head(3).to_dict("records"))
                bad += 1
            else:
                print(f"{name}: match ({len(s)} rows)")
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            bad += 1
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
