"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet tables; compare row counts, column names, and
order-insensitive value hashes.

Usage: python tools/check_oracles.py [sf_dir] [only_query_name]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if df[col].dtype == object:
            df[col] = df[col].astype(str)
        elif str(df[col].dtype).startswith("float"):
            df[col] = df[col].round(9)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else None

    import __spark_entry__ as entrymod
    from frontier.spark.session import get_spark

    spark = get_spark(app="oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name != only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error {exc}")
            continue
        if name not in os_:
            print(f"rows  {name}: {len(got)} rows (no oracle, rows-only)")
            continue
        try:
            want = con.execute(os_[name]).df()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {exc}")
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(g.columns)} vs "
                  f"{list(w.columns)}")
            continue
        if len(g) != len(w):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(g)} vs {len(w)}")
            continue
        gh = pd.util.hash_pandas_object(g.astype(str), index=False).sum()
        wh = pd.util.hash_pandas_object(w.astype(str), index=False).sum()
        if gh != wh:
            failures.append(name)
            diff = g.compare(w) if g.shape == w.shape else None
            print(f"FAIL  {name}: value hash mismatch")
            if diff is not None and not diff.empty:
                print(diff.head(5))
        else:
            print(f"OK    {name}: {len(g)} rows")
    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match their oracles")


if __name__ == "__main__":
    main()
