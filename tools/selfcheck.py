"""Local simulation of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet (default sf0.01),
then compares row count, column names/dtypes, and cell values
(column-name-sorted, row-sorted, exact after the queries' own rounding).

Usage: python tools/selfcheck.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(df[c]) or str(df[c].dtype).startswith("UInt"):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from pg_textsearch_spark.spark_utils import get_spark

    spark = get_spark("selfcheck", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        sql = os_.get(name)
        if sql is None:
            print(f"skip  {name}: no oracle ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {str(e)[:300]}")
            continue
        a, b = normalize(sdf), normalize(odf)
        status = []
        if len(a) != len(b):
            status.append(f"rowcount {len(a)} vs {len(b)}")
        if list(a.columns) != list(b.columns):
            status.append(f"cols {list(a.columns)} vs {list(b.columns)}")
        if not status:
            if not a.equals(b):
                neq = (a != b) & ~(a.isna() & b.isna())
                bad_cols = [c for c in a.columns if neq[c].any()]
                # tolerate <=1e-9 float residue already rounded away
                status.append(f"values differ in {bad_cols}")
                for c in bad_cols[:2]:
                    i = int(np.argmax(neq[c].to_numpy()))
                    status.append(f"  {c}[{i}]: {a[c][i]!r} vs {b[c][i]!r}")
        if status:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(status))
        else:
            print(f"ok    {name}: {len(a)} rows  {time.time()-t0:.1f}s")
    print("\n%d/%d passed" % (len(qs if not only else only) - len(failures),
                              len(qs if not only else only)))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
