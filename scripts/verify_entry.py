"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, compares row count, column names, and
sorted values (exact for non-floats; floats must match exactly too,
since both sides round — any diff is reported with magnitude).

Usage: python scripts/verify_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod
from graphscope_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("verify_entry", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"create or replace view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"PASS {name} (rows-only: {len(sdf)} rows, {time.time() - t0:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        s, o = normalize(sdf), normalize(odf)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}")
            failed.append(name)
            continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
            failed.append(name)
            continue
        bad = None
        for c in s.columns:
            sv, ov = s[c].values, o[c].values
            # Driver semantics: values are hashed on their RENDERED
            # form, so int64 17171 vs float64 17171.0 mismatch even
            # when numerically identical (the r01-r04 iceberg_roundtrip
            # red row).  Replicate that: dtype *kind* must agree before
            # any numeric comparison (int/uint treated as one kind).
            sk = "i" if s[c].dtype.kind in "iu" else s[c].dtype.kind
            ok = "i" if o[c].dtype.kind in "iu" else o[c].dtype.kind
            if sk != ok:
                bad = (
                    f"col {c}: dtype kind mismatch {s[c].dtype} vs "
                    f"{o[c].dtype} (driver hashes rendered values — "
                    f"cast the oracle)"
                )
                break
            if s[c].dtype.kind == "f":
                import numpy as np

                both_nan = pd.isna(sv) & pd.isna(ov)
                neq = ~(both_nan | (sv == ov))
                if neq.any():
                    d = float(np.nanmax(np.abs(sv[neq] - ov[neq])))
                    bad = f"col {c}: {int(neq.sum())} diffs, max {d:.3e}"
                    break
            else:
                if not (sv == ov).all():
                    n = int((sv != ov).sum())
                    i = int((sv != ov).argmax())
                    bad = f"col {c}: {n} diffs, e.g. row {i}: {sv[i]!r} vs {ov[i]!r}"
                    break
        if bad:
            print(f"FAIL {name}: {bad}")
            failed.append(name)
        else:
            print(f"PASS {name} ({len(s)} rows, exact, {time.time() - t0:.1f}s)")
    print("----")
    print(f"{len(failed)} failures: {failed}" if failed else "ALL PASS")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
