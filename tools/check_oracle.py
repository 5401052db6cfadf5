"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at sf0.01, then compares row count, column names, and
order-insensitive values (columns sorted by name, rows sorted by all
columns, NaN==NaN, timestamps normalized to UTC-naive micros).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from fte.conf import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = df[c]
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def compare(name: str, ours: pd.DataFrame, oracle: pd.DataFrame) -> list[str]:
    errs = []
    if len(ours) != len(oracle):
        errs.append(f"rowcount {len(ours)} != {len(oracle)}")
    if sorted(ours.columns) != sorted(oracle.columns):
        errs.append(f"columns {sorted(ours.columns)} != {sorted(oracle.columns)}")
        return errs
    a, b = normalize(ours), normalize(oracle)
    if len(a) == len(b):
        for c in a.columns:
            x, y = a[c], b[c]
            if pd.api.types.is_float_dtype(x) or pd.api.types.is_float_dtype(y):
                xa = pd.to_numeric(x, errors="coerce").to_numpy(dtype=float)
                ya = pd.to_numeric(y, errors="coerce").to_numpy(dtype=float)
                ok = np.isclose(xa, ya, rtol=1e-9, atol=1e-12, equal_nan=True) | (
                    np.isnan(xa) & np.isnan(ya)
                )
            else:
                ok = (x.astype(str).where(x.notna(), "<NULL>") == y.astype(str).where(y.notna(), "<NULL>")).to_numpy()
            nbad = int((~ok).sum())
            if nbad:
                i = int(np.argmax(~ok))
                errs.append(f"col {c}: {nbad} mismatches, first at row {i}: {x.iloc[i]!r} vs {y.iloc[i]!r}")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-oracle", master="local[8]",
                      extra_confs={"spark.sql.shuffle.partitions": "8", "spark.ui.enabled": "false"})
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ours = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"PASS {name} (rows-only: {len(ours)})")
            continue
        try:
            oracle = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failed.append(name)
            continue
        errs = compare(name, ours, oracle)
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs))
            failed.append(name)
        else:
            print(f"PASS {name} ({len(ours)} rows)")
    print(f"\n{len(qs) - len(failed)}/{len(qs)} pass")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
