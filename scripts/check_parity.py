"""Local mirror of the driver's correctness gate.

Runs every ``queries()[name](sf_dir)`` and compares it against
``oracle_sql()[name]`` via DuckDB: row count, column-name set, and an
order-insensitive value hash over columns sorted by name. Usage:

    python scripts/check_parity.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = np.round(df[c].astype(np.float64), 9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64", errors="ignore") if df[c].dtype != np.uint64 else df[c]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.sha256()
    for c in df.columns:
        h.update(c.encode())
        h.update(pd.util.hash_pandas_object(df[c], index=False).values.tobytes())
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, sqls = e.queries(), e.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL  {name}: ray side raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        wall = time.monotonic() - t0
        if name not in sqls:
            from docinsight_ray.pyoracle import PY_ORACLES

            chk = PY_ORACLES.get(name)
            if chk is None:
                print(f"ROWS  {name}: {len(mine)} rows (no oracle) [{wall:.1f}s]")
                continue
            try:
                ok, msg = chk(sf_dir, mine)
            except Exception as ex:
                print(f"FAIL  {name}: py-oracle raised {type(ex).__name__}: {ex}")
                n_fail += 1
                continue
            if ok:
                print(f"OK    {name}: py-oracle — {msg} [{wall:.1f}s]")
            else:
                print(f"FAIL  {name}: py-oracle — {msg} [{wall:.1f}s]")
                n_fail += 1
            continue
        try:
            ref = canon(con.sql(sqls[name]).df())
        except Exception as ex:
            print(f"FAIL  {name}: oracle SQL raised {ex}")
            n_fail += 1
            continue
        problems = []
        if len(mine) != len(ref):
            problems.append(f"rows {len(mine)} != {len(ref)}")
        if list(mine.columns) != list(ref.columns):
            problems.append(f"cols {list(mine.columns)} != {list(ref.columns)}")
        if not problems and value_hash(mine) != value_hash(ref):
            neq = (mine != ref) & ~(mine.isna() & ref.isna())
            bad_cols = [c for c in mine.columns if neq[c].any()]
            detail = []
            for c in bad_cols[:3]:
                i = int(neq[c].to_numpy().argmax())
                detail.append(f"{c}[{i}]: {mine[c].iloc[i]!r} != {ref[c].iloc[i]!r}")
            problems.append(f"value hash; diff cols {bad_cols[:5]} e.g. {detail}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{wall:.1f}s]")
            n_fail += 1
        else:
            print(f"OK    {name}: {len(mine)} rows match [{wall:.1f}s]")
    ray.shutdown()
    print("FAILURES:", n_fail)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
