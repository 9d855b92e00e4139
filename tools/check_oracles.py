"""Simulate the driver's correctness gate locally.

Runs every ``queries()`` entry at the given sf dir, runs the matching
``oracle_sql()`` in DuckDB over the same parquet tables, and compares
row count + schema + an order-insensitive value hash (columns sorted by
name, rows sorted, values hashed).  Usage:

    python tools/check_oracles.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.sha256()
    for col in df.columns:
        s = df[col]
        h.update(col.encode())
        for v in s:
            h.update(repr(v).encode())
    return h.hexdigest()[:16]


def main(sf_dir: str, only: list[str] | None = None) -> int:
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, ignore_reinit_error=True)
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        if name not in oracles:
            # rows-only check (driver's weaker path): no canonicalization —
            # nested struct/list columns need not be sortable/hashable
            try:
                raw = to_pandas(fn(sf_dir))
            except Exception as exc:  # noqa: BLE001
                print(f"FAIL {name}: ray query raised {exc!r}")
                failures += 1
                continue
            print(f"ok?  {name}: rows={len(raw)} (no oracle, rows-only) [{time.time()-t0:.1f}s]")
            continue
        try:
            got = canonical(to_pandas(fn(sf_dir)))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: ray query raised {exc!r}")
            failures += 1
            continue
        dt = time.time() - t0
        try:
            exp = canonical(con.execute(oracles[name]).fetchdf())
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL raised {exc!r}")
            failures += 1
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if list(got.columns) != list(exp.columns):
            problems.append(f"cols {list(got.columns)} != {list(exp.columns)}")
        elif value_hash(got) != value_hash(exp):
            problems.append("value hash mismatch")
            for col in got.columns:
                if len(got) == len(exp) and not got[col].equals(exp[col]):
                    diffs = (got[col] != exp[col]).sum()
                    problems.append(f"  col {col}: {diffs} differing values; "
                                    f"got[:3]={got[col].head(3).tolist()} exp[:3]={exp[col].head(3).tolist()}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"PASS {name}: rows={len(got)} [{dt:.1f}s]")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    raise SystemExit(main(sf, only=sys.argv[2:] or None))
