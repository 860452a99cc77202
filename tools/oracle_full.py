"""Emit ORACLE_FULL_r{N}.json — the per-query oracle record over the
FULL catalog (the driver's CORRECTNESS gate samples ~50 of the
registered queries; this artifact gives every round a committed record
for the other ~100).

For each entry in ``__ray_entry__.queries()``: run the Ray pipeline at
sf0.01 and, when an ``oracle_sql()`` entry exists, the DuckDB oracle
over the same parquet views; record rows_match / schema_match /
values_match (order-insensitive exact compare, the same canon as
tests/test_queries_oracle.py). SQL-less entries record a rows-only
check, mirroring the driver's weaker gate.

Usage (owns its Ray session — don't run next to another Ray workload):

    python tools/oracle_full.py 4            # round number → filename
    GRAFT_ORACLE_SF=/root/testdata/sf0.001 python tools/oracle_full.py 4
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "x"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    only = os.environ.get("GRAFT_ORACLE_ONLY")
    if only:  # spot-check mode: comma-separated names (no artifact write)
        names = {n.strip() for n in only.split(",") if n.strip()}
        queries = {k: v for k, v in queries.items() if k in names}
    out: dict[str, dict] = {}
    t_all = time.time()
    for name in sorted(queries):
        rec: dict = {"err": None}
        t0 = time.time()
        try:
            ray_df = _to_df(queries[name](SF_DIR))
            rec["ray_rows"] = int(len(ray_df))
            if name in oracles:
                sql_df = con.sql(oracles[name]).df()
                rec["oracle_rows"] = int(len(sql_df))
                rec["rows_match"] = len(ray_df) == len(sql_df)
                rec["schema_match"] = (
                    sorted(ray_df.columns) == sorted(sql_df.columns)
                )
                if rec["rows_match"] and rec["schema_match"]:
                    try:
                        pd.testing.assert_frame_equal(
                            _canon(ray_df), _canon(sql_df),
                            check_dtype=False, check_exact=True,
                        )
                        rec["values_match"] = True
                    except AssertionError as e:
                        rec["values_match"] = False
                        rec["err"] = str(e)[:300]
                else:
                    rec["values_match"] = False
            else:
                rec["mode"] = "rows_only"
                rec["rows_match"] = len(ray_df) > 0
        except Exception as e:  # pragma: no cover - diagnostic artifact
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
            rec["rows_match"] = rec["schema_match"] = False
            rec["values_match"] = False
        rec["sec"] = round(time.time() - t0, 3)
        out[name] = rec
        status = "ok" if rec.get("values_match", rec.get("rows_match")) else "FAIL"
        print(f"{name:32s} {status:4s} {rec['sec']:7.2f}s", file=sys.stderr)

    n_pass = sum(
        1 for r in out.values()
        if r.get("values_match", r.get("rows_match"))
    )
    artifact = {
        "sf": SF_DIR,
        "total": len(out),
        "pass": n_pass,
        "elapsed_sec": round(time.time() - t_all, 1),
        "queries": out,
    }
    if only:
        print(f"{n_pass}/{len(out)} pass (spot-check, no artifact)",
              file=sys.stderr)
    else:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            f"ORACLE_FULL_r{rnd}.json",
        )
        with open(path, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"{n_pass}/{len(out)} pass → {path}", file=sys.stderr)
    ray.shutdown()


if __name__ == "__main__":
    main()
