"""Local twin of the driver's correctness gate: run every __spark_entry__
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet tables, compare row count + column set + values.

Usage: python tools/check_contract.py [--json OUT.json] [sf_dir] [query ...]

--json writes the results in the driver CORRECTNESS file schema
({key: {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err}}), so a local sweep can be committed as CORRECTNESS_LOCAL_r{N}.json
and diffed mechanically against the driver's file.  Keys without an
oracle record a rows-only check (oracle_rows/hash_match null).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"]
    if len(sdf) != len(odf):
        errs.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
        return errs
    s, o = normalize(sdf), normalize(odf)
    for c in s.columns:
        sc, oc = s[c], o[c]
        if pd.api.types.is_float_dtype(sc):
            bad = ~(np.isclose(sc, oc.astype(np.float64), atol=1e-9, rtol=0, equal_nan=True))
        else:
            bad = ~((sc == oc) | (sc.isna() & oc.isna()))
        if bad.any():
            i = int(np.flatnonzero(bad)[0])
            errs.append(
                f"col {c}: {int(bad.sum())}/{len(s)} mismatches; first at row {i}: "
                f"spark={sc.iloc[i]!r} oracle={oc.iloc[i]!r}"
            )
    return errs


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod
    from moogle_spark.session import get_spark

    spark = get_spark(app="contract_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        results[name] = rec
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            rec["err"] = f"spark error: {str(e)[:300]}"
            n_fail += 1
            continue
        rec["spark_rows"] = len(sdf)
        if name not in oracles:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            rec.update(rows_match=True, schema_match=True, hash_match=None,
                       oracle_rows=None)
            n_pass += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            rec["err"] = f"oracle error: {str(e)[:300]}"
            n_fail += 1
            continue
        rec["oracle_rows"] = len(odf)
        errs = compare(name, sdf, odf)
        rec["schema_match"] = not any(e.startswith("columns differ") for e in errs)
        rec["rows_match"] = rec["schema_match"] and not any(
            e.startswith("row count differs") for e in errs
        )
        rec["hash_match"] = not errs
        if errs:
            print(f"FAIL {name} ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            for e in errs[:4]:
                print(f"     {e}")
            rec["err"] = "; ".join(errs[:4])
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {json_out} ({len(results)} keys)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
