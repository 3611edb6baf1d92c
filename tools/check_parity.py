"""Dev harness replicating the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at a given sf,
compare row count + schema-ish + order-insensitive value hash.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, ".")


def value_hash(pdf) -> str:
    pdf = pdf[sorted(pdf.columns)]
    # canonicalize: round-trip floats via repr of rounded values
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return hashlib.md5(pdf.astype(str).to_csv(index=False).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from arion_spark import get_spark

    spark = get_spark("parity", cpus=8)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(sdf)} rows")
            if len(sdf) == 0:
                print(f"      WARN: zero rows")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            failures.append(name)
            continue
        ok_rows = len(sdf) == len(ddf)
        ok_cols = sorted(sdf.columns) == sorted(ddf.columns)
        ok_hash = ok_rows and ok_cols and value_hash(sdf) == value_hash(ddf)
        status = "ok  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(
            f"{status} {name}: rows {len(sdf)}/{len(ddf)} cols_match={ok_cols} hash_match={ok_hash}"
        )
        if status == "FAIL":
            failures.append(name)
            if ok_cols and ok_rows:
                s = sdf[sorted(sdf.columns)].sort_values(by=sorted(sdf.columns)).reset_index(drop=True)
                d = ddf[sorted(ddf.columns)].sort_values(by=sorted(ddf.columns)).reset_index(drop=True)
                neq = (s.astype(str) != d.astype(str)).any(axis=1)
                print("      first diffs (spark vs duckdb):")
                print(s[neq].head(3).to_string())
                print(d[neq].head(3).to_string())
            elif not ok_cols:
                print(f"      spark cols:  {sorted(sdf.columns)}")
                print(f"      duckdb cols: {sorted(ddf.columns)}")
    spark.stop()
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
