"""Measure read_meta's per-field regex extraction vs a staged
single-pass marker parse (one regexp_extract_all of all markers into
array<struct<k,v>>, then per-field array filters).

NEGATIVE RESULT (2026-08-17, local[8], 2M rows × 8 fields): the staged
form is ~12× SLOWER (17.1 s vs 1.4 s).  transform/filter lambdas are
evaluated INTERPRETED per array element, while the per-field
regexp_extract stays inside whole-stage codegen — Java regex is not
the bottleneck, interpreted higher-order lambdas are.  extract()
therefore keeps the per-field form; the staged variant lives only
here, as the reproducible measurement.

Usage: python tools/bench_readmeta.py [n_rows]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import Column, functions as F

sys.path.insert(0, ".")
from arion_spark import get_spark  # noqa: E402
from arion_spark.operators import meta_fields as MF  # noqa: E402
from arion_spark.operators import read_meta as RM  # noqa: E402


# -- the rejected staged variant (kept for reproducibility) -----------------

def _marker_entries(text: Column) -> Column:
    ms = F.regexp_extract_all(text, F.lit(r"\[(\w+:[^\]]*)\]"), F.lit(1))
    return F.transform(
        ms,
        lambda m: F.struct(
            F.substring_index(m, ":", 1).alias("k"),
            F.trim(F.substr(m, F.locate(":", m) + 1, F.length(m))).alias("v"),
        ),
    )


def _entry_scalar(entries: Column, name: str) -> Column:
    return F.nullif(
        F.coalesce(
            F.try_element_at(
                F.filter(entries, lambda e: e.getField("k") == name), F.lit(1)
            ).getField("v"),
            F.lit(""),
        ),
        F.lit(""),
    )


def _entry_array(entries: Column, name: str) -> Column:
    return F.transform(
        F.filter(entries, lambda e: e.getField("k") == name),
        lambda e: e.getField("v"),
    )


def main(n_rows: int = 2_000_000) -> None:
    spark = get_spark("bench_readmeta", cpus=8)
    df = (
        spark.range(n_rows)
        .select(
            F.concat(
                F.lit("caption words here, keyword one, keyword two "
                      "[copyright: acme "),
                F.col("id").cast("string"),
                F.lit("] [city: Berlin] [province_state: BE] "
                      "[country_name: Germany] [country_code: DE] "
                      "[special_instructions: none] [subject: s1] "
                      "[subject: s2] [byline: author one] filler filler "
                      "filler model released (mr)"),
            ).alias("text")
        )
        .persist()
    )
    df.count()  # materialize input out of the timed region

    def staged():
        entries = _marker_entries(F.col("text"))
        cols = {n: _entry_scalar(entries, n) for n in MF.READ_SCALARS}
        cols |= {n: _entry_array(entries, n) for n in MF.READ_ARRAYS}
        return df.withColumns(cols)

    def per_field():
        cols = {n: RM.named_scalar(F.col("text"), n) for n in MF.READ_SCALARS}
        cols |= {n: RM.named_array(F.col("text"), n) for n in MF.READ_ARRAYS}
        return df.withColumns(cols)

    def run(mk):
        best = float("inf")
        for _ in range(3):
            # fresh DataFrame per iteration: re-collecting the SAME DF
            # object reuses AQE's materialized shuffle stages and times
            # almost nothing
            out = mk()
            # consume EVERY extracted field (hash them all) so column
            # pruning can't drop any extraction expression
            fields = list(MF.READ_SCALARS) + [
                F.concat_ws("|", F.col(n)).alias(n) for n in MF.READ_ARRAYS
            ]
            agg = out.select(
                F.bit_xor(F.xxhash64(*fields)).alias("h"), F.count("copyright")
            )
            t = time.time()
            agg.collect()
            best = min(best, time.time() - t)
        return best

    t_per_field = run(per_field)
    t_staged = run(staged)
    print(json.dumps({
        "n_rows": n_rows,
        "per_field_8pass_sec": round(t_per_field, 3),
        "staged_1pass_sec": round(t_staged, 3),
        "per_field_speedup_over_staged": round(t_staged / t_per_field, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000)
