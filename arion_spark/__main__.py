"""One-shot CLI: ``python -m arion_spark --input '<json>'``.

Mirrors the reference's process contract (reference: src/main.cpp:75-132):

* ``--version``           → ``{"version": "..."}`` on stdout, exit 0
* ``--input '<json>'``    → parse spec → run batch chain → result JSON on
  stdout; exit 0 when ``result`` is true, non-zero otherwise (the
  reference's ``exit(-1)``)
* setup failure           → structured error document on stdout
  (reference: constructErrorJson, src/arion.cpp:842-864), non-zero exit
* missing ``--input``     → usage on stderr, exit 1
* ``input`` also accepted positionally, like the reference's positional
  option (src/main.cpp:77-78)

The result document transposes the per-image doc (src/arion.cpp:750-834)
to the table domain: per-op ``info[]`` is aggregated over rows
(``result`` = op succeeded on every row, ``failed_rows`` = count), and
``height``/``width`` become ``rows`` processed.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_result_doc(out_df) -> dict:
    """Aggregate the per-row result columns into one JSON document."""
    from pyspark.sql import functions as F

    first = out_df.select(F.col("total_operations")).first()
    total_ops = first["total_operations"] if first else 0
    aggs = [F.count(F.lit(1)).alias("rows")]
    for i in range(total_ops):
        aggs.append(
            F.sum(
                F.when(F.col("info")[i]["result"], F.lit(0)).otherwise(F.lit(1))
            ).alias(f"_failed_{i}")
        )
        aggs.append(F.first(F.col("info")[i]["type"]).alias(f"_type_{i}"))
    row = out_df.agg(*aggs).first()
    info = []
    failed_ops = 0
    for i in range(total_ops):
        failed_rows = int(row[f"_failed_{i}"] or 0)
        failed_ops += 1 if failed_rows else 0
        info.append(
            {
                "type": row[f"_type_{i}"],
                "result": failed_rows == 0,
                "failed_rows": failed_rows,
            }
        )
    return {
        "rows": int(row["rows"]),
        "info": info,
        "total_operations": int(total_ops),
        "failed_operations": failed_ops,
        "result": failed_ops == 0,
    }


def main(argv: list[str] | None = None) -> int:
    from arion_spark import __version__

    parser = argparse.ArgumentParser(
        prog="arion_spark", description=f"arion_spark v{__version__}", add_help=True
    )
    parser.add_argument("--version", action="store_true", help="Print version")
    parser.add_argument(
        "--input", dest="input_json", help="The input operations to execute in JSON"
    )
    parser.add_argument(
        "input", nargs="?", help="Positional alias for --input (reference parity)"
    )
    parser.add_argument(
        "--cpus", type=int, default=8, help="local[] parallelism (default 8)"
    )
    args = parser.parse_args(argv)

    if args.version:
        print(json.dumps({"version": __version__}))
        return 0

    input_json = args.input_json or args.input
    if not input_json:
        print("You must provide the input operations to execute\n", file=sys.stderr)
        parser.print_help(sys.stderr)
        return 1

    from arion_spark import SpecError, compile_pipeline, get_spark
    from arion_spark.plans.compiler import error_doc

    try:
        pipeline = compile_pipeline(input_json)
    except SpecError as e:
        print(error_doc(e))
        return 2  # setup failure (reference: exit(-1) after setup)

    spark = get_spark("arion_cli", cpus=args.cpus)
    try:
        out = pipeline.run(spark)
        doc = build_result_doc(out)
    except Exception as e:  # run-time failure → error doc, not a crash
        print(error_doc(e))
        return 2
    finally:
        spark.stop()
    print(json.dumps(doc))
    return 0 if doc["result"] else 2


if __name__ == "__main__":
    sys.exit(main())
