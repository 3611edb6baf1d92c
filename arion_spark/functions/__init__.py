"""Scalar / analytic function library for large-scale training-data
pipelines over text and embedding columns.  Everything here is built-in
``pyspark.sql.functions`` expressions (JVM, codegen) unless explicitly
noted; all hashing goes through md5 so results are reproducible across
engines (the DuckDB oracle uses the same constructions).
"""
