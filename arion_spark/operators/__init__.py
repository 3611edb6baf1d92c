"""Operator library: each operator is a function ``DataFrame -> DataFrame``
(plus optional side-output writes), composed in spec order by the pipeline
compiler — the Spark analog of the reference's ``Operation`` base class
chain (reference: src/models/operation.hpp:56-94, src/arion.cpp:541-601).
"""

from arion_spark.operators import read_meta, normalize, fingerprint, copy  # noqa: F401
