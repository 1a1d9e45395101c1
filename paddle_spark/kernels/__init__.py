"""Pure per-document kernels (no Spark imports).

These functions are the single source of truth for extraction semantics:
the pytest golden generator runs them single-process, and the Spark layer
(`paddle_spark.operators.extract_job`) runs the very same code inside
``mapInPandas`` — which is what makes the byte-identical-per-url invariant
hold across partitionings, parallelism levels and re-runs.
"""

from paddle_spark.kernels.classify import classify_payload
from paddle_spark.kernels.extract import ExtractResult, extract_document

__all__ = ["classify_payload", "extract_document", "ExtractResult"]
