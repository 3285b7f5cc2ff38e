"""Scalar transform library: Column builders mirroring the reference's
26-function mapping-rule registry (internal/transform/transform.go:49-81),
all expressed with built-in ``pyspark.sql.functions`` — no Python row UDFs.
"""

from etl_tool_spark.functions.coerce import (
    canonical_for_hash,
    coerce_bool,
    coerce_double,
    coerce_long,
    go_to_string,
)
from etl_tool_spark.functions.registry import (
    TRANSFORMS,
    apply_transform,
    build_transform,
)

__all__ = [
    "TRANSFORMS",
    "apply_transform",
    "build_transform",
    "canonical_for_hash",
    "coerce_bool",
    "coerce_double",
    "coerce_long",
    "go_to_string",
]
