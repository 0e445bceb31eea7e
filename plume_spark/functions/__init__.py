"""Scalar-function layer: deterministic IDs, normalization."""

from plume_spark.functions.ids import entity_id_col  # noqa: F401
from plume_spark.functions.textnorm import norm_col, norm_py  # noqa: F401
