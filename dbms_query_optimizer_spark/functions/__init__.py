"""Reusable Column-level helpers, all built on ``pyspark.sql.functions``
(JVM-side, whole-stage-codegen-able). No Python UDFs live here.
"""

from .numeric import dec, dsum_double, davg_double, disc_price_expr, charge_expr

__all__ = [
    "dec",
    "dsum_double",
    "davg_double",
    "disc_price_expr",
    "charge_expr",
]
