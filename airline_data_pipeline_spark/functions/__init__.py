"""Column-expression helpers (SURVEY.md §2.7).

Everything here returns `pyspark.sql.Column` built from JVM-side
built-ins — these stay inside whole-stage codegen. No row-at-a-time
Python UDFs live in this package.
"""

from airline_data_pipeline_spark.functions.timefmt import (
    hhmm_delay_minutes,
    hhmm_delay_naive,
    hhmm_to_display,
    hhmm_to_minutes,
)
from airline_data_pipeline_spark.functions.vectors import (
    cosine_from_norms,
    cosine_similarity,
    dot,
    l2_norm,
)

__all__ = [
    "hhmm_delay_minutes",
    "hhmm_delay_naive",
    "hhmm_to_display",
    "hhmm_to_minutes",
    "cosine_from_norms",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
