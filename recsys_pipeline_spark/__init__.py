"""recsys_pipeline_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of akiragy/recsys_pipeline.

Everything here is expressed Spark-first: lazy DataFrame DAGs, Catalyst-optimized
joins/windows/aggregations, MLlib for model training, Structured Streaming for
incremental paths. No code is ported from the reference (a pandas/Redis/ES/Triton
pipeline); only its *semantics* are reproduced — see SURVEY.md for the mapping.
"""

__version__ = "0.1.0"

from recsys_pipeline_spark.session import get_spark  # noqa: F401
