"""data_pipeline_with_big_data_stack_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference pipeline
``d4v7d/Data-Pipeline-with-Big-Data-Stack`` (Airflow → Kafka → Druid → Superset) as a single
idiomatic Spark engine: declarative ingestion specs (the Druid datasource
model), a library of source readers, transform/cleanup operators,
aggregation/report ops, a Druid-dialect SQL shim, streaming twins, and
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing).

Everything here is DataFrame/SQL-first: logical plans are declared with the
DataFrame API and Catalyst/Tungsten pick the physical strategy. Pandas UDFs
appear only where built-in operators cannot express the semantics (opaque
binary parsing, embedding math beyond SQL reach).
"""

from data_pipeline_with_big_data_stack_spark.session import get_spark, prepare_session
from data_pipeline_with_big_data_stack_spark.tables import TABLE_NAMES, load_tables, register_views

__all__ = [
    "get_spark",
    "prepare_session",
    "load_tables",
    "register_views",
    "TABLE_NAMES",
]

__version__ = "0.1.0"
