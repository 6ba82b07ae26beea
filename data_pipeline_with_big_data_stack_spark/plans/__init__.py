from data_pipeline_with_big_data_stack_spark.plans.sql_shim import druid_sql, rewrite_druid_sql

__all__ = ["rewrite_druid_sql", "druid_sql"]
