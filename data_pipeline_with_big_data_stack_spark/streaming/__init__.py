"""Structured Streaming surface: streaming twins of every batch ingest
path (SURVEY §2.9), window operators, and custom stateful operators."""

from data_pipeline_with_big_data_stack_spark.streaming.runner import (  # noqa: F401
    json_dir_stream,
    rate_stream,
    run_available_now,
    run_to_parquet_available_now,
)
from data_pipeline_with_big_data_stack_spark.streaming.stateful import (  # noqa: F401
    ROCKSDB_CONF,
    ensure_tws_runtime,
    running_totals,
    stream_frequent_items,
    threshold_alerts,
    user_profile_stats,
)
from data_pipeline_with_big_data_stack_spark.streaming.windows import (  # noqa: F401
    session_agg,
    sliding_agg,
    stream_dedup,
    tumbling_agg,
)
