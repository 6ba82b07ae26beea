"""Worker-process shim for transformWithState's protobuf dependency.

Spark's transformWithStateInPandas driver worker speaks a protobuf
protocol to the JVM state server (pyspark/sql/streaming/proto/*_pb2).
When the interpreter has no ``google.protobuf`` installed, the engine
points the worker's PYTHONPATH at this directory plus a vendored
protobuf location via ``SPARK_GRAFT_TWS_PROTOBUF`` (see
``streaming/stateful.py::ensure_tws_runtime``). The ``site`` module
imports this file at worker startup; it appends the vendored path
(never shadowing a real install) and makes the generated-code version
check lenient, since a slightly older runtime is wire-compatible.
"""

import os

_vendor = os.environ.get("SPARK_GRAFT_TWS_PROTOBUF")
if _vendor:
    import sys

    if _vendor not in sys.path:
        sys.path.append(_vendor)  # append: never shadow a real protobuf
    try:
        from google.protobuf import runtime_version as _rv

        _orig = _rv.ValidateProtobufRuntimeVersion

        def _lenient(*a, **k):
            try:
                _orig(*a, **k)
            except Exception:
                pass

        _rv.ValidateProtobufRuntimeVersion = _lenient
    except Exception:
        pass
