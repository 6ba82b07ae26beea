"""Worker-shipping helper.

Functions sent to executors (pandas UDFs, ``mapInPandas`` parsers,
``applyInPandasWithState`` state machines) are pickled BY REFERENCE when
they live at module scope — the Python worker then needs this package on
its own ``sys.path``, which holds in our pytest env but not when an
external driver (the correctness harness, a spark-submit without
``--py-files``) imports the engine from a path executors don't share.

Registering the defining module for by-value pickling makes every
worker-side function self-contained in the serialized task — no executor
import of this package is ever required. Modules that define worker-side
functions call ``pickle_by_value(__name__)`` at import time.
"""

from __future__ import annotations

import sys


def pickle_by_value(module_name: str) -> None:
    try:
        from pyspark import cloudpickle
    except ImportError:  # pragma: no cover - ancient pyspark layout
        import cloudpickle  # type: ignore
    mod = sys.modules.get(module_name)
    if mod is not None:
        cloudpickle.register_pickle_by_value(mod)
