"""Ship this package to Spark Python workers.

Data-source classes, Pandas-UDF closures, and reducers are cloudpickled BY
REFERENCE: the worker process must be able to ``import eth_event_stream_spark``.
That holds only if the driver happened to run from the repo root. Every entry
point that spawns Python workers calls ``ship_package(spark)`` first — it zips
the package (rebuilt when sources change) and ``addPyFile``s it, which works
for any session including ones we didn't create (the driver harness's).

On a real cluster the same call distributes the package to executors — this
is the deployment story, not a test shim.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED: set[int] = set()  # id(sparkContext) already handled
_BY_VALUE: set[str] = set()  # module names already registered


def _register_by_value() -> None:
    """Make cloudpickle serialize this package's modules BY VALUE.

    addPyFile covers executor task workers, but the streaming data-source
    planner worker (python_streaming_source_runner) unpickles the source
    before any pyFiles are on its path. By-value pickling makes every
    pickled class/closure self-contained — no import needed anywhere.

    Re-scans sys.modules on EVERY call: modules imported after the first
    ship_package (e.g. the data source registered later than the first
    pandas-UDF operator) must still be covered — a one-shot flag would
    silently skip them and reintroduce worker ModuleNotFoundError.
    """
    import sys

    from pyspark import cloudpickle

    for name, mod in list(sys.modules.items()):
        if (
            name.startswith("eth_event_stream_spark")
            and mod is not None
            and name not in _BY_VALUE
        ):
            cloudpickle.register_pickle_by_value(mod)
            _BY_VALUE.add(name)


def ship_package(spark) -> None:
    _register_by_value()  # every call — late-imported modules must register
    sc = spark.sparkContext
    if id(sc) in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(tempfile.gettempdir(), "eth_event_stream_spark_pkg.zip")

    newest = 0.0
    files: list[tuple[str, str]] = []
    for dirpath, _, names in os.walk(pkg_dir):
        for f in names:
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                files.append((full, os.path.relpath(full, root)))
                newest = max(newest, os.path.getmtime(full))

    if not os.path.exists(zpath) or os.path.getmtime(zpath) < newest:
        with zipfile.ZipFile(zpath, "w") as z:
            for full, rel in files:
                z.write(full, rel)

    sc.addPyFile(zpath)
    _SHIPPED.add(id(sc))
