"""Run every examples/ lifecycle script sequentially in ONE interpreter.

Helper behind tests/test_examples_smoke.py. Each script still executes
through its own ``__main__`` guard with the argv a user would pass
(``runpy.run_path(..., run_name="__main__")``), but all six share one
Python process — and therefore one JVM gateway. Each script's closing
``spark.stop()`` tears down the SparkContext; the next ``get_spark``
starts a new context inside the ALREADY-RUNNING JVM, so the suite pays
JVM boot once instead of six times (the six fresh-JVM invocations were
~40% of the whole suite's wall clock by round 11).

Prints ``SMOKE-DONE <script>`` after each script completes so the test
can attribute a failure and confirm every script actually ran.
"""

from __future__ import annotations

import os
import runpy
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1]
    # "script" or "script:flag1:flag2" entries
    for spec in sys.argv[2:]:
        script, *extra = spec.split(":")
        path = os.path.join(REPO, "examples", script)
        sys.argv = [path, sf_dir, *extra]
        runpy.run_path(path, run_name="__main__")
        print(f"SMOKE-DONE {script}", flush=True)


if __name__ == "__main__":
    main()
