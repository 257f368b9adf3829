"""Smoke-execute every examples/ lifecycle script.

The examples compose only registry-tested components, but until round 9
nothing executed the COMPOSITION glue in CI — a regression in how the
stages are wired together (column renames, join keys, argument order)
would have surfaced only manually. Each script runs through its own
``__main__`` guard with the argv a user would pass, at the smallest
scale factor, and must print its closing summary line — the "non-empty
composed result" signal.

Through round 11 each script spawned its own Spark JVM (6 boots, ~40% of
the whole suite's wall clock). Since round 12 all six run sequentially in
ONE fresh interpreter (tests/_run_examples.py): each script still calls
``get_spark`` and ``spark.stop()`` itself, but the stops only tear down
the SparkContext — the JVM gateway persists, so boot is paid once. Full
coverage is unchanged: same scripts, same argv, same summary-line
assertions, plus a per-script SMOKE-DONE sentinel proving each completed.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

# Whole-file smoke drive: every example script in its own subprocess JVM
# (~3.5 min) — slow tier (conftest), run with SPARK_GRAFT_FULL_TESTS=1.
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# script -> (extra argv, a fragment its main() prints only after the
# composed flow completed — each script's own final-summary line).
# stream_multi runs with --live so the smoke drains the actual streaming
# sink (its closing line only prints on the live path; the batch sync
# summary prints either way). It runs LAST so any streaming teardown
# residue cannot leak into a batch script's session.
SCRIPTS = {
    "training_pipeline.py": ([], "training pipeline complete"),
    "incremental_cycle.py": ([], "incremental cycle complete"),
    "release_cycle.py": ([], "release cycle complete"),
    "serving_cycle.py": ([], "serving cycle complete"),
    "warehouse_cycle.py": ([], "warehouse cycle complete"),
    "crawl_cycle.py": ([], "crawl cycle complete"),
    "stream_multi.py": (["--live"], "live drain complete"),
}
_ORDER = [
    "training_pipeline.py",
    "incremental_cycle.py",
    "release_cycle.py",
    "serving_cycle.py",
    "warehouse_cycle.py",
    "crawl_cycle.py",
    "stream_multi.py",
]


def test_every_example_script_runs_clean_in_one_jvm():
    assert sorted(_ORDER) == sorted(SCRIPTS)
    specs = [
        ":".join([name, *SCRIPTS[name][0]]) for name in _ORDER
    ]
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tests", "_run_examples.py"),
            SF_DIR,
            *specs,
        ],
        capture_output=True,
        text=True,
        timeout=1500,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"examples runner exited {proc.returncode}\n"
        f"stdout tail:\n{proc.stdout[-3000:]}\n"
        f"stderr tail:\n{proc.stderr[-3000:]}"
    )
    for name in _ORDER:
        _, marker = SCRIPTS[name]
        assert f"SMOKE-DONE {name}" in proc.stdout, (
            f"{name} did not complete; stdout tail:\n{proc.stdout[-3000:]}"
        )
        assert marker in proc.stdout, (
            f"{name} finished without its summary line; stdout tail:\n"
            f"{proc.stdout[-3000:]}"
        )
