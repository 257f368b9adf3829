"""Smoke-execute every examples/ lifecycle script.

The examples compose only registry-tested components, but until round 9
nothing executed the COMPOSITION glue in CI — a regression in how the
stages are wired together (column renames, join keys, argument order)
would have surfaced only manually. Each test runs the script exactly as a
user would (`python examples/<name>.py <sf_dir>`) at the smallest scale
factor in a fresh interpreter, and asserts a clean exit plus the script's
own closing summary line — the "non-empty composed result" signal.

These spawn one Spark JVM per script (the point: the real invocation), so
the module is the slowest in the suite; scripts run sequentially to keep
any bench run in a neighbouring session honest.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# script -> (extra argv, a fragment its main() prints only after the
# composed flow completed — each script's own final-summary line).
# stream_multi runs with --live so the smoke drains the actual streaming
# sink (its closing line only prints on the live path; the batch sync
# summary prints either way).
SCRIPTS = {
    "training_pipeline.py": ([], "training pipeline complete"),
    "incremental_cycle.py": ([], "incremental cycle complete"),
    "release_cycle.py": ([], "release cycle complete"),
    "serving_cycle.py": ([], "serving cycle complete"),
    "warehouse_cycle.py": ([], "warehouse cycle complete"),
    "stream_multi.py": (["--live"], "live drain complete"),
}


@pytest.mark.parametrize("script", sorted(SCRIPTS))
def test_example_script_runs_clean(script):
    extra, marker = SCRIPTS[script]
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), SF_DIR, *extra],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"{script} exited {proc.returncode}\n"
        f"stdout tail:\n{proc.stdout[-2000:]}\n"
        f"stderr tail:\n{proc.stderr[-2000:]}"
    )
    assert marker in proc.stdout, (
        f"{script} finished without its summary line; stdout tail:\n"
        f"{proc.stdout[-2000:]}"
    )
