#!/usr/bin/env python
"""Bless (or re-bless) one sf section of BENCH_SOLO_REF.json — the
committed per-row solo references bench.py's canary drift index divides
against.

    python tools/gen_solo_ref.py <BENCH_DETAIL capture> <sf_key> <label>

e.g. ``python tools/gen_solo_ref.py BENCH_DETAIL.json 0.1 "r16 initial
solo 2026-08-16"``. The capture must be a CLEAN solo run: check its own
canary block (quiet probes) and spot-check the rows against history
before blessing — the whole point of the index is that these numbers
anchor drift attribution (and the per-query 2x criterion) for future
graded captures, so an ambiance-inflated row blessed here poisons every
later reading (the r15 lesson: the final committed r15 sidecar carried
two ~2x ambiance rows). After a deliberate semantic re-base of specific
rows, re-bless from the first clean capture of the new semantics."""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    if len(sys.argv) != 4:
        sys.exit(__doc__)
    capture_path, sf_key, label = sys.argv[1:]
    with open(capture_path) as f:
        capture = json.load(f)
    rows = capture.get("queries")
    if not isinstance(rows, dict) or not rows:
        sys.exit(f"{capture_path} has no per-query 'queries' map")
    if str(capture.get("sf")) != sf_key:
        sys.exit(
            f"refusing: capture sf={capture.get('sf')!r} != blessed key "
            f"{sf_key!r} (pass the matching key, e.g. '1_rehearsal')"
        )
    if "canary_warning" in capture:
        sys.exit(
            "refusing: capture carries a canary_warning — bless only "
            "clean solo runs"
        )
    out_path = os.path.join(REPO, "BENCH_SOLO_REF.json")
    blessed: dict = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            blessed = json.load(f)
    blessed[sf_key] = {"blessed": label, "rows": rows}
    with open(out_path, "w") as f:
        json.dump(blessed, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"blessed {len(rows)} rows for sf {sf_key} -> {out_path}")


if __name__ == "__main__":
    main()
