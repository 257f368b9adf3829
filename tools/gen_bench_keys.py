#!/usr/bin/env python
"""Regenerate BENCH_KEYS.json: the short->full query-name mapping used by
bench.py's archived stdout line. Run after adding/removing HEADLINE rows or
split-stage rows (EXTRA_ROWS); tests/test_bench_record.py fails if the
committed file drifts from the code."""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import EXTRA_ROWS, HEADLINE, build_short_map  # noqa: E402


def main() -> None:
    mapping = build_short_map(HEADLINE + EXTRA_ROWS)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_KEYS.json",
    )
    with open(out, "w") as f:
        json.dump(mapping, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(mapping)} keys to {out}")


if __name__ == "__main__":
    main()
