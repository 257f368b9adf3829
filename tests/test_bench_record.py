"""The archived bench record must survive the driver's stdout capture.

The driver archives the LAST 2000 characters of bench.py's stdout and
attempts a JSON parse; the r7 and r8 records were both cut mid-tail and
permanently lost ~15 per-query rows each. These tests pin the contract
that fixes it: the emitted line (short query keys, compact separators)
stays under the capture window even at worst-case value widths, the
short-key map is bijective, and the committed BENCH_KEYS.json expansion
file never drifts from the code that generates the keys.

No Spark session: bench.py is imported for its static tables only.
"""

from __future__ import annotations

import json
import os

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALL_ROWS = bench.HEADLINE + bench.EXTRA_ROWS


def test_short_map_is_bijective_and_total():
    m = bench.build_short_map(ALL_ROWS)
    assert len(m) == len(ALL_ROWS)  # no short key swallowed another row
    assert sorted(m.values()) == sorted(ALL_ROWS)
    assert len(set(ALL_ROWS)) == len(ALL_ROWS)  # and no duplicate full name


def test_archived_line_fits_driver_tail_capture():
    """Worst-case emitted line (every value at 4-digit seconds with 3
    decimals) must fit the 2000-char tail with headroom — the exact
    archived form is re-parseable, rows intact."""
    m = bench.build_short_map(ALL_ROWS)
    compact = {k: 9999.999 for k in m}
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": 99999.999,
            "unit": "sec",
            "headline_set": "r9-extended",
            "n_queries": len(compact),
            "keys": "BENCH_KEYS.json",
            "queries": compact,
            "sf": 0.1,
        },
        separators=(",", ":"),
    )
    assert len(line) < 1900, len(line)
    # emulate the driver: keep only the last 2000 chars, then parse
    parsed = json.loads(line[-2000:])
    assert len(parsed["queries"]) == len(ALL_ROWS)


def test_bench_keys_file_matches_code():
    with open(os.path.join(REPO, "BENCH_KEYS.json")) as f:
        on_disk = json.load(f)
    assert on_disk == bench.build_short_map(ALL_ROWS), (
        "BENCH_KEYS.json drifted — rerun tools/gen_bench_keys.py"
    )


def test_extra_rows_match_split_helpers():
    """EXTRA_ROWS must list exactly the timing keys the time_* split
    helpers write, or the short map misses rows at runtime."""
    import inspect

    src = "".join(
        inspect.getsource(fn)
        for fn in (
            bench.time_ivf_split,
            bench.time_pq_split,
            bench.time_ann_split,
            bench.time_prepare_corpus_split,
            bench.time_incremental_split,
            bench.time_cc_split,
        )
    )
    for row in bench.EXTRA_ROWS:
        assert f'"{row}"' in src, row
