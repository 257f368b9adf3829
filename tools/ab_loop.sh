#!/bin/bash
# Steal-gated alternating A/B: runs time_rows.py from the AFTER tree
# (/root/repo, working copy) and the BEFORE tree (/tmp/repo_before,
# pinned git worktree) in alternating order, tagging each capture.
# Usage: tools/ab_loop.sh <iterations> <sf_dir> <row> [<row> ...]
# Output lines: "<tag> <json>" appended to stdout; judge captures by
# their steal_pct_of_best field afterwards.
set -u
ITERS=$1; SF=$2; shift 2
for i in $(seq 1 "$ITERS"); do
  if [ $((i % 2)) -eq 1 ]; then ORDER="A B"; else ORDER="B A"; fi
  for side in $ORDER; do
    if [ "$side" = A ]; then d=/root/repo; else d=/tmp/repo_before; fi
    out=$(cd "$d" && SPARK_GRAFT_SF_DIR="$SF" python tools/time_rows.py -n 2 "$@" 2>/dev/null | tail -1)
    echo "$side $out"
  done
done
