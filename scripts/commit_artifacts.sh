#!/bin/bash
# Commit small run artifacts (JSON/JSONL/CSV/PNG/logs) immediately after
# they land. Motivation: the 2026-08-20 VM reboot destroyed every
# uncommitted artifact from queue A (the flagship's stage-1/2 outputs)
# — results must hit git the moment they exist.
# Usage: bash scripts/commit_artifacts.sh "message" path [path...]
set -u
cd /root/repo
msg="$1"; shift
for p in "$@"; do
  [ -e "$p" ] || continue
  if [ -f "$p" ]; then git add -f -- "$p"; continue; fi
  # -f because Results/ is gitignored wholesale yet holds small evidence
  # files (metrics.jsonl, curves); the big stage tensors live under
  # Dynamics/ and sol_on_shared/, excluded here.
  find "$p" -maxdepth 4 -type f \
    \( -name '*.json' -o -name '*.jsonl' -o -name '*.csv' \
       -o -name '*.png' -o -name '*.log' -o -name '*.txt' \) \
    -not -path '*/Dynamics/*' -not -path '*/sol_on_shared/*' \
    -size -8M -print0 | xargs -0 -r git add -f --
done
# retry around transient index.lock contention with the interactive session
for i in 1 2 3 4 5; do
  out=$(git commit -m "$msg" --no-verify 2>&1) && { echo "$out" | head -2; exit 0; }
  echo "$out" | grep -qi 'nothing to commit' && exit 0
  sleep 7
done
echo "commit_artifacts: giving up: $out"
exit 1
