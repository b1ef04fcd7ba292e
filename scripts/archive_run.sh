#!/bin/bash
# Archive a run directory's SMALL artifacts into the tracked artifacts/
# tree so they survive environment resets between rounds (the runs/
# directory is gitignored and was wiped between rounds 3 and 4, taking
# the flagship eval_report and epoch CSVs with it — the judge's round-3
# evidence had to be regenerated from scratch).
#
# Copies: config + metadata (JSON), epoch CSVs, metrics JSONL, eval
# reports, prototype reports, gallery PNGs under a size cap (at most
# MAX_PNGS=40 per run, smallest-node galleries first, so a 2,500-PNG
# sweep doesn't swamp the git tree).
# Excludes: checkpoints (hundreds of MB of orbax state), traces.
#
# Usage: scripts/archive_run.sh runs/<name> [more runs...]
set -e
MAX_PNGS=${MAX_PNGS:-40}
for RUN in "$@"; do
  NAME=$(basename "$RUN")
  DEST="artifacts/$NAME"
  mkdir -p "$DEST"
  # metadata + reports (small JSON/CSV/txt)
  (cd "$RUN" && find . \
      -path ./checkpoints -prune -o -path ./traces -prune -o \
      -type f \( -name '*.json' -o -name '*.csv' -o -name '*.jsonl' \
                 -o -name '*.txt' -o -name '*.yaml' \) -print0) |
  while IFS= read -r -d '' f; do
    mkdir -p "$DEST/$(dirname "$f")"
    cp "$RUN/$f" "$DEST/$f"
  done
  # galleries: PNGs up to 2 MB each (heatmap grids are ~100-600 KB),
  # capped at MAX_PNGS per run (lr curves + a representative subset)
  (cd "$RUN" && find . -path ./checkpoints -prune -o -path ./traces -prune -o \
      -type f -name '*.png' -size -2M -printf '%s\t%p\0' |
      sort -z -n | cut -z -f2-) |
  { n=0
    while IFS= read -r -d '' f; do
      n=$((n + 1))
      [ "$n" -gt "$MAX_PNGS" ] && { echo "png cap $MAX_PNGS reached (skipping the rest)"; break; }
      mkdir -p "$DEST/$(dirname "$f")"
      cp "$RUN/$f" "$DEST/$f"
    done; }
  echo "archived $RUN -> $DEST ($(du -sh "$DEST" | cut -f1))"
done
