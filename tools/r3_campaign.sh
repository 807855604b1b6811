#!/bin/bash
# Round-3 measurement campaign: run everything in ONE sequential pass the
# moment the axon tunnel is up (sessions are precious — outages run hours).
# Usage: bash tools/r3_campaign.sh [stage...]   (default: all stages)
set -u
cd "$(dirname "$0")/.."
LOG=tools/r3_campaign.log
stages=${@:-"probes fwd bench"}

echo "=== campaign start $(date -u +%H:%M:%S) stages: $stages ===" | tee -a "$LOG"

run() {
  echo "--- $* ($(date -u +%H:%M:%S)) ---" | tee -a "$LOG"
  "$@" 2>&1 | tee -a "$LOG" | tail -40
}

for s in $stages; do
  case "$s" in
    probes)
      run python tools/opt_probe3.py null mxuden convpk gnpk glue2
      ;;
    fwd)
      run python tools/fwd_probe.py
      ;;
    refwf)
      run python tools/ref_workflow.py
      ;;
    bench)
      run python bench.py
      ;;
    *)
      run python tools/opt_probe3.py "$s"
      ;;
  esac
done
echo "=== campaign done $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
