#!/usr/bin/env bash
# One-command environment-drift smoke gate (run FIRST thing each round):
# builds, then runs graft.Verify over ALL registered keys at sf0.001 and
# fails if any declared key cannot plan/run (e.g. the driver regenerated
# testdata with a new physical type — the r10 regression this guards).
#
#   ./smoke.sh            # sf0.001 (fast, ~2 min)
#   ./smoke.sh sf0.01     # another SF dir name under /root/testdata
set -euo pipefail
cd "$(dirname "$0")"
SF="${1:-sf0.001}"
OUT="target/smoke-$SF"
rm -rf "$OUT"
sbt -batch "runMain graft.Verify /root/testdata/$SF $OUT"
# Verify exits nonzero on any per-key failure; double-check the manifest
# agrees that every declared key was emitted (belt + suspenders).
python3 - "$OUT/manifest.json" <<'EOF'
import json, sys
m = json.load(open(sys.argv[1]))
missing = sorted(set(m["declared"]) - set(m["emitted"]))
assert not m["subset"], "smoke must run the FULL key set"
assert not missing, f"keys missing from verify output: {missing}"
print(f"[smoke] OK: {len(m['emitted'])}/{len(m['declared'])} keys emitted, 0 failed")
EOF
