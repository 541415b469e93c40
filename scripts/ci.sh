#!/usr/bin/env bash
# CI recipe (ROADMAP #14): fast-tier tests + bench smoke, CPU-only.
#
# Mirrors what a GitHub-Actions job would run on a TPU-less runner:
#   1. fast test tier  (pytest -m "not slow"; virtual 8-device CPU mesh)
#   2. slow tier       (app-level + goldens) when CI_FULL=1
#   3. bench smoke     (tiny frame through the full engine, one JSON line)
#   4. multichip dryrun (the driver's artifact, self-sanitizing)
#
# Usage: scripts/ci.sh [--full] [--tpu]
#   --tpu: additionally run the on-TPU Mosaic verification tier
#          (scripts/tpu_ci.py; needs the real chip) — gates kernel↔fused
#          parity, K-buffer parity, Mesh((1,1)) sharded overhead, and a
#          golden subset through the Mosaic compilation; writes
#          TPUCHECK.json.
set -euo pipefail
cd "$(dirname "$0")/.."

FULL=${CI_FULL:-0}
TPU=0
for a in "$@"; do
  [ "$a" = "--full" ] && FULL=1
  [ "$a" = "--tpu" ] && TPU=1
done

echo "== fast test tier =="
python -m pytest tests/ -m "not slow" -q

if [ "$FULL" = "1" ]; then
  echo "== slow tier (app + goldens + multihost) =="
  python -m pytest tests/ -m slow -q
fi

echo "== bench smoke =="
PYTHONPATH=$(python - <<'EOF'
import os
print(os.pathsep.join(p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
                      if p and ".axon_site" not in p))
EOF
) JAX_PLATFORMS=cpu python bench.py --small --no-baseline

echo "== multichip dryrun =="
python - <<'EOF'
import __graft_entry__ as g
g.dryrun_multichip(8)
print("dryrun_multichip(8) ok")
EOF

if [ "$TPU" = "1" ]; then
  echo "== on-TPU Mosaic tier =="
  python scripts/tpu_ci.py
fi

echo "CI OK"
