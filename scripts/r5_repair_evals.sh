#!/bin/bash
# Repair pass for the round-5 attribution study: any arm whose evidence
# json is missing the NVS or mesh metrics (tunnel outage mid-eval) is
# re-run with EVAL_ONLY (training is skipped when its 50k checkpoint
# exists, re-run when it does not — self-healing either way).
set -u
cd /root/repo
for ARM in s42 s1 s2 notaper noexit; do
  J=docs/evidence/quality_variance/${ARM}.json
  NEED=1
  if [ -f "$J" ]; then
    NEED=$(python - "$J" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print(0 if ("nvs" in d and "mesh_metrics_m" in d) else 1)
EOF
)
  fi
  if [ "$NEED" = "1" ]; then
    echo "[repair] arm $ARM incomplete -> re-running"
    EVAL_ONLY=1 bash scripts/r5_attrib_arm.sh "$ARM"
  else
    echo "[repair] arm $ARM complete"
  fi
done
python scripts/r5_attrib_summary.py || true
