#!/bin/bash
cd /root/repo
NAMES=$(python - <<'PY'
import importlib.util, sys
sys.path.insert(0,'/root/repo')
spec = importlib.util.spec_from_file_location("rayentry", "/root/repo/__ray_entry__.py")
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
print(" ".join(m.queries()))
PY
)
arr=($NAMES)
total=${#arr[@]}
echo "total queries: $total"
rc=0
for ((i=0; i<total; i+=40)); do
  chunk="${arr[@]:i:40}"
  echo "=== chunk starting at $i ==="
  python scripts/check_queries.py /root/testdata/sf0.01 $chunk 2>/dev/null | grep -E "^\[FAIL|failures$|^[0-9]+ failures"
  s=${PIPESTATUS[0]}
  if [ $s -ne 0 ]; then rc=1; echo "CHUNK at $i EXIT $s"; fi
done
echo "overall rc: $rc"
