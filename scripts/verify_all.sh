#!/bin/bash
# One-command full verification: entry() smoke, the complete oracle
# gate (every queries() entry vs its DuckDB/fixture oracle, run in
# crash-safe chunks — Ray 2.49 intermittently dies on internal CHECKs
# in single sessions executing many hundreds of Datasets, NOTES #63),
# then the full pytest suite.  Exit 0 = everything green.
set -u
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"

echo "== entry() smoke =="
python - <<'EOF' || exit 1
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
import __ray_entry__ as e
out = e.entry()
import ray.data
n = out.count() if isinstance(out, ray.data.Dataset) else len(out)
assert n > 0, "entry() returned no rows"
print(f"entry(): {n} rows")
ray.shutdown()
EOF

echo "== full oracle gate (chunked) =="
python - <<'EOF' > /tmp/kgray_all_queries.txt || exit 1
import __ray_entry__ as e
print("\n".join(e.queries().keys()))
EOF
rm -f /tmp/kgray_gatechunk_*
split -l 35 /tmp/kgray_all_queries.txt /tmp/kgray_gatechunk_
rc=0
for f in /tmp/kgray_gatechunk_*; do
  xargs -a "$f" python scripts/check_queries.py "$SF"
  c=$?
  if [ $c -ne 0 ]; then
    # one retry per chunk: the known Ray-internal CHECK crash class
    xargs -a "$f" python scripts/check_queries.py "$SF"
    c=$?
    [ $c -ne 0 ] && rc=1
  fi
done
[ $rc -ne 0 ] && { echo "GATE FAILED"; exit 1; }
echo "gate green"

echo "== pytest =="
python -m pytest tests/ -q || exit 1
echo "ALL GREEN"
