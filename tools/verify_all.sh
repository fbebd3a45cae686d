#!/usr/bin/env bash
# One-command verification sweep: unit/e2e tests, the oracle gate in both
# session modes at the driver's grading scale, and the headline bench.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -q

echo "== oracle gate (engine session, sf0.01) =="
python tools/oracle_check.py /root/testdata/sf0.01 2>&1 | tail -1

echo "== oracle gate (driver-style plain session, sf0.01) =="
python tools/oracle_check.py --plain /root/testdata/sf0.01 2>&1 | tail -1

echo "== oracle gate (plain session, non-UTC timezone, sf0.01) =="
python tools/oracle_check.py --plain --tz Asia/Tokyo /root/testdata/sf0.01 2>&1 | tail -1

echo "== oracle gate (adversarial edge dataset, full registry) =="
python tools/make_edge_sf.py > /dev/null
python tools/oracle_check.py /tmp/edge_sf 2>&1 | tail -1

echo "== bench (sf0.1) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py 2>/dev/null | tail -1
