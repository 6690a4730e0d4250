#!/bin/bash
# Soak the streaming-tier gate queries under the driver's conditions
# (CPUS=4, constrained heap) hunting the w9 driver flake: N isolated
# graft.Verify runs, each DuckDB-compared. Usage:
#   tools/soak_streaming.sh [N] [queries] [heap]
set -u
N="${1:-20}"
QUERIES="${2:-w9_dedup_stream,w1_window_stream,a23_cms_stream}"
HEAP="${3:--Xmx3g}"
cd "$(dirname "$0")/.."
fails=0
for i in $(seq 1 "$N"); do
  out="/tmp/soak_stream/run_$i"
  rm -rf "$out"
  SPARK_GRAFT_CPUS=4 SBT_OPTS="$HEAP" \
    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $out $QUERIES" \
    >/tmp/soak_stream/log_$i.txt 2>&1
  if python3 tools/check_correctness.py "$out" /root/testdata/sf0.01 --subset \
    > /tmp/soak_stream/check_$i.txt 2>&1; then
    echo "run $i: PASS"
  else
    echo "run $i: FAIL"
    tail -5 "/tmp/soak_stream/check_$i.txt"
    fails=$((fails + 1))
  fi
done
echo "soak complete: $((N - fails))/$N pass"
exit $((fails > 0))
