#!/bin/bash
# Contended-host amplification experiment (VERDICT r16 #2): run the same
# 6-query Bench subset twice — quiet box, then with an induced co-tenant
# (N busy-loop processes) — and record per-shape amplification. The model
# under test: many-stage iterative queries (q_hits, q_hll_merge,
# q_bootstrap_ci) amplify far more than scan/join-shaped queries
# (wc_words, q_agg_variants, q_tpch_q3) under the same CPU steal, because
# every stage boundary is a scheduler round-trip that a saturated run
# queue delays multiplicatively.
#
# Usage: tools/contention_experiment.sh [hogs] (default 24)
set -u
cd /root/repo
HOGS="${1:-24}"
QUERIES="q_hits,q_hll_merge,q_bootstrap_ci,wc_words,q_agg_variants,q_tpch_q3"

run_leg() {
  local tag="$1"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
    sbt -batch 'runMain graft.Bench' 2>"target/contention_${tag}.stderr" \
    | grep '"metric"' | tail -1 > "target/contention_${tag}.json"
  echo "== $tag =="
  cat "target/contention_${tag}.json"
}

echo "[exp] quiet leg (load: $(cut -d' ' -f1 /proc/loadavg))"
run_leg quiet

echo "[exp] starting $HOGS busy-loop co-tenants"
PIDS=()
for i in $(seq 1 "$HOGS"); do
  bash -c 'while :; do :; done' &
  PIDS+=($!)
done
trap 'kill "${PIDS[@]}" 2>/dev/null' EXIT
sleep 5
echo "[exp] contended leg (load: $(cut -d' ' -f1 /proc/loadavg))"
run_leg contended
kill "${PIDS[@]}" 2>/dev/null
trap - EXIT
echo "[exp] done; per-query compare:"
python3 - <<'EOF'
import json
q = json.load(open('target/contention_quiet.json'))['queries']
c = json.load(open('target/contention_contended.json'))['queries']
# ADVICE r17: a query failed/omitted in either leg, or a 0.0 quiet time,
# must not KeyError/ZeroDivisionError away the whole table after both
# expensive legs ran — compare the intersection, name the strays.
only_q = sorted(set(q) - set(c))
only_c = sorted(set(c) - set(q))
if only_q: print(f"[exp] quiet leg only (no compare): {','.join(only_q)}")
if only_c: print(f"[exp] contended leg only (no compare): {','.join(only_c)}")
both = [k for k in q if k in c]
zero = sorted(k for k in both if q[k] <= 0.0)
if zero: print(f"[exp] zero/neg quiet time (no ratio): {','.join(zero)}")
comp = [k for k in both if q[k] > 0.0]
print(f"{'query':22s} {'quiet':>8s} {'contended':>10s} {'amp':>7s}")
for k in sorted(comp, key=lambda k: -c[k]/q[k]):
    print(f"{k:22s} {q[k]:8.2f} {c[k]:10.2f} {c[k]/q[k]:7.2f}x")
EOF
