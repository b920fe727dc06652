#!/usr/bin/env bash
# One-command suspect adjudicator (round-15, verdict task 5).
#
# When a bench window flags queries >=2x over their trailing floors, the
# question is always the same: code regression, or a noisy window? The
# discriminating experiment (hand-built by the judge in three separate
# rounds, now scripted): re-measure the suspects INTERLEAVED with known-
# stable control queries in one subset run. Controls share the window,
# so their ratio-to-floor measures the ENVIRONMENT; a suspect whose
# ratio collapses to the controls' is noise, one that still breaches
# after dividing out the control factor is code.
#
#   scripts/probe.sh q1,q2,...  [sfDir]
#
# Output: per suspect, CLEAR (raw + env-adjusted ratio) or CONFIRM.
# Artifacts land under probe_bench_out.json / probe_bench_trend.json
# (SPARK_GRAFT_OUT_PREFIX) so the main sf0.1 trend chain — which carries
# the standing two-run suspect evidence — is never clobbered.
set -euo pipefail
cd "$(dirname "$0")/.."

targets="${1:?usage: probe.sh q1,q2,... [sfDir]}"
sfdir="${2:-/root/testdata/sf0.1}"
baseline=bench_baseline.json

controls=$(python3 - "$targets" <<'EOF'
import json, sys
targets = set(sys.argv[1].split(','))
floors = json.load(open("bench_baseline.json"))["queries"]
# stable controls: baselined, cheap (0.2-1.0s floor), not under test;
# stratified by family prefix (round-robin one per family before a
# second from any — same rule as Bench's auto-probe) so one family's
# local noise can't dominate the environment estimate
cands = sorted(n for n, v in floors.items()
               if n not in targets and 0.2 <= v <= 1.0)
fams = {}
for n in cands:
    fams.setdefault(n.split('_', 1)[0], []).append(n)
rows = [fams[f] for f in sorted(fams)]
picked = [r[i] for i in range(max(map(len, rows), default=0))
          for r in rows if i < len(r)][:6]
print(','.join(picked))
EOF
)
[ -n "$controls" ] || { echo "no eligible controls in $baseline" >&2; exit 1; }

echo "probe: targets=[$targets] controls=[$controls] sf=$sfdir" >&2
SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_ONLY="$targets,$controls" \
  SPARK_GRAFT_OUT_PREFIX=probe_ \
  sbt -batch "runMain graft.Bench" >/dev/null 2>&1 || {
    echo "bench run failed; re-run without output redirect to see why" >&2
    exit 1
  }

python3 - "$targets" "$controls" <<'EOF'
import json, os, sys
targets = sys.argv[1].split(',')
controls = sys.argv[2].split(',')
out = json.load(open("probe_bench_out.json"))
floors = json.load(open("bench_baseline.json"))["queries"]
qs, var = out["queries"], out.get("variance", {})
# trailing-window medians: the poisoned-floor cross-check (r17) — a
# freak sample moves a min-folded floor but never the window median
meds = {}
if os.path.exists("bench_history.json"):
    hist = json.load(open("bench_history.json"))
    acc = {}
    for run in hist.get("runs", []):
        for n, v in run["queries"].items():
            acc.setdefault(n, []).append(v)
    for n, xs in acc.items():
        s = sorted(xs)
        meds[n] = s[len(s) // 2] if len(s) % 2 else \
            (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2

def ratio(n):
    f = floors.get(n)
    return (qs[n] / f) if (n in qs and f) else None

cr = sorted(r for r in (ratio(c) for c in controls) if r is not None)
env = cr[len(cr) // 2] if cr else 1.0
print(f"window environment factor (median of {len(cr)} controls): "
      f"{env:.2f}x")
rc = 0
for t in targets:
    r = ratio(t)
    if r is None:
        print(f"  {t}: NO-BASELINE (measured "
              f"{qs.get(t, float('nan')):.3f}s)")
        continue
    # clamp: env normalization excuses a SLOW window, never amplifies
    adj = r / max(env, 1.0)
    mr = (qs[t] / meds[t]) if meds.get(t) else None
    v = var.get(t, {})
    detail = (f"raw {r:.2f}x, env-adj {adj:.2f}x"
              + (f", vs-window-median {mr:.2f}x" if mr else "")
              + f" (min {qs[t]:.3f}s vs floor {floors[t]:.3f}s, "
              f"spread {v.get('spread', 0):.3f}s)")
    # CONFIRM needs BOTH the floor breach and 1.5x the trailing median
    # (a poisoned floor cannot manufacture a code ruling)
    if adj >= 2.0 and (mr is None or mr >= 1.5):
        print(f"  {t}: CONFIRM — {detail}")
        rc = 1
    else:
        print(f"  {t}: clear — {detail}")
print("verdict:", "CONFIRMED regression(s) above" if rc
      else "all clear (window noise)")
sys.exit(rc)
EOF
