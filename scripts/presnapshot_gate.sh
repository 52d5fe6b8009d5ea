#!/usr/bin/env bash
# Standing pre-snapshot gate (r06 verdict item 2): no round snapshot ships
# without (1) the full pytest suite green and (2) a freshly regenerated
# full-registry oracle supplement — the exact pair of checks that would
# have caught the r06 srm_event_types schema break before it reached an
# artifact. Run from the repo root; pass the round tag as $1 (e.g. r08).
#
#   scripts/presnapshot_gate.sh r08
#
# Optional extras (slower, run when the round touched the relevant layer):
#   SF01=1    also sweep at sf0.1 (scale-literal check)
#   TZ_SWEEP=1  also sweep under a foreign JVM timezone
#   STREAMS=1 also regenerate the batch≡stream equivalence artifact
set -euo pipefail
tag="${1:?usage: presnapshot_gate.sh <round-tag>}"

echo "== gate 1/2: full pytest (two halves) =="
mapfile -t files < <(ls tests/test_*.py)
half=$(( (${#files[@]} + 1) / 2 ))
python -m pytest "${files[@]:0:half}" -q
python -m pytest "${files[@]:half}" -q

echo "== gate 2/2: full-registry oracle supplement =="
python scripts/driver_sim.py --json "CORRECTNESS_SUPPLEMENT_${tag}.json"

if [[ "${SF01:-0}" == "1" ]]; then
  echo "== extra: sf0.1 scale sweep =="
  python scripts/driver_sim.py --sf /root/testdata/sf0.1 --skip-smoke \
    --json "CORRECTNESS_SF0p1_${tag}.json"
fi
if [[ "${TZ_SWEEP:-0}" == "1" ]]; then
  echo "== extra: foreign-timezone sweep (DST-free zone) =="
  TZ=Australia/Perth JAVA_TOOL_OPTIONS=-Duser.timezone=Australia/Perth \
    python scripts/driver_sim.py --skip-smoke \
    --json "CORRECTNESS_TZ_${tag}.json"
  # Perth observes no DST, so that sweep can never catch a spring-forward
  # date-boundary bug (r7 verdict item 3); New York adds the DST-observing
  # matrix point for the F1-F5 / ST3 / ST5 local-day logic.
  echo "== extra: foreign-timezone sweep (DST-observing zone) =="
  TZ=America/New_York JAVA_TOOL_OPTIONS=-Duser.timezone=America/New_York \
    python scripts/driver_sim.py --skip-smoke \
    --json "CORRECTNESS_TZ2_${tag}.json"
fi
if [[ "${STREAMS:-0}" == "1" ]]; then
  echo "== extra: batch≡stream equivalence =="
  python scripts/stream_equiv.py --json "STREAM_EQUIV_${tag}.json"
fi
echo "presnapshot gate PASSED for ${tag}"
