#!/usr/bin/env bash
# tools/gate.sh — the ONE-COMMAND full gate.
#
# Chains every correctness arm the repo has, so no round (or future
# maintainer) can skip one by accident:
#
#   1. sbt_test            unit/plan/property/robustness suites
#   2. real_sf0.01         Verify + DuckDB selfcheck on the real fixture
#                          at the graded SF (the driver's own gate)
#   3. hostile_sf0.001     full replay against the poisoned fixture
#                          (tools/hostile_fixture.py: NULL/zero/junk/
#                          exotic-unicode rows appended per table)
#   4. retype_<arm> ×6     full replay against each single-drift re-typed
#                          fixture (date|timestamp|nanos|embdouble|
#                          decimal|intflip)
#   5. chained_all_drifts  full replay against the composed
#                          decimal→intflip→embdouble→nanos fixture
#   6. mass_leak_sf0.001   full replay against the planted mass-leak
#                          fixture (tools/mass_leak_fixture.py: one
#                          benchmark passage in > maxDf train docs) PLUS
#                          the d53 nonempty check — the audit view must
#                          name the planted carriers that d49's maxDf cap
#                          deliberately reports clean
#
# Every arm runs even if an earlier one fails; the summary prints one
# PASS/FAIL line per arm and the script exits 1 if ANY failed.
# Runtime: ~25–35 min on a quiet host (the test suite + 9 Verify JVMs).
set -u
cd "$(dirname "$0")/.."
CPUS="${SPARK_GRAFT_CPUS:-8}"
SCRATCH="$(mktemp -d /tmp/graft_gate.XXXXXX)"
declare -a RESULTS=()
fail=0

arm() { # arm <name> <cmd...>: record PASS/FAIL, never abort the chain
  local name="$1"; shift
  echo "== [gate] $name"
  if "$@"; then RESULTS+=("PASS  $name")
  else RESULTS+=("FAIL  $name"); fail=1; fi
}

verify_against() { # verify_against <name> <fixtureDir>
  local name="$1" src="$2" out="$SCRATCH/v_$1"
  arm "$name" bash -c "SPARK_GRAFT_CPUS=$CPUS sbt -batch 'runMain graft.Verify $src $out' >'$SCRATCH/$name.sbt.log' 2>&1 && python3 tools/selfcheck.py '$src' '$out' >'$SCRATCH/$name.check.log' 2>&1; rc=\$?; tail -3 '$SCRATCH/$name.check.log' 2>/dev/null; exit \$rc"
}

arm "sbt_test" bash -c "sbt -batch test >'$SCRATCH/sbt_test.log' 2>&1 || { tail -20 '$SCRATCH/sbt_test.log'; exit 1; }"

verify_against "real_sf0.01" /root/testdata/sf0.01

if python3 tools/hostile_fixture.py /root/testdata/sf0.001 "$SCRATCH/hostile" >/dev/null; then
  verify_against "hostile_sf0.001" "$SCRATCH/hostile"
else
  RESULTS+=("FAIL  hostile_fixture_build"); fail=1
fi

for a in date timestamp nanos embdouble decimal intflip; do
  if python3 tools/retype_fixture.py /root/testdata/sf0.001 "$SCRATCH/re_$a" "$a" >/dev/null; then
    verify_against "retype_$a" "$SCRATCH/re_$a"
  else
    RESULTS+=("FAIL  retype_${a}_build"); fail=1
  fi
done

# chained all-drifts: each arm re-types the PREVIOUS arm's output
# (symlinked untouched tables make the chain cheap)
src=/root/testdata/sf0.001
chain_ok=1
for a in decimal intflip embdouble nanos; do
  if ! python3 tools/retype_fixture.py "$src" "$SCRATCH/chain_$a" "$a" >/dev/null; then
    RESULTS+=("FAIL  chain_${a}_build"); fail=1; chain_ok=0; break
  fi
  src="$SCRATCH/chain_$a"
done
[ "$chain_ok" = 1 ] && verify_against "chained_all_drifts" "$src"

# planted mass-leak arm: full replay must stay green AND the d53 suspect
# view must be nonempty, naming exactly the planted train carriers
if python3 tools/mass_leak_fixture.py /root/testdata/sf0.001 "$SCRATCH/leak" >/dev/null; then
  verify_against "mass_leak_sf0.001" "$SCRATCH/leak"
  # the d53 check reads the replay's output — if the replay failed or
  # wrote nothing, report it as BLOCKED on that (the replay arm already
  # set fail=1) instead of failing with an unrelated pyarrow traceback
  if [[ " ${RESULTS[*]} " != *"PASS  mass_leak_sf0.001"* ]] || \
     [ ! -d "$SCRATCH/v_mass_leak_sf0.001/d53_mass_contamination_suspects" ]; then
  RESULTS+=("SKIP  mass_leak_d53_nonempty (blocked: mass_leak_sf0.001 replay failed or wrote no d53 output)")
  else
  arm "mass_leak_d53_nonempty" python3 - "$SCRATCH/v_mass_leak_sf0.001" <<'PYEOF'
import sys
import pyarrow.dataset as ds
def ids_of(q):
    return {r["doc_id"] for r in
            ds.dataset(f"{sys.argv[1]}/{q}").to_table().to_pylist()}
suspects = ids_of("d53_mass_contamination_suspects")
planted = set(range(1000, 1060))  # the planted train carriers
missing = planted - suspects
assert not missing, f"d53 missed {len(missing)} planted carriers: {sorted(missing)[:5]}"
# the false-negative mode itself: the capped d49 verdict must report the
# planted carriers CLEAN (their fps are stop-capped) — exactly why the
# audit view has to exist
leaked_into_verdict = planted & ids_of("d49_decontaminate_winnowed")
assert not leaked_into_verdict, \
    f"d49 flagged planted mass-leak docs (cap not engaged): {sorted(leaked_into_verdict)[:5]}"
print(f"d53 named all {len(planted)} planted carriers; d49 (capped) reported them clean")
PYEOF
  fi
else
  RESULTS+=("FAIL  mass_leak_fixture_build"); fail=1
fi

echo
echo "== [gate] summary"
printf '%s\n' "${RESULTS[@]}"
if [ "$fail" = 0 ]; then rm -rf "$SCRATCH"
else echo "== [gate] FAILED — logs kept in $SCRATCH"; fi
exit $fail
