#!/bin/bash
# Scale sweep driver: one JVM per family (so one family's cache pressure
# can't evict another's mid-measurement — the qad-at-sf1 artifact from the
# round-8 notes), TimeOne with 3 reps (rep1 = cold incl. shared-cache
# builds, reps 2-3 = warm steady state; two warm chances so a single
# GC-pressure spike can't masquerade as the steady state). Rep-inversion
# handling (warm > cold from accumulated same-JVM state at the 100×
# fixtures) lives in tools/assemble_scale.py: min-of-reps + an explicit
# "inverted" flag in the artifact, never silent.
#
# Usage: tools/run_scale.sh <sfDir> <outPrefix> [fam1,fam2,...]
#   e.g. tools/run_scale.sh /tmp/sf10 /tmp/scale_sf10
#        tools/run_scale.sh /tmp/sf10p /tmp/scale_sf10p pair,grouping,er,setsim,text
set -u
SF="$1"; OUT="$2"; ONLY="${3:-}"

declare -A FAMS=(
  [linear]="q40,q57"
  [graph]="q88,qa7,q8j,q9n"
  [er]="q9q,qba"
  [setsim]="qad,qb2"
  [ingest]="q84,qbg,qbq"
  [ann]="q46,q47,q4a,q59,q8h,q48,qbe,qbf,qbh,qbj"
  [pair]="q42,q4c,q4b,q44,q41"
  [grouping]="q56,q8n,qbc"
  [stream]="q58,q65,q69,q9c,qbb,q9w"
  [text]="qbi,qbk,qbl,qbm"
)
ORDER="linear graph er setsim ingest ann pair grouping stream text"

for fam in $ORDER; do
  if [ -n "$ONLY" ] && [[ ",$ONLY," != *",$fam,"* ]]; then continue; fi
  echo "=== $fam (${FAMS[$fam]}) -> ${OUT}_${fam}.log"
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.TimeOne $SF ${FAMS[$fam]} 3" \
    > "${OUT}_${fam}.log" 2>&1
  grep -h "\[time\]" "${OUT}_${fam}.log" | sed 's/\[info\] //'
done
