#!/bin/bash
# Plan-drift gate, runnable standalone (r7 verdict #4): re-checks the
# committed structural plan signatures of the headline queries plus the
# global cross-join/UDF hygiene sweep over every declared query.
#   tools/check_plans.sh
cd "$(dirname "$0")/.." && exec sbt -batch "testOnly graft.PlanGuardSpec"
