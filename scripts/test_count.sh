#!/bin/bash
# Machine-derived test count (r7 verdict: the round log's claim must come
# from the ScalaTest summary, not be hand-carried). Runs the full suite
# and prints the summary lines verbatim; paste them into SURVEY §15.
set -o pipefail
sbt -batch test 2>&1 | tee /tmp/graft_sbt_test.log \
  | grep -E "Total number of tests run:|Suites: completed|Tests: succeeded|All tests passed|Tests: failed"
