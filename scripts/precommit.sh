#!/bin/sh
# Pre-commit compile gate. A broken HEAD voids EVERY downstream gate for a
# whole round (round 3: one non-compiling commit → empty CORRECTNESS, void
# BENCH). Install once with:
#   ln -sf ../../scripts/precommit.sh .git/hooks/pre-commit
# Bypass (e.g. docs-only commit) with: git commit --no-verify
set -e
cd "$(git rev-parse --show-toplevel)"
# docs/scripts-only commits don't need the JVM spin-up
if git diff --cached --name-only | grep -q '\.scala$\|\.sbt$'; then
  echo "[precommit] sbt compile (Scala staged; round-3 lesson) ..."
  sbt -batch compile < /dev/null
fi
