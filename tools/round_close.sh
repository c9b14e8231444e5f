#!/bin/sh
# Round-close one-liner (README "Round-close checklist" step 3, made
# executable per the r18 verdict — the artifact-commit step recurred
# as a judge flag for five rounds when it was manual).
#
# Usage: tools/round_close.sh [round-number]
# Stages every driver round artifact present in the repo root and
# commits them with a standard message. Run at round START (artifacts
# appear when the previous round's judge finishes) and at any point
# the driver drops new ones.
set -e
cd "$(dirname "$0")/.."
N="${1:-?}"
FILES=""
for f in CORRECTNESS_r*.json BENCH_r*.json BENCH_LAST.json LEAKCHECK.json \
         COPYCHECK.json VERDICT.md ADVICE.md PROGRESS.jsonl; do
  # git status --porcelain covers staged, unstaged, AND untracked —
  # `git diff --quiet` alone misses artifacts that were already
  # `git add`ed but not committed (r19 advice).
  [ -e "$f" ] && [ -n "$(git status --porcelain -- "$f")" ] \
    && FILES="$FILES $f"
done
if [ -z "$FILES" ]; then
  echo "round_close: no new or modified driver artifacts — nothing to commit"
  exit 0
fi
git add $FILES
git commit -m "round $N: driver artifacts (verdict/advice/correctness/bench)"
echo "round_close: committed$FILES"
