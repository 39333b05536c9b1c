#!/bin/bash
# End-of-round snapshot gate: refuse to commit a snapshot unless the
# build AND the full test suite are green. Rounds 5 and 8 both shipped
# final snapshots over a red verification step; this makes the invariant
# mechanical instead of a discipline.
#
# Usage: tools/snapshot_gate.sh ["commit message"]
#   - runs sbt -batch compile && sbt -batch test
#   - on success, commits the working tree (if dirty) with the given
#     message (default: "snapshot: gate green")
#   - on ANY failure, exits non-zero and commits NOTHING
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[gate] sbt -batch compile"
sbt -batch compile
echo "[gate] sbt -batch test"
sbt -batch test

if [[ -n "$(git status --porcelain)" ]]; then
  # a green build does not mean every untracked file belongs in the
  # snapshot: show exactly what will be swept in, and refuse untracked
  # files outside the known artifact paths (src/ tools/ docs/ *.md)
  echo "[gate] changes to be committed:"
  git status --porcelain
  # null-delimited so untracked paths containing spaces (which porcelain
  # quotes and awk would truncate) cannot evade the allowlist
  stray=""
  while IFS= read -r -d '' f; do
    if [[ ! "$f" =~ ^(src/|tools/|docs/) && ! "$f" =~ ^[^/]+\.md$ ]]; then
      stray+="$f"$'\n'
    fi
  done < <(git ls-files --others --exclude-standard -z)
  if [[ -n "$stray" ]]; then
    echo "[gate] REFUSING: untracked files outside src/ tools/ docs/ *.md:"
    echo "$stray"
    echo "[gate] add them explicitly or clean them up, then re-run"
    exit 1
  fi
  git add -A
  git commit -m "${1:-snapshot: gate green}"
  echo "[gate] committed: $(git log --oneline -1)"
else
  echo "[gate] tree clean, nothing to commit"
fi
echo "[gate] GREEN"
