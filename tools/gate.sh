#!/bin/bash
# Pre-snapshot verification gate: run after `sbt test` + a Verify/selfcheck
# pass to stamp the CURRENT src/main tree as verified. The pre-commit hook
# (tools/install-hooks.sh) refuses to commit a src/main tree that does not
# carry this stamp — the guard against the round-10/11 pattern where the
# end-of-round snapshot commit shipped unverified src/main changes (a red
# gate once, dead untested code once).
#
# Usage:
#   tools/gate.sh stamp    # record the current src/main tree as verified
#   tools/gate.sh check    # exit 1 if src/main differs from the stamp
set -e
cd /root/repo
MARK=.git/verified-src-tree
tree_hash() {
  # content hash of src/main as it would be committed (worktree state)
  git ls-files -s src/main | git hash-object --stdin
  # include unstaged modifications: hash the file contents themselves
  find src/main -type f -name '*.scala' -print0 | sort -z | xargs -0 cat | git hash-object --stdin
}
case "${1:-check}" in
  stamp)
    tree_hash > "$MARK"
    echo "[gate] stamped verified src/main tree"
    ;;
  check)
    if [ ! -f "$MARK" ]; then
      echo "[gate] NO verification stamp — run sbt test + tools/gate.sh stamp" >&2
      exit 1
    fi
    if ! tree_hash | diff -q - "$MARK" >/dev/null 2>&1; then
      echo "[gate] src/main differs from the last verified tree — run the" >&2
      echo "[gate] test+verify suite, then tools/gate.sh stamp (or export" >&2
      echo "[gate] GRAFT_ALLOW_UNVERIFIED=1 to bypass for non-code commits)" >&2
      exit 1
    fi
    ;;
  *)
    echo "usage: tools/gate.sh [stamp|check]" >&2
    exit 2
    ;;
esac
