#!/bin/bash
# Pre-snapshot verification gate: run after `sbt test` + a Verify/selfcheck
# pass to stamp the CURRENT src/main tree as verified. The pre-commit hook
# (tools/install-hooks.sh) refuses to commit a src/main tree that does not
# carry this stamp — the guard against the round-10/11 pattern where the
# end-of-round snapshot commit shipped unverified src/main changes (a red
# gate once, dead untested code once).
#
# The hash covers WORKTREE CONTENT ONLY (every file under src/main, bytes
# as they sit on disk) — staging state is irrelevant, so stamping before
# or after `git add` yields the same hash and `check` agrees with a
# just-made commit of the same content.
#
# Usage:
#   tools/gate.sh stamp    # record the current src/main tree as verified
#   tools/gate.sh check    # exit 1 if src/main differs from the stamp
set -e
cd "$(git rev-parse --show-toplevel)"
MARK=.git/verified-src-tree
tree_hash() {
  find src/main -type f -print0 | LC_ALL=C sort -z \
    | xargs -0 sha256sum | git hash-object --stdin
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
