#!/bin/bash
# Install the pre-commit hook that refuses to commit src/main changes that
# have not been verified (tools/gate.sh). Bypass for a genuinely non-code
# commit: GRAFT_ALLOW_UNVERIFIED=1 git commit ...
set -e
cd "$(git rev-parse --show-toplevel)"
cat > .git/hooks/pre-commit <<'EOF'
#!/bin/bash
# Refuse a commit whose src/main tree was not stamped verified — the
# guard against end-of-round snapshot commits carrying untested changes.
[ "$GRAFT_ALLOW_UNVERIFIED" = "1" ] && exit 0
# commits that do not touch src/main need no stamp
if git diff --cached --quiet -- src/main 2>/dev/null; then exit 0; fi
exec tools/gate.sh check
EOF
chmod +x .git/hooks/pre-commit
echo "[hooks] pre-commit installed"
