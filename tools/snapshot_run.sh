#!/bin/bash
# Run a command from an immutable snapshot (detached git worktree of HEAD).
#
# Benchmark hygiene (VERDICT r3 item 6): the r03 campaign raced live source
# edits and recorded a verification FAIL (`bench_logs/r03/bench_1g_r09.log`).
# This harness makes that failure mode structurally impossible:
#   - refuses to run when the tree is dirty (tracked files);
#   - checks out HEAD into /tmp/huffman_bench_wt_<sha> (reused if present);
#   - builds the native module there and runs the command FROM the snapshot,
#     with logs going wherever the caller pointed them (absolute paths).
#
# Usage: tools/snapshot_run.sh <cmd...>        (cwd = snapshot root)
set -eu
cd "$(dirname "$0")/.."

if [ -n "$(git status --porcelain --untracked-files=no)" ]; then
  echo "snapshot_run: refusing to benchmark a dirty tree — commit first" >&2
  git status --porcelain --untracked-files=no >&2
  exit 1
fi

SHA=$(git rev-parse --short HEAD)
WT="/tmp/huffman_bench_wt_$SHA"
if [ ! -d "$WT" ]; then
  git worktree prune
  git worktree add --detach "$WT" HEAD >/dev/null
fi
make -C "$WT/native" >/dev/null 2>&1 || true

cd "$WT"
exec "$@"
