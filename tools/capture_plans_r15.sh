#!/bin/bash
# Plan evidence for plans/r15/: formatted physical plans of every
# r15-touched query, captured at the r14 final tree (BEFORE) and at the
# r15 final tree (AFTER). Run from /root/repo with no other sbt active.
set -e
QUERIES="q272_ivf_curve q273_ivfpq_topk q280_ivfpq_curve q322_ivfpq_append q352_seq_pq_sync q354_catalog_compact q355_matview_retract q357_pq_maintain q359_change_feed q360_catalog_feed"
BEFORE_REF=${1:-da81d6c}
mkdir -p plans/r15
split_plans() { # $1 = raw log, $2 = suffix
  python3 - "$1" "$2" <<'EOF'
import re, sys
raw = open(sys.argv[1]).read()
suffix = sys.argv[2]
parts = re.split(r"^========== (\S+) ==========$", raw, flags=re.M)
for i in range(1, len(parts), 2):
    name = parts[i].split("_")[0]
    open(f"plans/r15/{name}_{suffix}.txt", "w").write(
        f"== {parts[i]} ({suffix}) ==\n" + parts[i+1].strip() + "\n")
EOF
}
# AFTER: current tree
sbt -batch "runMain graft.Explain $QUERIES" > /tmp/plans_r15_after.log 2>&1
split_plans /tmp/plans_r15_after.log after
# BEFORE: r14 final tree in a throwaway worktree (own target dir)
git worktree add -f /tmp/r15_before_wt "$BEFORE_REF"
(cd /tmp/r15_before_wt &&
  sbt -batch "runMain graft.Explain $QUERIES" > /tmp/plans_r15_before.log 2>&1)
split_plans /tmp/plans_r15_before.log before
git worktree remove --force /tmp/r15_before_wt
ls -la plans/r15/
