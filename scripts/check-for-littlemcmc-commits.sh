#!/usr/bin/env bash
# Upstream-drift watchdog (counterpart of the reference's
# scripts/check-for-pymc3-commits.sh:6-17): clone upstream littlemcmc and
# fail if its sampler sources changed in the last day, so CI files an
# issue prompting a behavioral-parity review here.
set -euo pipefail

UPSTREAM=${UPSTREAM:-https://github.com/eigenfoo/littlemcmc.git}
WATCH_PATHS="littlemcmc/"

tmp=$(mktemp -d)
trap 'rm -rf "$tmp"' EXIT
git clone --quiet --depth 50 "$UPSTREAM" "$tmp/littlemcmc"

cd "$tmp/littlemcmc"
recent=$(git log --since="1 day ago" --oneline -- $WATCH_PATHS || true)
if [ -n "$recent" ]; then
    echo "Upstream littlemcmc sampler code changed in the last day:"
    echo "$recent"
    echo "Review for behavioral parity with littlemcmc_tpu."
    exit 1
fi
echo "No upstream sampler changes in the last day."
