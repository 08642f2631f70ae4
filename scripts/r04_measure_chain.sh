#!/bin/bash
# Round-4 scaling measurement chain, run serially so measurements never
# overlap: (1) 32-leg straggler-tail tuning grid, (2) run-level lockstep
# interleave at the standard 40k-doc corpus, (3) lockstep at a 4x corpus
# (job-length sweep: the fixed per-run overhead term F amortizes with
# job size, so efficiency-vs-docs rising toward the host-physics probe
# ceiling isolates the framework term from Amdahl + host physics).
set -u
cd "$(dirname "$0")/.."
echo "=== tail_tune (32-leg grid) ==="
python scripts/tail_tune.py --cores 32 --runs 4 \
    --media-factors 4,8,16 --shuffle-factors 1,2 \
    2>&1 | tee /tmp/tail_tune_r04.log
echo "=== lockstep 40k ==="
python scripts/lockstep_pairs.py --cycles 16 --docs 40000 \
    2>&1 | tee /tmp/lockstep_40k.log
echo "=== lockstep 160k ==="
python scripts/lockstep_pairs.py --cycles 8 --docs 160000 \
    2>&1 | tee /tmp/lockstep_160k.log
echo "=== chain done ==="
