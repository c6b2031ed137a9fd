#!/bin/sh
# Soak the randomized model checks with fresh seeds beyond the pinned
# defaults: SOAK_SEEDS extends the parametrized seed lists and
# SOAK_EXAMPLES raises the hypothesis example counts. Usage:
#   scripts/soak_models.sh [n_seeds] [base_seed] [examples]
# Each invocation is deterministic given its arguments; vary base_seed
# to explore new schedules. Runtime grows roughly linearly in n_seeds.
set -e
N=${1:-10}
BASE=${2:-1000}
EXAMPLES=${3:-20}
SEEDS=$(python -c "print(' '.join(str($BASE+i) for i in range($N)))")
echo "soaking with seeds: $SEEDS examples: $EXAMPLES"
cd "$(dirname "$0")/.."
SOAK_SEEDS="$SEEDS" SOAK_EXAMPLES="$EXAMPLES" \
python -m pytest -x -q \
  tests/test_posdelete_model.py \
  tests/test_index_model.py \
  tests/test_merge_model.py \
  "tests/test_rollup.py::test_rollup_matches_truth_over_random_op_sequences" \
  "tests/test_lakestream_source.py::test_stream_matches_model_over_random_op_sequences" \
  "tests/test_feature_table.py::test_random_dml_matches_oneshot_recompute"
