#!/bin/bash
# Reproduce the published evaluation protocol (analog of
# scripts/5_evaluate_convnext_on_audioset.sbatch): balanced-train + eval
# HDF5 index sets at batch 256.
set -e
CKPT=${1:?usage: evaluate_on_audioset.sh CKPT EVAL_IDX.h5 [BAL_IDX.h5]}
EVAL_IDX=${2:?}
BAL_IDX=${3:-}
ARGS=(--checkpoint "$CKPT" --eval-indexes "$EVAL_IDX" --batch-size 256 --num-workers 10)
[ -n "$BAL_IDX" ] && ARGS+=(--bal-indexes "$BAL_IDX")
python -m audioset_convnext_inf_tpu.cli.evaluate "${ARGS[@]}"
