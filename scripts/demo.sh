#!/bin/bash
# Single-file tagging demo (analog of scripts/demo_convnext.sbatch).
set -e
CKPT=${1:?usage: demo.sh CHECKPOINT AUDIO.wav}
AUDIO=${2:?usage: demo.sh CHECKPOINT AUDIO.wav}
python -m audioset_convnext_inf_tpu.cli.demo "$AUDIO" --checkpoint "$CKPT"
