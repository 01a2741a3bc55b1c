#!/bin/bash
# The canonical pipeline — analog of the reference's run_training.sh
# (/root/reference/sc/cmd/run_training.sh): train all trials, then report.
# No ipcluster: one process drives the whole TPU mesh.
set -euo pipefail

WORK_DIR="${1:-.}"
CONFIG="${2:-fix_config.yaml}"
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"

export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"

python -m rankaae_tpu.cli.train_sc -c "${CONFIG}" -w "${WORK_DIR}"
python -m rankaae_tpu.cli.generate_report -c "${CONFIG}" -w "${WORK_DIR}"
