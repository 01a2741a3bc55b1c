#!/bin/bash
# End-to-end example: data -> 8-trial training -> model-selection report.
# Analog of the reference's example/run_training.sh (no ipcluster needed).
set -euo pipefail
cd "$(dirname "${BASH_SOURCE[0]}")"
REPO_ROOT="$(cd .. && pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"

[ -f synthetic_xanes_7000.csv ] || python make_data.py
python -m rankaae_tpu.cli.train_sc -c fix_config.yaml -w .
python -m rankaae_tpu.cli.generate_report -c fix_config.yaml -w .
