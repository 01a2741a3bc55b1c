#!/bin/bash
# Regenerate PARITY_FUSED.md from all committed fast-protocol quality runs.
cd "$(dirname "$0")/.."
set -e
PAIRS=(
  --pair FC-300-fused artifacts/parity_fused/fc300_faithful/ours.json artifacts/parity_fused/fc300_fused/ours.json
  --pair FC-300-joint artifacts/parity_fused/fc300_faithful/ours.json artifacts/parity_fused/fc300_joint/ours.json
  --pair compact-300-fused artifacts/parity_conv_compact_amp/ours.json artifacts/parity_fused/compact300_fused/ours.json
  --pair compact-300-joint artifacts/parity_conv_compact_amp/ours.json artifacts/parity_fused/compact300_joint/ours.json
  --pair compact-1500-fused artifacts/parity_conv_compact_1500/ours.json artifacts/parity_fused/compact1500_fused/ours.json
  --pair compact-1500-joint artifacts/parity_conv_compact_1500/ours.json artifacts/parity_fused/compact1500_joint/ours.json
)
if [ -f artifacts/parity_fused/normal300_joint/ours.json ]; then
  PAIRS+=(--pair normal-300-joint artifacts/parity_conv_normal/ours.json artifacts/parity_fused/normal300_joint/ours.json)
fi
if [ -f artifacts/parity_fused/qved300_joint/ours.json ]; then
  PAIRS+=(--pair qved-300-joint artifacts/parity_qved/ours.json artifacts/parity_fused/qved300_joint/ours.json)
fi
python scripts/fused_gate.py "${PAIRS[@]}" --out PARITY_FUSED.md
