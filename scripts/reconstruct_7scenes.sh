#!/usr/bin/env bash
# 7Scenes reconstruction (reference sfm_scripts/reconstruct_7scenes.sh):
# nc=16, ground-plane (xz) birch clustering per scene.
set -euo pipefail
ROOT=${1:?dataset root (e.g. datasets/7Scenes)}
OUT=${2:?landmark root (e.g. landmarks/7Scenes)}
for scene in chess heads office fire stairs redkitchen pumpkin; do
    bash "$(dirname "$0")/reconstruct_scene.sh" \
        "$ROOT/$scene" "$OUT/$scene" "$ROOT/$scene/3D-models" \
        "$ROOT/$scene/pairs.txt" 16 xz birch
done
