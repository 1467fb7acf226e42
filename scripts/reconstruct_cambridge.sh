#!/usr/bin/env bash
# CambridgeLandmarks reconstruction: nc=32, xz birch.
set -euo pipefail
ROOT=${1:?dataset root}
OUT=${2:?landmark root}
for scene in GreatCourt KingsCollege OldHospital ShopFacade StMarysChurch; do
    bash "$(dirname "$0")/reconstruct_scene.sh" \
        "$ROOT/$scene" "$OUT/$scene" "$ROOT/$scene/3D-models" \
        "$ROOT/$scene/pairs.txt" 32 xz birch
done
