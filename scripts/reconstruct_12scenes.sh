#!/usr/bin/env bash
# 12Scenes reconstruction: nc=16, xy birch (reference sfm_scripts).
set -euo pipefail
ROOT=${1:?dataset root}
OUT=${2:?landmark root}
for scene in apt1/kitchen apt1/living apt2/bed apt2/kitchen apt2/living \
             apt2/luke office1/gates362 office1/gates381 office1/lounge \
             office1/manolis office2/5a office2/5b; do
    bash "$(dirname "$0")/reconstruct_scene.sh" \
        "$ROOT/$scene" "$OUT/$scene" "$ROOT/$scene/3D-models" \
        "$ROOT/$scene/pairs.txt" 16 xy birch
done
