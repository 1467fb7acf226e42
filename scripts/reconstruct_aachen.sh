#!/usr/bin/env bash
# Aachen v1.1 reconstruction: nc=512, xz birch (larger radius compression).
set -euo pipefail
ROOT=${1:?dataset root}
OUT=${2:?landmark root}
bash "$(dirname "$0")/reconstruct_scene.sh" \
    "$ROOT/Aachenv11" "$OUT/Aachenv11" "$ROOT/Aachenv11/3D-models" \
    "$ROOT/Aachenv11/pairs.txt" 512 xz birch
