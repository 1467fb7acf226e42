#!/usr/bin/env bash
# Generic scene reconstruction driver (the per-dataset equivalent of the
# reference's sfm_scripts/reconstruct_*.sh): extract features, match
# covisibility pairs, triangulate with reference poses, then build landmarks.
#
# Usage: reconstruct_scene.sh DATASET_DIR LANDMARK_DIR REF_MODEL_DIR PAIRS_TXT [N_CLUSTER] [MODE] [METHOD]
set -euo pipefail

DATASET_DIR=$1
LANDMARK_DIR=$2
REF_MODEL=$3
PAIRS=$4
N_CLUSTER=${5:-16}
MODE=${6:-xz}
METHOD=${7:-birch}

FEATS=$LANDMARK_DIR/feats-sfd2.h5
MATCHES=$LANDMARK_DIR/matches-gml.h5
mkdir -p "$LANDMARK_DIR"

python -m pram_tpu.cli.extract_features \
    --image_dir "$DATASET_DIR" --export_fn "$FEATS" --conf sfd2 \
    ${SFD2_WEIGHTS:+--weight_path "$SFD2_WEIGHTS"}

python -m pram_tpu.cli.match_features \
    --pairs "$PAIRS" --features "$FEATS" --export_fn "$MATCHES" --conf gml \
    ${GML_WEIGHTS:+--weight_path "$GML_WEIGHTS"}

python -m pram_tpu.cli.triangulate \
    --reference_model "$REF_MODEL" --features "$FEATS" \
    --pairs "$PAIRS" --matches "$MATCHES" --output "$LANDMARK_DIR/model"

python -m pram_tpu.cli.build_map \
    --model "$LANDMARK_DIR/model" --features "$FEATS" \
    --output "$LANDMARK_DIR" --n_cluster "$N_CLUSTER" \
    --cluster_mode "$MODE" --cluster_method "$METHOD"
