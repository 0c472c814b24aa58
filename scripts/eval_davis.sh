#!/bin/bash
# Run every annotation policy on DAVIS-17 val (reference scripts/eval_davis.sh).
set -e
DB=DAVIS_17
ROUNDS=${ROUNDS:-60}
PY="python -m eva_vos_tpu.cli.eval_annotation_method --db $DB --rounds $ROUNDS"

$PY --policy rand_mask
$PY --policy oracle_mask
$PY --policy qnet_mask
$PY --policy upper_bound_mask
$PY --policy l2_mask --encoder resnet101
$PY --policy l2_mask --encoder vit_large
$PY --policy l2_mask --encoder dino_large
$PY --policy rand_type --types 3clicks
$PY --policy rand_rand --types 3clicks mask
$PY --policy oracle_oracle --types 3clicks mask
$PY --policy eva_vos
