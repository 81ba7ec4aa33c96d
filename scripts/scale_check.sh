#!/bin/bash
#  Copyright (c) 2026 graft contributors
#  SPDX-License-Identifier: Apache-2.0
# Empirical scale validation: time the heavy queries at sf0.1 and at
# the ~10x synthetic sf1 (scripts/make_sf1.py), print warm wall-times
# and the sf1/sf0.1 ratio. Ratios are judged against each query's
# documented complexity bound in SCALE.md.
set -o errexit
QUERIES=${QUERIES:-"q154_triangles q130_setsim_join q57_dedup_clusters \
q41_ngram_jaccard q141_cluster_canonical q67_simhash_near_dup \
q44_embedding_near_dup q146_pagerank_trade q149_corr_matrix \
q84_partitioned_ingest q180_semdedup q184_semdedup_auto \
q187_ann_ivf_pq q191_fellegi_sunter q198_coreness"}
SF01=${SF01:-/root/testdata/sf0.1}
SF1=${SF1:-/tmp/graft_sf1}
[ -d "$SF1" ] || python3 "$(dirname "$0")/make_sf1.py" "$SF1"
for q in $QUERIES; do
  for sf in "$SF01" "$SF1"; do
    # `|| true`: a crashed/missing run must print FAIL and keep the
    # sweep going, not errexit the whole script
    t=$(SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g sbt -batch \
      "runMain graft.RunOne $q $sf" 2>&1 | grep -oP 'run2: \K[0-9.]+' || true)
    echo "SCALE $q $sf ${t:-FAIL}"
  done
done
