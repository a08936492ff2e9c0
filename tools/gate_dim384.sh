#!/bin/bash
# Reference-width (384-dim) correctness gate — SURVEY §6.
# Synthesizes the 384-dim corpus, then oracle-gates the kernel +
# one-per-family ANN query set at that width via tools/gate.py.
set -e
cd "$(dirname "$0")/.."
python3 tools/gen_dim384.py "${1:-/root/testdata/sf0.01}" /tmp/dim384_data
QUERIES=knn_cosine,knn_euclidean,knn_dot,knn_manhattan,vector_scan,vector_normalize,ann_ivf_static,ann_sq8,ann_bq_wide,ann_pq_static,ann_ivfpq_static,ann_pq_rerank,ann_ivf_adaptive,pq_subspace_balance,embed_centroid_drift,knn_classifier_eval,embed_eff_dim,coreset_kcenter,dedup_embedding,dedup_semantic,embed_dist_hist,knn_graph_nndescent,knn_graph_search,knn_graph_search_routed,knn_graph_append,knn_graph_delete,ann_pq_permuted,ann_recall_matrix,knn_graph_filtered,vector_sql_ann,knn_graph_search_pq,vector_sql_ann_graph,vector_sql_ann_l2,vector_sql_ann_graph_l2,vector_sql_ann_dot_fallback,embed_linear_search,vector_sql_ann_dml_delete,vector_sql_ann_dml_update,vector_sql_ann_cosine_recall,vector_sql_ann_count \
  python3 tools/gate.py /tmp/dim384_data /tmp/dim384_out
