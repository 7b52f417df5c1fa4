"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: no
ray.init()/ray.shutdown() here or in any code path these call.

- ``entry()``: flagship pipeline — build the inverted index over the
  sf0.001 documents table (code tokenizer, hash doc ids, dedup) and
  serve the fixed BM25 query set through the actor-pool scorer.
- ``queries()``: one entry per implemented operator/pipeline
  (SURVEY.md §2 + the training-data ops); each callable takes sf_dir.
- ``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible
  entry (same column names, same rounding).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    import ray.data

    from docinsight_ray.build import build_index
    from docinsight_ray.config import EngineConfig
    from docinsight_ray.pipelines.documents import DOC_QUERIES, documents_as_corpus
    from docinsight_ray.scorer import query_index
    import pyarrow as pa

    sf_dir = "/root/testdata/sf0.001"
    cfg = EngineConfig(tokenizer="code", doc_id_mode="column", dedup=True)
    index_dir = f"/tmp/docinsight_ray_idx/flagship-{cfg.config_hash()}"
    build_index(documents_as_corpus(sf_dir), index_dir, cfg, fingerprint=f"flagship:{sf_dir}")
    qtbl = pa.table(
        {
            "query_id": pa.array([q[0] for q in DOC_QUERIES], type=pa.int64()),
            "text": pa.array([q[1] for q in DOC_QUERIES], type=pa.string()),
            "k": pa.array([10] * len(DOC_QUERIES), type=pa.uint32()),
        }
    )
    qds = ray.data.from_arrow(qtbl)
    return query_index(qds, index_dir, cfg, mode="maxscore", concurrency=2)


def queries() -> dict[str, Callable[[str], Any]]:
    from docinsight_ray.pipelines.documents import QUERIES as DOC_Q
    from docinsight_ray.functions.textstats import QUERIES as TEXT_Q
    from docinsight_ray.functions.dedup import QUERIES as DEDUP_Q
    from docinsight_ray.functions.knn import QUERIES as KNN_Q
    from docinsight_ray.functions.windows import QUERIES as WIN_Q
    from docinsight_ray.functions.multimodal import QUERIES as MM_Q
    from docinsight_ray.functions.chunking import QUERIES as CHUNK_Q
    from docinsight_ray.pipelines.relational import QUERIES as REL_Q
    from docinsight_ray.functions.corpusops import QUERIES as CORPUS_Q
    from docinsight_ray.functions.semistruct import QUERIES as SEMI_Q
    from docinsight_ray.functions.sketches import QUERIES as SKETCH_Q
    from docinsight_ray.pipelines.prepare import QUERIES as PREP_Q
    from docinsight_ray.functions.bpe import QUERIES as BPE_Q
    from docinsight_ray.functions.classify import QUERIES as CLS_Q
    from docinsight_ray.functions.vecstats import QUERIES as VEC_Q
    from docinsight_ray.functions.graph import QUERIES as GRAPH_Q
    from docinsight_ray.pipelines.ann import QUERIES as ANN_Q
    from docinsight_ray.functions.unigram import QUERIES as UNI_Q

    from docinsight_ray.pipelines.conformance import q_reference_topk

    out: dict[str, Callable[[str], Any]] = {}
    for d in (DOC_Q, TEXT_Q, DEDUP_Q, KNN_Q, WIN_Q, MM_Q, CHUNK_Q, REL_Q, CORPUS_Q, SEMI_Q,
              SKETCH_Q, PREP_Q, BPE_Q, CLS_Q, VEC_Q, GRAPH_Q, ANN_Q, UNI_Q):
        out.update(d)
    # the reference query set on the REAL reference corpus (ignores
    # sf_dir; no SQL oracle — rank-identity + plagiarism conformance
    # asserted by tests/test_reference_corpus.py and CONFORMANCE.json)
    out["reference_topk"] = q_reference_topk
    # The driver samples a prefix of this dict's stable ordering each
    # round. Rotate gates it has never verified (absent from
    # CORRECTNESS_r01..r04) to the front so each round's sample covers
    # the newest surface; new gates are unsampled by definition and
    # enumerate first automatically. (VERDICT r3 #2, VERDICT r4 #1.)
    sampled = _DRIVER_SAMPLED_R1_R3 | _DRIVER_SAMPLED_R4
    front = {k: v for k, v in out.items() if k not in sampled}
    front.update((k, v) for k, v in out.items() if k in sampled)
    return front


# Gates the driver has already full-oracle-verified in rounds 1-3
# (union of CORRECTNESS_r0{1,2,3}.json keys — historical fact, frozen).
_DRIVER_SAMPLED_R1_R3 = frozenset({
    "bm25_boosting", "bm25_collapse", "bm25_conjunctive", "bm25_constant_score",
    "bm25_decay", "bm25_dismax", "bm25_doc_query", "bm25_explain", "bm25_facets",
    "bm25_filtered", "bm25_fuzzy", "bm25_hydrated", "bm25_length_histogram",
    "bm25_merged", "bm25_more_like_this", "bm25_msm", "bm25_must", "bm25_negated",
    "bm25_page2", "bm25_prefix", "bm25_range", "bm25_regex", "bm25_rerank",
    "bm25_rm3", "bm25_sort_field", "bm25_stemmed", "bm25_structured",
    "bm25_tombstone", "bm25_topk", "bm25_topk_bmw", "bm25_topk_lazy",
    "bm25_total_hits", "bm25plus_topk", "chunk_docs", "corpus_stats",
    "doc_filter", "doc_fingerprint", "docs_registry", "embedding_near_dup",
    "embedding_near_dup_lsh", "exact_dedup", "highlight", "hybrid_rrf",
    "index_stats", "knn_cosine", "knn_cosine_ivf", "knn_cosine_lsh", "lang_id",
    "lineitem_agg", "lmdir_topk", "minhash_lsh_pairs", "multimodal_features",
    "ngram_jaccard_pairs", "orders_by_nation", "percolate", "phrase_index_topk",
    "phrase_prefix_topk", "positions_probe", "postings_probe", "proximity_topk",
    "quality_score", "reference_topk", "rrf_topk", "sessionize",
    "significant_terms", "simhash64", "spellcheck", "suggest", "suggest_phrase",
    "term_df_top100", "token_count", "top_parts_by_size", "windowed_agg",
})

# Gates the driver verified in round 4 (CORRECTNESS_r04.json keys —
# historical fact, frozen; kept separate so each round's provenance
# is auditable).
_DRIVER_SAMPLED_R4 = frozenset({
    'asof_join', 'bm25_boosted', 'bm25_fielded', 'bm25_rank_feature',
    'bm25_synonyms', 'budget_select', 'custdist', 'dataset_split', 'decontaminate',
    'doc_rollup', 'dup_clusters', 'event_funnel', 'event_pivot', 'event_retention',
    'event_transitions', 'extended_stats', 'gopher_rules', 'hard_negatives',
    'jaccard_topk', 'knn_cosine_filtered', 'knn_cosine_pq', 'knn_cosine_sq8',
    'knn_graph_mutual', 'knn_mmr', 'knn_range', 'lapsed_customers', 'large_orders',
    'length_quantiles', 'map_eval', 'multimodal_real', 'ndcg_eval', 'phrase_match',
    'pii_redact', 'priority_semi_join', 'promo_revenue', 'range_join',
    'retrieval_eval', 'returned_revenue', 'revenue_by_nation', 'semdedup',
    'sequence_pack', 'simhash_near_dup', 'sliding_agg', 'term_vectors',
    'tfidf_top_terms', 'top_event_type', 'top_unshipped_orders', 'topk_per_group',
    'user_cum_spend', 'windowed_delta',
})


def oracle_sql() -> dict[str, str]:
    from docinsight_ray.pipelines.documents import ORACLE_SQL as DOC_S
    from docinsight_ray.functions.textstats import ORACLE_SQL as TEXT_S
    from docinsight_ray.functions.dedup import ORACLE_SQL as DEDUP_S
    from docinsight_ray.functions.knn import ORACLE_SQL as KNN_S
    from docinsight_ray.functions.windows import ORACLE_SQL as WIN_S
    from docinsight_ray.functions.multimodal import ORACLE_SQL as MM_S
    from docinsight_ray.functions.chunking import ORACLE_SQL as CHUNK_S
    from docinsight_ray.pipelines.relational import ORACLE_SQL as REL_S
    from docinsight_ray.functions.corpusops import ORACLE_SQL as CORPUS_S
    from docinsight_ray.functions.semistruct import ORACLE_SQL as SEMI_S
    from docinsight_ray.pipelines.prepare import ORACLE_SQL as PREP_S
    from docinsight_ray.functions.classify import ORACLE_SQL as CLS_S
    from docinsight_ray.functions.vecstats import ORACLE_SQL as VEC_S
    from docinsight_ray.functions.graph import ORACLE_SQL as GRAPH_S
    from docinsight_ray.pipelines.ann import ORACLE_SQL as ANN_S

    out: dict[str, str] = {}
    for d in (DOC_S, TEXT_S, DEDUP_S, KNN_S, WIN_S, MM_S, CHUNK_S, REL_S, CORPUS_S, SEMI_S,
              PREP_S, CLS_S, VEC_S, GRAPH_S, ANN_S):
        out.update(d)
    return out
