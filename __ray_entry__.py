"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` / ``ray.shutdown`` here or in the library code these
callables use (only bench.py, CLI entry points and the test fixture
own a Ray session).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: derive transcript
    turns, run the layered extraction (normalize -> segment -> rules ->
    lexicon scoring), return the per-turn Dataset."""
    from jochre3_ocr_ray.ops.transcripts import derive_transcripts
    from jochre3_ocr_ray.pipelines.extract import build_extraction

    turns = derive_transcripts("/root/testdata/sf0.001")
    return build_extraction(turns, include_blocks=True)


def _curate():
    from jochre3_ocr_ray.pipelines import curate

    return curate


def _corpus_prep():
    from jochre3_ocr_ray.pipelines import corpus_prep

    return corpus_prep


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline (SURVEY.md §2)."""
    from jochre3_ocr_ray.ops import dedup, evaluation, multimodal, relational
    from jochre3_ocr_ray.ops import similarity, sketches, textstats, transcripts

    return {
        # flagship extraction pipeline (SURVEY §2.2/§2.3/§3)
        "extract_turns": transcripts.q_extract_turns,
        "glyph_stats": transcripts.q_glyph_stats,
        "assemble_conversations": transcripts.q_assemble_conversations,
        # relational coverage (SURVEY §2.4-2.6 analogs)
        "q1_pricing_summary": relational.q1_pricing_summary,
        "top_customers": relational.q_top_customers,
        "revenue_by_nation": relational.q_revenue_by_nation,
        "events_daily": relational.q_events_daily,
        "distinct_event_types": relational.q_distinct_event_types,
        "orders_filter": relational.q_orders_filter,
        "top_parts": relational.q_top_parts,
        "event_sessions": relational.q_event_sessions,
        "event_union": relational.q_event_union,
        "order_lineitem_join": relational.q_order_lineitem_join,
        "events_sliding": relational.q_events_sliding,
        "events_asof": relational.q_events_asof,
        # consolidated ANTI+SEMI (both kernels run; tagged union) so the
        # whole surface fits the driver's 50-slot correctness window
        "customers_semi_anti": relational.q_customers_semi_anti,
        # events_quantiles_histogram shares this oracle; its
        # equality-to-exact pin lives in tests/test_ops.py
        # (TestHistogramQuantiles)
        "events_quantiles": relational.q_events_quantiles,
        "events_quantiles_tdigest": relational.q_events_quantiles_tdigest,
        "events_user_hll": sketches.q_events_user_hll,
        "heavy_hitter_users": sketches.q_heavy_hitter_users,
        "sample_documents": relational.q_sample_documents,
        "top_orders_per_priority": relational.q_top_orders_per_priority,
        "events_corr": relational.q_events_corr,
        "events_pivot": relational.q_events_pivot,
        # dedup family (§2.7 + training-data ops); ngram+simhash are a
        # tagged union (both kernels run — same consolidation shape as
        # customers_semi_anti) so the surface fits the 50-slot window
        "dedup_exact": dedup.q_dedup_exact,
        "dedup_minhash": dedup.q_dedup_minhash,
        "dedup_ngram_simhash": dedup.q_dedup_ngram_simhash,
        "dedup_semantic": dedup.q_dedup_semantic,
        "dedup_exact_substring": dedup.q_dedup_exact_substring,
        "embedding_near_dup": dedup.q_embedding_near_dup,
        "dedup_clusters": dedup.q_dedup_clusters,
        "decontaminate": dedup.q_decontaminate,
        # similarity search; approx_accuracy = consolidated LSH-recall
        # + IVF-recall invariant rows (both kernels run)
        "ann_cosine_topk": similarity.q_ann_cosine_topk,
        "approx_accuracy": similarity.q_approx_accuracy,
        # text analysis — doc_profile is the fused one-scan composition
        # of token_count / token_count_bpe / quality_score / fingerprint
        # / langid / pii_scrub / repetition_stats (all still exposed
        # individually in ops.textstats + pytest-pinned; the shared
        # per-batch kernels make drift impossible)
        "doc_profile": textstats.q_doc_profile,
        "chunk_documents": textstats.q_chunk_documents,
        "tfidf_top_terms": textstats.q_tfidf_top_terms,
        "pack_sequences": textstats.q_pack_sequences,
        # multimodal plumbing — decode-once fusion of media_features /
        # media_frames / media_resize (standalone stages still exposed)
        "media_pipeline": multimodal.q_media_pipeline,
        # training-side corpus prep (corpus/learning analogs)
        "corpus_alphabet": _corpus_prep().q_corpus_alphabet,
        "training_line_examples": _corpus_prep().q_training_line_examples,
        "training_word_examples": _corpus_prep().q_training_word_examples,
        "yolo_annotations": _corpus_prep().q_yolo_annotations,
        "word_to_glyph_annotations": _corpus_prep().q_word_to_glyph_annotations,
        "rotation_annotations": _corpus_prep().q_rotation_annotations,
        "glyph_eval": _corpus_prep().q_glyph_eval,
        # evaluation metrics (Evaluator analog)
        "eval_extraction": evaluation.q_eval_extraction,
        # training-data curation pipeline (ops composed);
        # curate_documents = tagged union of the exact-dedup-only and
        # near-dup-cluster-pruned variants (both run)
        "curate_documents": _curate().q_curate_documents_all,
        "curate_training_chunks": _curate().q_curate_training_chunks,
        # balanced per-(lang,source) training mix + deterministic tape
        "balanced_mix": _curate().q_balanced_mix,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle for EVERY query above — including the approximate
    ops: LSH/IVF entries return driver-checkable accuracy rows whose
    hard columns (true-pair counts, exact-top-1 echoes) the SQL
    recomputes independently; minhash/simhash/cluster pair sets are
    deterministic on this corpus and checked against exact SQL ground
    truth (see ops/dedup.py docstring)."""
    from jochre3_ocr_ray.ops import dedup, evaluation, multimodal, relational
    from jochre3_ocr_ray.ops import similarity, sketches, textstats, transcripts

    return {
        "extract_turns": transcripts.Q_EXTRACT_TURNS_SQL,
        "glyph_stats": transcripts.Q_GLYPH_STATS_SQL,
        "assemble_conversations": transcripts.Q_ASSEMBLE_CONVERSATIONS_SQL,
        "q1_pricing_summary": relational.Q1_SQL,
        "top_customers": relational.Q_TOP_CUSTOMERS_SQL,
        "revenue_by_nation": relational.Q_REVENUE_BY_NATION_SQL,
        "events_daily": relational.Q_EVENTS_DAILY_SQL,
        "distinct_event_types": relational.Q_DISTINCT_EVENT_TYPES_SQL,
        "orders_filter": relational.Q_ORDERS_FILTER_SQL,
        "top_parts": relational.Q_TOP_PARTS_SQL,
        "event_sessions": relational.Q_EVENT_SESSIONS_SQL,
        "event_union": relational.Q_EVENT_UNION_SQL,
        "order_lineitem_join": relational.Q_ORDER_LINEITEM_JOIN_SQL,
        "events_sliding": relational.Q_EVENTS_SLIDING_SQL,
        "events_asof": relational.Q_EVENTS_ASOF_SQL,
        "customers_semi_anti": relational.Q_CUSTOMERS_SEMI_ANTI_SQL,
        "events_quantiles": relational.Q_EVENTS_QUANTILES_SQL,
        "events_quantiles_tdigest": relational.Q_EVENTS_QUANTILES_TDIGEST_SQL,
        "events_user_hll": sketches.Q_EVENTS_USER_HLL_SQL,
        "heavy_hitter_users": sketches.Q_HEAVY_HITTER_USERS_SQL,
        "sample_documents": relational.Q_SAMPLE_DOCUMENTS_SQL,
        "top_orders_per_priority": relational.Q_TOP_ORDERS_PER_PRIORITY_SQL,
        "events_corr": relational.Q_EVENTS_CORR_SQL,
        "events_pivot": relational.Q_EVENTS_PIVOT_SQL,
        "dedup_exact": dedup.Q_DEDUP_EXACT_SQL,
        "dedup_minhash": dedup.Q_DEDUP_MINHASH_SQL,
        "dedup_ngram_simhash": dedup.Q_DEDUP_NGRAM_SIMHASH_SQL,
        "dedup_semantic": dedup.Q_DEDUP_SEMANTIC_SQL,
        "dedup_exact_substring": dedup.Q_DEDUP_EXACT_SUBSTRING_SQL,
        "dedup_clusters": dedup.Q_DEDUP_CLUSTERS_SQL,
        "decontaminate": dedup.Q_DECONTAMINATE_SQL,
        "embedding_near_dup": dedup.Q_EMBEDDING_NEAR_DUP_SQL,
        "ann_cosine_topk": similarity.Q_ANN_COSINE_TOPK_SQL,
        "approx_accuracy": similarity.Q_APPROX_ACCURACY_SQL,
        "doc_profile": textstats.Q_DOC_PROFILE_SQL,
        "chunk_documents": textstats.Q_CHUNK_DOCUMENTS_SQL,
        "tfidf_top_terms": textstats.Q_TFIDF_TOP_TERMS_SQL,
        "pack_sequences": textstats.Q_PACK_SEQUENCES_SQL,
        "media_pipeline": multimodal.Q_MEDIA_PIPELINE_SQL,
        "corpus_alphabet": _corpus_prep().Q_CORPUS_ALPHABET_SQL,
        "training_line_examples": _corpus_prep().Q_TRAINING_LINE_EXAMPLES_SQL,
        "training_word_examples": _corpus_prep().Q_TRAINING_WORD_EXAMPLES_SQL,
        "yolo_annotations": _corpus_prep().Q_YOLO_ANNOTATIONS_SQL,
        "word_to_glyph_annotations": _corpus_prep().Q_WORD_TO_GLYPH_ANNOTATIONS_SQL,
        "rotation_annotations": _corpus_prep().Q_ROTATION_ANNOTATIONS_SQL,
        "glyph_eval": _corpus_prep().Q_GLYPH_EVAL_SQL,
        "eval_extraction": evaluation.Q_EVAL_EXTRACTION_SQL,
        "curate_documents": _curate().Q_CURATE_DOCUMENTS_ALL_SQL,
        "curate_training_chunks": _curate().Q_CURATE_TRAINING_CHUNKS_SQL,
        "balanced_mix": _curate().Q_BALANCED_MIX_SQL,
    }
