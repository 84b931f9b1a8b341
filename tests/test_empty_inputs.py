"""Empty-corpus robustness: every new curation/profile operator must
yield zero rows (not crash) on an empty, schema-typed input."""

import pyarrow as pa
import ray.data as rd


def _empty_docs():
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
        "source": pa.array([], pa.string()),
    }))


def _empty_events():
    import numpy as np
    return rd.from_arrow(pa.table({
        "event_id": pa.array([], pa.int64()),
        "event_type": pa.array([], pa.string()),
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array(np.array([], np.int64), pa.timestamp("us")),
        "value": pa.array([], pa.float64()),
    }))


def test_curation_ops_empty():
    from trustfuse_ray.pipelines.curate import curate_documents
    from trustfuse_ray.stages.curation import (decontaminate, hash_sample,
                                               ngram_jaccard_adjacent,
                                               repetition_signals,
                                               token_pack)

    e = _empty_docs()
    assert decontaminate(e).take_all() == []
    assert repetition_signals(e.select_columns(["doc_id",
                                                "text"])).take_all() == []
    assert ngram_jaccard_adjacent(e).take_all() == []
    assert hash_sample(e).take_all() == []
    assert token_pack(e).take_all() == []
    assert curate_documents(e).take_all() == []


def test_profile_ops_empty():
    from trustfuse_ray.stages.profile import (distinct_count_per_key,
                                              hll_registers, top_tokens,
                                              topk_per_key,
                                              value_histogram,
                                              value_quantiles)
    from trustfuse_ray.stages.text import quality_classify

    d, ev = _empty_docs(), _empty_events()
    assert top_tokens(d).take_all() == []
    assert topk_per_key(
        rd.from_arrow(pa.table({
            "source": pa.array([], pa.string()),
            "n_chars": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64())})),
        "source", "n_chars").take_all() == []
    assert value_quantiles(ev).take_all() == []
    assert value_histogram(ev).take_all() == []
    assert distinct_count_per_key(ev).take_all() == []
    assert hll_registers(ev).take_all() == []
    assert quality_classify(d.select_columns(["doc_id",
                                              "text"])).take_all() == []


def test_joins_empty():
    from trustfuse_ray.stages.joins import range_join_count

    assert range_join_count(_empty_events()).take_all() == []


def test_round3_wave_empty():
    import numpy as np

    from trustfuse_ray.fuse.voting import voting_incremental
    from trustfuse_ray.reverse import (conflict_profile, fused_provenance,
                                       snapshot_diff)
    from trustfuse_ray.stages.ann import embedding_quantize
    from trustfuse_ray.stages.curation import mixture_order
    from trustfuse_ray.stages.graph import kg_negative_samples
    from trustfuse_ray.stages.profile import bpe_pair_counts

    d = _empty_docs()
    assert bpe_pair_counts(d).take_all() == []
    assert mixture_order(d, {}, n_parts=2).take_all() == []

    claims = rd.from_arrow(pa.table({
        "source": pa.array([], pa.string()),
        "entity": pa.array([], pa.string()),
        "attr": pa.array([], pa.string()),
        "value_str": pa.array([], pa.string()),
        "value_num": pa.array([], pa.float64()),
        "value_type": pa.array([], pa.string()),
    }))
    assert fused_provenance(claims, n_parts=2).take_all() == []
    assert conflict_profile(claims, n_parts=2).take_all() == []
    assert voting_incremental(claims, claims, n_parts=2).take_all() == []
    assert kg_negative_samples(claims, n_parts=2).take_all() == []

    shaped = rd.from_arrow(pa.table({
        "entity": pa.array([], pa.string()),
        "attr": pa.array([], pa.string()),
        "value_str": pa.array([], pa.string()),
        "value_num": pa.array([], pa.float64()),
    }))
    assert snapshot_diff(shaped, shaped, n_parts=2).take_all() == []

    embs = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32())),
    }))
    assert embedding_quantize(embs).take_all() == []


def test_round4_ops_empty():
    import numpy as np

    from trustfuse_ray.reverse import (dangling_refs, entity_signatures,
                                       fact_history, source_pair_agreement,
                                       voting_recency)
    from trustfuse_ray.stages.assemble import sft_pairs
    from trustfuse_ray.stages.curation import length_bucket_batches
    from trustfuse_ray.stages.profile import bpe_encode, bpe_merges
    from trustfuse_ray.stages.text import per_source_median_gate
    from trustfuse_ray.stages.windows import rolling_active_users

    e_docs = _empty_docs()
    assert bpe_merges(e_docs).take_all() == []
    assert bpe_encode(e_docs).take_all() == []
    assert length_bucket_batches(e_docs).take_all() == []
    assert per_source_median_gate(e_docs).take_all() == []
    assert rolling_active_users(_empty_events()).take_all() == []

    e_claims = rd.from_arrow(pa.table({
        "source": pa.array([], pa.string()),
        "entity": pa.array([], pa.string()),
        "attr": pa.array([], pa.string()),
        "value_str": pa.array([], pa.string()),
        "value_type": pa.array([], pa.string()),
        "ts": pa.array(np.array([], np.int64), pa.timestamp("us")),
    }))
    assert entity_signatures(e_claims).take_all() == []
    assert source_pair_agreement(e_claims).take_all() == []
    assert voting_recency(e_claims).take_all() == []
    assert fact_history(e_claims).take_all() == []
    assert dangling_refs(e_claims).take_all() == []

    e_turns = rd.from_arrow(pa.table({
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int32()),
        "role": pa.array([], pa.string()),
        "text": pa.array([], pa.string()),
    }))
    assert sft_pairs(e_turns).take_all() == []


def test_round4_transcript_ops_null_text():
    import numpy as np

    from trustfuse_ray.stages.assemble import role_transitions, sft_pairs
    from trustfuse_ray.stages.text import conv_lang_switches

    turns = rd.from_arrow(pa.table({
        "conv_id": pa.array(["c", "c", "c"], pa.string()),
        "turn_idx": pa.array([0, 1, 2], pa.int32()),
        "role": pa.array(["user", "assistant", None], pa.string()),
        "text": pa.array([None, "resp", None], pa.string()),
    }))
    pairs = sft_pairs(turns, n_parts=2).take_all()
    assert [(r["turn_idx"], r["prompt"], r["response"]) for r in pairs] \
        == [(1, "user: ", "resp")]
    rt = {(r["role_from"], r["role_to"]): r["n"]
          for r in role_transitions(turns, n_parts=2).take_all()}
    assert rt == {("user", "assistant"): 1, ("assistant", ""): 1}
    ls = conv_lang_switches(turns, n_parts=2).take_all()
    assert ls[0]["n_turns"] == 3


def test_wave3_ops_empty():
    from trustfuse_ray.stages.ann import (centroid_confusion,
                                          centroid_separation,
                                          label_cohesion)
    from trustfuse_ray.stages.curation import curriculum_schedule
    from trustfuse_ray.stages.graph import label_propagation, reachability
    from trustfuse_ray.stages.text import dedup_keep_best, normalized_dedup
    from trustfuse_ray.stages.windows import user_gap_median

    d, ev = _empty_docs(), _empty_events()
    edges = rd.from_arrow(pa.table({
        "src": pa.array([], pa.string()),
        "dst": pa.array([], pa.string())}))
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32())),
        "label": pa.array([], pa.int32())}))
    assert reachability(edges, k=2, n_parts=2).take_all() == []
    assert label_propagation(edges, rounds=2, n_parts=2).take_all() == []
    assert curriculum_schedule(d).take_all() == []
    assert centroid_confusion(emb).take_all() == []
    assert centroid_separation(emb).take_all() == []
    assert label_cohesion(emb).take_all() == []
    assert normalized_dedup(d).take_all() == []
    assert dedup_keep_best(d).take_all() == []
    assert user_gap_median(ev, n_parts=2).take_all() == []
