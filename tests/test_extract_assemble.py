"""Extraction + reassembly stages (north-rule invariant checks)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from trustfuse_ray.stages.assemble import (TurnOrderError,
                                           assemble_conversations)
from trustfuse_ray.stages.extract import TripleExtractor, extract_triples


def _transcripts(rows):
    return ray.data.from_arrow(pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "tool": pa.array([r[4] for r in rows], pa.string()),
        "ts": pa.array([np.datetime64("2026-01-01", "us")] * len(rows)),
    }))


def test_extractor_parses_claims():
    ex = TripleExtractor()
    batch = _transcripts([
        ("c1", 0, "assistant", "Hello. The color of E00001 is red.", "wiki"),
        ("c1", 1, "user", "The color of E00001 is blue.", ""),  # user: skipped
        ("c1", 2, "tool", "The population of node 3 prime is 1,234. "
                          "The color of E00002 is green .", "db"),
        ("c1", 3, "tool", "no claims here", "db"),
    ]).take_all()
    tbl = pa.Table.from_pylist(batch)
    out = ex(tbl)
    rows = out.to_pylist()
    assert len(rows) == 3
    assert rows[0]["source"] == "assistant:wiki"
    assert rows[0]["attr"] == "color" and rows[0]["raw_value"] == "red"
    assert rows[1]["mention"] == "node 3 prime"
    assert rows[1]["raw_value"] == "1,234"
    assert rows[2]["raw_value"] == "green "  # trailing space kept raw
    # claim ids are distinct + stable
    assert len({r["claim_id"] for r in rows}) == 3
    assert ex(tbl)["claim_id"].to_pylist() == out["claim_id"].to_pylist()


def test_extract_dataset_stage():
    ds = _transcripts([
        ("c1", 0, "assistant", "The color of X is red.", "wiki"),
        ("c2", 0, "assistant", "nothing", "wiki"),
    ])
    out = extract_triples(ds, concurrency=(1, 2)).take_all()
    assert len(out) == 1


def test_assemble_restores_turn_order():
    ds = _transcripts([
        ("c1", 2, "user", "t2", ""),
        ("c1", 0, "user", "t0", ""),
        ("c1", 1, "user", "t1", ""),
        ("c2", 0, "user", "only", ""),
    ])
    rows = {r["conv_id"]: r for r in assemble_conversations(ds).take_all()}
    assert rows["c1"]["transcript"] == "t0\nt1\nt2"
    assert rows["c1"]["n_turns"] == 3
    assert rows["c2"]["transcript"] == "only"


def test_assemble_rejects_duplicate_turns():
    ds = _transcripts([
        ("c1", 0, "user", "a", ""),
        ("c1", 0, "user", "b", ""),
    ])
    with pytest.raises(Exception) as ei:
        assemble_conversations(ds).take_all()
    assert "duplicate turn_idx" in str(ei.value)


def test_turn_equality_invariant_on_synth(synth_dir):
    """Per-turn text equality under stable turn ordering: reassembling the
    shuffled synthetic transcripts and re-splitting yields the original
    (conv_id, turn_idx, text) set exactly."""
    ds = ray.data.read_parquet(synth_dir + "/transcripts")
    original = {(r["conv_id"], r["turn_idx"]): r["text"]
                for r in ds.take_all()}
    reassembled = assemble_conversations(ds).take_all()
    rebuilt = {}
    for conv in reassembled:
        # transcripts were joined in turn order; texts contain no newlines
        for i, txt in enumerate(conv["transcript"].split("\n")):
            rebuilt[(conv["conv_id"], sorted(
                ti for (c, ti) in original if c == conv["conv_id"])[i])] = txt
    assert rebuilt == original


def test_extractor_vectorized_matches_loop():
    """The Arrow-vectorized default-pattern path must be row- and
    claim_id-identical to the generic findall loop, including edge cases:
    unterminated trailing claims, ' is ' inside mentions, non-charset
    characters between 'is' and the period, and multi-claim turns."""
    ex = TripleExtractor()
    rows = [
        ("c1", 0, "assistant", "Hello. The color of E1 is red.", "wiki"),
        ("c1", 1, "user", "The color of E1 is blue.", ""),
        ("c1", 2, "tool", "The population of node 3 prime is 1,234. "
                          "The color of E2 is green .", "db"),
        ("c1", 3, "tool", "no claims here", "db"),
        # unterminated: must NOT match (no trailing period)
        ("c2", 0, "assistant", "The color of E3 is red", None),
        # value blocked by a non-charset char before the period
        ("c2", 1, "assistant", "The color of E4 is red; maybe.", "x"),
        # mention containing " is " (lazy stops at the first " is ")
        ("c2", 2, "assistant", "The state of what is seen is unknown.", "x"),
        # three claims in one turn exercises seq numbering
        ("c3", 0, "tool", "The a_b of X is 1. The c of Y is 2. "
                          "The d of Z is 3.", "t"),
        # claim not at sentence start (unanchored match)
        ("c3", 1, "assistant", "note that The size of Q is large.", ""),
    ]
    tbl = pa.Table.from_pylist([
        {"conv_id": c, "turn_idx": t, "role": r, "text": x, "tool": tl,
         "ts": 1700000000000000 + 17 * t}
        for c, t, r, x, tl in rows
    ], schema=pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int32()),
        ("role", pa.string()), ("text", pa.string()),
        ("tool", pa.string()), ("ts", pa.timestamp("us")),
    ]))
    vec = ex._call_vectorized(tbl).to_pylist()
    loop = ex._call_loop(tbl).to_pylist()
    assert vec == loop
    # c1: 3 claims; c2: ';' blocks one, "what is seen is unknown" matches
    # (value = "seen is unknown"); c3: 3 + 1 claims
    assert len(vec) == 8
    assert ex(tbl).to_pylist() == vec  # dispatch uses the vectorized path


def test_fnv64_batch_matches_scalar():
    from trustfuse_ray.stages.extract import fnv64, fnv64_batch
    keys = ["", "a", "c0001|17|2", "x" * 65, "conv|0|0", "Ü-umlaut|1|0"]
    arr = pa.chunked_array([keys[:3], keys[3:]])
    got = fnv64_batch(arr).to_pylist()
    assert got == [fnv64(k) for k in keys]
    # sliced (offset != 0) array goes through the offset-aware buffer path
    flat = pa.array(keys)
    assert fnv64_batch(flat.slice(2, 3)).to_pylist() == \
        [fnv64(k) for k in keys[2:5]]


def test_conversation_profile_stats():
    import pyarrow as pa
    import ray.data as rd

    from trustfuse_ray.stages.assemble import conversation_profile

    rows = [
        ("c1", 0, "user", "", 1_000_000),
        ("c1", 1, "assistant", "db", 3_000_000),
        ("c1", 2, "tool", "db", 9_000_000),
        ("c2", 0, "user", None, 5_000_000),
    ]
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "tool": pa.array([r[3] for r in rows], pa.string()),
        "ts": pa.array([r[4] for r in rows], pa.timestamp("us")),
        "text": pa.array(["x"] * len(rows), pa.string()),
    })
    out = {r["conv_id"]: r for r in conversation_profile(
        rd.from_arrow(t).repartition(2), n_parts=2).take_all()}
    c1 = out["c1"]
    assert (c1["n_turns"], c1["n_roles"], c1["n_tool_turns"]) == (3, 3, 2)
    assert c1["max_turn_idx"] == 2 and c1["span_us"] == 8_000_000
    c2 = out["c2"]
    assert (c2["n_turns"], c2["n_tool_turns"], c2["span_us"]) == (1, 0, 0)


def test_conversation_dedup_keeps_min_conv():
    import pyarrow as pa
    import ray.data as rd

    from trustfuse_ray.stages.assemble import conversation_dedup

    rows = [
        # c2 == c1's text (turns arrive out of order for c2)
        ("c1", 0, "hello"), ("c1", 1, "world"),
        ("c2", 1, "world"), ("c2", 0, "hello"),
        ("c3", 0, "different"),
    ]
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "text": pa.array([r[2] for r in rows], pa.string()),
        "role": pa.array(["user"] * len(rows), pa.string()),
    })
    out = {r["conv_id"]: (r["fp"], r["keep"]) for r in conversation_dedup(
        rd.from_arrow(t).repartition(3), n_parts=2).take_all()}
    assert out["c1"][0] == out["c2"][0] != out["c3"][0]
    assert (out["c1"][1], out["c2"][1], out["c3"][1]) == (1, 0, 1)


def test_sft_pairs_prompt_assembly():
    from trustfuse_ray.stages.assemble import sft_pairs

    # turns arrive shuffled; assistant turn 0 has no context and is skipped
    out = sft_pairs(_transcripts([
        ("c1", 2, "assistant", "final answer", "kb"),
        ("c1", 0, "assistant", "no context yet", "kb"),
        ("c1", 1, "user", "question?", ""),
        ("c2", 0, "user", "hi", ""),
        ("c2", 1, "tool", "lookup", "db"),
        ("c2", 2, "assistant", "resp", "kb"),
    ]), n_parts=4).take_all()
    by = {(r["conv_id"], r["turn_idx"]): r for r in out}
    assert set(by) == {("c1", 2), ("c2", 2)}
    r = by[("c1", 2)]
    assert r["prompt"] == "assistant: no context yet\nuser: question?"
    assert r["response"] == "final answer"
    assert r["n_context_turns"] == 2
    assert r["prompt_chars"] == len(r["prompt"])
    assert r["response_chars"] == len("final answer")
    assert by[("c2", 2)]["prompt"] == "user: hi\ntool: lookup"


def test_role_transitions_counts():
    from trustfuse_ray.stages.assemble import role_transitions

    out = {(r["role_from"], r["role_to"]): r["n"]
           for r in role_transitions(_transcripts([
               ("c1", 1, "user", "q", ""),       # shuffled turn order
               ("c1", 0, "assistant", "a", "kb"),
               ("c1", 2, "assistant", "a", "kb"),
               ("c2", 0, "user", "q", ""),
               ("c2", 1, "assistant", "a", "kb"),
               ("c3", 0, "tool", "solo turn", "db"),
           ]), n_parts=4).take_all()}
    assert out == {("assistant", "user"): 1, ("user", "assistant"): 2}


def test_response_boilerplate_recurrence():
    from trustfuse_ray.stages.assemble import response_boilerplate

    out = response_boilerplate(_transcripts([
        ("c1", 0, "user", "q", ""), ("c1", 1, "assistant", "SAME", "kb"),
        ("c2", 0, "user", "q", ""), ("c2", 1, "assistant", "SAME", "kb"),
        ("c3", 0, "user", "q", ""), ("c3", 1, "assistant", "unique", "kb"),
    ]), n_parts=4).take_all()
    assert len(out) == 1
    assert (out[0]["n_pairs"], out[0]["n_convs"]) == (2, 2)


def test_conv_lead_summary_sentences():
    from trustfuse_ray.stages.assemble import conv_lead_summary

    out = {r["conv_id"]: r for r in conv_lead_summary(_transcripts([
        ("c1", 1, "assistant", "Second turn. More.", "kb"),
        ("c1", 0, "user", "First sentence. Rest here.", ""),
        ("c2", 0, "user", "no period at all", ""),
    ]), n_parts=4).take_all()}
    r = out["c1"]
    assert r["lead"] == "First sentence."
    assert r["tail_lead"] == "Second turn."
    assert r["n_turns"] == 2
    assert r["total_chars"] == len("First sentence. Rest here.") + len(
        "Second turn. More.")
    # single-turn conv: lead and tail_lead are the same turn
    assert out["c2"]["lead"] == "no period at all"
    assert out["c2"]["tail_lead"] == "no period at all"


def test_assistant_latency_buckets():
    import numpy as np
    import ray.data as rd

    from trustfuse_ray.stages.assemble import assistant_latency

    s = 1_000_000
    turns = [  # user at 0s; assistant kb at 1s (bucket bitlen(2)=2);
        # assistant db at 9s (bitlen(10)=4); tool turns ignored
        ("c", 0, "user", "", 0),
        ("c", 1, "assistant", "kb", 1 * s),
        ("c", 2, "tool", "db", 3 * s),
        ("c", 3, "assistant", "db", 9 * s),
        ("d", 0, "assistant", "kb", 0),  # no preceding user: skipped
    ]
    ds = rd.from_arrow(pa.table({
        "conv_id": pa.array([t[0] for t in turns], pa.string()),
        "turn_idx": pa.array([t[1] for t in turns], pa.int32()),
        "role": pa.array([t[2] for t in turns], pa.string()),
        "tool": pa.array([t[3] for t in turns], pa.string()),
        "ts": pa.array(np.array([t[4] for t in turns],
                                dtype="datetime64[us]")),
    })).repartition(2)
    out = {(r["tool"], r["bucket"]): r["n"]
           for r in assistant_latency(ds, n_parts=4).take_all()}
    assert out == {("kb", 2): 1, ("db", 4): 1}


def test_conv_tool_paths_order_and_counts():
    from trustfuse_ray.stages.assemble import conv_tool_paths

    out = {r["path"]: r["n_convs"]
           for r in conv_tool_paths(_transcripts([
               ("c1", 1, "tool", "x", "db"),
               ("c1", 0, "assistant", "x", "kb"),
               ("c2", 0, "assistant", "x", "kb"),
               ("c2", 1, "tool", "x", "db"),
               ("c3", 0, "user", "x", ""),  # no tools: dropped
           ]), n_parts=4).take_all()}
    assert out == {"kb->db": 2}


def test_tool_transitions_skip_empty():
    from trustfuse_ray.stages.assemble import tool_transitions

    out = {(r["tool_from"], r["tool_to"]): r["n"]
           for r in tool_transitions(_transcripts([
               ("c1", 0, "assistant", "x", "kb"),
               ("c1", 1, "user", "x", ""),       # empty tool skipped
               ("c1", 2, "tool", "x", "db"),
               ("c1", 3, "tool", "x", "db"),
               ("c2", 0, "assistant", "x", "kb"),  # single tool: none
           ]), n_parts=4).take_all()}
    assert out == {("kb", "db"): 1, ("db", "db"): 1}


def test_re_training_pairs_attach_text():
    import ray.data as rd

    from trustfuse_ray.stages.extract import re_training_pairs

    claims = rd.from_arrow(pa.table({
        "conv_id": pa.array(["c1", "c1"], pa.string()),
        "turn_idx": pa.array([0, 0], pa.int32()),
        "attr": pa.array(["color", "size"], pa.string()),
        "entity": pa.array(["E1", "E1"], pa.string()),
        "value_str": pa.array(["red", "big"], pa.string()),
    })).repartition(2)
    turns = _transcripts([
        ("c1", 0, "tool", "E1 is red and big.", "db"),
        ("c1", 1, "user", "no claims here", ""),
    ])
    out = sorted((r["relation"], r["value_str"], r["text"])
                 for r in re_training_pairs(claims, turns,
                                            n_parts=4).take_all())
    assert out == [("color", "red", "E1 is red and big."),
                   ("size", "big", "E1 is red and big.")]
