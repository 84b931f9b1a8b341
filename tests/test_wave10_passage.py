"""Round-5 wave 10: passage ranking, trending tokens, extractive
summary salience — planted cases."""

import pyarrow as pa


def test_passage_best_window_planted():
    import ray.data as rd

    from trustfuse_ray.stages.profile import passage_best_windows

    # doc 1: hits clustered past the first window; with window=4 and
    # stride=2 the best span is the one holding both 'x x'
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b c d e x x h",
                          "x a a a"], pa.string())}))
    out = passage_best_windows(ds, terms=("x",), window=4, stride=2, k=10)
    d = {int(i): (int(w), int(h), int(rk)) for i, w, h, rk in zip(
        out["doc_id"].to_pylist(), out["win_idx"].to_pylist(),
        out["hits"].to_pylist(), out["rank"].to_pylist())}
    # doc1 windows (stride 2): [a b c d]=0, [c d e x]=1, [e x x h]=2,
    # best = win 2 with 2 hits
    assert d[1][0] == 2 and d[1][1] == 2
    # doc2: single window 0 with 1 hit
    assert d[2][0] == 0 and d[2][1] == 1
    # global ranking: doc1 (2 hits) before doc2 (1 hit)
    assert d[1][2] == 1 and d[2][2] == 2


def test_passage_no_hits_dropped():
    import ray.data as rd

    from trustfuse_ray.stages.profile import passage_best_windows

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([5], pa.int64()),
        "text": pa.array(["nothing relevant here"], pa.string())}))
    out = passage_best_windows(ds, terms=("x",), window=4, stride=2, k=3)
    assert out.num_rows == 0


def test_trending_tokens_planted():
    import datetime

    import ray.data as rd

    from trustfuse_ray.stages.profile import trending_tokens

    rows = [
        (datetime.datetime(2024, 1, 1, 3), "apple apple pear"),
        (datetime.datetime(2024, 1, 1, 9), "apple kiwi"),
        (datetime.datetime(2024, 1, 2, 1), "kiwi kiwi kiwi"),
    ]
    ds = rd.from_arrow(pa.table({
        "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
        "text": pa.array([r[1] for r in rows], pa.string())}))
    out = trending_tokens(ds, k=2).take_all()
    day1 = (datetime.datetime(2024, 1, 1)
            - datetime.datetime(1970, 1, 1)).days
    by_day: dict = {}
    for r in out:
        by_day.setdefault(r["day"], []).append((r["token"], r["n"]))
    assert sorted(by_day[day1]) == [("apple", 3), ("kiwi", 1)]
    assert by_day[day1 + 1] == [("kiwi", 3)]
