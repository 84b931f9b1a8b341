"""Hand-computed oracle for common.pairwise_cluster_metrics.

Items a,b,c,d,e with predicted clusters {a,b,c} {d} {e} and truth
families {a,b} {c,d} {e}:
  predicted-same pairs: C(3,2)=3            (ab, ac, bc)
  truth-same pairs:     C(2,2->1)+1 = 2     (ab, cd)
  both:                 ab only = 1
  precision = 1/3, recall = 1/2.
"""

import pyarrow as pa

import ray.data as rd

from trustfuse_ray.stages.common import pairwise_cluster_metrics


def test_pairwise_cluster_metrics_known_case(ray_session):
    labeled = rd.from_arrow(pa.table({
        "pred": pa.array([1, 1, 1, 2, 3], pa.int64()),
        "truth": pa.array([10, 10, 20, 20, 30], pa.int64()),
    }))
    t = pairwise_cluster_metrics(labeled, "pred", "truth",
                                 count_name="n_items")
    row = t.to_pylist()[0]
    assert row == {
        "n_items": 5,
        "n_pred_pairs": 3,
        "n_true_pairs": 2,
        "n_correct_pairs": 1,
        "pair_precision": 1.0 / 3.0,
        "pair_recall": 0.5,
    }


def test_pairwise_cluster_metrics_no_pairs(ray_session):
    labeled = rd.from_arrow(pa.table({
        "pred": pa.array([1, 2], pa.int64()),
        "truth": pa.array([10, 20], pa.int64()),
    }))
    row = pairwise_cluster_metrics(labeled, "pred", "truth").to_pylist()[0]
    assert row["n_pred_pairs"] == 0 and row["n_true_pairs"] == 0
    assert row["pair_precision"] is None and row["pair_recall"] is None
