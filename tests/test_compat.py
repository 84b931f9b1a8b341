"""The hash-shuffle schema-broadcast shim (trustfuse_ray/compat.py).

Upstream Ray 2.49 broadcasts a join side's schema to the shuffle
aggregators only with the FIRST block of that side; a zero-row first
block returns before the fan-out, so partitions that receive no
non-empty shard finalize schema-less tables and ``pa.Table.join``
raises ArrowInvalid.  These cases fail deterministically without the
shim (importing trustfuse_ray installs it)."""

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

import trustfuse_ray  # noqa: F401  (installs the shim)


def test_shim_installed():
    from ray.data._internal.execution.operators import hash_shuffle as hs

    assert getattr(hs, "_trustfuse_schema_safe", False)


def test_join_with_fully_empty_side(ray_session):
    left = rd.from_arrow(pa.table({"k": list(range(200)),
                                   "v": [1.0] * 200}))
    right = rd.from_arrow(pa.table({"rk": pa.array([], pa.int64()),
                                    "w": pa.array([], pa.float64())}))
    j = left.join(right, join_type="inner", num_partitions=8,
                  on=("k",), right_on=("rk",))
    assert j.count() == 0


def test_join_side_with_empty_first_block(ray_session):
    # A filtered side where most blocks produce zero rows — whichever
    # block arrives first, the schema must still reach every partition.
    base = rd.from_arrow(pa.table({
        "rk": list(range(64)), "w": [float(i) for i in range(64)]}))

    def _filt(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["rk"], 7))

    right = base.repartition(16).map_batches(
        _filt, batch_format="pyarrow", zero_copy_batch=True)
    left = rd.from_arrow(pa.table({"k": list(range(1000)),
                                   "v": [1.0] * 1000}))
    j = left.join(right, join_type="inner", num_partitions=8,
                  on=("k",), right_on=("rk",))
    out = j.take_all()
    assert len(out) == 1 and out[0]["w"] == 7.0


def test_left_outer_join_with_empty_right(ray_session):
    left = rd.from_arrow(pa.table({"k": [1, 2, 3], "v": [1.0, 2.0, 3.0]}))
    right = rd.from_arrow(pa.table({"rk": pa.array([], pa.int64()),
                                    "w": pa.array([], pa.float64())}))
    j = left.join(right, join_type="left_outer", num_partitions=4,
                  on=("k",), right_on=("rk",))
    rows = j.take_all()
    assert len(rows) == 3 and all(r["w"] is None for r in rows)
