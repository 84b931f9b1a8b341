"""Runtime shims for upstream Ray Data issues.  Version-gated, no public
API changes — each shim re-implements the narrowest possible slice of the
upstream function and delegates everything else to the original.

``install()`` is idempotent and is invoked from ``trustfuse_ray.__init__``
so every entry path (driver import, bench, tests, CLI) gets it.

Shim 1 — hash-shuffle schema broadcast (Ray 2.49,
``ray/data/_internal/execution/operators/hash_shuffle.py``):

The hash-shuffle operator fans each side's SCHEMA to all aggregators via
empty shards, but only alongside the FIRST block of that side
(``send_empty_blocks=True`` exactly once).  ``_shuffle_block`` however
early-returns on a zero-row block BEFORE the fan-out loop.  If the first
arriving block of a join side is empty (routine for a filtered spec-small
side: a parquet fragment whose rows all fail the predicate), the schema
is never broadcast, ``_has_schemas_broadcasted`` is still flipped to
True, and every partition that receives no non-empty shard finalizes a
schema-less ``pa.table({})`` — ``pa.Table.join`` then raises
ArrowInvalid ("No match or multiple matches for key field reference ...").
Deterministic at tiny scale, a scheduling-order flake at ANY scale.

The shim keeps the cheap early return but performs the schema fan-out
first whenever this block is the designated schema broadcaster.

Shim 2 — hash-shuffle aggregator CPU reservation (same Ray file):

Join/shuffle aggregators are long-lived ACTORS that each reserve
``min(1, (cluster_CPU/2)/num_partitions)`` CPUs.  A DAG with two or
more concurrent 8-partition joins on a small session (4-CPU pytest, a
shared host under load) can have its aggregator pools collectively
reserve EVERY CPU; the upstream 1-CPU map tasks that feed them then
never schedule, and the pipeline deadlocks — observed live: ``ray
status`` shows 4.0/4.0 CPU all held by idle ``ray::HashShuffleAgg``
actors with "9+ pending tasks/actors" demanding 1 CPU, forever.
(The aggregator's own work — accumulating shards + one
``pa.Table.join`` per partition — is bursty and brief; reserving whole
cores for it starves the producers that keep it busy.)

Fix: pin the per-partition CPU reservation to the small constant Ray
itself uses as the single-node fallback (0.0625 = 4 CPUs per default
64-partition pool) via the documented DataContext overrides, instead
of the cluster-proportional formula.  An 8-partition pool then
reserves 0.5 CPU total, so even several concurrent joins leave the
map tasks room on any session size.  Multi-node semantics are
unchanged — aggregator *memory* sizing (the real constraint at scale)
is untouched.
"""

from __future__ import annotations

import ray


def install() -> None:
    """Install all shims (idempotent)."""
    _install_shuffle_schema_broadcast()
    _install_aggregator_cpu_caps()


def _install_aggregator_cpu_caps() -> None:
    from ray.data import DataContext

    ctx = DataContext.get_current()
    for field in ("hash_shuffle_operator_actor_num_cpus_per_partition_override",
                  "join_operator_actor_num_cpus_per_partition_override"):
        if getattr(ctx, field, 0) is None:
            setattr(ctx, field, 0.0625)


def _install_shuffle_schema_broadcast() -> None:
    from ray.data._internal.execution.operators import hash_shuffle as _hs

    if getattr(_hs, "_trustfuse_schema_safe", False):
        return

    _orig_body = _hs._shuffle_block._function

    @ray.remote
    def _shuffle_block_schema_safe(
        block,
        input_index,
        key_columns,
        pool,
        block_transformer=None,
        send_empty_blocks=False,
        override_partition_id=None,
    ):
        from ray.data._internal.execution.operators.hash_shuffle import (
            _create_empty_table,
        )
        from ray.data._internal.table_block import TableBlockAccessor
        from ray.data.block import BlockAccessor, BlockExecStats, BlockType

        stats = BlockExecStats.builder()
        if block_transformer is not None:
            block = block_transformer(block)
        block = TableBlockAccessor.try_convert_block_type(
            block, block_type=BlockType.ARROW
        )
        if block.num_rows == 0:
            if send_empty_blocks:
                # The upstream early return skips exactly this fan-out;
                # without it, partitions that never receive a non-empty
                # shard finalize schema-less tables and joins fail.
                shard = _create_empty_table(block.schema)
                waits = [
                    pool.get_aggregator_for_partition(pid).submit.remote(
                        input_index, pid, ray.put(shard)
                    )
                    for pid in range(pool.num_partitions)
                ]
                # Same synchronization contract as the original: the task
                # only completes once aggregators accepted the shards.
                ray.wait(waits, num_returns=len(waits))
            meta = BlockAccessor.for_block(block).get_metadata(
                exec_stats=stats.build()
            )
            return (meta, {})
        # Non-empty: delegate to the unmodified upstream body (transformer
        # already applied above, so pass None).
        return _orig_body(
            block,
            input_index,
            key_columns,
            pool,
            None,
            send_empty_blocks,
            override_partition_id,
        )

    _hs._shuffle_block = _shuffle_block_schema_safe
    _hs._trustfuse_schema_safe = True
