"""Reverse mapping: fused triples → original (pre-canonicalization) values.

The reference rebuilds a pandas MultiIndex over the preprocessed claims and
positionally looks up the seed (raw) value
(`/root/reference/trustfuse/conflicting_dataset/dataset.py:191-256`).  The
engine instead carries ``claim_id`` through every transform; the fusion
winner keeps its claim_id, so reverse mapping is a hash join
``triples ⋈ claims ON winner_claim_id = claim_id`` — no index gymnastics,
and it distributes (SURVEY.md §2.4).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def reverse_map(triples, claims, num_partitions: int = 16):
    """Adds the original surface form (raw_value) and lineage
    (conv_id, turn_idx) of the winning claim to each fused triple —
    the reference's ``fmt_fused_data``."""
    seed = claims.select_columns(
        ["claim_id", "raw_value", "conv_id", "turn_idx"])
    return triples.join(
        seed, join_type="left_outer", num_partitions=num_partitions,
        on=("winner_claim_id",), right_on=("claim_id",))


def fused_provenance(claims, n_parts: int = 32):
    """Per-fused-triple provenance: for every CATEGORICAL fused triple
    (majority value per (entity, attr), ties to the lexicographically
    smallest — voting semantics, `fuse/voting.py`), the sorted distinct
    list of sources that asserted the winning value plus its support
    count.  The triple-level lineage record the north-star's
    "per-partition lineage + metrics" asks for at the finest grain.

    Shape: map-side distinct of (source, entity, attr, value_str) bounds
    the exchange by per-block distinct claims (the voting combiner's
    trick), then ONE hash exchange on (entity, attr); winner selection
    and the source string_agg happen inside the group.  Returns
    (entity, attr, value_str, n_sources, sources)."""
    import functools

    from trustfuse_ray.stages.common import hash_group_apply

    def _distinct(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.not_equal(batch["value_type"], "quantity"),
                       pc.is_valid(batch["value_str"]))
        t = batch.filter(keep).select(
            ["source", "entity", "attr", "value_str"])
        return t.group_by(
            ["source", "entity", "attr", "value_str"]).aggregate([])

    def _prov(group: pa.Table) -> pa.Table:
        # the map-side distinct is per BLOCK; finish the global distinct
        # over (source, value) here before counting support
        pairs = set(zip(group["source"].to_pylist(),
                        group["value_str"].to_pylist()))
        srcs, vals = (list(t) for t in zip(*sorted(pairs)))
        counts: dict[str, int] = {}
        for v in vals:
            counts[v] = counts.get(v, 0) + 1
        win = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        ss = sorted({s for s, v in zip(srcs, vals) if v == win})
        return pa.table({
            "entity": group["entity"][:1],
            "attr": group["attr"][:1],
            "value_str": pa.array([win], pa.string()),
            "n_sources": pa.array([len(ss)], pa.int64()),
            "sources": pa.array([",".join(ss)], pa.string())})

    prov_schema = pa.schema([("entity", pa.string()), ("attr", pa.string()),
                             ("value_str", pa.string()),
                             ("n_sources", pa.int64()),
                             ("sources", pa.string())])
    return hash_group_apply(
        claims.map_batches(_distinct, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["entity", "attr"], _prov, n_parts=n_parts,
        plasma_schema=prov_schema)


def conflict_profile(claims, n_parts: int = 32):
    """Per-attribute conflict statistics over the claim stream — the
    fusion-difficulty profile (how contested each attribute is, which
    drives model choice / skew planning in a TrustFuse-style pipeline).

    Per fact (entity, attr): n_values = distinct asserted values
    (categorical value_str + quantity value_num counted without string
    formatting, so DuckDB replays it exactly); a fact is conflicted when
    n_values ≥ 2.  Per attr: fact count, conflicted-fact count, max
    values per fact, total distinct value rows.

    Shape: map-side distinct on (entity, attr, value_str, value_num)
    bounds the exchange; per-fact stats reduce inside ONE (entity, attr)
    co-partition; the per-attr rollup groups the tiny per-fact stream."""
    from trustfuse_ray.stages.common import hash_group_apply

    def _dd(batch: pa.Table) -> pa.Table:
        cols = ["entity", "attr", "value_str", "value_num"]
        return batch.select(cols).group_by(cols).aggregate([])

    def _perfact(group: pa.Table) -> pa.Table:
        pairs = set(zip(group["value_str"].to_pylist(),
                        group["value_num"].to_pylist()))
        strs = {vs for vs, _ in pairs if vs is not None}
        nums = {vn for _, vn in pairs if vn is not None}
        return pa.table({
            "attr": group["attr"][:1],
            "n_values": pa.array([len(strs) + len(nums)], pa.int64()),
            "n_rows": pa.array([len(pairs)], pa.int64())})

    perfact = hash_group_apply(
        claims.map_batches(_dd, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["entity", "attr"], _perfact, n_parts=n_parts,
        plasma_schema=pa.schema([("attr", pa.string()),
                                 ("n_values", pa.int64()),
                                 ("n_rows", pa.int64())]))

    def _rollup(group: pa.Table) -> pa.Table:
        import numpy as np
        nv = np.asarray(group["n_values"], dtype=np.int64)
        nr = np.asarray(group["n_rows"], dtype=np.int64)
        return pa.table({
            "attr": group["attr"][:1],
            "n_facts": pa.array([len(nv)], pa.int64()),
            "n_conflicted": pa.array([int((nv >= 2).sum())], pa.int64()),
            "max_values": pa.array([int(nv.max())], pa.int64()),
            "n_value_rows": pa.array([int(nr.sum())], pa.int64())})

    return hash_group_apply(
        perfact, ["attr"], _rollup, n_parts=min(n_parts, 8),
        plasma_schema=pa.schema([("attr", pa.string()),
                                 ("n_facts", pa.int64()),
                                 ("n_conflicted", pa.int64()),
                                 ("max_values", pa.int64()),
                                 ("n_value_rows", pa.int64())]))


def snapshot_diff(old_triples, new_triples, n_parts: int = 32):
    """KG-versioning diff between two fused snapshots (both shaped
    (entity, attr, value_str, value_num) — voting-sqlable form): emits one
    row per fact whose truth was ``added`` (absent from the old snapshot)
    or ``changed`` (winner value differs).  Facts never disappear under
    cumulative claim growth, so no 'removed' kind.  Categorical and
    quantity truths diff independently (a fact's kind is the null-ness of
    value_str, as in the voting-sqlable shape).

    Shape: tag sides, ONE (entity, attr) co-partition; the diff runs
    inside the group — no broadcast, both snapshots scale."""
    import functools

    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply

    def _tag(batch: pa.Table, side: int) -> pa.Table:
        return pa.table({
            "entity": batch["entity"].cast(pa.string()),
            "attr": batch["attr"].cast(pa.string()),
            "value_str": batch["value_str"].cast(pa.string()),
            "value_num": batch["value_num"].cast(pa.float64()),
            "__new": pa.array(np.full(len(batch), side, np.int8))})

    def _diff(group: pa.Table) -> pa.Table:
        side = np.asarray(group["__new"], dtype=np.int8)
        vs = group["value_str"].to_pylist()
        vn = group["value_num"].to_pylist()
        old = {}
        new = {}
        for s, a, b in zip(side, vs, vn):
            kind = "num" if a is None else "cat"
            (new if s else old)[kind] = (a, b)
        oe, oa, oc, oos, ons, oon, onn = [], [], [], [], [], [], []
        ent = group["entity"][0].as_py()
        attr = group["attr"][0].as_py()
        for kind, (a, b) in sorted(new.items()):
            prev = old.get(kind)
            if prev == (a, b):
                continue
            oe.append(ent)
            oa.append(attr)
            oc.append("added" if prev is None else "changed")
            oos.append(None if prev is None else prev[0])
            oon.append(None if prev is None else prev[1])
            ons.append(a)
            onn.append(b)
        return pa.table({
            "entity": pa.array(oe, pa.string()),
            "attr": pa.array(oa, pa.string()),
            "change": pa.array(oc, pa.string()),
            "old_value_str": pa.array(oos, pa.string()),
            "new_value_str": pa.array(ons, pa.string()),
            "old_value_num": pa.array(oon, pa.float64()),
            "new_value_num": pa.array(onn, pa.float64())})

    out_schema = pa.schema([
        ("entity", pa.string()), ("attr", pa.string()),
        ("change", pa.string()),
        ("old_value_str", pa.string()), ("new_value_str", pa.string()),
        ("old_value_num", pa.float64()), ("new_value_num", pa.float64())])
    tagged_old = old_triples.map_batches(
        functools.partial(_tag, side=0), batch_format="pyarrow",
        zero_copy_batch=True)
    tagged_new = new_triples.map_batches(
        functools.partial(_tag, side=1), batch_format="pyarrow",
        zero_copy_batch=True)
    return hash_group_apply(tagged_old.union(tagged_new),
                            ["entity", "attr"], _diff, n_parts=n_parts,
                            plasma_schema=out_schema)


def source_agreement(claims, window_us: int = 86_400_000_000,
                     n_parts: int = 32):
    """Source-trust drift: per (source, tumbling time window), how many
    categorical claims agree with the corpus-level fused truth (voting
    semantics — majority over globally-distinct (source, value) pairs,
    ties to the smallest value).  The temporal source-reliability report
    a TrustFuse operator watches to catch degrading feeds.

    Shape: ONE (entity, attr) co-partition of the categorical claims;
    the group computes its winner from its distinct (source, value)
    pairs, flags every raw claim row, and collapses to (source, window,
    n, n_agree) partials — the final groupby sums a stream bounded by
    sources × windows, not claims."""
    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply

    def _cat(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.not_equal(batch["value_type"], "quantity"),
                       pc.is_valid(batch["value_str"]))
        import numpy as np

        t = batch.filter(keep)
        ts = np.asarray(t["ts"].cast(pa.int64()), dtype=np.int64)
        win = pa.array(ts // np.int64(window_us), pa.int64())
        return pa.table({"source": t["source"], "entity": t["entity"],
                         "attr": t["attr"], "value_str": t["value_str"],
                         "window": win})

    def _agree(group: pa.Table) -> pa.Table:
        srcs = group["source"].to_pylist()
        vals = group["value_str"].to_pylist()
        wins = group["window"].to_pylist()
        counts: dict[str, int] = {}
        for s, v in set(zip(srcs, vals)):
            counts[v] = counts.get(v, 0) + 1
        winner = sorted(counts.items(),
                        key=lambda kv: (-kv[1], kv[0]))[0][0]
        agg: dict[tuple, list] = {}
        for s, v, w in zip(srcs, vals, wins):
            k = (s, w)
            st = agg.setdefault(k, [0, 0])
            st[0] += 1
            st[1] += int(v == winner)
        ks = sorted(agg)
        return pa.table({
            "source": pa.array([k[0] for k in ks], pa.string()),
            "window": pa.array([k[1] for k in ks], pa.int64()),
            "n": pa.array([agg[k][0] for k in ks], pa.int64()),
            "n_agree": pa.array([agg[k][1] for k in ks], pa.int64())})

    part = hash_group_apply(
        claims.map_batches(_cat, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["entity", "attr"], _agree, n_parts=n_parts,
        plasma_schema=pa.schema([("source", pa.string()),
                                 ("window", pa.int64()),
                                 ("n", pa.int64()),
                                 ("n_agree", pa.int64())]))
    return (part.groupby(["source", "window"]).sum(["n", "n_agree"])
            .rename_columns({"sum(n)": "n", "sum(n_agree)": "n_agree"}))


def truth_timeline(claims, n_cuts: int = 4, n_parts: int = 32):
    """Truth evolution under cumulative claim growth — the reference's
    DynamicDataset semantics (buckets only ever grow) as ONE analytic:
    for each of ``n_cuts`` cumulative time cutoffs (global ts range split
    in equal µs steps), the voting-fused truth over claims with
    ``ts ≤ cutoff``.  Shows when each fact's truth stabilizes.

    Shape: one tiny global (min, max) ts aggregate, then ONE
    (entity, attr) co-partition; each group replays its own claims
    against all cutoffs (group-local work × n_cuts, no extra exchange).
    Returns (cut, entity, attr, value_str, value_num)."""
    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply

    stats = claims.select_columns(["ts"]).map_batches(
        lambda b: pa.table({
            "lo": pa.array([pc.min(b["ts"].cast(pa.int64())).as_py()],
                           pa.int64()),
            "hi": pa.array([pc.max(b["ts"].cast(pa.int64())).as_py()],
                           pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True).take_all()
    lo = min(r["lo"] for r in stats if r["lo"] is not None)
    hi = max(r["hi"] for r in stats if r["hi"] is not None)
    cuts = [lo + (hi - lo) * k // n_cuts for k in range(1, n_cuts + 1)]

    def _meta(batch: pa.Table) -> pa.Table:
        return pa.table({
            "source": batch["source"], "entity": batch["entity"],
            "attr": batch["attr"], "value_str": batch["value_str"],
            "value_num": batch["value_num"],
            "value_type": batch["value_type"],
            "ts_us": batch["ts"].cast(pa.int64())})

    def _timeline(group: pa.Table) -> pa.Table:
        srcs = group["source"].to_pylist()
        vss = group["value_str"].to_pylist()
        vns = group["value_num"].to_pylist()
        vts = group["value_type"].to_pylist()
        tss = group["ts_us"].to_pylist()
        ent = group["entity"][0].as_py()
        attr = group["attr"][0].as_py()
        ock, ovs, ovn = [], [], []
        for k, cut in enumerate(cuts, start=1):
            seen = set()
            cat: dict[str, int] = {}
            nums = []
            for s, vs, vn, vt, t in zip(srcs, vss, vns, vts, tss):
                if t is None or t > cut:
                    continue
                key = (s, vs, vn, vt)
                if key in seen:
                    continue
                seen.add(key)
                if vt == "quantity":
                    if vn is not None:
                        nums.append(vn)
                elif vs is not None:
                    cat[vs] = cat.get(vs, 0) + 1
            if cat:
                win = sorted(cat.items(),
                             key=lambda kv: (-kv[1], kv[0]))[0][0]
                ock.append(k)
                ovs.append(win)
                ovn.append(None)
            if nums:
                ock.append(k)
                ovs.append(None)
                ovn.append(float(np.median(np.asarray(nums, np.float64))))
        n = len(ock)
        return pa.table({
            "cut": pa.array(ock, pa.int64()),
            "entity": pa.array([ent] * n, pa.string()),
            "attr": pa.array([attr] * n, pa.string()),
            "value_str": pa.array(ovs, pa.string()),
            "value_num": pa.array(ovn, pa.float64())})

    return hash_group_apply(
        claims.map_batches(_meta, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["entity", "attr"], _timeline, n_parts=n_parts,
        plasma_schema=pa.schema([("cut", pa.int64()),
                                 ("entity", pa.string()),
                                 ("attr", pa.string()),
                                 ("value_str", pa.string()),
                                 ("value_num", pa.float64())]))


def entity_mention_stats(claims, n_parts: int = 32):
    """Per-entity mention footprint: how many distinct conversations and
    claims assert facts about each entity — the hot-entity skew profile
    the salted fusion paths are sized against.

    Per-block (entity, conv_id, n) combine bounds the exchange by
    distinct (entity, conversation) pairs per block; one entity
    co-partition finishes.  Returns (entity, n_convs, n_claims)."""
    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply

    def _partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["entity", "conv_id"])
        return (t.group_by(["entity", "conv_id"])
                .aggregate([("conv_id", "count")])
                .rename_columns(["entity", "conv_id", "n"]))

    def _stats(group: pa.Table) -> pa.Table:
        convs = set(group["conv_id"].to_pylist())
        n = int(np.asarray(group["n"], dtype=np.int64).sum())
        return pa.table({
            "entity": group["entity"][:1],
            "n_convs": pa.array([len(convs)], pa.int64()),
            "n_claims": pa.array([n], pa.int64())})

    return hash_group_apply(
        claims.map_batches(_partial, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["entity"], _stats, n_parts=n_parts,
        plasma_schema=pa.schema([("entity", pa.string()),
                                 ("n_convs", pa.int64()),
                                 ("n_claims", pa.int64())]))


def fact_stability(claims, n_cuts: int = 4, n_parts: int = 32):
    """Convergence point of each fact's truth under cumulative growth:
    the smallest cutoff index from which the fused value never changes
    again (derived from :func:`truth_timeline`'s cuts).  Facts whose
    truth first appears at cut c and never flips report ``stable_cut=c``;
    late flips push it up — the fusion-confidence analytic.

    One extra (entity, attr) co-partition over the tiny timeline stream.
    Returns (entity, attr, kind, stable_cut, n_cuts_present)."""
    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply

    timeline = truth_timeline(claims, n_cuts=n_cuts, n_parts=n_parts)

    def _stab(group: pa.Table) -> pa.Table:
        cuts = group["cut"].to_pylist()
        vss = group["value_str"].to_pylist()
        vns = group["value_num"].to_pylist()
        ent = group["entity"][0].as_py()
        attr = group["attr"][0].as_py()
        per_kind: dict[str, list] = {}
        for c, vs, vn in zip(cuts, vss, vns):
            kind = "num" if vs is None else "cat"
            per_kind.setdefault(kind, []).append((c, vs, vn))
        oe, oa, ok, os_, on = [], [], [], [], []
        for kind, rows in sorted(per_kind.items()):
            rows.sort()
            final = rows[-1][1:]
            stable = rows[-1][0]
            for c, vs, vn in reversed(rows):
                if (vs, vn) == final:
                    stable = c
                else:
                    break
            oe.append(ent)
            oa.append(attr)
            ok.append(kind)
            os_.append(stable)
            on.append(len(rows))
        return pa.table({
            "entity": pa.array(oe, pa.string()),
            "attr": pa.array(oa, pa.string()),
            "kind": pa.array(ok, pa.string()),
            "stable_cut": pa.array(os_, pa.int64()),
            "n_cuts_present": pa.array(on, pa.int64())})

    return hash_group_apply(
        timeline, ["entity", "attr"], _stab, n_parts=n_parts,
        plasma_schema=pa.schema([("entity", pa.string()),
                                 ("attr", pa.string()),
                                 ("kind", pa.string()),
                                 ("stable_cut", pa.int64()),
                                 ("n_cuts_present", pa.int64())]))


def attr_value_entropy(claims, n_parts: int = 32):
    """Per-attribute value-diversity profile: over globally-distinct
    (entity, attr, value_str) categorical assertions, the integer
    surprisal sum ``Σ_v n_v · (bitlen(N + 1) − bitlen(n_v + 1))`` (the
    bit-length entropy proxy, SQL-exact) plus the distinct value count —
    high values mean heavily contested / diverse attributes.

    Map-side distinct bounds the exchange; one attr co-partition.
    Returns (attr, n_assertions, n_values, entropy_fx)."""
    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply

    def _dd(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.not_equal(batch["value_type"], "quantity"),
                       pc.is_valid(batch["value_str"]))
        t = batch.filter(keep).select(["entity", "attr", "value_str"])
        return t.group_by(["entity", "attr", "value_str"]).aggregate([])

    def _ent(group: pa.Table) -> pa.Table:
        rows = set(zip(group["entity"].to_pylist(),
                       group["value_str"].to_pylist()))
        counts: dict[str, int] = {}
        for _, v in rows:
            counts[v] = counts.get(v, 0) + 1
        total = sum(counts.values())
        bt = (total + 1).bit_length()
        ent = sum(n * (bt - (n + 1).bit_length())
                  for n in counts.values())
        return pa.table({
            "attr": group["attr"][:1],
            "n_assertions": pa.array([total], pa.int64()),
            "n_values": pa.array([len(counts)], pa.int64()),
            "entropy_fx": pa.array([ent], pa.int64())})

    return hash_group_apply(
        claims.map_batches(_dd, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["attr"], _ent, n_parts=min(n_parts, 8),
        plasma_schema=pa.schema([("attr", pa.string()),
                                 ("n_assertions", pa.int64()),
                                 ("n_values", pa.int64()),
                                 ("entropy_fx", pa.int64())]))


def multi_truth(claims, min_support: int = 2, n_parts: int = 32):
    """Deterministic multi-truth emit — the reference LTM's multi-valued
    output semantics (a fact can hold SEVERAL true values, e.g. a book's
    authors) without the Gibbs sampler: every categorical value asserted
    by at least ``min_support`` distinct sources is emitted as a truth,
    with its support count.

    Map-side distinct + ONE (entity, attr) co-partition.  Returns
    (entity, attr, value_str, support)."""
    from trustfuse_ray.stages.common import hash_group_apply

    def _dd(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.not_equal(batch["value_type"], "quantity"),
                       pc.is_valid(batch["value_str"]))
        t = batch.filter(keep).select(["source", "entity", "attr",
                                       "value_str"])
        return t.group_by(["source", "entity", "attr",
                           "value_str"]).aggregate([])

    def _emit(group: pa.Table) -> pa.Table:
        pairs = set(zip(group["source"].to_pylist(),
                        group["value_str"].to_pylist()))
        counts: dict[str, int] = {}
        for _, v in pairs:
            counts[v] = counts.get(v, 0) + 1
        vals = sorted(v for v, n in counts.items() if n >= min_support)
        ent = group["entity"][0].as_py()
        attr = group["attr"][0].as_py()
        return pa.table({
            "entity": pa.array([ent] * len(vals), pa.string()),
            "attr": pa.array([attr] * len(vals), pa.string()),
            "value_str": pa.array(vals, pa.string()),
            "support": pa.array([counts[v] for v in vals], pa.int64())})

    return hash_group_apply(
        claims.map_batches(_dd, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["entity", "attr"], _emit, n_parts=n_parts,
        plasma_schema=pa.schema([("entity", pa.string()),
                                 ("attr", pa.string()),
                                 ("value_str", pa.string()),
                                 ("support", pa.int64())]))


def entity_signatures(claims, n_parts: int = 32):
    """Ontology-style entity typing: each entity's *attribute signature*
    (sorted distinct attrs joined by ',') groups entities into implicit
    types — the schema-induction profile a KG-construction pipeline
    reports before deciding entity classes.

    Shape: map-side distinct on (entity, attr) bounds the exchange to the
    entity-attribute incidence; the signature reduces inside ONE entity
    co-partition; the per-signature rollup is a second small exchange
    bounded by the number of OBSERVED attribute combinations (≤ 2^|attrs|
    but in practice tiny next to the claim stream)."""
    from trustfuse_ray.stages.common import hash_group_apply

    def _dd(batch: pa.Table) -> pa.Table:
        cols = ["entity", "attr"]
        return batch.select(cols).group_by(cols).aggregate([])

    def _sig(group: pa.Table) -> pa.Table:
        attrs = sorted(set(group["attr"].to_pylist()))
        return pa.table({
            "signature": pa.array([",".join(attrs)], pa.string()),
            "n_attrs": pa.array([len(attrs)], pa.int64())})

    sigs = hash_group_apply(
        claims.map_batches(_dd, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["entity"], _sig, n_parts=n_parts,
        plasma_schema=pa.schema([("signature", pa.string()),
                                 ("n_attrs", pa.int64())]))

    def _rollup(group: pa.Table) -> pa.Table:
        return pa.table({
            "signature": group["signature"][:1],
            "n_attrs": group["n_attrs"][:1],
            "n_entities": pa.array([len(group)], pa.int64())})

    return hash_group_apply(
        sigs, ["signature"], _rollup, n_parts=n_parts,
        plasma_schema=pa.schema([("signature", pa.string()),
                                 ("n_attrs", pa.int64()),
                                 ("n_entities", pa.int64())]))


def source_pair_agreement(claims, min_shared: int = 2, n_parts: int = 32):
    """Source-dependence statistic (the copy-detection precursor of
    ACCU-style models): for every unordered source pair sharing at least
    ``min_shared`` categorical facts, how many facts both assert and on
    how many they agree (same value_str).  High agreement on many shared
    facts flags copying / shared provenance.

    Shape: map-side distinct of (source, entity, attr, value_str) bounds
    the exchange; per-fact groups emit their source-pair partials (a fact
    touches |sources-on-fact|² pairs — bounded by per-fact fan-in, the
    conflict profile's skew guard applies); one tiny (s1, s2) groupby
    finishes.  Returns (s1, s2, n_shared, n_agree)."""
    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply

    def _distinct(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.not_equal(batch["value_type"], "quantity"),
                       pc.is_valid(batch["value_str"]))
        t = batch.filter(keep).select(
            ["source", "entity", "attr", "value_str"])
        return t.group_by(
            ["source", "entity", "attr", "value_str"]).aggregate([])

    def _pairs(group: pa.Table) -> pa.Table:
        by_src: dict[str, set] = {}
        for s, v in zip(group["source"].to_pylist(),
                        group["value_str"].to_pylist()):
            by_src.setdefault(s, set()).add(v)
        srcs = sorted(by_src)
        a, b, ag = [], [], []
        for i, s1 in enumerate(srcs):
            for s2 in srcs[i + 1:]:
                a.append(s1)
                b.append(s2)
                ag.append(1 if by_src[s1] & by_src[s2] else 0)
        return pa.table({
            "s1": pa.array(a, pa.string()),
            "s2": pa.array(b, pa.string()),
            "n_shared": pa.array(np.ones(len(a), np.int64)),
            "n_agree": pa.array(ag, pa.int64())})

    pair_schema = pa.schema([("s1", pa.string()), ("s2", pa.string()),
                             ("n_shared", pa.int64()),
                             ("n_agree", pa.int64())])
    partials = hash_group_apply(
        claims.map_batches(_distinct, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["entity", "attr"], _pairs, n_parts=n_parts,
        plasma_schema=pair_schema)
    agg = (partials.groupby(["s1", "s2"]).sum(["n_shared", "n_agree"])
           .rename_columns({"sum(n_shared)": "n_shared",
                            "sum(n_agree)": "n_agree"}))
    return agg.filter(expr=f"n_shared >= {int(min_shared)}")


def voting_recency(claims, day_us: int = 86_400_000_000,
                   n_parts: int = 32):
    """Recency-weighted voting over categorical facts: each distinct
    (source, value, day) assertion carries integer weight
    ``day − fact's earliest day + 1``, so newer assertions outvote stale
    ones — the freshness-biased fusion rule for cumulative claim streams
    (stale mirrors decay instead of tying forever).  Winner per fact =
    max summed weight, ties to the lexicographically smallest value.

    Shape: map-side distinct of (source, entity, attr, value_str, day)
    bounds the exchange; weights and the argmax reduce inside ONE
    (entity, attr) co-partition.  Integer arithmetic throughout — DuckDB
    replays it exactly.  Returns (entity, attr, value_str, w)."""
    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply

    def _distinct(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.not_equal(batch["value_type"], "quantity"),
                       pc.is_valid(batch["value_str"]))
        t = batch.filter(keep)
        day = pc.divide(t["ts"].cast(pa.int64()),
                        pa.scalar(day_us, pa.int64()))
        t = pa.table({"source": t["source"], "entity": t["entity"],
                      "attr": t["attr"], "value_str": t["value_str"],
                      "day": day})
        return t.group_by(
            ["source", "entity", "attr", "value_str", "day"]).aggregate([])

    def _vote(group: pa.Table) -> pa.Table:
        # the map-side distinct is per BLOCK; finish the global distinct
        # over (source, value, day) before weighting
        rows = set(zip(group["source"].to_pylist(),
                       group["value_str"].to_pylist(),
                       np.asarray(group["day"], dtype=np.int64).tolist()))
        dmin = min(d for _, _, d in rows)
        totals: dict[str, int] = {}
        for _, v, d in rows:
            totals[v] = totals.get(v, 0) + int(d - dmin + 1)
        win = sorted(totals.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        return pa.table({
            "entity": group["entity"][:1],
            "attr": group["attr"][:1],
            "value_str": pa.array([win[0]], pa.string()),
            "w": pa.array([win[1]], pa.int64())})

    return hash_group_apply(
        claims.map_batches(_distinct, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["entity", "attr"], _vote, n_parts=n_parts,
        plasma_schema=pa.schema([("entity", pa.string()),
                                 ("attr", pa.string()),
                                 ("value_str", pa.string()),
                                 ("w", pa.int64())]))


def fact_history(claims, day_us: int = 86_400_000_000, n_parts: int = 32):
    """Temporal-KG fact history (SCD2-style): per categorical fact, the
    validity intervals of the cumulative voting truth at day granularity —
    one row per (entity, attr, value) reign with ``valid_from_day`` /
    ``valid_to_day`` (−1 = still current).  Truth at day d = the value
    with most distinct supporting sources among assertions with
    day ≤ d, ties to the lexicographically smallest value (voting
    semantics under DynamicDataset cumulative growth).

    Shape: map-side distinct of (source, entity, attr, value_str, day)
    bounds the exchange; each (entity, attr) group replays its own
    assertion days locally (the truth_timeline trick at day grain) and
    emits only change points."""
    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply

    def _distinct(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.not_equal(batch["value_type"], "quantity"),
                       pc.is_valid(batch["value_str"]))
        t = batch.filter(keep)
        day = pc.divide(t["ts"].cast(pa.int64()),
                        pa.scalar(day_us, pa.int64()))
        t = pa.table({"source": t["source"], "entity": t["entity"],
                      "attr": t["attr"], "value_str": t["value_str"],
                      "day": day})
        return t.group_by(
            ["source", "entity", "attr", "value_str", "day"]).aggregate([])

    out_schema = pa.schema([
        ("entity", pa.string()), ("attr", pa.string()),
        ("value_str", pa.string()), ("valid_from_day", pa.int64()),
        ("valid_to_day", pa.int64())])

    def _history(group: pa.Table) -> pa.Table:
        rows = sorted(set(zip(
            np.asarray(group["day"], dtype=np.int64).tolist(),
            group["source"].to_pylist(),
            group["value_str"].to_pylist())))
        ent = group["entity"][0].as_py()
        attr = group["attr"][0].as_py()
        support: dict[str, set] = {}
        reigns: list[list] = []  # [value, from_day]
        i, n = 0, len(rows)
        while i < n:
            d = rows[i][0]
            while i < n and rows[i][0] == d:
                _, s, v = rows[i]
                support.setdefault(v, set()).add(s)
                i += 1
            win = sorted(support.items(),
                         key=lambda kv: (-len(kv[1]), kv[0]))[0][0]
            if not reigns or reigns[-1][0] != win:
                reigns.append([win, d])
        m = len(reigns)
        return pa.table({
            "entity": pa.array([ent] * m, pa.string()),
            "attr": pa.array([attr] * m, pa.string()),
            "value_str": pa.array([r[0] for r in reigns], pa.string()),
            "valid_from_day": pa.array([r[1] for r in reigns], pa.int64()),
            "valid_to_day": pa.array(
                [reigns[j + 1][1] - 1 if j + 1 < m else -1
                 for j in range(m)], pa.int64())})

    return hash_group_apply(
        claims.map_batches(_distinct, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["entity", "attr"], _history, n_parts=n_parts,
        plasma_schema=out_schema)


def dangling_refs(claims, ref_attrs: tuple[str, ...] = ("neighbor",),
                  n_parts: int = 32):
    """KG referential-integrity audit: entity-valued assertions (the
    ``ref_attrs`` columns, e.g. ``neighbor``) whose target never appears
    as a claim SUBJECT — dangling edges a downstream graph build would
    drop silently.  Returns (ref, n_refs) with n_refs = distinct
    referencing entities.

    Shape: both sides collapse map-side to distinct pairs; ONE
    co-partition on the referenced id unions tagged streams and the
    anti-join + count happen in-group — no broadcast of either side."""
    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply

    attrs = set(ref_attrs)

    def _refs(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_in(batch["attr"],
                                value_set=pa.array(sorted(attrs))),
                       pc.is_valid(batch["value_str"]))
        t = batch.filter(keep)
        out = pa.table({"ref": t["value_str"].cast(pa.string()),
                        "src": t["entity"].cast(pa.string())})
        out = out.group_by(["ref", "src"]).aggregate([])
        return pa.table({"ref": out["ref"], "src": out["src"],
                         "side": pa.array(np.zeros(len(out), np.int8))})

    def _subjects(batch: pa.Table) -> pa.Table:
        t = pa.table({"ref": batch["entity"].cast(pa.string())})
        t = t.group_by(["ref"]).aggregate([])
        n = len(t)
        return pa.table({"ref": t["ref"],
                         "src": pa.array([""] * n, pa.string()),
                         "side": pa.array(np.ones(n, np.int8))})

    tagged = claims.map_batches(_refs, batch_format="pyarrow",
                                zero_copy_batch=True).union(
        claims.map_batches(_subjects, batch_format="pyarrow",
                           zero_copy_batch=True))

    def _audit(group: pa.Table) -> pa.Table:
        side = np.asarray(group["side"], dtype=np.int8)
        srcs = {s for s, sd in zip(group["src"].to_pylist(), side)
                if sd == 0}
        if not srcs:  # subject never referenced: not a ref row
            return pa.schema([("ref", pa.string()),
                              ("n_refs", pa.int64()),
                              ("dangling", pa.bool_())]).empty_table()
        return pa.table({
            "ref": group["ref"][:1],
            "n_refs": pa.array([len(srcs)], pa.int64()),
            "dangling": pa.array([not bool((side == 1).any())])})

    return hash_group_apply(
        tagged, ["ref"], _audit, n_parts=n_parts,
        plasma_schema=pa.schema([("ref", pa.string()),
                                 ("n_refs", pa.int64()),
                                 ("dangling", pa.bool_())]))


def key_discovery(claims, n_parts: int = 32):
    """Inverse-functional-property mining: per attribute, how close its
    values come to uniquely identifying entities — the key-discovery
    audit that picks natural keys for entity resolution.  Per attr:
    distinct values, values asserted for exactly one entity, and the
    max entities sharing one value.

    Shape: map-side distinct of (attr, value_str, entity); per-value
    entity counts reduce in ONE (attr, value) co-partition; the per-attr
    rollup groups the tiny per-value stream."""
    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply

    def _dd(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.not_equal(batch["value_type"], "quantity"),
                       pc.is_valid(batch["value_str"]))
        t = batch.filter(keep).select(["attr", "value_str", "entity"])
        return t.group_by(["attr", "value_str", "entity"]).aggregate([])

    def _perval(group: pa.Table) -> pa.Table:
        ents = set(group["entity"].to_pylist())
        return pa.table({"attr": group["attr"][:1],
                         "n_entities": pa.array([len(ents)], pa.int64())})

    perval = hash_group_apply(
        claims.map_batches(_dd, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["attr", "value_str"], _perval, n_parts=n_parts,
        plasma_schema=pa.schema([("attr", pa.string()),
                                 ("n_entities", pa.int64())]))

    def _rollup(group: pa.Table) -> pa.Table:
        ne = np.asarray(group["n_entities"], dtype=np.int64)
        return pa.table({
            "attr": group["attr"][:1],
            "n_values": pa.array([len(ne)], pa.int64()),
            "n_unique_values": pa.array([int((ne == 1).sum())], pa.int64()),
            "max_entities_per_value": pa.array([int(ne.max())], pa.int64())})

    return hash_group_apply(
        perval, ["attr"], _rollup, n_parts=min(n_parts, 8),
        plasma_schema=pa.schema([("attr", pa.string()),
                                 ("n_values", pa.int64()),
                                 ("n_unique_values", pa.int64()),
                                 ("max_entities_per_value", pa.int64())]))


def tool_yield(transcripts, claims, n_parts: int = 8):
    """Per-tool extraction yield: for every claiming source
    (``role:tool``), how many eligible turns the corpus holds, how many
    conversations use it, and how many claims extraction actually got
    out of it — the "which connectors feed the KG" report that decides
    crawler/extractor investment.

    Shape: both sides pre-aggregate map-side to per-source partials
    (sources are a tiny domain) and meet in one source co-partition;
    turn text never moves."""
    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply

    def _turn_partials(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["role"],
                        value_set=pa.array(["assistant", "tool"]))
        t = batch.filter(keep)
        src = pc.binary_join_element_wise(
            t["role"].cast(pa.string()),
            pc.fill_null(t["tool"].cast(pa.string()), ""), ":")
        g = pa.table({"source": src, "conv_id": t["conv_id"]})
        g = g.group_by(["source", "conv_id"]).aggregate([
            ("conv_id", "count")])
        return pa.table({"source": g["source"],
                         "conv_id": g["conv_id"],
                         "n_turns": g["conv_id_count"].cast(pa.int64()),
                         "n_claims": pa.array(
                             np.zeros(len(g), np.int64))})

    def _claim_partials(batch: pa.Table) -> pa.Table:
        g = (batch.select(["source"]).group_by(["source"])
             .aggregate([("source", "count")]))
        n = len(g)
        return pa.table({"source": g["source"],
                         "conv_id": pa.array([""] * n, pa.string()),
                         "n_turns": pa.array(np.zeros(n, np.int64)),
                         "n_claims": g["source_count"].cast(pa.int64())})

    tagged = transcripts.select_columns(
        ["conv_id", "role", "tool"]).map_batches(
        _turn_partials, batch_format="pyarrow",
        zero_copy_batch=True).union(
        claims.map_batches(_claim_partials, batch_format="pyarrow",
                           zero_copy_batch=True))

    def _reduce(group: pa.Table) -> pa.Table:
        convs = {c for c in group["conv_id"].to_pylist() if c}
        return pa.table({
            "source": group["source"][:1],
            "n_turns": pa.array(
                [int(np.asarray(group["n_turns"],
                                dtype=np.int64).sum())], pa.int64()),
            "n_convs": pa.array([len(convs)], pa.int64()),
            "n_claims": pa.array(
                [int(np.asarray(group["n_claims"],
                                dtype=np.int64).sum())], pa.int64())})

    return hash_group_apply(
        tagged, ["source"], _reduce, n_parts=n_parts,
        plasma_schema=pa.schema([("source", pa.string()),
                                 ("n_turns", pa.int64()),
                                 ("n_convs", pa.int64()),
                                 ("n_claims", pa.int64())]))


def fd_mining(triples, n_parts: int = 32):
    """Functional-dependency mining over the fused graph (schema
    discovery): for every ordered attribute pair (a → b), does an
    entity's value of ``a`` determine its value of ``b``?  Reports per
    pair: entities carrying both attrs, distinct LHS values, and LHS
    values mapping to >1 distinct RHS value (violations; 0 = exact FD).

    Shape: ONE entity co-partition emits per-entity attr-pair rows
    (≤ |attrs|² each, attrs are a tiny domain); a second
    (a, b, va) co-partition counts distinct RHS; the per-(a, b) rollup
    is tiny.  Categorical triples only."""
    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply

    def _cat(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch["value_str"]))
        return pa.table({"entity": t["entity"].cast(pa.string()),
                         "attr": t["attr"].cast(pa.string()),
                         "value_str": t["value_str"].cast(pa.string())})

    def _entity_pairs(group: pa.Table) -> pa.Table:
        av = {a: v for a, v in zip(group["attr"].to_pylist(),
                                   group["value_str"].to_pylist())}
        attrs = sorted(av)
        a_out, b_out, va, vb = [], [], [], []
        for a in attrs:
            for b in attrs:
                if a != b:
                    a_out.append(a)
                    b_out.append(b)
                    va.append(av[a])
                    vb.append(av[b])
        return pa.table({"a": pa.array(a_out, pa.string()),
                         "b": pa.array(b_out, pa.string()),
                         "va": pa.array(va, pa.string()),
                         "vb": pa.array(vb, pa.string())})

    pairs = hash_group_apply(
        triples.map_batches(_cat, batch_format="pyarrow",
                            zero_copy_batch=True),
        ["entity"], _entity_pairs, n_parts=n_parts,
        plasma_schema=pa.schema([("a", pa.string()), ("b", pa.string()),
                                 ("va", pa.string()),
                                 ("vb", pa.string())]))

    def _lhs(group: pa.Table) -> pa.Table:
        vbs = set(group["vb"].to_pylist())
        return pa.table({"a": group["a"][:1], "b": group["b"][:1],
                         "support": pa.array([len(group)], pa.int64()),
                         "n_rhs": pa.array([len(vbs)], pa.int64())})

    lhs = hash_group_apply(
        pairs, ["a", "b", "va"], _lhs, n_parts=n_parts,
        plasma_schema=pa.schema([("a", pa.string()), ("b", pa.string()),
                                 ("support", pa.int64()),
                                 ("n_rhs", pa.int64())]))

    def _rollup(group: pa.Table) -> pa.Table:
        sup = np.asarray(group["support"], dtype=np.int64)
        nr = np.asarray(group["n_rhs"], dtype=np.int64)
        return pa.table({
            "a": group["a"][:1], "b": group["b"][:1],
            "support": pa.array([int(sup.sum())], pa.int64()),
            "n_lhs_values": pa.array([len(sup)], pa.int64()),
            "n_violations": pa.array([int((nr > 1).sum())], pa.int64())})

    return hash_group_apply(
        lhs, ["a", "b"], _rollup, n_parts=min(n_parts, 8),
        plasma_schema=pa.schema([("a", pa.string()), ("b", pa.string()),
                                 ("support", pa.int64()),
                                 ("n_lhs_values", pa.int64()),
                                 ("n_violations", pa.int64())]))


def claim_velocity(claims, day_us: int = 86_400_000_000,
                   n_parts: int = 32):
    """Per-entity claim-arrival trend: over the entity's active days,
    the exact integer least-squares slope NUMERATOR of claims-per-day
    vs day — ``n·Σ(d·c) − Σd·Σc`` (positive = accelerating attention,
    negative = fading).  All-integer arithmetic, so DuckDB replays it
    bit-for-bit without float slope division.

    Shape: map-side (entity, day) count partials bound the exchange by
    active entity-days; stats reduce in ONE entity co-partition.
    Returns (entity, n_days, n_claims, slope_num)."""
    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply

    def _partial(batch: pa.Table) -> pa.Table:
        day = pc.divide(batch["ts"].cast(pa.int64()),
                        pa.scalar(day_us, pa.int64()))
        t = pa.table({"entity": batch["entity"].cast(pa.string()),
                      "day": day})
        return (t.group_by(["entity", "day"])
                .aggregate([("day", "count")])
                .rename_columns(["entity", "day", "c"]))

    partials = (claims.select_columns(["entity", "ts"]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["entity", "day"]).sum("c")
        .rename_columns({"sum(c)": "c"}))

    def _trend(group: pa.Table) -> pa.Table:
        d = np.asarray(group["day"], dtype=np.int64)
        c = np.asarray(group["c"], dtype=np.int64)
        n = len(d)
        slope_num = int(n * int((d * c).sum()) - int(d.sum()) * int(c.sum()))
        return pa.table({
            "entity": group["entity"][:1],
            "n_days": pa.array([n], pa.int64()),
            "n_claims": pa.array([int(c.sum())], pa.int64()),
            "slope_num": pa.array([slope_num], pa.int64())})

    return hash_group_apply(
        partials, ["entity"], _trend, n_parts=n_parts,
        plasma_schema=pa.schema([("entity", pa.string()),
                                 ("n_days", pa.int64()),
                                 ("n_claims", pa.int64()),
                                 ("slope_num", pa.int64())]))


def quantity_trimmed(claims, scale: int = 1_000_000, n_parts: int = 32):
    """Robust quantity fusion: per numeric fact, the 1-trimmed
    aggregate over the distinct (source, value) assertions — drop ONE
    smallest and ONE largest assertion when ≥3 exist, then report the
    exact int64 micro-unit sum and count of the survivors (no float
    division — the consumer divides).  The outlier-resistant
    alternative to the reference's plain median for heavy-tailed
    numeric conflicts.

    Shape: map-side distinct of (source, entity, attr, value_fx)
    bounds the exchange; trim + sum reduce in ONE (entity, attr)
    co-partition.  Returns (entity, attr, n_used, trimmed_sum_fx)."""
    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply

    def _distinct(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(batch["value_type"], "quantity"),
                       pc.is_valid(batch["value_num"]))
        t = batch.filter(keep)
        fx = pc.cast(pc.round(pc.multiply(
            t["value_num"].cast(pa.float64()),
            pa.scalar(float(scale))),
            round_mode="half_towards_infinity"), pa.int64())
        d = pa.table({"source": t["source"], "entity": t["entity"],
                      "attr": t["attr"], "value_fx": fx})
        return d.group_by(
            ["source", "entity", "attr", "value_fx"]).aggregate([])

    def _trim(group: pa.Table) -> pa.Table:
        # finish the global distinct, then trim on the value multiset
        rows = sorted(set(zip(group["source"].to_pylist(),
                              np.asarray(group["value_fx"],
                                         dtype=np.int64).tolist())))
        vals = sorted(v for _, v in rows)
        if len(vals) >= 3:
            vals = vals[1:-1]
        return pa.table({
            "entity": group["entity"][:1],
            "attr": group["attr"][:1],
            "n_used": pa.array([len(vals)], pa.int64()),
            "trimmed_sum_fx": pa.array([int(sum(vals))], pa.int64())})

    return hash_group_apply(
        claims.map_batches(_distinct, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["entity", "attr"], _trim, n_parts=n_parts,
        plasma_schema=pa.schema([("entity", pa.string()),
                                 ("attr", pa.string()),
                                 ("n_used", pa.int64()),
                                 ("trimmed_sum_fx", pa.int64())]))


def contemporaneous_accuracy(claims, day_us: int = 86_400_000_000,
                             n_parts: int = 32):
    """Temporal-KG source audit: for every categorical assertion, was it
    the CURRENT cumulative-voting truth on the day it was made (the
    validity intervals of :func:`fact_history`)?  Per source: assertions
    checked and contemporaneously-correct count — "right at the time"
    beats "right in hindsight" for trust scoring under cumulative
    growth.

    Shape: ONE (entity, attr) co-partition replays the fact's truth
    intervals (the fact_history walk) AND audits its own distinct
    (source, value, day) assertions in the same group — no second join;
    the per-source rollup is a tiny groupby."""
    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply

    def _distinct(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.not_equal(batch["value_type"], "quantity"),
                       pc.is_valid(batch["value_str"]))
        t = batch.filter(keep)
        day = pc.divide(t["ts"].cast(pa.int64()),
                        pa.scalar(day_us, pa.int64()))
        t = pa.table({"source": t["source"], "entity": t["entity"],
                      "attr": t["attr"], "value_str": t["value_str"],
                      "day": day})
        return t.group_by(
            ["source", "entity", "attr", "value_str", "day"]).aggregate([])

    def _audit(group: pa.Table) -> pa.Table:
        rows = sorted(set(zip(
            np.asarray(group["day"], dtype=np.int64).tolist(),
            group["source"].to_pylist(),
            group["value_str"].to_pylist())))
        # truth per assertion day (cumulative voting replay, day grain)
        support: dict[str, set] = {}
        truth_at: dict[int, str] = {}
        i, n = 0, len(rows)
        while i < n:
            d = rows[i][0]
            while i < n and rows[i][0] == d:
                _, s, v = rows[i]
                support.setdefault(v, set()).add(s)
                i += 1
            truth_at[d] = sorted(
                support.items(), key=lambda kv: (-len(kv[1]), kv[0]))[0][0]
        srcs: dict[str, list] = {}
        for d, s, v in rows:
            st = srcs.setdefault(s, [0, 0])
            st[0] += 1
            if truth_at[d] == v:
                st[1] += 1
        ks = sorted(srcs)
        return pa.table({
            "source": pa.array(ks, pa.string()),
            "n_checked": pa.array([srcs[k][0] for k in ks], pa.int64()),
            "n_timely": pa.array([srcs[k][1] for k in ks], pa.int64())})

    partials = hash_group_apply(
        claims.map_batches(_distinct, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["entity", "attr"], _audit, n_parts=n_parts,
        plasma_schema=pa.schema([("source", pa.string()),
                                 ("n_checked", pa.int64()),
                                 ("n_timely", pa.int64())]))
    return (partials.groupby("source").sum(["n_checked", "n_timely"])
            .rename_columns({"sum(n_checked)": "n_checked",
                             "sum(n_timely)": "n_timely"}))


def source_specialization(claims, n_parts: int = 32):
    """Source-specialization profile: per source, the integer surprisal
    entropy of its assertion distribution over attributes
    (Σ_a n_a · (bitlen(N + 1) − bitlen(n_a + 1)), the SQL-exact
    bit-length proxy) plus distinct attrs and total assertions — low
    entropy = specialist connector, high = generalist.

    Map-side (source, attr) count partials bound the exchange; one
    source co-partition.  Returns (source, n_claims, n_attrs,
    entropy_fx)."""
    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply

    def _partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["source", "attr"])
        return (t.group_by(["source", "attr"])
                .aggregate([("attr", "count")])
                .rename_columns(["source", "attr", "n"]))

    partials = (claims.map_batches(_partial, batch_format="pyarrow",
                                   zero_copy_batch=True)
                .groupby(["source", "attr"]).sum("n")
                .rename_columns({"sum(n)": "n"}))

    def _ent(group: pa.Table) -> pa.Table:
        ns = np.asarray(group["n"], dtype=np.int64)
        total = int(ns.sum())
        bt = (total + 1).bit_length()
        ent = int(sum(int(n) * (bt - (int(n) + 1).bit_length())
                      for n in ns))
        return pa.table({
            "source": group["source"][:1],
            "n_claims": pa.array([total], pa.int64()),
            "n_attrs": pa.array([len(ns)], pa.int64()),
            "entropy_fx": pa.array([ent], pa.int64())})

    return hash_group_apply(
        partials, ["source"], _ent, n_parts=min(n_parts, 8),
        plasma_schema=pa.schema([("source", pa.string()),
                                 ("n_claims", pa.int64()),
                                 ("n_attrs", pa.int64()),
                                 ("entropy_fx", pa.int64())]))


def fused_lineage(claims, n_parts: int = 32):
    """Per-fused-triple RECORD lineage: for every categorical fused
    triple (majority over distinct (source, value) pairs, ties to the
    lexicographically smallest — voting semantics), the rollup of the raw
    claim records that assert the winning value: how many claims, from
    how many conversations, and the earliest (conv_id, ts) they trace to.
    Complements :func:`fused_provenance` (source-level) with the
    turn-level lineage the north rule's "per-partition lineage" is about.

    Shape: one (entity, attr) hash exchange over the pruned categorical
    claim columns; winner selection and the bounded rollup (counts + min)
    happen inside the group — no unbounded aggregates leave it.  Returns
    (entity, attr, value_str, n_claims, n_convs, first_conv,
    first_ts_us)."""
    from trustfuse_ray.stages.common import hash_group_apply

    def _prune(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.not_equal(batch["value_type"], "quantity"),
                       pc.is_valid(batch["value_str"]))
        return batch.filter(keep).select(
            ["source", "entity", "attr", "value_str", "claim_id",
             "conv_id", "ts"])

    def _lin(group: pa.Table) -> pa.Table:
        pairs = set(zip(group["source"].to_pylist(),
                        group["value_str"].to_pylist()))
        counts: dict[str, int] = {}
        for _, v in pairs:
            counts[v] = counts.get(v, 0) + 1
        win = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        sup = group.filter(pc.equal(group["value_str"], win))
        ts_us = pc.cast(sup["ts"], pa.int64())
        return pa.table({
            "entity": group["entity"][:1],
            "attr": group["attr"][:1],
            "value_str": pa.array([win], pa.string()),
            "n_claims": pa.array(
                [pc.count_distinct(sup["claim_id"]).as_py()], pa.int64()),
            "n_convs": pa.array(
                [pc.count_distinct(sup["conv_id"]).as_py()], pa.int64()),
            "first_conv": pa.array([pc.min(sup["conv_id"]).as_py()],
                                   pa.string()),
            "first_ts_us": pa.array([pc.min(ts_us).as_py()], pa.int64()),
        })

    lin_schema = pa.schema([
        ("entity", pa.string()), ("attr", pa.string()),
        ("value_str", pa.string()), ("n_claims", pa.int64()),
        ("n_convs", pa.int64()), ("first_conv", pa.string()),
        ("first_ts_us", pa.int64())])
    pruned = claims.map_batches(_prune, batch_format="pyarrow",
                                zero_copy_batch=True)
    return hash_group_apply(pruned, ["entity", "attr"], _lin,
                            n_parts=n_parts, plasma_schema=lin_schema)


def source_trust_decay(claims, ref_day: int,
                       day_us: int = 86_400_000_000, max_shift: int = 40,
                       n_parts: int = 32):
    """Per-source exponentially-decayed trust: each distinct categorical
    assertion (source, entity, attr, value, day) carries integer weight
    ``1_000_000 >> min(ref_day − day, max_shift)`` (half-life = one day
    relative to the corpus's newest claim), and a source's trust is the
    permille share of its decayed weight that lands on the fact's
    majority value (distinct-source vote, tie → smallest value).  Stale
    agreement stops propping up a source — the audit that catches
    decayed mirrors.

    Shape: map-side distinct bounds the exchange to assertion tuples;
    winner + per-source weight partials compute inside ONE
    (entity, attr) co-partition; the per-source rollup is a tiny second
    groupby.  Integer arithmetic throughout — DuckDB replays it."""
    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply

    def _distinct(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.not_equal(batch["value_type"], "quantity"),
                       pc.is_valid(batch["value_str"]))
        t = batch.filter(keep)
        day = pc.divide(t["ts"].cast(pa.int64()),
                        pa.scalar(day_us, pa.int64()))
        t = pa.table({"source": t["source"], "entity": t["entity"],
                      "attr": t["attr"], "value_str": t["value_str"],
                      "day": day})
        return t.group_by(
            ["source", "entity", "attr", "value_str", "day"]).aggregate([])

    part_schema = pa.schema([("source", pa.string()), ("n", pa.int64()),
                             ("w_total", pa.int64()),
                             ("w_agree", pa.int64())])

    def _fact(group: pa.Table) -> pa.Table:
        rows = set(zip(group["source"].to_pylist(),
                       group["value_str"].to_pylist(),
                       np.asarray(group["day"], dtype=np.int64).tolist()))
        voters: dict[str, set] = {}
        for s, v, _ in rows:
            voters.setdefault(v, set()).add(s)
        win = sorted(voters.items(),
                     key=lambda kv: (-len(kv[1]), kv[0]))[0][0]
        per: dict[str, list] = {}
        for s, v, d in rows:
            w = 1_000_000 >> min(ref_day - d, max_shift)
            acc = per.setdefault(s, [0, 0, 0])
            acc[0] += 1
            acc[1] += w
            if v == win:
                acc[2] += w
        srcs = sorted(per)
        return pa.table({
            "source": pa.array(srcs, pa.string()),
            "n": pa.array([per[s][0] for s in srcs], pa.int64()),
            "w_total": pa.array([per[s][1] for s in srcs], pa.int64()),
            "w_agree": pa.array([per[s][2] for s in srcs], pa.int64())})

    partials = hash_group_apply(
        claims.map_batches(_distinct, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["entity", "attr"], _fact, n_parts=n_parts,
        plasma_schema=part_schema)

    agg = (partials.groupby("source").sum(["n", "w_total", "w_agree"])
           .rename_columns({"sum(n)": "n_votes",
                            "sum(w_total)": "w_total",
                            "sum(w_agree)": "w_agree"}))

    def _shape(batch: pa.Table) -> pa.Table:
        wt = np.asarray(batch["w_total"], dtype=np.int64)
        wa = np.asarray(batch["w_agree"], dtype=np.int64)
        return batch.append_column(
            "trust_permille",
            pa.array(wa * 1000 // np.maximum(wt, 1), pa.int64()))

    return agg.map_batches(_shape, batch_format="pyarrow",
                           zero_copy_batch=True)


def type_induction(fused, n_parts: int = 32):
    """Schema/type induction over the fused graph: an entity's TYPE is
    the signature of its distinct attribute set (sorted, comma-joined) —
    entities described by the same predicates cluster into one induced
    class, with the lexicographically smallest entity as representative.
    The ontology-bootstrap step of KG construction.

    Shape: distinct (entity, attr) → per-entity signature inside one
    entity co-partition → signature-keyed rollup (bounded by the number
    of distinct predicate sets)."""
    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply

    def _distinct(batch: pa.Table) -> pa.Table:
        return pa.table({"entity": batch["entity"],
                         "attr": batch["attr"]}).group_by(
            ["entity", "attr"]).aggregate([])

    sig_schema = pa.schema([("type_sig", pa.string()),
                            ("n_attrs", pa.int64()),
                            ("entity", pa.string())])

    def _sig(group: pa.Table) -> pa.Table:
        attrs = sorted(set(group["attr"].to_pylist()))
        return pa.table({
            "type_sig": pa.array([",".join(attrs)], pa.string()),
            "n_attrs": pa.array([len(attrs)], pa.int64()),
            "entity": group["entity"][:1]})

    sigs = hash_group_apply(
        fused.map_batches(_distinct, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["entity"], _sig, n_parts=n_parts, plasma_schema=sig_schema)

    out_schema = pa.schema([("type_sig", pa.string()),
                            ("n_attrs", pa.int64()),
                            ("n_entities", pa.int64()),
                            ("rep_entity", pa.string())])

    def _roll(group: pa.Table) -> pa.Table:
        ents = group["entity"].to_pylist()
        return pa.table({
            "type_sig": group["type_sig"][:1],
            "n_attrs": group["n_attrs"][:1],
            "n_entities": pa.array([len(ents)], pa.int64()),
            "rep_entity": pa.array([min(ents)], pa.string())})

    return hash_group_apply(sigs, ["type_sig"], _roll, n_parts=n_parts,
                            plasma_schema=out_schema)


def source_influence(claims, n_parts: int = 32):
    """Source criticality by leave-one-out voting: for every categorical
    fact a source participates in, recompute the majority winner with
    that source's votes removed — facts whose winner CHANGES are the
    facts this source single-handedly decides.  High flip counts mean
    the graph depends on one feed (re-crawl priority / trust risk).

    Winner rule everywhere: distinct-source votes, count desc, value
    asc — including after removal, over the fact's original value set
    (counts may drop to 0; the rule still picks deterministically, so
    DuckDB replays it).  One (entity, attr) co-partition; per fact the
    in-group work is O(sources × values); one tiny per-source rollup."""
    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply

    def _distinct(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.not_equal(batch["value_type"], "quantity"),
                       pc.is_valid(batch["value_str"]))
        t = batch.filter(keep)
        t = pa.table({"source": t["source"], "entity": t["entity"],
                      "attr": t["attr"], "value_str": t["value_str"]})
        return t.group_by(
            ["source", "entity", "attr", "value_str"]).aggregate([])

    part_schema = pa.schema([("source", pa.string()),
                             ("n_facts", pa.int64()),
                             ("n_flips", pa.int64())])

    def _fact(group: pa.Table) -> pa.Table:
        rows = set(zip(group["source"].to_pylist(),
                       group["value_str"].to_pylist()))
        counts: dict[str, int] = {}
        by_src: dict[str, set] = {}
        for s, v in rows:
            counts[v] = counts.get(v, 0) + 1
            by_src.setdefault(s, set()).add(v)
        vals = sorted(counts)
        win = min(vals, key=lambda v: (-counts[v], v))
        out: dict[str, list] = {}
        for s, voted in by_src.items():
            adj = {v: counts[v] - (1 if v in voted else 0) for v in vals}
            win2 = min(vals, key=lambda v: (-adj[v], v))
            acc = out.setdefault(s, [0, 0])
            acc[0] += 1
            if win2 != win:
                acc[1] += 1
        srcs = sorted(out)
        return pa.table({
            "source": pa.array(srcs, pa.string()),
            "n_facts": pa.array([out[s][0] for s in srcs], pa.int64()),
            "n_flips": pa.array([out[s][1] for s in srcs], pa.int64())})

    partials = hash_group_apply(
        claims.map_batches(_distinct, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["entity", "attr"], _fact, n_parts=n_parts,
        plasma_schema=part_schema)

    agg = (partials.groupby("source").sum(["n_facts", "n_flips"])
           .rename_columns({"sum(n_facts)": "n_facts",
                            "sum(n_flips)": "n_flips"}))

    def _shape(batch: pa.Table) -> pa.Table:
        nf = np.asarray(batch["n_facts"], dtype=np.int64)
        fl = np.asarray(batch["n_flips"], dtype=np.int64)
        return batch.append_column(
            "influence_permille",
            pa.array(fl * 1000 // np.maximum(nf, 1), pa.int64()))

    return agg.map_batches(_shape, batch_format="pyarrow",
                           zero_copy_batch=True)
