"""Distributed transitive clustering: iterative min-label propagation.

The reference approximates transitive closure with exactly TWO rounds of
1-hop min-label propagation in SQL (``batch_mdm_gcp/bigquery_utils.py:684-716``
— "simplified transitive closure"), which is wrong for chains longer than two
hops. This engine implements the real fixpoint: per iteration every node takes
``min(own label, min of neighbors' labels)`` via a hash-partitioned
``Dataset.join`` (edges ⋈ labels) + ``groupby(node)`` exchange, looping until
no label changes (driver-controlled, ``cfg.max_cc_iterations`` cap).
Convergence is O(component diameter) iterations — small for ER duplicate
graphs. Matches the reference output whenever 2 hops suffice, and is correct
beyond.

Edges come from scored pairs with ``match_decision ∈ {auto_merge,
human_review}`` and ``combined_score ≥ 0.6`` (``bigquery_utils.py:645-653``);
unmatched records remain singleton clusters (``:663-682``) because labels are
seeded from ALL doc_ids.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from . import config as C
from .config import EngineConfig, DEFAULT_CONFIG


def _edge_mask(batch: pa.Table):
    """Edge predicate over scored pairs (bigquery_utils.py:645-653)."""
    return pc.and_(
        pc.is_in(batch["match_decision"], value_set=pa.array(["auto_merge", "human_review"])),
        pc.greater_equal(batch["combined_score"], C.CLUSTER_EDGE_THRESHOLD),
    )


def build_edges(scored_ds):
    """Bidirectional edge list from scored pairs (bigquery_utils.py:645-660)."""

    def to_edges(batch: pa.Table) -> pa.Table:
        kept = batch.filter(_edge_mask(batch))
        return pa.table(
            {
                "src": pa.concat_arrays(
                    [kept["doc1_id"].combine_chunks(), kept["doc2_id"].combine_chunks()]
                ),
                "dst": pa.concat_arrays(
                    [kept["doc2_id"].combine_chunks(), kept["doc1_id"].combine_chunks()]
                ),
            }
        )

    return scored_ds.map_batches(to_edges, batch_format="pyarrow")


def init_labels(docs_or_features_ds):
    """Every doc starts in its own cluster (bigquery_utils.py:663-682)."""

    def seed(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["doc_id"], "label": batch["doc_id"]})

    return docs_or_features_ds.select_columns(["doc_id"]).map_batches(
        seed, batch_format="pyarrow"
    )


def _min_label_block(batch: pa.Table):
    """Grouped-min over a sorted-by-node block: for each node emit
    (node, min(label), changed) where changed = min != the node's own previous
    label (the row with is_self=1).

    Fully vectorized: node run boundaries come from the dictionary codes
    (first-appearance codes over a sorted column are nondecreasing), labels
    are dictionary-encoded and ranked so the per-group min is one
    ``np.minimum.reduceat`` over int ranks — Python-level work is O(unique
    labels), not O(rows)."""
    import numpy as np

    n = batch.num_rows
    if n == 0:
        # derive the typed-empty from the input schema when present —
        # connected_components also runs over int64 nodes, and a hardcoded
        # string-typed empty would conflict with those label blocks
        names = batch.column_names
        node_t = batch.schema.field("node").type if "node" in names else pa.string()
        label_t = batch.schema.field("label").type if "label" in names else node_t
        return pa.table(
            {
                "node": pa.array([], node_t),
                "label": pa.array([], label_t),
                "changed": pa.array([], pa.int64()),
            }
        )
    node_col = batch["node"].combine_chunks()
    ncodes = pc.dictionary_encode(node_col).indices.to_numpy(zero_copy_only=False)
    starts = np.concatenate(([0], np.nonzero(np.diff(ncodes))[0] + 1))

    ld = pc.dictionary_encode(batch["label"].combine_chunks())
    lcodes = ld.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    ldict = ld.dictionary
    # rank codes by dictionary VALUE order so min-rank == lexicographic min
    sort_idx = pc.sort_indices(ldict).to_numpy(zero_copy_only=False).astype(np.int64)
    ranks = np.empty(len(sort_idx), dtype=np.int64)
    ranks[sort_idx] = np.arange(len(sort_idx))
    lrank = ranks[lcodes]

    min_rank = np.minimum.reduceat(lrank, starts)
    is_self = batch["is_self"].to_numpy(zero_copy_only=False).astype(bool)
    self_pos = np.nonzero(is_self)[0]
    grp_of_self = np.searchsorted(starts, self_pos, side="right") - 1
    old_rank = np.full(len(starts), -1, dtype=np.int64)
    old_rank[grp_of_self] = lrank[self_pos]
    changed = (old_rank >= 0) & (min_rank != old_rank)

    out_labels = ldict.take(pa.array(sort_idx[min_rank], pa.int64()))
    return pa.table(
        {
            "node": node_col.take(pa.array(starts, pa.int64())),
            "label": out_labels,
            "changed": pa.array(changed.astype(np.int64), pa.int64()),
        }
    )


def _block_refs(mat_ds) -> list:
    """Arrow-block object refs of a materialized Dataset (no execution)."""
    from .dsutil import block_refs

    return block_refs(mat_ds)


def _partials_block(block: pa.Table, fr) -> tuple[int, pa.Table]:
    """Per-edge-block combiner: min frontier label pushed to each adjacent
    src (task twin of the old _frontier_partial_msgs map).

    Empty-block guard: Ray's sort emits zero-SCHEMA blocks for empty output
    partitions and map UDFs pass them through uncalled, so edge datasets fed
    by a sort-partitioned stage can carry schema-less empties."""
    if block.num_rows == 0 or "dst" not in block.column_names:
        return 0, pa.table({})
    fn, fl = fr
    idx = pc.index_in(block["dst"], value_set=fn)
    hit = pc.is_valid(idx)
    t = pa.table(
        {"node": block["src"].filter(hit), "label": fl.take(idx.filter(hit))}
    )
    if t.num_rows == 0:
        return 0, t
    g = t.group_by("node").aggregate([("label", "min")]).rename_columns(
        ["node", "label"]
    )
    return g.num_rows, g


def _apply_block(block: pa.Table, upd) -> tuple[pa.Table, int, pa.Table]:
    """Min-merge broadcast updates into one label block; returns
    (new_block, n_changed, changed_rows)."""
    if block.num_rows == 0 or "node" not in block.column_names:
        return block, 0, pa.table({})
    un, ul = upd
    idx = pc.index_in(block["node"], value_set=un)
    hit = pc.is_valid(idx)
    cand = ul.take(pc.fill_null(idx, 0))
    cur = block["label"]
    better = pc.and_(hit, pc.less(cand, cur))
    new = pa.table({"node": block["node"], "label": pc.if_else(better, cand, cur)})
    changed = new.filter(better)
    return new, changed.num_rows, changed


def _strip_block(block: pa.Table) -> tuple[pa.Table, int, pa.Table]:
    """Post-exchange block: (labels without the changed flag, n_changed,
    changed rows)."""
    if block.num_rows == 0 or "changed" not in block.column_names:
        return block, 0, pa.table({})
    out = block.select(["node", "label"])
    changed = out.filter(pc.equal(block["changed"], 1))
    return out, changed.num_rows, changed


def _scored_edges_block(block: pa.Table) -> tuple[int, pa.Table]:
    """Raw-task twin of ``build_edges`` over one scored block, emitting each
    edge ONCE (directed) — ``driver_cc`` propagates both ways anyway."""
    if block.num_rows == 0 or "doc1_id" not in block.column_names:
        return 0, pa.table({})
    kept = block.filter(_edge_mask(block))
    t = pa.table({"src": kept["doc1_id"], "dst": kept["doc2_id"]})
    return t.num_rows, t


def edge_map_from_scored(scored_mat, cfg: EngineConfig = DEFAULT_CONFIG):
    """Thresholded edges → sparse non-identity (node, label) map, entirely as
    raw tasks over the MATERIALIZED scored Dataset's block refs + one driver
    numpy fixpoint (``driver_cc``) — no Dataset execution at all (each one
    costs ~0.4-0.5 s of executor startup; this was the largest slice of the
    cluster stage's serial core). Counts come back first; edge tables are
    fetched only under ``cfg.cc_driver_edge_cap``. Returns ``None`` when the
    edge set exceeds the cap — callers fall back to ``build_edges`` +
    ``connected_components`` (the distributed fixpoint)."""
    import ray

    from .dsutil import block_refs

    task = ray.remote(num_returns=2)(_scored_edges_block)
    outs = [task.remote(r) for r in block_refs(scored_mat)]
    counts = ray.get([o[0] for o in outs])
    if sum(counts) > cfg.cc_driver_edge_cap:
        return None
    tabs = ray.get([o[1] for o, c in zip(outs, counts) if c > 0])
    if not tabs:
        return pa.table(
            {"node": pa.array([], pa.string()), "label": pa.array([], pa.string())}
        )
    return driver_cc(pa.concat_tables(tabs, promote_options="default"))


def driver_cc(edge_tab: pa.Table) -> pa.Table:
    """Min-label connected components of one (src, dst) edge table, computed
    driver-side with vectorized numpy (edge-relax ``np.minimum.at`` +
    pointer-jumping, O(E) per round, O(log n) rounds). Edges may be directed
    or bidirectional — propagation runs both ways. Node type is anything
    Arrow can dictionary-encode (string or int); the label order is VALUE
    order (rank-encoded like ``_min_label_block``), so the result matches the
    distributed fixpoint exactly.

    Returns only the NON-IDENTITY rows (node, label) with label != node —
    every other node is its own singleton/minimum, so the sparse map bounds
    the broadcast at (non-minimum member count) rows."""
    import numpy as np

    if edge_tab.num_rows == 0:
        t = edge_tab
        src_t = t.schema.field("src").type if "src" in t.column_names else pa.string()
        return pa.table({"node": pa.array([], src_t), "label": pa.array([], src_t)})
    src = edge_tab["src"].combine_chunks()
    dst = edge_tab["dst"].combine_chunks()
    enc = pc.dictionary_encode(pa.concat_arrays([src, dst]))
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dictionary = enc.dictionary
    sort_idx = pc.sort_indices(dictionary).to_numpy(zero_copy_only=False).astype(np.int64)
    ranks = np.empty(len(sort_idx), np.int64)
    ranks[sort_idx] = np.arange(len(sort_idx))
    r = ranks[codes]
    E = len(src)
    ui, vi = r[:E], r[E:]
    lab = np.arange(len(sort_idx), dtype=np.int64)
    while True:
        new = lab.copy()
        np.minimum.at(new, ui, lab[vi])
        np.minimum.at(new, vi, lab[ui])
        while True:  # pointer jumping: label of my label
            nn = new[new]
            if np.array_equal(nn, new):
                break
            new = nn
        if np.array_equal(new, lab):
            break
        lab = new
    changed = np.flatnonzero(lab != np.arange(len(lab)))
    take_nodes = pa.array(sort_idx[changed], pa.int64())
    take_labels = pa.array(sort_idx[lab[changed]], pa.int64())
    return pa.table(
        {"node": dictionary.take(take_nodes), "label": dictionary.take(take_labels)}
    )


def apply_label_map(labels_ds, label_map: pa.Table):
    """Lazy broadcast apply of a sparse (node, label) override map onto a
    seed label Dataset: hits take the mapped label, misses keep their own."""
    import ray

    mref = ray.put(
        (label_map["node"].combine_chunks(), label_map["label"].combine_chunks())
    )

    def apply(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "node" not in b.column_names:
            return b
        nodes, labs = ray.get(mref)
        if len(nodes) == 0:  # empty override map (no merges): seeds stand
            return pa.table({"node": b["node"], "label": b["label"]})
        idx = pc.index_in(b["node"], value_set=nodes)
        lab = pc.if_else(
            pc.is_valid(idx),
            labs.take(pc.fill_null(idx, 0)),
            b["label"].combine_chunks(),
        )
        return pa.table({"node": b["node"], "label": lab})

    return labels_ds.select_columns(["node", "label"]).map_batches(
        apply, batch_format="pyarrow"
    )


def connected_components(edges_ds, labels_ds, cfg: EngineConfig = DEFAULT_CONFIG,
                         labels_are_seed: bool = True):
    """Iterate min-label propagation to fixpoint.

    Distributed iteration (all hash-partitioned, no driver data movement):
      msgs   = edges ⋈ labels on dst       → (src, neighbor_label)
      union  = msgs ∪ labels(self-tagged)
      labels = sort(node) → grouped min    → (node, min_label, changed)

    Delta iteration (when the previous round changed ≤
    ``cfg.cc_frontier_broadcast_cap`` labels): broadcast the changed
    (node, label) set via ``ray.put`` and run two cheap map passes —
    per-edge-block combiner minima, then a min-merge over the label table —
    instead of the join + sort exchange. Label propagation is monotone
    (labels only decrease), so pushing only from changed nodes is exact
    delta propagation; the fixpoint is identical. ER duplicate graphs hit a
    tiny frontier after one full pass, making iterations 2+ sub-second.

    ``labels_are_seed=True`` (the ``init_labels`` contract: label == node and
    every edge endpoint has a label row) enables an iteration-0 shortcut that
    skips the first join — edges ⋈ identity-labels is the identity, so
    neighbor labels ARE the dst ids. Pass ``False`` for warm-start/resumed
    label inputs, where the shortcut would propagate wrong labels and edges
    whose dst lacks a label row would inject ghost labels the join filters.
    """
    import ray
    import ray.data

    edges = edges_ds.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return labels_ds.select_columns(["node", "label"])
    if labels_are_seed and n_edges <= cfg.cc_driver_edge_cap:
        # Small-graph fast path (see cfg.cc_driver_edge_cap): collect the
        # thresholded edges, run the same min-label fixpoint driver-side in
        # numpy, and return a LAZY broadcast apply over the seed labels —
        # zero Dataset executions here; the one cheap map fuses into
        # whatever consumes the labels (survivorship join, resolve, write).
        # Seed-only: with warm-start labels the component minimum is over
        # INITIAL labels, which live distributed — that stays on the
        # iterative path below.
        etabs = [
            t for t in ray.get(_block_refs(edges))
            if t.num_rows and "src" in t.column_names
        ]
        emap = driver_cc(
            pa.concat_tables(etabs, promote_options="default")
        )
        if emap.num_rows == 0:
            return labels_ds.select_columns(["node", "label"])
        return apply_label_map(labels_ds, emap)
    keepalive = [edges]  # hold materialized datasets so block refs stay valid
    edge_refs = _block_refs(edges)
    labels_mat = labels_ds.materialize()
    keepalive.append(labels_mat)
    label_refs = _block_refs(labels_mat)
    cap = cfg.cc_frontier_broadcast_cap

    # Driver-coordinated delta rounds run as RAW Ray tasks over the
    # materialized block refs: each Dataset execution carries ~0.3-0.5 s of
    # executor startup, and a CC run makes ~8 tiny passes (frontier probes,
    # partial-message combiners, broadcast applies) — as tasks they cost
    # ~50 ms each. The all-to-all iterations stay on the Dataset API.
    partials_task = ray.remote(num_returns=2)(_partials_block)
    apply_task = ray.remote(num_returns=3)(_apply_block)
    strip_task = ray.remote(num_returns=3)(_strip_block)

    def msg_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["src"],
                "label": batch["label"],
                "is_self": pa.array([0] * batch.num_rows, pa.int8()),
            }
        )

    def self_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["node"],
                "label": batch["label"],
                "is_self": pa.array([1] * batch.num_rows, pa.int8()),
            }
        )

    def first_msgs(batch: pa.Table) -> pa.Table:
        # iteration 1 shortcut: labels are seeded label==node, so
        # edges ⋈ labels is the identity — neighbor labels ARE the dst ids
        return pa.table(
            {
                "node": batch["src"],
                "label": batch["dst"],
                "is_self": pa.array([0] * batch.num_rows, pa.int8()),
            }
        )

    def gather_frontier(outs) -> pa.Table | None:
        """(count, table) task outputs → one frontier table, None if > cap.
        Counts come back first (ints); tables are fetched only under the cap,
        so driver memory stays bounded at ~cap rows."""
        counts = ray.get([o[0] for o in outs])
        total = sum(counts)
        if total > cap:
            return None
        tabs = ray.get([o[1] for o, c in zip(outs, counts) if c > 0])
        if not tabs:
            return pa.table({"node": pa.array([], pa.string()),
                             "label": pa.array([], pa.string())})
        return pa.concat_tables(tabs, promote_options="default").combine_chunks()

    frontier: pa.Table | None = None
    for it in range(cfg.max_cc_iterations):
        if frontier is not None:
            fref = ray.put(
                (frontier["node"].combine_chunks(), frontier["label"].combine_chunks())
            )
            outs = [partials_task.remote(r, fref) for r in edge_refs]
            ptab = gather_frontier(outs)
            if ptab is None:
                frontier = None  # adjacency fan-out too large — full exchange
                continue
            if ptab.num_rows == 0:
                break
            best = ptab.group_by("node").aggregate([("label", "min")])
            uref = ray.put(
                (best["node"].combine_chunks(), best["label_min"].combine_chunks())
            )
            outs = [apply_task.remote(r, uref) for r in label_refs]
            label_refs = [o[0] for o in outs]
            frontier = gather_frontier([(o[1], o[2]) for o in outs])
        else:
            labels_cur = ray.data.from_arrow_refs(label_refs)
            if it == 0 and labels_are_seed:
                msgs = edges.map_batches(first_msgs, batch_format="pyarrow")
            else:
                from .dsutil import copartition_join

                joined = copartition_join(
                    edges, labels_cur, on="dst", right_on="node",
                    n=cfg.cc_num_partitions,
                )
                msgs = joined.map_batches(msg_rows, batch_format="pyarrow")

            union = msgs.union(labels_cur.map_batches(self_rows, batch_format="pyarrow"))
            # ONE execution per iteration: sort + grouped-min fused. (No
            # trailing repartition: _min_label_block emits a typed table even
            # for empty blocks, so every downstream consumer sees a schema.)
            new_labels = (
                union.sort("node")
                .map_batches(_min_label_block, batch_size=None, batch_format="pyarrow")
                .materialize()
            )
            keepalive.append(new_labels)
            outs = [strip_task.remote(r) for r in _block_refs(new_labels)]
            label_refs = [o[0] for o in outs]
            frontier = gather_frontier([(o[1], o[2]) for o in outs])
        if frontier is not None and frontier.num_rows == 0:
            break
    return ray.data.from_arrow_refs(label_refs)
