"""Span → feature-column extraction (the interleaved-doc "parser").

Turns the input docs table ``(doc_id, spans)`` into a flat feature table with
one string column per span kind plus a ``media_refs`` list column — the
Ray-native analogue of the reference's union+projection step
(``batch_mdm_gcp/bigquery_utils.py:154-237``). The input ``spans`` column is
never modified; features are derived (span-invariant, FIXTURES.md §6.1).

Vectorized: one ``flatten`` + ``list_parent_indices`` per batch, then NumPy
scatter per kind — no Python loop over rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .schema import FIELD_KINDS, MEDIA_KIND
from .textnorm import standardize_table


def extract_features(batch: pa.Table, keep_spans: bool = False) -> pa.Table:
    n = batch.num_rows
    spans = batch["spans"].combine_chunks()
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(spans)
    kinds = flat.field("kind").to_numpy(zero_copy_only=False)
    texts = flat.field("text")
    refs = flat.field("media_ref")

    cols: dict[str, pa.Array] = {"doc_id": batch["doc_id"]}
    for kind in FIELD_KINDS:
        mask = kinds == kind
        vals = np.full(n, None, dtype=object)
        idx = parent[mask]
        tv = texts.filter(pa.array(mask)).to_numpy(zero_copy_only=False)
        # first occurrence wins if a kind repeats: reversed assignment
        vals[idx[::-1]] = tv[::-1]
        cols[kind] = pa.array(vals, type=pa.string())

    media_mask = kinds == MEDIA_KIND
    media_parent = parent[media_mask]
    media_vals = refs.filter(pa.array(media_mask)).to_numpy(zero_copy_only=False)
    lists: list[list[str]] = [[] for _ in range(n)]
    for p, v in zip(media_parent, media_vals):
        lists[p].append(v)
    cols["media_refs"] = pa.array(lists, type=pa.list_(pa.string()))

    if keep_spans:
        cols["spans"] = batch["spans"]
    return pa.table(cols)


def featurize_batch(batch: pa.Table) -> pa.Table:
    """extract + standardize in one map_batches kernel."""
    return standardize_table(extract_features(batch))


def featurize(docs_ds):
    """Dataset[docs] -> Dataset[features with *_clean columns]."""
    return docs_ds.map_batches(featurize_batch, batch_format="pyarrow")
