"""The composed training-data preprocessing pipeline.

What a user of this engine actually runs before training: one streaming
job chaining the operator families —

    documents
      → token + quality counts        (vectorized map_batches)
      → quality gate                  (length / alpha-ratio filter)
      → exact dedup                   (md5 groupby → min-id keep list)
      → semi-join on the keep list    (partitioned hash join)
      → MinHash-LSH near-dup pruning  (keep each cluster's representative)
      → sequence packing              (FFD into fixed token budgets)

Every stage streams; the only driver-side state is the per-cluster
representative logic, which rides the (small) cluster assignment table
through joins — never the corpus. Returns the packs Dataset plus a
summary dict of per-stage row counts (the funnel a data engineer checks
first).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def run_training_pipeline(ds, *, budget: int = 2048,
                          min_tokens: int = 20, min_alpha_ratio: float = 0.5,
                          minhash_threshold: float = 0.7,
                          id_column: str = "doc_id",
                          text_column: str = "text",
                          shuffle_salt: str | None = None,
                          collect_funnel: bool = True):
    """documents Dataset (id, text) → (packs Dataset, funnel dict).

    Note: the alpha-ratio gate counts ASCII letters — for CJK-heavy
    corpora pass ``min_alpha_ratio=0`` (or gate on a langid column
    upstream) or the gate drops those documents by design.

    The two ``materialize()`` calls pin stages that are consumed by more
    than one downstream branch (dedup keep-list + join probe side) in the
    object store — spillable, distributed, never the driver. At very
    large scale swap them for ``write_parquet`` intermediates so a
    restart resumes from the last stage boundary instead of recomputing."""
    from ..stages.dedup import exact_dedup, minhash_lsh_dedup
    from ..stages.join import hash_join
    from ..stages.packing import pack_deterministic
    from ..stages.textops import token_counts, quality_counts

    def features(batch: pa.Table) -> pa.Table:
        return quality_counts(token_counts(batch, text_column), text_column)

    featured = ds.map_batches(features, batch_format="pyarrow")

    def quality_gate(batch: pa.Table) -> pa.Table:
        n_tok = batch.column("n_tokens")
        alpha_ratio = pc.divide(
            pc.cast(batch.column("n_alpha"), pa.float64()),
            pc.cast(pc.max_element_wise(batch.column("n_chars_q"), 1),
                    pa.float64()))
        keep = pc.and_(pc.greater_equal(n_tok, min_tokens),
                       pc.greater_equal(alpha_ratio, min_alpha_ratio))
        return batch.filter(keep)

    gated = featured.map_batches(
        quality_gate, batch_format="pyarrow").select_columns(
        [id_column, text_column, "n_tokens"]).materialize()

    # exact dedup → keep list of min-id representatives (small: one row
    # per distinct content), semi-joined back onto the gated stream
    reps = exact_dedup(gated, column=text_column, id_column=id_column
                       ).select_columns([id_column]).map_batches(
        lambda t: t.append_column("keep_e", pa.array([1] * len(t),
                                                     pa.int64())),
        batch_format="pyarrow")
    exact_kept = hash_join(
        gated, reps, key=id_column,
        left_cols=[text_column, "n_tokens"], right_cols=["keep_e"],
        right_types={"keep_e": pa.int64()},
    ).drop_columns(["keep_e"]).materialize()

    # near-dup pruning: cluster assignments are one row per CLUSTERED doc;
    # drop docs assigned to a cluster they don't represent
    clusters = minhash_lsh_dedup(
        exact_kept, column=text_column, id_column=id_column,
        threshold=minhash_threshold)
    def non_reps(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.not_equal(batch.column(id_column),
                                      batch.column("cluster_id")))
        return pa.table({
            id_column: t.column(id_column),
            "is_dup": pa.array([1] * len(t), pa.int64()),
        })

    drop = clusters.map_batches(non_reps, batch_format="pyarrow")
    joined = hash_join(exact_kept, drop, key=id_column,
                       left_cols=["n_tokens"], right_cols=["is_dup"],
                       how="left", right_types={"is_dup": pa.int64()})

    def keep_non_dups(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_null(batch.column("is_dup"))
                            ).drop_columns(["is_dup"])

    deduped = joined.map_batches(
        keep_non_dups, batch_format="pyarrow").materialize()

    order_column = id_column
    if shuffle_salt is not None:
        # deterministic epoch shuffle before packing: packs then mix
        # documents from across the corpus instead of id order. Same
        # salt → same packs on any cluster shape; bump the salt per
        # epoch. The shuffle key doubles as the packing partition/order
        # key, so the "shuffle" costs nothing beyond packing's own
        # exchange.
        import hashlib

        def add_shuffle_key(batch: pa.Table) -> pa.Table:
            hs = [int(hashlib.md5(
                (shuffle_salt + str(v)).encode()).hexdigest()[:15], 16)
                for v in batch.column(id_column).to_pylist()]
            return batch.append_column("_shuf", pa.array(hs, pa.int64()))

        deduped = deduped.map_batches(
            add_shuffle_key, batch_format="pyarrow")
        order_column = "_shuf"

    # scheduling-independent: pack membership is a pure function of the
    # surviving doc set (stages/packing.pack_deterministic), so reruns
    # and snapshot checks see identical packs regardless of block order
    packs = pack_deterministic(deduped, budget=budget, id_column=id_column,
                               order_column=order_column)

    funnel = {}
    if collect_funnel:
        funnel = {
            "gated": gated.count(),
            "exact_kept": exact_kept.count(),
            "after_neardup": deduped.count(),
        }
    return packs, funnel
