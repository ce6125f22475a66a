"""Sampling / splits / privacy-audit queries.

Split from the original __ray_entry__ monolith (round-5 verdict item 3);
bodies are unchanged — oracle hashes and goldens are preserved.
"""
from __future__ import annotations

from ._common import _read_pq  # noqa: F401


def q_importance_sample(sf_dir: str):
    """Length-proportional importance sampling (quality-weighted data
    selection): acceptance threshold = min(1e6, n_tokens·5000) ppm —
    docs with ≥200 tokens always kept, shorter ones kept with
    probability n_tokens/200. Integer arithmetic end-to-end so the SQL
    oracle reproduces every accept/reject decision bit-for-bit."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.sample import importance_sample
    from magic_content_extractor_ray.stages.textops import token_counts

    ds = _read_pq(f"{sf_dir}/documents.parquet",
                  columns=["doc_id", "text"])

    def weight(batch: pa.Table) -> pa.Table:
        batch = token_counts(batch)
        w = pc.min_element_wise(
            pc.multiply(batch.column("n_tokens"), pa.scalar(5000,
                                                            pa.int64())),
            pa.scalar(1_000_000, pa.int64()))
        return batch.select(["doc_id", "n_tokens"]).append_column(
            "w_ppm", pc.cast(w, pa.int64()))

    return importance_sample(
        ds.map_batches(weight, batch_format="pyarrow"),
        weight_ppm_column="w_ppm").sort("doc_id")

def q_stratified_sample(sf_dir: str):
    """Deterministic per-language stratified sample (the data-mixing
    primitive): a pure md5-hash predicate — shuffle-free, resume-safe,
    identical at any parallelism, and bit-for-bit SQL-checkable."""
    from magic_content_extractor_ray.stages.sample import stratified_sample

    ds = _read_pq(f"{sf_dir}/documents.parquet",
                  columns=["doc_id", "lang"])
    return stratified_sample(
        ds, key_column="lang", pcts={"en": 50, "de": 30}, default_pct=10,
    ).sort("doc_id")

def q_epoch_shuffle(sf_dir: str):
    """Deterministic EPOCH SHUFFLE (training-data global reordering):
    every document's position in the md5(epoch_salt + id) order —
    a reproducible, resumable stand-in for random_shuffle (same rank
    for the same id/epoch on any cluster shape), computed as a
    distributed prefix-count over the 60-bit hash key instead of a full
    sort. Changing the salt re-shuffles for the next epoch."""
    import hashlib

    import pyarrow as pa
    import pyarrow.compute as pc
    from magic_content_extractor_ray.stages.scan import keyed_prefix_sum

    SALT = "epoch-0:"

    def hash_key(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        hs = [int(hashlib.md5((SALT + str(i)).encode()).hexdigest()[:15],
                  16) for i in ids]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "h": pa.array(hs, pa.int64()),
            "one": pa.array([1] * len(batch), pa.int64()),
        })

    ranked = keyed_prefix_sum(
        _read_pq(f"{sf_dir}/documents.parquet",
                 columns=["doc_id"]).map_batches(
            hash_key, batch_format="pyarrow"),
        key_column="h", value_column="one", bucket_width=1 << 44,
        out_column="rk", tie_column="doc_id")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "shuffle_pos": pc.add(batch.column("rk"),
                                  pa.scalar(1, pa.int64())),
        })

    return ranked.map_batches(finish, batch_format="pyarrow").sort(
        "shuffle_pos")

def q_sample_fixed(sf_dir: str):
    """Deterministic fixed-SIZE uniform sample (reservoir-sampling
    analog): the 50 docs with the smallest md5(doc_id) — tree of
    per-batch bottom-k's, stable across runs/parallelism
    (stages/sample.fixed_k_sample)."""
    from magic_content_extractor_ray.stages.sample import fixed_k_sample

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "lang"])
    return fixed_k_sample(docs, k=50, id_column="doc_id")

def q_sample_per_lang(sf_dir: str):
    """Deterministic k-per-group sample: exactly 10 docs per language by
    hash order (stages/sample.fixed_k_per_group, tree-reduced)."""
    from magic_content_extractor_ray.stages.sample import fixed_k_per_group

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "lang"])
    return fixed_k_per_group(docs, k=10, group_column="lang",
                             id_column="doc_id").sort(["lang", "doc_id"])

def q_source_mixture(sf_dir: str):
    """Data mixing WITH upsampling (the training-mixture op stratified
    sampling can't express): per-source integer rates where 250 → 2.5×
    (two copies of every row, a deterministic hash-selected half a
    third), 60 → 0.6× down-sample, 0 → source dropped, default 100 →
    identity. Shuffle-free md5 predicate, resume-safe, identical at any
    parallelism; replica index emitted for downstream decorrelation."""
    from magic_content_extractor_ray.stages.sample import upsample_mixture

    ds = _read_pq(f"{sf_dir}/documents.parquet",
                  columns=["doc_id", "source"])
    return upsample_mixture(
        ds, key_column="source",
        rate_pcts={"src0": 250, "src1": 130, "src2": 60, "src3": 0},
        default_pct=100,
    ).sort(["doc_id", "copy"])

def q_weighted_sample(sf_dir: str):
    """Efraimidis–Spirakis A-ES weighted sampling WITHOUT replacement:
    the 100 docs with the largest ln(u)/n_chars keys (u from md5(id)) —
    a length-proportional sample whose every draw, including the top-k
    cut, is reproduced bit-for-bit by the SQL twin
    (stages/sample.weighted_sample_aes: tree of per-batch top-k's)."""
    from magic_content_extractor_ray.stages.sample import (
        weighted_sample_aes)

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "n_chars"])
    return weighted_sample_aes(docs, k=100, weight_column="n_chars",
                               salt="aes-1:")

def q_k_anonymity(sf_dir: str):
    """Privacy audit: k-anonymity over the quasi-identifier pair
    (nation, market segment) — cells with fewer than k=10 customers,
    i.e. the combinations whose members are re-identifiable. Per-batch
    partial counts fold the row-scale input into one bounded
    (nations × segments) cell table per block; the final groupby and
    the k filter touch only cell rows."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({
            "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
            "c_mktsegment": t.column("c_mktsegment"),
        }).group_by(["c_nationkey", "c_mktsegment"]).aggregate(
            [([], "count_all")])
        return pa.table({"c_nationkey": g.column("c_nationkey"),
                         "c_mktsegment": g.column("c_mktsegment"),
                         "n": pc.cast(g.column("count_all"), pa.int64())})

    cells = _read_pq(f"{sf_dir}/customer.parquet",
                     columns=["c_nationkey", "c_mktsegment"]
                     ).map_batches(partial,
                                   batch_format="pyarrow").to_pandas()
    out = cells.groupby(["c_nationkey", "c_mktsegment"], as_index=False)[
        "n"].sum()
    out = out[out["n"] < 10].sort_values(
        ["c_nationkey", "c_mktsegment"]).reset_index(drop=True)
    out["n"] = out["n"].astype("int64")
    return out[["c_nationkey", "c_mktsegment", "n"]]

def q_fim_split(sf_dir: str):
    """Fill-in-the-middle transform (code-model data prep): two
    deterministic md5-derived cut points per doc split it into
    prefix/middle/suffix, re-emitted in SPM order (suffix‖prefix‖
    middle) and fingerprinted. Cut points are a pure function of
    doc_id (the stratified_sample md5 idiom), so the transform is
    resumable and SQL-twinnable; the per-doc slicing is inherently
    per-document work. Docs with < 3 chars are excluded."""
    import hashlib

    import pandas as pd
    import pyarrow as pa

    def split(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        out_id, out_n, out_p1, out_p2, out_h = [], [], [], [], []
        for d, txt in zip(ids, texts):
            n = len(txt)
            if n < 3:
                continue
            a = int(hashlib.md5(f"{d}:1".encode()).hexdigest()[:8],
                    16) % (n - 1) + 1
            b = int(hashlib.md5(f"{d}:2".encode()).hexdigest()[:8],
                    16) % (n - 1) + 1
            p1, p2 = min(a, b), max(a, b)
            spm = txt[p2:] + txt[:p1] + txt[p1:p2]
            out_id.append(d)
            out_n.append(n)
            out_p1.append(p1)
            out_p2.append(p2)
            out_h.append(hashlib.md5(spm.encode("utf-8")).hexdigest())
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "n_chars": pa.array(out_n, pa.int64()),
            "p1": pa.array(out_p1, pa.int64()),
            "p2": pa.array(out_p2, pa.int64()),
            "spm_md5": pa.array(out_h, pa.string())})

    out = _read_pq(f"{sf_dir}/documents.parquet",
                   columns=["doc_id", "text"]
                   ).map_batches(split,
                                 batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)

def q_dp_lang_counts(sf_dir: str):
    """Differentially-private per-language doc counts (ε=1 Laplace,
    sensitivity 1) with SEEDED noise: the Laplace draw is the inverse
    CDF of an md5-derived uniform (u from the first 8 hex of
    md5('dp:'+lang)), so the release is reproducible and
    SQL-twinnable — the oracle replays the identical double op
    sequence (IEEE determinism, the segment_ttest precedent). True
    counts are exact combiner partials; only the bounded lang table
    reaches the driver."""
    import hashlib
    import math

    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np

        g = pa.table({"lang": t.column("lang"),
                      "n": pa.array(np.ones(len(t), np.int64))}
                     ).group_by("lang").aggregate([("n", "sum")])
        return g.rename_columns(["lang", "n"])

    counts = _read_pq(f"{sf_dir}/documents.parquet", columns=["lang"]
                      ).map_batches(partial, batch_format="pyarrow"
                                    ).groupby("lang").aggregate(
        Sum("n", alias_name="n")).to_pandas()

    rows = []
    for lang, c in zip(counts["lang"], counts["n"]):
        h = int(hashlib.md5(f"dp:{lang}".encode()).hexdigest()[:8], 16)
        u = (float(h) + 0.5) / 4294967296.0
        s = u - 0.5
        noise = -1.0 * math.copysign(1.0, s) * math.log(
            1.0 - 2.0 * abs(s))
        rows.append({"lang": lang, "n_true": int(c),
                     "n_dp": math.floor(float(int(c)) + noise)})
    out = pd.DataFrame(rows).sort_values("lang").reset_index(drop=True)
    out["n_dp"] = out["n_dp"].astype("int64")
    return out

def q_ht_estimate(sf_dir: str):
    """HORVITZ-THOMPSON estimation from the importance sample (survey
    statistics over sampled corpora): each accepted doc contributes
    its token count inverse-weighted by its inclusion probability —
    floor(n_tokens·10⁶ / w_ppm) per doc, summed exactly — giving an
    unbiased estimate of the TRUE total token count, which is also
    computed exactly for the error column. All integer; the sample,
    the weights and the estimator are each SQL-reproducible."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.sample import (
        importance_sample)
    from magic_content_extractor_ray.stages.textops import token_counts

    ds = _read_pq(f"{sf_dir}/documents.parquet",
                  columns=["doc_id", "text"])

    def weight(batch: pa.Table) -> pa.Table:
        batch = token_counts(batch)
        w = pc.min_element_wise(
            pc.multiply(batch.column("n_tokens"),
                        pa.scalar(5000, pa.int64())),
            pa.scalar(1_000_000, pa.int64()))
        return batch.select(["doc_id", "n_tokens"]).append_column(
            "w_ppm", pc.cast(w, pa.int64()))

    weighted = ds.map_batches(weight,
                              batch_format="pyarrow").materialize()
    true_total = int(weighted.sum("n_tokens"))

    def contrib(batch: pa.Table) -> pa.Table:
        ht = pc.divide(  # int64 floor division
            pc.multiply(batch.column("n_tokens"),
                        pa.scalar(1_000_000, pa.int64())),
            batch.column("w_ppm"))
        return pa.table({
            "one": pa.array([len(batch)], pa.int64()),
            "ht": pa.array([pc.sum(ht).as_py() or 0], pa.int64())})

    agg = importance_sample(weighted, weight_ppm_column="w_ppm"
                            ).map_batches(
        contrib, batch_format="pyarrow").aggregate(
        Sum("one", alias_name="n_sampled"),
        Sum("ht", alias_name="ht_total"))
    n_sampled, ht_total = int(agg["n_sampled"]), int(agg["ht_total"])
    return pd.DataFrame({
        "n_sampled": pd.Series([n_sampled], dtype="int64"),
        "ht_total_tokens": pd.Series([ht_total], dtype="int64"),
        "true_total_tokens": pd.Series([true_total], dtype="int64"),
        "err_ppm": pd.Series(
            [(1_000_000 * abs(ht_total - true_total)) // true_total],
            dtype="int64")})

_POISSON1_CDF = (0.36787944117144233, 0.7357588823428847,
                 0.9196986029286058, 0.9810118431238462,
                 0.9963401531726563, 0.9994058151824183,
                 0.9999167588507119)

def q_bootstrap_ci(sf_dir: str):
    """DETERMINISTIC Poisson bootstrap CI for mean doc length per
    lang: 20 resample replicates where each doc's weight in replicate
    r is Poisson(1)-distributed via the inverse CDF of the md5(doc:r)
    uniform (the dp_lang_counts seeded-noise idiom) — so the SQL twin
    reproduces every weight with a CASE ladder on the same literal
    thresholds. Replicate means are exact floor micro-chars; the
    CI is quantile_disc(0.1/0.9) over the 20 replicate estimates
    (index floor((n−1)q), mirrored). One (lang × 20)-cell combiner
    shuffle; nothing row-scale leaves the batches."""
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    R = 20
    TH = np.array(_POISSON1_CDF)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        chars = batch.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.int64)
        langs = batch.column("lang").to_numpy(zero_copy_only=False)
        out = {"lang": [], "rep": [], "sw": [], "swc": []}
        w = np.empty((len(ids), R), dtype=np.int64)
        for r in range(R):
            u = np.array([int(hashlib.md5(
                f"{d}:boot:{r}".encode()).hexdigest()[:8], 16)
                for d in ids], dtype=np.float64)
            u = (u + 0.5) / 4294967296.0
            w[:, r] = np.searchsorted(TH, u, side="right")
        for lang in np.unique(langs):
            m = langs == lang
            wm = w[m]
            cm = chars[m]
            for r in range(R):
                out["lang"].append(str(lang))
                out["rep"].append(r)
                out["sw"].append(int(wm[:, r].sum()))
                out["swc"].append(int((wm[:, r] * cm).sum()))
        return pa.table({
            "lang": pa.array(out["lang"], pa.string()),
            "rep": pa.array(out["rep"], pa.int64()),
            "sw": pa.array(out["sw"], pa.int64()),
            "swc": pa.array(out["swc"], pa.int64())})

    cells = _read_pq(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "lang", "n_chars"]
                     ).map_batches(partial, batch_format="pyarrow"
                                   ).groupby(["lang", "rep"]).aggregate(
        Sum("sw", alias_name="sw"),
        Sum("swc", alias_name="swc")).to_pandas()
    cells["est"] = (1_000_000 * cells["swc"]) // cells["sw"]
    rows = []
    for lang, g in cells.groupby("lang", sort=True):
        est = np.sort(g["est"].to_numpy(dtype=np.int64))
        n = len(est)
        rows.append({"lang": lang, "n_reps": n,
                     "lo_micro": int(est[(n - 1) * 10 // 100]),
                     "hi_micro": int(est[(n - 1) * 90 // 100])})
    return pd.DataFrame(rows).astype(
        {"n_reps": "int64", "lo_micro": "int64", "hi_micro": "int64"})

def q_l_diversity(sf_dir: str):
    """Privacy audit beyond k-anonymity: L-DIVERSITY of the sensitive
    attribute (market segment) within each quasi-identifier group
    (nation) — distinct-l plus ENTROPY-l (Shannon entropy of the
    within-group segment distribution, integer nano-nats via the
    user_entropy c·ln(c) idiom). Bounded (nations × segments) cells;
    one combiner pass."""
    import math

    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({
            "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
            "c_mktsegment": t.column("c_mktsegment"),
        }).group_by(["c_nationkey", "c_mktsegment"]).aggregate(
            [([], "count_all")])
        return pa.table({"c_nationkey": g.column("c_nationkey"),
                         "c_mktsegment": g.column("c_mktsegment"),
                         "c": pc.cast(g.column("count_all"),
                                      pa.int64())})

    cells = _read_pq(f"{sf_dir}/customer.parquet",
                     columns=["c_nationkey", "c_mktsegment"]
                     ).map_batches(partial,
                                   batch_format="pyarrow").to_pandas()
    cells = cells.groupby(["c_nationkey", "c_mktsegment"],
                          as_index=False)["c"].sum()
    rows = []
    for nat, g in cells.groupby("c_nationkey", sort=True):
        cs = [int(x) for x in g["c"]]
        n = sum(cs)
        s = sum(int(math.floor(c * math.log(c) * 1e9 + 0.5))
                for c in cs)
        ent = int(math.floor(
            (math.log(n) - s / 1e9 / n) * 1e9 + 0.5))
        rows.append({"c_nationkey": int(nat), "n_customers": n,
                     "l_distinct": len(cs), "entropy_nano": ent})
    return pd.DataFrame(rows).astype(
        {"n_customers": "int64", "l_distinct": "int64",
         "entropy_nano": "int64"})

def q_apportion_sample(sf_dir: str):
    """Hamilton LARGEST-REMAINDER apportionment of a fixed sampling
    budget (N=1000 docs) across the (lang, source) corpus cells — the
    constrained-allocation step of training-mixture construction:
    per-cell quotas that sum EXACTLY to the budget, unlike independent
    rounding. All integer: base = (N·c) // T bigint floor, remainder
    (N·c) mod T; the L = N − Σbase leftover seats go to the largest
    remainders (ties: lang, source ascending). One combiner map pass;
    only the bounded |langs|×|sources| cell table reaches the driver."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    N = 1000

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang", "source"]).aggregate([([], "count_all")])
        return pa.table({"lang": g.column("lang"),
                         "source": g.column("source"),
                         "c": pc.cast(g.column("count_all"),
                                      pa.int64())})

    cells = _read_pq(f"{sf_dir}/documents.parquet",
                     columns=["lang", "source"]).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    cells = cells.groupby(["lang", "source"], as_index=False)["c"].sum()
    total = int(cells["c"].sum())
    cells["n_docs"] = cells["c"].astype("int64")
    cells["base"] = [N * int(c) // total for c in cells["c"]]
    cells["rem"] = [N * int(c) % total for c in cells["c"]]
    leftover = N - int(cells["base"].sum())
    order = cells.sort_values(
        ["rem", "lang", "source"],
        ascending=[False, True, True]).index[:leftover]
    cells["seats"] = cells["base"]
    cells.loc[order, "seats"] += 1
    out = cells[["lang", "source", "n_docs", "seats"]].sort_values(
        ["lang", "source"]).reset_index(drop=True)
    return out.astype({"n_docs": "int64", "seats": "int64"})

def q_t_closeness(sf_dir: str):
    """Privacy-audit triptych completion (with [[k_anonymity]] and
    [[l_diversity]]): T-CLOSENESS of the sensitive attribute (market
    segment, ordered lexicographically) within each quasi-identifier
    group (nation) — the ordered-category Earth Mover's Distance
    between the within-group segment distribution and the global one,
    normalized by its max (K−1). Exact rationals: EMD numerator
    Σ_k |cumsum(c_gk·N − C_k·n_g)| is integer; emd_nano is ONE integer
    floor division by n_g·N·(K−1). One combiner pass; only the bounded
    nations × segments grid reaches the driver."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({
            "nat": pc.cast(t.column("c_nationkey"), pa.int64()),
            "seg": t.column("c_mktsegment"),
        }).group_by(["nat", "seg"]).aggregate([([], "count_all")])
        return pa.table({"nat": g.column("nat"), "seg": g.column("seg"),
                         "c": pc.cast(g.column("count_all"), pa.int64())})

    cells = _read_pq(f"{sf_dir}/customer.parquet",
                     columns=["c_nationkey", "c_mktsegment"]
                     ).map_batches(partial,
                                   batch_format="pyarrow").to_pandas()
    cells = cells.groupby(["nat", "seg"], as_index=False)["c"].sum()
    grid = cells.pivot_table(index="nat", columns="seg", values="c",
                             fill_value=0, aggfunc="sum").sort_index(
        axis=1)
    glob = [int(x) for x in grid.sum(axis=0)]
    N = sum(glob)
    K = len(glob)
    rows = []
    for nat, r in grid.iterrows():
        cs = [int(x) for x in r]
        ng = sum(cs)
        run, num = 0, 0
        for c, cg in zip(cs, glob):
            run += c * N - cg * ng
            num += abs(run)
        emd = (num * 10**9) // (ng * N * (K - 1))
        rows.append({"c_nationkey": int(nat), "n_customers": ng,
                     "emd_nano": emd})
    return pd.DataFrame(rows).astype(
        {"n_customers": "int64", "emd_nano": "int64"})

def q_pps_systematic(sf_dir: str):
    """Probability-proportional-to-size SYSTEMATIC sampling (the
    survey-sampling complement of the A-ES weighted sample): docs in
    doc_id order with size = n_chars; doc i is selected iff the
    cumulative size crosses a new multiple of W/k (k = 50,
    deterministic zero offset, documented) — i.e.
    ⌊cum_i·k/W⌋ > ⌊cum_{i-1}·k/W⌋, all integer arithmetic. One
    two-phase prefix-sum scan; selection is a pure map over the ranked
    rows. Output (doc_id, n_chars, pick_idx)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.scan import keyed_prefix_sum

    K = 50

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
            "w": pc.cast(t.column("n_chars"), pa.int64())})

    base = docs.map_batches(prep, batch_format="pyarrow")
    total = int(base.map_batches(
        lambda t: pa.table({"s": pa.array(
            [int(t.column("w").to_numpy(zero_copy_only=False).sum())],
            pa.int64())}),
        batch_format="pyarrow").to_pandas()["s"].sum())

    ranked = keyed_prefix_sum(base, key_column="doc_id",
                              value_column="w", out_column="cum0")

    def select(df: pd.DataFrame) -> pd.DataFrame:
        cum0 = df["cum0"].to_numpy(dtype="int64")       # exclusive
        w = df["w"].to_numpy(dtype="int64")
        cum1 = cum0 + w                                  # inclusive
        b0 = (cum0 * K) // total
        b1 = (cum1 * K) // total
        sel = b1 > b0
        out = pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64")[sel],
            "n_chars": pd.Series(w[sel], index=df.index[sel],
                                 dtype="int64"),
            "pick_idx": pd.Series(b0[sel], index=df.index[sel],
                                  dtype="int64")})
        return out

    return ranked.map_batches(select,
                              batch_format="pandas").sort("doc_id")
