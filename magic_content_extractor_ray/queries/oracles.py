"""DuckDB oracle SQL for every queries() entry (the driver correctness gate).

Split from the original __ray_entry__ monolith (round-5 verdict item 3);
bodies are unchanged — oracle hashes and goldens are preserved.
"""
from __future__ import annotations

from ._common import _ANN_K, _ANN_NQ, _EVENT_TYPES  # noqa: F401


_STOPWORD_ALT = ("a|an|and|are|as|at|be|been|by|for|from|in|is|it|of|on|or|"
                 "that|the|this|to|was|were|with")

def _page_rank_sql(damping: float = 0.85, n_iter: int = 10) -> str:
    """The broadcast recurrence unrolled as chained CTEs — an
    INDEPENDENT restatement DuckDB executes dense, term order matched
    (r/ow*w) so FP drift stays far inside the 1e-8 rounding grain."""
    sql = ("WITH seq AS (SELECT user_id, "
           "CAST(json_extract(props, '$.k') AS BIGINT) AS k, "
           "LEAD(CAST(json_extract(props, '$.k') AS BIGINT)) OVER "
           "(PARTITION BY user_id ORDER BY ts, event_id) AS nk "
           "FROM events), "
           "edges AS (SELECT k AS src, nk AS dst, "
           "CAST(count(*) AS DOUBLE) AS w FROM seq "
           "WHERE nk IS NOT NULL GROUP BY 1, 2), "
           "nodes AS (SELECT src AS node FROM edges "
           "UNION SELECT dst FROM edges), "
           "nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes), "
           "outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1), "
           "r0 AS (SELECT node, 1.0/(SELECT n FROM nv) AS r FROM nodes)")
    base_lit = repr(1.0 - damping)
    d_lit = repr(damping)
    for i in range(1, n_iter + 1):
        sql += (f", r{i} AS (SELECT n.node, "
                f"CAST({base_lit} AS DOUBLE)/(SELECT n FROM nv) + "
                f"{d_lit}*coalesce(c.s, 0) AS r FROM nodes n "
                f"LEFT JOIN (SELECT e.dst, sum(p.r / o.ow * e.w) AS s "
                f"FROM edges e JOIN outw o ON o.src = e.src "
                f"JOIN r{i-1} p ON p.node = e.src GROUP BY e.dst) c "
                f"ON c.dst = n.node)")
    sql += (f" SELECT node, CAST(floor(r * 1e8 + 0.5) AS BIGINT) "
            f"AS pr_e8 FROM r{n_iter} ORDER BY node")
    return sql

def _textrank_sql(damping: float = 0.85, n_iter: int = 10) -> str:
    """q_page_rank's unrolled-CTE recurrence, restated over the word
    co-occurrence graph (term order r/ow*w matched so FP drift stays
    inside the 1e-8 rounding grain)."""
    sql = (
        "WITH toks AS MATERIALIZED (SELECT "
        "list_filter(regexp_split_to_array(lower(text), '\\s+'), "
        "w -> len(w) >= 4) AS ws FROM documents), "
        "adjp AS (SELECT u['a'] AS a, u['b'] AS b FROM ("
        "SELECT unnest([{'a': ws[i], 'b': ws[i+1]} "
        "for i in range(1, greatest(len(ws), 1))]) AS u FROM toks)), "
        "edges AS MATERIALIZED (SELECT src, dst, "
        "CAST(count(*) AS DOUBLE) AS w FROM ("
        "SELECT a AS src, b AS dst FROM adjp "
        "UNION ALL SELECT b, a FROM adjp) GROUP BY 1, 2), "
        "nodes AS (SELECT src AS node FROM edges "
        "UNION SELECT dst FROM edges), "
        "nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes), "
        "outw AS MATERIALIZED (SELECT src, sum(w) AS ow "
        "FROM edges GROUP BY 1), "
        "r0 AS (SELECT node, 1.0/(SELECT n FROM nv) AS r FROM nodes)")
    base_lit = repr(1.0 - damping)
    d_lit = repr(damping)
    for i in range(1, n_iter + 1):
        sql += (f", r{i} AS MATERIALIZED (SELECT n.node, "
                f"CAST({base_lit} AS DOUBLE)/(SELECT n FROM nv) + "
                f"{d_lit}*coalesce(c.s, 0) AS r FROM nodes n "
                f"LEFT JOIN (SELECT e.dst, sum(p.r / o.ow * e.w) AS s "
                f"FROM edges e JOIN outw o ON o.src = e.src "
                f"JOIN r{i-1} p ON p.node = e.src GROUP BY e.dst) c "
                f"ON c.dst = n.node)")
    sql += (f" SELECT node AS word, CAST(floor(r * 100000000 + 0.5) "
            f"AS BIGINT) AS pr_e8 FROM r{n_iter} "
            f"ORDER BY pr_e8 DESC, word LIMIT 20")
    return sql

def _mmr_oracle(k: int = 8) -> str:
    """Unrolled greedy MMR twin (the _kcenter_oracle pattern): round
    1 = argmin distance-to-query; round i = argmax (min-dist-to-chosen
    − dist-to-query), ties vec_id asc, chosen + query excluded."""
    parts = [
        _SQ8_CODES_SQL,
        ", codes AS MATERIALIZED (SELECT vec_id, ex.dim, CASE WHEN mx = mn THEN 0 "
        "ELSE CAST(floor((val - mn) * 255.0 / (mx - mn)) AS BIGINT) END "
        "AS code FROM ex JOIN grid ON grid.dim = ex.dim), "
        "qq AS MATERIALIZED (SELECT min(vec_id) AS qid FROM codes), "
        "dq AS MATERIALIZED (SELECT c.vec_id, CAST(sum((c.code - x.code) * "
        "(c.code - x.code)) AS BIGINT) AS dq FROM codes c JOIN codes x "
        "ON x.dim = c.dim AND x.vec_id = (SELECT qid FROM qq) "
        "GROUP BY 1), "
        "m1 AS MATERIALIZED (SELECT vec_id, -dq AS sc FROM dq "
        "WHERE vec_id <> (SELECT qid FROM qq) "
        "ORDER BY sc DESC, vec_id LIMIT 1), "
        "d1 AS MATERIALIZED (SELECT c.vec_id, CAST(sum((c.code - x.code) * "
        "(c.code - x.code)) AS BIGINT) AS d FROM codes c JOIN codes x "
        "ON x.dim = c.dim AND x.vec_id = (SELECT vec_id FROM m1) "
        "GROUP BY 1)"]
    for i in range(2, k + 1):
        excl = " UNION ALL ".join(
            f"SELECT vec_id FROM m{j}" for j in range(1, i))
        parts.append(
            f", m{i} AS MATERIALIZED (SELECT p.vec_id, p.d - q.dq AS sc "
            f"FROM d{i-1} p JOIN dq q ON q.vec_id = p.vec_id "
            f"WHERE p.vec_id <> (SELECT qid FROM qq) "
            f"AND p.vec_id NOT IN ({excl}) "
            f"ORDER BY sc DESC, p.vec_id LIMIT 1)")
        if i < k:
            parts.append(
                f", d{i} AS MATERIALIZED (SELECT p.vec_id, LEAST(p.d, s.d) AS d "
                f"FROM d{i-1} p JOIN (SELECT c.vec_id, "
                f"CAST(sum((c.code - x.code) * (c.code - x.code)) "
                f"AS BIGINT) AS d FROM codes c JOIN codes x "
                f"ON x.dim = c.dim AND x.vec_id = "
                f"(SELECT vec_id FROM m{i}) GROUP BY 1) s "
                f"ON s.vec_id = p.vec_id)")
    parts.append(
        " SELECT CAST(1 AS BIGINT) AS round, vec_id, "
        "CAST(sc AS BIGINT) AS score2 FROM m1")
    for i in range(2, k + 1):
        parts.append(f" UNION ALL SELECT {i}, vec_id, sc FROM m{i}")
    parts.append(" ORDER BY round")
    return "".join(parts)

def _markov_stationary_oracle(squarings: int = 10) -> str:
    """Unrolled integer matrix-squaring twin of q_markov_stationary
    (row-stochastic renormalization each round; HUGEINT throughout —
    2·w·10⁶ exceeds int64). Every CTE MATERIALIZED (DuckDB inlines
    plain CTEs; chained self-joins explode otherwise)."""
    RND = ("CASE WHEN rs.rs = 0 THEN 0 ELSE "
           "(2 * w.w * 1000000 + rs.rs) // (2 * rs.rs) END")
    parts = [
        "WITH seq AS MATERIALIZED (SELECT user_id, "
        "CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1 "
        "WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END AS t, "
        "LEAD(CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1 "
        "WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS nt "
        "FROM events), "
        "ct AS MATERIALIZED (SELECT t AS i, nt AS j, "
        "CAST(count(*) AS HUGEINT) AS c FROM seq "
        "WHERE nt IS NOT NULL GROUP BY 1, 2), "
        "grid AS (SELECT a.i AS i, b.i AS j FROM range(5) a(i), "
        "range(5) b(i)), "
        "full0 AS MATERIALIZED (SELECT g.i, g.j, "
        "COALESCE(ct.c, 0) AS c FROM grid g LEFT JOIN ct "
        "ON ct.i = g.i AND ct.j = g.j), "
        "rs0 AS MATERIALIZED (SELECT i, sum(c) AS rs FROM full0 "
        "GROUP BY 1), "
        "c0 AS MATERIALIZED (SELECT w.i, w.j, CASE WHEN rs.rs = 0 THEN "
        "(CASE WHEN w.i = w.j THEN 1000000 ELSE 0 END) ELSE "
        "(2 * w.c * 1000000 + rs.rs) // (2 * rs.rs) END AS p "
        "FROM full0 w JOIN rs0 rs ON rs.i = w.i)"]
    for k in range(1, squarings + 1):
        parts.append(
            f", w{k} AS MATERIALIZED (SELECT a.i AS i, b.j AS j, "
            f"sum(a.p * b.p) AS w FROM c{k-1} a JOIN c{k-1} b "
            f"ON a.j = b.i GROUP BY 1, 2)"
            f", rs{k} AS MATERIALIZED (SELECT i, sum(w) AS rs "
            f"FROM w{k} GROUP BY 1)"
            f", c{k} AS MATERIALIZED (SELECT w.i, w.j, "
            + RND.replace("w.w", "w.w").replace("rs.rs", "rs.rs")
            + f" AS p FROM w{k} w JOIN rs{k} rs ON rs.i = w.i)")
    parts.append(
        f" SELECT CASE j WHEN 0 THEN 'click' WHEN 1 THEN 'error' "
        f"WHEN 2 THEN 'purchase' WHEN 3 THEN 'signup' ELSE 'view' END "
        f"AS event_type, CAST(p AS BIGINT) AS pi_micro "
        f"FROM c{squarings} WHERE i = 0 ORDER BY j")
    return "".join(parts)

def _coverage_oracle(k: int = 10, v: int = 500) -> str:
    """Unrolled greedy max-coverage twin of q_coverage_select (each
    round: join against the remaining-uncovered term set, argmax by
    (count desc, doc_id asc), EXCEPT out the pick's terms)."""
    parts = [
        "WITH toks AS MATERIALIZED (SELECT DISTINCT doc_id, "
        "unnest(list_filter(regexp_split_to_array(lower(text), "
        "'\\s+'), w -> w <> '')) AS term FROM documents), "
        "tdf AS (SELECT term, count(*) AS df FROM toks GROUP BY 1), "
        "voc AS MATERIALIZED (SELECT term FROM (SELECT term, "
        f"row_number() OVER (ORDER BY df DESC, term) AS rn FROM tdf) "
        f"WHERE rn <= {v}), "
        "dt AS MATERIALIZED (SELECT t.doc_id, t.term FROM toks t "
        "JOIN voc USING (term)), "
        "u0 AS MATERIALIZED (SELECT term FROM voc)"]
    for i in range(1, k + 1):
        excl = " AND ".join(
            [f"doc_id <> (SELECT doc_id FROM p{j})"
             for j in range(1, i)]) or "TRUE"
        parts.append(
            f", p{i} AS MATERIALIZED (SELECT doc_id, "
            f"CAST(count(*) AS BIGINT) AS n FROM dt "
            f"JOIN u{i-1} USING (term) WHERE {excl} GROUP BY 1 "
            f"ORDER BY n DESC, doc_id LIMIT 1)"
            f", u{i} AS MATERIALIZED (SELECT term FROM u{i-1} "
            f"EXCEPT SELECT term FROM dt "
            f"WHERE doc_id = (SELECT doc_id FROM p{i}))")
    sel = []
    for i in range(1, k + 1):
        sel.append(
            f"SELECT CAST({i} AS BIGINT) AS round, doc_id, n AS n_new, "
            f"(SELECT count(*) FROM voc) - (SELECT count(*) FROM u{i}) "
            f"AS n_total FROM p{i}")
    parts.append(" " + " UNION ALL ".join(sel) + " ORDER BY round")
    return "".join(parts)

def _voptimal_oracle(cells: int = 64, k: int = 8) -> str:
    """Unrolled V-optimal DP twin of q_voptimal_histogram: exact
    HUGEINT prefix sums → micro-floored per-segment costs → k rounds of
    the split DP with (cost asc, split asc) argmin, then a backpointer
    walk emitting the k segments."""
    parts = [
        "WITH mmx AS (SELECT CAST(min(n_chars) AS BIGINT) AS mn, "
        "CAST(max(n_chars) AS BIGINT) AS mx FROM documents), "
        "cl AS (SELECT (CAST(n_chars AS BIGINT) - (SELECT mn FROM mmx)) "
        f"* {cells} // ((SELECT mx - mn + 1 FROM mmx)) AS cell, "
        "CAST(n_chars AS BIGINT) AS v FROM documents), "
        "ag AS (SELECT cell, CAST(count(*) AS HUGEINT) AS c, "
        "CAST(sum(v) AS HUGEINT) AS s, CAST(sum(v * v) AS HUGEINT) AS q "
        "FROM cl GROUP BY 1), "
        f"grid AS (SELECT CAST(t.i AS BIGINT) AS cell FROM "
        f"range({cells}) t(i)), "
        "fc AS MATERIALIZED (SELECT g.cell, COALESCE(a.c, 0) AS c, "
        "COALESCE(a.s, 0) AS s, COALESCE(a.q, 0) AS q FROM grid g "
        "LEFT JOIN ag a USING (cell)), "
        "pre AS MATERIALIZED (SELECT cell, "
        "sum(c) OVER (ORDER BY cell) AS pc, "
        "sum(s) OVER (ORDER BY cell) AS ps, "
        "sum(q) OVER (ORDER BY cell) AS pq FROM fc), "
        "seg AS MATERIALIZED (SELECT g.cell AS i, j.cell AS j, "
        "CASE WHEN (j.pc - COALESCE(p0.pc, 0)) = 0 THEN 0 ELSE "
        "(((j.pc - COALESCE(p0.pc, 0)) * (j.pq - COALESCE(p0.pq, 0)) "
        "- (j.ps - COALESCE(p0.ps, 0)) * (j.ps - COALESCE(p0.ps, 0))) "
        "* 1000000) // (j.pc - COALESCE(p0.pc, 0)) END AS cost "
        "FROM grid g JOIN pre j ON j.cell >= g.cell "
        "LEFT JOIN pre p0 ON p0.cell = g.cell - 1), "
        "d1 AS MATERIALIZED (SELECT j, cost AS d FROM seg WHERE i = 0)"]
    for r in range(2, k + 1):
        parts.append(
            f", d{r} AS MATERIALIZED (SELECT j, d, bi FROM ("
            f"SELECT s2.j AS j, p.d + s2.cost AS d, p.j AS bi, "
            f"row_number() OVER (PARTITION BY s2.j "
            f"ORDER BY p.d + s2.cost, s2.i) AS rn "
            f"FROM d{r-1} p JOIN seg s2 ON s2.i = p.j + 1) WHERE rn = 1)")
    # backpointer walk: e_k chain as scalar CTEs
    parts.append(f", e{k} AS (SELECT CAST({cells - 1} AS BIGINT) AS e)")
    for r in range(k, 1, -1):
        parts.append(
            f", b{r} AS (SELECT (SELECT bi FROM d{r} "
            f"WHERE j = (SELECT e FROM e{r})) AS b)"
            f", e{r-1} AS (SELECT (SELECT b FROM b{r}) AS e)")
    sel = []
    for r in range(1, k + 1):
        start = ("CAST(0 AS BIGINT)" if r == 1
                 else f"(SELECT b FROM b{r}) + 1")
        sel.append(
            f"SELECT CAST({r} AS BIGINT) AS seg, {start} AS start_cell, "
            f"(SELECT e FROM e{r}) AS end_cell, "
            f"CAST((SELECT cost FROM seg WHERE i = {start} "
            f"AND j = (SELECT e FROM e{r})) AS BIGINT) AS cost_micro")
    parts.append(" " + " UNION ALL ".join(sel) + " ORDER BY seg")
    return "".join(parts)

_CURATION_SQL ="\nWITH d0 AS (SELECT doc_id, source, text,\n            CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS nt\n            FROM documents),\nq AS (SELECT doc_id, source, text, nt FROM d0 WHERE nt >= 10),\nhh AS (SELECT doc_id, source, nt, md5(text) AS h FROM q),\ndd AS MATERIALIZED (SELECT doc_id, source, nt FROM\n  (SELECT doc_id, source, nt,\n          min(doc_id) OVER (PARTITION BY h) AS md FROM hh)\n  WHERE doc_id = md),\nns AS MATERIALIZED (SELECT source, CAST(sum(nt) AS BIGINT) AS n\n                    FROM dd GROUP BY 1),\ntot AS (SELECT CAST(sum(n) // 2 AS BIGINT) AS b, count(*) AS m FROM ns),\nordered AS (SELECT source, n, row_number() OVER (ORDER BY n, source) AS k,\n            COALESCE(CAST(sum(n) OVER (ORDER BY n, source\n            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),\n            0) AS p FROM ns),\ncand AS (SELECT DISTINCT t FROM (SELECT n AS t FROM ns UNION ALL\n         SELECT greatest(0, ((SELECT b FROM tot) - p) //\n                ((SELECT m FROM tot) - k + 1)) FROM ordered)),\nev AS (SELECT c.t, CAST(sum(least(ns.n, c.t)) AS BIGINT) AS f\n       FROM cand c CROSS JOIN ns GROUP BY 1),\nts AS (SELECT COALESCE(max(t), 0) AS tstar FROM ev\n       WHERE f <= (SELECT b FROM tot)),\nlv AS (SELECT (SELECT b FROM tot) - CAST(sum(least(n,\n       (SELECT tstar FROM ts))) AS BIGINT) AS l FROM ns),\npri AS (SELECT source, row_number() OVER (ORDER BY n DESC, source) AS r\n        FROM ns WHERE n > (SELECT tstar FROM ts)),\nalloc AS MATERIALIZED (SELECT ns.source,\n        least(ns.n, (SELECT tstar FROM ts)) + CASE WHEN pri.r IS NOT NULL\n        AND pri.r <= (SELECT l FROM lv) THEN 1 ELSE 0 END AS a\n        FROM ns LEFT JOIN pri USING (source)),\ncum AS (SELECT dd.doc_id, dd.source, dd.nt,\n        COALESCE(CAST(sum(nt) OVER (PARTITION BY source ORDER BY doc_id\n        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)\n        AS cum0 FROM dd),\ncapped AS MATERIALIZED (SELECT c.doc_id, c.source, c.nt FROM cum c\n        JOIN alloc a USING (source) WHERE c.cum0 + c.nt <= a.a),\nb2 AS (SELECT doc_id, source, nt,\n       CAST(ntile(10) OVER (ORDER BY nt, doc_id) AS BIGINT) AS decile\n       FROM capped),\nr2 AS (SELECT doc_id, source, nt, decile,\n       row_number() OVER (PARTITION BY decile, source\n       ORDER BY nt, doc_id) - 1 AS rr FROM b2)\nSELECT doc_id, source, nt AS n_tokens,\n       CAST(row_number() OVER (ORDER BY decile, rr, source) - 1\n       AS BIGINT) AS position\nFROM r2 ORDER BY doc_id"

_SQ8_CODES_SQL = (
    "WITH ex AS (SELECT vec_id, CAST(t.i + 1 AS BIGINT) AS dim, "
    "CAST(embedding[CAST(t.i AS INTEGER) + 1] AS DOUBLE) AS val "
    "FROM embeddings, range(64) t(i)), "
    "grid AS (SELECT dim, min(val) AS mn, max(val) AS mx "
    "FROM ex GROUP BY 1)")

def _kcenter_oracle(k: int = 8) -> str:
    """Unrolled greedy k-center twin: round i's centroid = argmax of the
    running min-distance map d(i−1) (ties: vec_id asc), then the map
    folds in distances to the new centroid via LEAST. Same int codes,
    same integer squared-L2 as stages/ann.kcenter_select."""
    parts = [
        _SQ8_CODES_SQL,
        ", codes AS (SELECT vec_id, ex.dim, CASE WHEN mx = mn THEN 0 "
        "ELSE CAST(floor((val - mn) * 255.0 / (mx - mn)) AS BIGINT) END "
        "AS code FROM ex JOIN grid ON grid.dim = ex.dim), "
        "c1 AS (SELECT min(vec_id) AS vid FROM codes), "
        "d1 AS (SELECT c.vec_id, CAST(sum((c.code - x.code) * "
        "(c.code - x.code)) AS BIGINT) AS d FROM codes c JOIN codes x "
        "ON x.dim = c.dim AND x.vec_id = (SELECT vid FROM c1) "
        "GROUP BY 1)"]
    for i in range(2, k + 1):
        parts.append(
            f", c{i} AS (SELECT vec_id AS vid, d FROM d{i-1} "
            f"ORDER BY d DESC, vec_id LIMIT 1)")
        if i < k:
            parts.append(
                f", d{i} AS (SELECT p.vec_id, LEAST(p.d, s.d) AS d "
                f"FROM d{i-1} p JOIN (SELECT c.vec_id, "
                f"CAST(sum((c.code - x.code) * (c.code - x.code)) "
                f"AS BIGINT) AS d FROM codes c JOIN codes x "
                f"ON x.dim = c.dim AND x.vec_id = "
                f"(SELECT vid FROM c{i}) GROUP BY 1) s "
                f"ON s.vec_id = p.vec_id)")
    parts.append(
        " SELECT CAST(1 AS BIGINT) AS round, "
        "(SELECT vid FROM c1) AS vec_id, CAST(0 AS BIGINT) AS dist_sq")
    for i in range(2, k + 1):
        parts.append(f" UNION ALL SELECT {i}, vid, d FROM c{i}")
    parts.append(" ORDER BY round")
    return "".join(parts)

def _pca_power_oracle(squarings: int = 10) -> str:
    """Unrolled matrix-squaring twin of q_pca_power: exact HUGEINT
    covariance numerators -> +-10^6-grid normalize (round-half-away via
    positive floor division) -> ``squarings`` integer matrix-squaring +
    renormalize rounds -> row sums (M . 1) -> final normalize + sign
    canonicalization on the first nonzero loading. Every CTE is
    MATERIALIZED: DuckDB inlines plain CTEs, and a chained self-join
    would otherwise expand the plan exponentially."""
    RND = ("CASE WHEN (SELECT m FROM {m}) = 0 THEN 0 "
           "WHEN {x} >= 0 THEN (2 * {x} * 1000000 + (SELECT m FROM {m})) "
           "// (2 * (SELECT m FROM {m})) "
           "ELSE -((2 * (-({x})) * 1000000 + (SELECT m FROM {m})) "
           "// (2 * (SELECT m FROM {m}))) END")
    parts = [
        "WITH q AS MATERIALIZED (SELECT vec_id, t.i AS i, "
        "CAST(round(CAST(embedding[CAST(t.i AS INTEGER) + 1] AS DOUBLE) "
        "* 1000000) AS BIGINT) AS v FROM embeddings, range(64) t(i)), "
        "p AS MATERIALIZED (SELECT a.i AS i, b.i AS j, count(*) AS n, "
        "sum(CAST(a.v AS HUGEINT) * b.v) AS sxy, "
        "sum(CAST(a.v AS HUGEINT)) AS sx, "
        "sum(CAST(b.v AS HUGEINT)) AS sy "
        "FROM q a JOIN q b ON a.vec_id = b.vec_id GROUP BY 1, 2), "
        "nm AS MATERIALIZED (SELECT i, j, "
        "CAST(n AS HUGEINT) * sxy - sx * sy AS num FROM p), "
        "mx AS MATERIALIZED (SELECT max(abs(num)) AS m FROM nm), "
        "c0 AS MATERIALIZED (SELECT i, j, "
        + RND.format(m="mx", x="num") + " AS c FROM nm)"]
    for k in range(1, squarings + 1):
        parts.append(
            f", w{k} AS MATERIALIZED (SELECT a.i AS i, b.j AS j, "
            f"sum(a.c * b.c) AS w FROM c{k-1} a JOIN c{k-1} b "
            f"ON a.j = b.i GROUP BY 1, 2)"
            f", m{k} AS MATERIALIZED (SELECT max(abs(w)) AS m FROM w{k})"
            f", c{k} AS MATERIALIZED (SELECT i, j, "
            + RND.format(m=f"m{k}", x="w") + f" AS c FROM w{k})")
    parts.append(
        f", rs AS MATERIALIZED (SELECT i, sum(c) AS w FROM c{squarings} "
        f"GROUP BY 1), "
        f"mf AS MATERIALIZED (SELECT max(abs(w)) AS m FROM rs), "
        f"vf AS MATERIALIZED (SELECT i, "
        + RND.format(m="mf", x="w") + " AS v FROM rs)"
        ", lead AS MATERIALIZED (SELECT v FROM vf WHERE v <> 0 "
        "ORDER BY i LIMIT 1) "
        "SELECT CAST(i AS BIGINT) AS i, CAST(CASE WHEN "
        "COALESCE((SELECT v FROM lead), 0) < 0 THEN -v ELSE v END "
        "AS BIGINT) AS loading FROM vf ORDER BY i")
    return "".join(parts)

def _fixture(name: str) -> str:
    import os

    # repo root = two levels above magic_content_extractor_ray/queries/
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(root, "tests", "fixtures", name)

def oracle_sql() -> dict[str, str]:
    # Two fixture-backed oracle kinds (generated by tools/make_fixtures.py,
    # frozen in git):
    # - extract_goldens reads the HAND-PINNED expected span sequences of
    #   tests/goldens.json — independent reference parity, valid at any sf.
    # - the sf0_01/ snapshots freeze the current output of queries whose
    #   semantics SQL cannot express (extraction, LSH dedup, language id,
    #   packing); they are regression oracles pinned to the driver's
    #   correctness scale (sf0.01) and anchored by the pytest golden /
    #   property suites.
    return {
        "extract_goldens": (
            'SELECT doc_id, "offset", kind, media_ref, span_text '
            f"FROM read_parquet('{_fixture('goldens_expected.parquet')}')"),
        "extract_spans": (
            'SELECT doc_id, "offset", kind, media_ref, span_text '
            f"FROM read_parquet('{_fixture('sf0_01/extract_spans.parquet')}')"),
        "extract_pipeline": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/extract_pipeline.parquet')}')"),
        "extract_formats": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/extract_formats.parquet')}')"),
        "lang_id": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/lang_id.parquet')}')"),
        "dedup_minhash": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/dedup_minhash.parquet')}')"),
        "cross_dedup": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/cross_dedup.parquet')}')"),
        "dedup_simhash": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/dedup_simhash.parquet')}')"),
        "dedup_embedding": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/dedup_embedding.parquet')}')"),
        "pack_sequences": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/pack_sequences.parquet')}')"),
        "extract_metrics": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/extract_metrics.parquet')}')"),
        "extract_readability": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/extract_readability.parquet')}')"),
        "image_phash": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/image_phash.parquet')}')"),
        "bpe_train": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/bpe_train.parquet')}')"),
        "audio_spectral": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/audio_spectral.parquet')}')"),
        "media_thumbnails": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/media_thumbnails.parquet')}')"),
        "media_features": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/media_features.parquet')}')"),
        "audio_features": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/audio_features.parquet')}')"),
        "training_pipeline": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/training_pipeline.parquet')}')"),
        "distinct_users_approx": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/distinct_users_approx.parquet')}')"),
        "checkpoint_lineage": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/checkpoint_lineage.parquet')}')"),
        "embedding_clusters": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/embedding_clusters.parquet')}')"),
        "ann_lsh": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/ann_lsh.parquet')}')"),
        "ann_ivf": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/ann_ivf.parquet')}')"),
        "dedup_exact": (
            "SELECT md5(text) AS text_hash, min(doc_id) AS doc_id, "
            "count(*) AS n_dups FROM documents GROUP BY md5(text)"),
        "dedup_ngram": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            ngrams AS (
              SELECT DISTINCT doc_id, ng FROM (
                SELECT doc_id,
                       unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                               for i in range(1, greatest(len(ws) - 1, 1))])
                       AS ng
                FROM toks)),
            df AS (SELECT ng, count(*) AS c FROM ngrams GROUP BY ng),
            surv AS (SELECT n.doc_id, n.ng FROM ngrams n
                     JOIN df USING (ng) WHERE df.c <= 32),
            sizes AS (SELECT doc_id, count(*) AS sz FROM surv
                      GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                     count(*) AS n_common
              FROM surv a JOIN surv b
                ON a.ng = b.ng AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT i.left_id, i.right_id, i.n_common,
                   round(i.n_common / (sa.sz + sb.sz - i.n_common), 6)
                     AS jaccard
            FROM inter i JOIN sizes sa ON sa.doc_id = i.left_id
                         JOIN sizes sb ON sb.doc_id = i.right_id
            WHERE i.n_common / (sa.sz + sb.sz - i.n_common) >= 0.4""",
        "dedup_overlap": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            ngrams AS (
              SELECT DISTINCT doc_id, ng FROM (
                SELECT doc_id,
                       unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                               for i in range(1, greatest(len(ws) - 1, 1))])
                       AS ng
                FROM toks)),
            df AS (SELECT ng, count(*) AS c FROM ngrams GROUP BY ng),
            surv AS (SELECT n.doc_id, n.ng FROM ngrams n
                     JOIN df USING (ng) WHERE df.c <= 32),
            sizes AS (SELECT doc_id, count(*) AS sz FROM surv
                      GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                     count(*) AS n_common
              FROM surv a JOIN surv b
                ON a.ng = b.ng AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT i.left_id, i.right_id, i.n_common,
                   round(i.n_common / least(sa.sz, sb.sz), 6) AS overlap
            FROM inter i JOIN sizes sa ON sa.doc_id = i.left_id
                         JOIN sizes sb ON sb.doc_id = i.right_id
            WHERE i.n_common / least(sa.sz, sb.sz) >= 0.8""",
        "token_count": (
            "SELECT doc_id, "
            "len(regexp_extract_all(text, '\\S+')) AS n_tokens "
            "FROM documents"),
        "pii_redacted": r"""
            WITH aug AS (
              SELECT doc_id,
                text || ' contact: user' || doc_id
                     || '@example.com from 10.0.' || (doc_id % 256) || '.'
                     || (doc_id % 100) || ' call 555-'
                     || (100 + doc_id % 900) || '-'
                     || (1000 + doc_id % 9000) AS t
              FROM documents)
            SELECT doc_id,
              len(regexp_extract_all(t,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
              len(regexp_extract_all(t,
                '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
              len(regexp_extract_all(t,
                '\b\d{3}[- ]\d{3}[- ]\d{4}\b')) AS n_phone,
              regexp_replace(regexp_replace(regexp_replace(t,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                '<EMAIL>', 'g'),
                '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                '\b\d{3}[- ]\d{3}[- ]\d{4}\b', '<PHONE>', 'g')
                AS text_redacted
            FROM aug""",
        "quality_counts": (
            "SELECT doc_id, length(text) AS n_chars_q, "
            "len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha, "
            "len(regexp_extract_all(text, '[0-9]')) AS n_digit, "
            "len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct, "
            f"len(regexp_extract_all(text, '\\b({_STOPWORD_ALT})\\b')) "
            "AS n_stopword FROM documents"),
        "fingerprint": (
            "SELECT doc_id, md5(trim(regexp_replace(lower(text), "
            "'\\s+', ' ', 'g'))) AS fingerprint FROM documents"),
        "source_chars_quantiles": (
            "SELECT source, quantile_cont(n_chars, 0.5) AS p50_chars, "
            "quantile_cont(n_chars, 0.95) AS p95_chars "
            "FROM documents GROUP BY source ORDER BY source"),
        "orders_rollup": (
            "SELECT COALESCE(o_orderstatus, 'ALL') AS status, "
            "COALESCE(o_orderpriority, 'ALL') AS priority, "
            "count(*) AS n FROM orders "
            "GROUP BY ROLLUP(o_orderstatus, o_orderpriority) "
            "ORDER BY status, priority"),
        "top_terms": (
            "SELECT CAST(row_number() OVER (ORDER BY count(*) DESC, word) "
            "AS BIGINT) AS rnk, word AS term, count(*) AS n FROM ("
            "SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS word "
            "FROM documents) GROUP BY word "
            "ORDER BY n DESC, term LIMIT 100"),
        "stratified_sample": (
            "SELECT doc_id, lang FROM documents WHERE "
            "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) "
            "% 100 < (CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 30 "
            "ELSE 10 END) ORDER BY doc_id"),
        "shipping_priority": (
            "SELECT l.l_orderkey, CAST(sum("
            "CAST(round(l.l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) "
            "AS revenue_c4, "
            "strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate "
            "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
            "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
            "WHERE c.c_mktsegment = 'BUILDING' "
            "AND o.o_orderdate < TIMESTAMP '1996-06-30' "
            "AND l.l_shipdate > TIMESTAMP '1996-06-30' "
            "GROUP BY l.l_orderkey, o.o_orderdate "
            "ORDER BY revenue_c4 DESC, o_orderdate, l_orderkey LIMIT 10"),
        "regional_revenue": (
            "SELECT n.n_name AS n_name, CAST(sum("
            "CAST(round(l.l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) "
            "AS revenue_c4 "
            "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
            "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "AND c.c_nationkey = s.s_nationkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "JOIN region r ON n.n_regionkey = r.r_regionkey "
            "WHERE r.r_name = 'EUROPE' "
            "AND o.o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o.o_orderdate < TIMESTAMP '1998-01-01' "
            "GROUP BY 1 ORDER BY revenue_c4 DESC, n_name"),
        "covisitation": (
            "WITH ui AS (SELECT DISTINCT user_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'view') "
            "SELECT a.item AS item_a, b.item AS item_b, "
            "count(*) AS n_users "
            "FROM ui a JOIN ui b ON a.user_id = b.user_id "
            "AND a.item < b.item "
            "GROUP BY 1, 2 ORDER BY n_users DESC, item_a, item_b "
            "LIMIT 50"),
        "centroid_assign": (
            "WITH x AS (SELECT vec_id, label, "
            "generate_subscripts(embedding, 1) AS dim, "
            "CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) "
            "AS BIGINT) AS xm FROM embeddings), "
            "c AS (SELECT label, dim, CAST(floor("
            "(2.0 * sum(xm) + count(*)) / (2.0 * count(*))) AS BIGINT) "
            "AS cm FROM x GROUP BY 1, 2), "
            "d AS (SELECT x.vec_id, c.label, "
            "CAST(sum((x.xm - c.cm) * (x.xm - c.cm)) AS BIGINT) AS dist "
            "FROM x JOIN c USING (dim) GROUP BY 1, 2) "
            "SELECT vec_id, label AS pred_label, dist AS dist_sq "
            "FROM (SELECT *, row_number() OVER (PARTITION BY vec_id "
            "ORDER BY dist, label) AS rn FROM d) WHERE rn = 1 "
            "ORDER BY vec_id"),
        "quality_percentile": (
            "WITH tok AS (SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) "
            "AS n_tokens FROM documents) "
            "SELECT doc_id, n_tokens, CAST(floor("
            "percent_rank() OVER (ORDER BY n_tokens) * 1000000) "
            "AS BIGINT) AS pr_ppm FROM tok ORDER BY doc_id"),
        "inverted_index": (
            "WITH tf AS (SELECT t.term, d.doc_id, "
            "CAST(count(*) AS BIGINT) AS tf "
            "FROM documents d, unnest(regexp_extract_all("
            "lower(d.text), '\\S+')) AS t(term) "
            "WHERE t.term <> '' GROUP BY 1, 2) "
            "SELECT term, doc_id, tf, rn AS rank "
            "FROM (SELECT *, row_number() OVER (PARTITION BY term "
            "ORDER BY tf DESC, doc_id) AS rn FROM tf) WHERE rn <= 5 "
            "ORDER BY term, rank"),
        "retention_cohorts": (
            "WITH uw AS (SELECT DISTINCT user_id, "
            "CAST(date_trunc('week', ts) AS DATE) AS wk FROM events), "
            "c AS (SELECT user_id, min(wk) AS cohort FROM uw "
            "GROUP BY user_id) "
            "SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_week, "
            "CAST((uw.wk - c.cohort) / 7 AS BIGINT) AS week_offset, "
            "count(*) AS n_users FROM uw JOIN c USING (user_id) "
            "GROUP BY 1, 2 ORDER BY 1, 2"),
        "funnel_counts": (
            "WITH f AS (SELECT user_id, "
            "min(CASE WHEN event_type = 'view' THEN ts END) AS tv, "
            "min(CASE WHEN event_type = 'click' THEN ts END) AS tc, "
            "min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp "
            "FROM events GROUP BY user_id) "
            "SELECT CAST(count(CASE WHEN tv IS NOT NULL THEN 1 END) "
            "AS BIGINT) AS n_view, "
            "CAST(count(CASE WHEN tc > tv THEN 1 END) AS BIGINT) "
            "AS n_view_click, "
            "CAST(count(CASE WHEN tc > tv AND tp > tc THEN 1 END) "
            "AS BIGINT) AS n_funnel_complete FROM f"),
        "clean_text": (
            "SELECT doc_id, "
            "trim(regexp_replace(nfc_normalize(regexp_replace(text, "
            "'[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g')), "
            "'\\s+', ' ', 'g')) AS clean_text FROM documents"),
        "quality_pruned": (
            "WITH tok AS (SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) "
            "AS n_tokens FROM documents), "
            "t AS (SELECT quantile_cont(n_tokens, 0.25) AS p25 FROM tok) "
            "SELECT doc_id, n_tokens FROM tok, t WHERE n_tokens > p25 "
            "ORDER BY doc_id"),
        "importance_sample": (
            "SELECT doc_id, n_tokens, "
            "least(n_tokens * 5000, 1000000) AS w_ppm FROM ("
            "SELECT doc_id, CAST(len(regexp_extract_all(text, '\\S+')) "
            "AS BIGINT) AS n_tokens FROM documents) WHERE "
            "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) "
            "% 1000000 < least(n_tokens * 5000, 1000000) "
            "ORDER BY doc_id"),
        "doc_frequency": (
            "SELECT CAST(row_number() OVER (ORDER BY count(*) DESC, word) "
            "AS BIGINT) AS rnk, word AS term, count(*) AS df FROM ("
            "SELECT DISTINCT doc_id, "
            "unnest(regexp_extract_all(lower(text), '\\S+')) AS word "
            "FROM documents) GROUP BY word ORDER BY df DESC, term "
            "LIMIT 50"),
        "repetition_stats": (
            "SELECT doc_id, "
            "len(regexp_extract_all(text, '\\S+')) AS n_words, "
            "len(list_distinct(regexp_extract_all(lower(text), '\\S+'))) "
            "AS n_distinct_words, "
            "length(regexp_replace(text, '\\s', '', 'g')) "
            "AS n_nonspace_chars FROM documents"),
        "token_histogram": (
            "SELECT len(regexp_extract_all(text, '\\S+')) // 10 "
            "AS token_bucket, count(*) AS n_docs FROM documents "
            "GROUP BY 1 ORDER BY 1"),
        "sliding_events": (
            "WITH h AS (SELECT event_type, "
            "CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS "
            "hour_bucket, count(*) AS n_events FROM events GROUP BY 1, 2) "
            "SELECT a.event_type, a.hour_bucket, CAST(sum(b.n_events) "
            "AS BIGINT) AS sliding_events FROM h a JOIN h b "
            "ON a.event_type = b.event_type AND b.hour_bucket "
            "BETWEEN a.hour_bucket - 2 AND a.hour_bucket "
            "GROUP BY a.event_type, a.hour_bucket"),
        "lang_median_chars": (
            "SELECT lang, median(n_chars) AS median_chars "
            "FROM documents GROUP BY lang ORDER BY lang"),
        "top_docs_per_lang": (
            "SELECT lang, rnk, doc_id, n_chars FROM ("
            "SELECT lang, doc_id, n_chars, row_number() OVER ("
            "PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rnk "
            "FROM documents) WHERE rnk <= 3 ORDER BY lang, rnk"),
        "customers_no_purchases": (
            "SELECT c.c_custkey FROM customer c WHERE NOT EXISTS ("
            "SELECT 1 FROM events e WHERE e.user_id = c.c_custkey "
            "AND e.event_type = 'purchase') ORDER BY c.c_custkey"),
        "user_paths": (
            "SELECT user_id, string_agg(event_type, '>' "
            "ORDER BY ts, event_id) AS path FROM events "
            "GROUP BY user_id ORDER BY user_id"),
        "event_gaps": (
            "WITH g AS (SELECT user_id, epoch_us(ts) - "
            "lag(epoch_us(ts)) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS gap FROM events) "
            "SELECT user_id, count(gap) AS n_gaps, "
            "CAST(sum(gap) AS BIGINT) AS total_gap_us, "
            "CAST(max(gap) AS BIGINT) AS max_gap_us FROM g "
            "WHERE gap IS NOT NULL GROUP BY user_id ORDER BY user_id"),
        "running_order_total": (
            "SELECT o_custkey, o_orderkey, CAST(sum(total_c) OVER ("
            "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_total_c "
            "FROM (SELECT o_custkey, o_orderkey, o_orderdate, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS total_c "
            "FROM orders) ORDER BY o_custkey, o_orderkey"),
        "events_pivot": (
            "SELECT user_id, "
            + ", ".join(
                f"CAST(sum(CASE WHEN event_type = '{et}' THEN 1 ELSE 0 "
                f"END) AS BIGINT) AS n_{et}" for et in _EVENT_TYPES)
            + " FROM events GROUP BY user_id ORDER BY user_id"),
        "users_intersect": (
            "SELECT user_id FROM ("
            "SELECT user_id FROM events WHERE event_type = 'view' "
            "INTERSECT "
            "SELECT user_id FROM events WHERE event_type = 'purchase'"
            ") ORDER BY user_id"),
        "purchase_days_clean": (
            "SELECT user_id, day_bucket FROM ("
            "SELECT user_id, CAST(floor(epoch_us(ts) / 86400000000) "
            "AS BIGINT) AS day_bucket FROM events "
            "WHERE event_type = 'purchase' "
            "EXCEPT "
            "SELECT user_id, CAST(floor(epoch_us(ts) / 86400000000) "
            "AS BIGINT) AS day_bucket FROM events "
            "WHERE event_type = 'error'"
            ") ORDER BY user_id, day_bucket"),
        "epoch_shuffle": (
            "SELECT doc_id, CAST(row_number() OVER (ORDER BY "
            "CAST(concat('0x', substr(md5(concat('epoch-0:', "
            "CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT), doc_id) "
            "AS BIGINT) AS shuffle_pos FROM documents "
            "ORDER BY shuffle_pos"),
        "doc_char_rank": (
            "SELECT doc_id, n_chars, CAST(row_number() OVER ("
            "ORDER BY n_chars, doc_id) AS BIGINT) AS rn "
            "FROM documents ORDER BY rn"),
        "embedding_norms": (
            "SELECT vec_id, CAST(sum(m * m) AS BIGINT) AS norm_sq_micro "
            "FROM (SELECT vec_id, CAST(round(CAST(unnest(embedding) "
            "AS DOUBLE) * 1000000) AS BIGINT) AS m FROM embeddings) "
            "GROUP BY vec_id ORDER BY vec_id"),
        "lang_chars_var": (
            "WITH s AS (SELECT lang, count(*) AS n, "
            "CAST(sum(n_chars) AS BIGINT) AS sx, "
            "CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx "
            "FROM documents GROUP BY lang) "
            "SELECT lang, n, round((CAST(sxx AS DOUBLE) - "
            "CAST(sx AS DOUBLE) * sx / n) / (n - 1), 6) AS var_chars "
            "FROM s ORDER BY lang"),
        "customers_with_purchases": (
            "SELECT c.c_custkey FROM customer c WHERE EXISTS ("
            "SELECT 1 FROM events e WHERE e.user_id = c.c_custkey "
            "AND e.event_type = 'purchase') ORDER BY c.c_custkey"),
        "daily_view_purchase": (
            "WITH v AS (SELECT user_id, CAST(floor(epoch_us(ts) / "
            "86400000000) AS BIGINT) AS day_bucket, count(*) AS n_views "
            "FROM events WHERE event_type = 'view' GROUP BY 1, 2), "
            "p AS (SELECT user_id, CAST(floor(epoch_us(ts) / "
            "86400000000) AS BIGINT) AS day_bucket, "
            "count(*) AS n_purchases FROM events "
            "WHERE event_type = 'purchase' GROUP BY 1, 2) "
            "SELECT COALESCE(v.user_id, p.user_id) AS user_id, "
            "COALESCE(v.day_bucket, p.day_bucket) AS day_bucket, "
            "COALESCE(v.n_views, 0) AS n_views, "
            "COALESCE(p.n_purchases, 0) AS n_purchases "
            "FROM v FULL OUTER JOIN p ON v.user_id = p.user_id "
            "AND v.day_bucket = p.day_bucket "
            "ORDER BY user_id, day_bucket"),
        "sample_per_lang": (
            "SELECT doc_id, lang FROM ("
            "SELECT doc_id, lang, row_number() OVER ("
            "PARTITION BY lang "
            "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn "
            "FROM documents) WHERE rn <= 10 ORDER BY lang, doc_id"),
        "orders_cube": (
            "SELECT COALESCE(o_orderstatus, 'ALL') AS status, "
            "COALESCE(o_orderpriority, 'ALL') AS priority, "
            "count(*) AS n FROM orders "
            "GROUP BY CUBE(o_orderstatus, o_orderpriority) "
            "ORDER BY status, priority"),
        "sample_fixed": (
            "SELECT doc_id, lang FROM documents "
            "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id "
            "LIMIT 50"),
        "token_offsets": (
            "SELECT doc_id, n_tokens, token_offset, "
            "token_offset // 2048 AS pack_id FROM ("
            "SELECT doc_id, n_tokens, COALESCE(CAST(sum(n_tokens) OVER ("
            "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING) AS BIGINT), 0) AS token_offset FROM ("
            "SELECT doc_id, len(regexp_extract_all(text, '\\S+')) "
            "AS n_tokens FROM documents)) ORDER BY doc_id"),
        "heavy_terms": (
            "SELECT CAST(row_number() OVER (ORDER BY count(*) DESC, word) "
            "AS BIGINT) AS rnk, word AS term, count(*) AS n FROM ("
            "SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS word "
            "FROM documents) GROUP BY word "
            "ORDER BY n DESC, term LIMIT 20"),
        "active_days": (
            "SELECT user_id, day_bucket FROM ("
            "SELECT user_id, CAST(floor(epoch_us(ts) / 86400000000) "
            "AS BIGINT) AS day_bucket FROM events "
            "WHERE event_type = 'click' "
            "UNION "
            "SELECT user_id, CAST(floor(epoch_us(ts) / 86400000000) "
            "AS BIGINT) AS day_bucket FROM events "
            "WHERE event_type = 'purchase'"
            ") ORDER BY user_id, day_bucket"),
        "chars_quartiles": (
            "WITH t AS (SELECT quantile_cont(n_chars, 0.25) AS p25, "
            "quantile_cont(n_chars, 0.5) AS p50, "
            "quantile_cont(n_chars, 0.75) AS p75 FROM documents) "
            "SELECT CASE WHEN n_chars <= p25 THEN 1 "
            "WHEN n_chars <= p50 THEN 2 WHEN n_chars <= p75 THEN 3 "
            "ELSE 4 END AS quartile, "
            "CAST(sum(n_chars) AS BIGINT) AS total_chars, "
            "count(*) AS n_docs FROM documents, t "
            "GROUP BY quartile ORDER BY quartile"),
        "suppliers_by_region": (
            "SELECT r.r_name, count(*) AS n_suppliers FROM supplier s "
            "JOIN nation n ON s.s_nationkey = n.n_nationkey "
            "JOIN region r ON n.n_regionkey = r.r_regionkey "
            "GROUP BY r.r_name ORDER BY r.r_name"),
        "orders_monthly": (
            "SELECT o_orderstatus, "
            "CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 "
            "AS BIGINT) AS month_bucket, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS total_c, count(*) AS n_orders FROM orders "
            "GROUP BY o_orderstatus, month_bucket "
            "ORDER BY o_orderstatus, month_bucket"),
        "chunk_dedup": (
            "WITH t AS (SELECT doc_id, "
            "regexp_extract_all(text, '\\S+') AS toks, "
            "len(regexp_extract_all(text, '\\S+')) AS n FROM documents), "
            "c AS (SELECT doc_id, toks, n, CAST(CASE WHEN n <= 128 THEN 1 "
            "ELSE 1 + CAST(ceil((n - 128) / 96.0) AS BIGINT) END "
            "AS BIGINT) AS n_chunks FROM t WHERE n > 0), "
            "e AS (SELECT doc_id, toks, n, "
            "unnest(generate_series(1, n_chunks)) AS g FROM c), "
            "k AS (SELECT doc_id * 1000000 + CAST(g AS BIGINT) "
            "AS chunk_key, array_to_string(list_slice(toks, "
            "(g - 1) * 96 + 1, (g - 1) * 96 + least(128, "
            "n - (g - 1) * 96)), ' ') AS chunk_text FROM e) "
            "SELECT md5(chunk_text) AS text_hash, "
            "min(chunk_key) AS chunk_key, count(*) AS n_dups "
            "FROM k GROUP BY md5(chunk_text) ORDER BY chunk_key"),
        "docs_decontaminated": (
            "WITH b AS (SELECT array_to_string(list_slice("
            "regexp_extract_all(text, '\\S+'), 11, 18), ' ') AS phrase "
            "FROM (SELECT text FROM documents ORDER BY doc_id LIMIT 5)), "
            "bb AS (SELECT phrase FROM b WHERE phrase != '') "
            "SELECT d.doc_id FROM documents d WHERE NOT EXISTS ("
            "SELECT 1 FROM bb WHERE contains(d.text, bb.phrase)) "
            "ORDER BY d.doc_id"),
        "doc_chunks": (
            "WITH t AS (SELECT doc_id, "
            "regexp_extract_all(text, '\\S+') AS toks, "
            "len(regexp_extract_all(text, '\\S+')) AS n FROM documents), "
            "c AS (SELECT doc_id, toks, n, CAST(CASE WHEN n <= 128 THEN 1 "
            "ELSE 1 + CAST(ceil((n - 128) / 96.0) AS BIGINT) END "
            "AS BIGINT) AS n_chunks FROM t WHERE n > 0), "
            "e AS (SELECT doc_id, toks, n, "
            "unnest(generate_series(1, n_chunks)) AS g FROM c) "
            "SELECT doc_id, CAST(g AS BIGINT) AS chunk_id, "
            "CAST((g - 1) * 96 AS BIGINT) AS start_token, "
            "CAST(least(128, n - (g - 1) * 96) AS BIGINT) AS n_tokens, "
            "array_to_string(list_slice(toks, (g - 1) * 96 + 1, "
            "(g - 1) * 96 + least(128, n - (g - 1) * 96)), ' ') "
            "AS chunk_text FROM e ORDER BY doc_id, chunk_id"),
        "session_durations": (
            "WITH o AS (SELECT user_id, ts, event_id, CASE WHEN "
            "epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) > 1800000000 THEN 1 ELSE 0 END "
            "AS brk FROM events), "
            "s AS (SELECT user_id, ts, CAST(1 + sum(brk) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM o) "
            "SELECT user_id, session_id, count(*) AS n_events, "
            "CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) "
            "AS duration_us FROM s GROUP BY user_id, session_id "
            "ORDER BY user_id, session_id"),
        "top_terms_per_lang": (
            "SELECT lang, rnk, term, n FROM ("
            "SELECT lang, word AS term, count(*) AS n, "
            "CAST(row_number() OVER (PARTITION BY lang "
            "ORDER BY count(*) DESC, word) AS BIGINT) AS rnk FROM ("
            "SELECT lang, unnest(regexp_extract_all(lower(text), "
            "'\\S+')) AS word FROM documents) GROUP BY lang, word) "
            "WHERE rnk <= 5 ORDER BY lang, rnk"),
        "split_assignments": (
            "SELECT doc_id, CASE WHEN b < 90 THEN 'train' "
            "WHEN b < 95 THEN 'val' ELSE 'test' END AS split FROM ("
            "SELECT doc_id, CAST(concat('0x', substr(md5("
            "CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 AS b "
            "FROM documents) ORDER BY doc_id"),
        "supplier_ship_volumes": (
            "SELECT n.n_name, CAST(year(l.l_shipdate) AS BIGINT) "
            "AS ship_year, CAST(sum(CAST(l.l_quantity AS BIGINT)) "
            "AS BIGINT) AS sum_qty, CAST(sum("
            "CAST(round(l.l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - l.l_discount) * 100) AS BIGINT) * "
            "CAST(round((1 + l.l_tax) * 100) AS BIGINT)) AS BIGINT) "
            "AS revenue_c6 FROM lineitem l "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "JOIN nation n ON s.s_nationkey = n.n_nationkey "
            "GROUP BY n.n_name, ship_year ORDER BY n.n_name, ship_year"),
        "event_value_totals": (
            "SELECT event_type, CAST(sum(CAST(round(value * 100) "
            "AS BIGINT)) AS BIGINT) AS total_value_c, "
            "count(*) AS n_events FROM events "
            "GROUP BY event_type ORDER BY event_type"),
        "recent_orders": (
            "SELECT o_orderkey, o_custkey, o_orderdate FROM orders "
            "WHERE o_orderdate >= TIMESTAMP '2001-01-01' "
            "ORDER BY o_orderkey"),
        "brand_revenue": (
            "SELECT p.p_brand, CAST(sum("
            "CAST(round(l.l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) "
            "AS revenue_c4, count(*) AS n_items "
            "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
            "GROUP BY p.p_brand ORDER BY p.p_brand"),
        "lineitem_corr": (
            "WITH s AS (SELECT count(*) AS n, sum(q) AS sx, sum(p) AS sy, "
            "sum(q * q) AS sxx, sum(p * p) AS syy, sum(q * p) AS sxy "
            "FROM (SELECT CAST(l_quantity AS BIGINT) AS q, "
            "CAST(round(l_extendedprice) AS BIGINT) AS p FROM lineitem)) "
            "SELECT n, round((CAST(n AS DOUBLE) * sxy - "
            "CAST(sx AS DOUBLE) * sy) / sqrt((CAST(n AS DOUBLE) * sxx - "
            "CAST(sx AS DOUBLE) * sx) * (CAST(n AS DOUBLE) * syy - "
            "CAST(sy AS DOUBLE) * sy)), 6) AS corr_qp FROM s"),
        "label_centroids": (
            "SELECT CAST(label AS BIGINT) AS label, "
            "CAST(pos AS BIGINT) AS dim, "
            "CAST(sum(CAST(round(CAST(val AS DOUBLE) * 1000000) "
            "AS BIGINT)) AS BIGINT) AS sum_micro, count(*) AS n_vals "
            "FROM (SELECT label, unnest(embedding) AS val, "
            "unnest(range(1, len(embedding) + 1)) AS pos FROM embeddings) "
            "GROUP BY label, pos ORDER BY label, dim"),
        "tfidf_terms": (
            "WITH words AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '\\S+')) AS word "
            "FROM documents), "
            "agg AS (SELECT word AS term, CAST(count(*) AS BIGINT) AS tf, "
            "CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM words "
            "WHERE word != '' GROUP BY word), "
            "n AS (SELECT count(*) AS n_docs FROM documents) "
            "SELECT CAST(row_number() OVER (ORDER BY score DESC, term) "
            "AS BIGINT) AS rnk, term, tf, df, score FROM ("
            "SELECT term, tf, df, round(CAST(tf AS DOUBLE) * "
            "ln(CAST(n.n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) "
            "AS score FROM agg, n) ORDER BY rnk LIMIT 50"),
        "collocations": r"""
            WITH toks AS (
              SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            uni AS (SELECT unnest(ws) AS w FROM toks),
            ucnt AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
            tu AS (SELECT CAST(count(*) AS DOUBLE) AS nu FROM uni),
            big AS (
              SELECT unnest([ws[i] || ' ' || ws[i+1]
                             for i in range(1, greatest(len(ws), 1))]) AS b
              FROM toks),
            bcnt AS (SELECT b, count(*) AS c FROM big GROUP BY b
                     HAVING count(*) >= 5),
            tb AS (SELECT CAST(count(*) AS DOUBLE) AS nb FROM big)
            SELECT split_part(b, ' ', 1) AS w1,
                   split_part(b, ' ', 2) AS w2,
                   CAST(bcnt.c AS BIGINT) AS c_ab,
                   round(ln((bcnt.c / tb.nb) /
                            ((ua.c / tu.nu) * (ub.c / tu.nu))), 6) AS pmi
            FROM bcnt CROSS JOIN tb CROSS JOIN tu
            JOIN ucnt ua ON ua.w = split_part(bcnt.b, ' ', 1)
            JOIN ucnt ub ON ub.w = split_part(bcnt.b, ' ', 2)
            ORDER BY pmi DESC, w1, w2 LIMIT 100""",
        "customer_order_counts": (
            "SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) "
            "AS n_orders FROM customer c LEFT JOIN orders o "
            "ON o.o_custkey = c.c_custkey GROUP BY c.c_custkey "
            "ORDER BY c.c_custkey"),
        "last_event_per_user": (
            "SELECT user_id, event_id AS last_event FROM ("
            "SELECT user_id, event_id, row_number() OVER ("
            "PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
            "FROM events) WHERE rn = 1 ORDER BY user_id"),
        "supplier_nation": (
            "SELECT n.n_name, count(*) AS n_suppliers FROM supplier s "
            "JOIN nation n ON s.s_nationkey = n.n_nationkey "
            "GROUP BY n.n_name ORDER BY n.n_name"),
        "lineitem_revenue": (
            "SELECT l_returnflag, CAST(sum("
            "CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) "
            "AS revenue_c4, count(*) AS n_rows FROM lineitem "
            "GROUP BY l_returnflag ORDER BY l_returnflag"),
        "lang_stats": (
            "SELECT lang, CAST(sum(n_chars) AS BIGINT) AS total_chars, "
            "count(*) AS n_docs FROM documents GROUP BY lang ORDER BY lang"),
        "top_docs": (
            "SELECT doc_id, n_chars FROM documents "
            "ORDER BY n_chars DESC, doc_id LIMIT 100"),
        "long_docs": (
            "SELECT doc_id, lang, n_chars FROM documents "
            "WHERE n_chars >= 400 ORDER BY doc_id"),
        "source_stats": (
            "SELECT source, count(*) AS n_docs, min(n_chars) AS min_chars, "
            "max(n_chars) AS max_chars FROM documents GROUP BY source "
            "ORDER BY source"),
        "events_by_type": (
            "SELECT event_type, count(*) AS n_events, "
            "min(user_id) AS min_user, max(user_id) AS max_user "
            "FROM events GROUP BY event_type ORDER BY event_type"),
        "lineitem_pricing": (
            "SELECT l_returnflag, l_linestatus, "
            "sum(l_quantity) AS sum_qty, count(*) AS n_rows "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus "
            "ORDER BY l_returnflag, l_linestatus"),
        "event_props": (
            "SELECT CAST(json_extract(props, '$.k') AS BIGINT) // 10 "
            "AS k_bucket, count(*) AS n_events FROM events "
            "GROUP BY 1 ORDER BY 1"),
        "page_rank": _page_rank_sql(),
        "source_mixture": (
            "WITH d AS (SELECT doc_id, source, "
            "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
            "AS UBIGINT) % 100 AS b, "
            "(CASE source WHEN 'src0' THEN 250 WHEN 'src1' THEN 130 "
            "WHEN 'src2' THEN 60 WHEN 'src3' THEN 0 ELSE 100 END) AS r "
            "FROM documents), "
            "n AS (SELECT doc_id, source, "
            "r // 100 + CASE WHEN b < r % 100 THEN 1 ELSE 0 END AS copies "
            "FROM d) "
            "SELECT doc_id, source, CAST(unnest(generate_series(0, "
            "CAST(copies AS BIGINT) - 1)) AS BIGINT) AS copy "
            "FROM n WHERE copies > 0 ORDER BY doc_id, copy"),
        "events_hourly": (
            "SELECT event_type, "
            "CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hour_bucket, "
            "count(*) AS n_events FROM events GROUP BY 1, 2"),
        "events_by_segment": (
            "SELECT c.c_mktsegment, count(*) AS n_events FROM events e "
            "JOIN customer c ON e.user_id = c.c_custkey "
            "GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"),
        "user_sessions": (
            "WITH o AS (SELECT user_id, ts, "
            "lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts "
            "FROM events) SELECT user_id, "
            "CAST(1 + sum(CASE WHEN pts IS NOT NULL AND "
            "epoch(ts) - epoch(pts) > 1800 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_sessions "
            "FROM o GROUP BY user_id ORDER BY user_id"),
        "orders_by_segment": (
            "SELECT c.c_mktsegment, count(*) AS n_orders FROM orders o "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"),
        "distinct_users": (
            "SELECT event_type, count(DISTINCT user_id) AS n_users "
            "FROM events GROUP BY event_type ORDER BY event_type"),
        "views_before_click": (
            "SELECT a.event_id AS click_id, "
            "CAST(count(b.event_id) AS BIGINT) AS n_prior_views "
            "FROM events a JOIN events b ON a.user_id = b.user_id "
            "AND b.event_type = 'view' "
            "AND b.ts >= a.ts - INTERVAL 24 HOUR AND b.ts < a.ts "
            "WHERE a.event_type = 'click' GROUP BY a.event_id "
            "ORDER BY click_id"),
        "asof_join": (
            "WITH a AS (SELECT user_id, ts, event_id FROM events "
            "WHERE event_type = 'click'), "
            "b AS (SELECT user_id, ts, event_id FROM events "
            "WHERE event_type = 'view') "
            "SELECT a.event_id AS click_id, b.event_id AS view_id "
            "FROM a ASOF JOIN b ON a.user_id = b.user_id AND a.ts >= b.ts "
            "ORDER BY click_id"),
        "ann_filtered": (
            f"WITH q AS (SELECT vec_id AS query_id, embedding AS qe "
            f"FROM embeddings ORDER BY vec_id LIMIT {_ANN_NQ}), "
            "scored AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
            "list_cosine_similarity(q.qe, e.embedding) AS score "
            "FROM q CROSS JOIN embeddings e WHERE e.label < 5), "
            "ranked AS (SELECT query_id, neighbor_id, row_number() OVER ("
            "PARTITION BY query_id ORDER BY score DESC, neighbor_id) "
            f"AS rank FROM scored) SELECT query_id, neighbor_id, rank "
            f"FROM ranked WHERE rank <= {_ANN_K}"),
        "ann_topk": (
            f"WITH q AS (SELECT vec_id AS query_id, embedding AS qe "
            f"FROM embeddings ORDER BY vec_id LIMIT {_ANN_NQ}), "
            "scored AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
            "list_cosine_similarity(q.qe, e.embedding) AS score "
            "FROM q CROSS JOIN embeddings e), "
            "ranked AS (SELECT query_id, neighbor_id, row_number() OVER ("
            "PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank "
            f"FROM scored) SELECT query_id, neighbor_id, rank FROM ranked "
            f"WHERE rank <= {_ANN_K}"),
        "dup_passages": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            ngrams AS (
              SELECT DISTINCT doc_id, ng FROM (
                SELECT doc_id,
                       unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                               for i in range(1, greatest(len(ws) - 1, 1))])
                       AS ng
                FROM toks)),
            df AS (SELECT ng, count(*) AS c FROM ngrams GROUP BY ng),
            per AS (
              SELECT n.doc_id, count(*) AS n_ngrams,
                     CAST(sum(CASE WHEN df.c >= 2 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_dup
              FROM ngrams n JOIN df USING (ng) GROUP BY n.doc_id)
            SELECT doc_id, n_ngrams, n_dup,
                   round(n_dup * 1.0 / n_ngrams, 6) AS dup_ratio
            FROM per ORDER BY doc_id""",
        "eval_overlap": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            ngrams AS (
              SELECT DISTINCT doc_id, ng FROM (
                SELECT doc_id,
                       unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                               for i in range(1, greatest(len(ws) - 1, 1))])
                       AS ng
                FROM toks)),
            ev AS (SELECT * FROM ngrams WHERE doc_id % 10 = 0),
            tr AS (SELECT DISTINCT ng FROM ngrams WHERE doc_id % 10 <> 0),
            hits AS (
              SELECT e.doc_id, count(*) AS n_ngrams,
                     CAST(sum(CASE WHEN t.ng IS NOT NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_overlap
              FROM ev e LEFT JOIN tr t USING (ng) GROUP BY e.doc_id)
            SELECT doc_id, n_ngrams, n_overlap,
                   round(n_overlap * 1.0 / n_ngrams, 6) AS overlap_ratio
            FROM hits ORDER BY doc_id""",
        "word_entropy": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            w AS (SELECT doc_id, unnest(ws) AS word FROM toks),
            c AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY 1, 2),
            agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
                           count(*) AS n_distinct, sum(c * log2(c)) AS s
                    FROM c GROUP BY doc_id)
            SELECT doc_id, n_words, n_distinct,
                   round(log2(n_words) - s / n_words, 4) AS word_entropy,
                   round(n_distinct * 1.0 / n_words, 6) AS ttr
            FROM agg ORDER BY doc_id""",
        "big_orders": r"""
            WITH qty AS (
              SELECT l_orderkey,
                     CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                       AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 200)
            SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
                   q.total_qty, c.c_name
            FROM qty q
            JOIN orders o ON o.o_orderkey = q.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            ORDER BY o.o_orderkey""",
        "semantic_dedup": (
            "SELECT * FROM read_parquet("
            f"'{_fixture('sf0_01/semantic_dedup.parquet')}')"),
        "chars_quantiles_approx": r"""
            WITH b AS (SELECT CAST(min(n_chars) AS BIGINT) AS lo,
                              CAST(max(n_chars) AS BIGINT) AS hi,
                              CAST(count(*) AS BIGINT) AS n
                       FROM documents),
            h AS (SELECT ((d.n_chars - b.lo) * 1024)
                           // (b.hi - b.lo + 1) AS bucket,
                         CAST(count(*) AS BIGINT) AS c
                  FROM documents d, b GROUP BY 1),
            cum AS (SELECT bucket,
                           sum(c) OVER (ORDER BY bucket) AS cm FROM h),
            qq AS (SELECT unnest([50, 90, 99]) AS q),
            pick AS (SELECT qq.q AS q, min(cum.bucket) AS bucket
                     FROM qq, b, cum
                     WHERE cum.cm >= greatest(1, (qq.q * b.n + 99) // 100)
                     GROUP BY qq.q)
            SELECT CAST(p.q AS BIGINT) AS q,
                   CAST(b.lo + p.bucket * (b.hi - b.lo + 1) // 1024
                        AS BIGINT) AS est
            FROM pick p, b ORDER BY q""",
        "mode_source": r"""
            SELECT lang, source AS mode_source, n FROM (
              SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY count(*) DESC, source)
                       AS rnk
              FROM documents GROUP BY lang, source)
            WHERE rnk = 1 ORDER BY lang""",
        "bm25_topk": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            q AS (SELECT unnest(['batch', 'hash', 'scan']) AS term),
            stats AS (SELECT count(*) AS n, avg(len(ws)) AS avgdl
                      FROM toks),
            tf AS (SELECT t.doc_id, w.word AS term,
                          CAST(count(*) AS BIGINT) AS tf,
                          any_value(len(t.ws)) AS dl
                   FROM toks t, unnest(t.ws) AS w(word)
                   WHERE w.word IN (SELECT term FROM q)
                   GROUP BY t.doc_id, w.word),
            df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                   FROM tf GROUP BY term),
            scored AS (
              SELECT tf.doc_id,
                     -- constants written as the engine computes them
                     -- ((k1+1.0) != literal 2.2 at the last ulp)
                     sum(ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
                         * (tf.tf * (1.2 + 1.0))
                         / (tf.tf + 1.2 * (1.0 - 0.75
                                           + 0.75 * tf.dl / s.avgdl)))
                       AS raw
              FROM tf JOIN df USING (term), stats s
              GROUP BY tf.doc_id)
            SELECT doc_id, floor(raw * 1e6 + 0.5) / 1e6 AS score
            FROM scored
            ORDER BY score DESC, doc_id LIMIT 20""",
        "daily_revenue_ma7": r"""
            WITH d AS (
              SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
                       AS day,
                     CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS rev_c
              FROM orders GROUP BY 1),
            w AS (
              SELECT day, rev_c,
                     CAST(sum(rev_c) OVER (ORDER BY day ROWS 6 PRECEDING)
                          AS BIGINT) AS s,
                     CAST(count(*) OVER (ORDER BY day ROWS 6 PRECEDING)
                          AS BIGINT) AS c
              FROM d)
            SELECT day, rev_c, (2 * s + c) // (2 * c) AS ma7_c
            FROM w ORDER BY day""",
        "item_triangles": r"""
            WITH ui AS (
              SELECT DISTINCT user_id,
                     CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1)
                          AS BIGINT) AS item
              FROM events WHERE event_type = 'view'),
            e0 AS (SELECT a.item AS a, b.item AS b, count(*) AS n
                   FROM ui a JOIN ui b
                     ON a.user_id = b.user_id AND a.item < b.item
                   GROUP BY 1, 2),
            e AS (SELECT a, b FROM e0 WHERE n >= 2),
            tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                    FROM e e1
                    JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
                    JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
            items AS (SELECT x AS item FROM tri
                      UNION ALL SELECT y FROM tri
                      UNION ALL SELECT z FROM tri)
            SELECT item, CAST(count(*) AS BIGINT) AS n_triangles
            FROM items GROUP BY item ORDER BY item""",
        "weighted_sample": r"""
            WITH keyed AS (
              SELECT doc_id, n_chars AS weight,
                     ln((CAST(concat('0x', substr(md5(concat('aes-1:',
                           CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
                         + 1.0) / 1152921504606846976.0)
                       / n_chars AS r
              FROM documents WHERE n_chars > 0),
            top AS (SELECT * FROM keyed
                    ORDER BY r DESC, doc_id LIMIT 100)
            SELECT doc_id, weight, round(r, 6) AS aes_key
            FROM top ORDER BY doc_id""",
        "lang_chars_quantiles": r"""
            WITH b AS (SELECT CAST(min(n_chars) AS BIGINT) AS lo,
                              CAST(max(n_chars) AS BIGINT) AS hi
                       FROM documents),
            h AS (SELECT d.lang AS key,
                         ((d.n_chars - b.lo) * 1024)
                           // (b.hi - b.lo + 1) AS bucket,
                         CAST(count(*) AS BIGINT) AS c
                  FROM documents d, b GROUP BY 1, 2),
            cum AS (SELECT key, bucket,
                           sum(c) OVER (PARTITION BY key
                                        ORDER BY bucket) AS cm,
                           sum(c) OVER (PARTITION BY key) AS n
                    FROM h),
            qq AS (SELECT unnest([50, 90]) AS q),
            pick AS (SELECT cum.key, qq.q, min(cum.bucket) AS bucket
                     FROM qq JOIN cum
                       ON cum.cm >= greatest(1, (qq.q * cum.n + 99) // 100)
                     GROUP BY 1, 2)
            SELECT p.key AS lang, CAST(p.q AS BIGINT) AS q,
                   CAST(b.lo + p.bucket * (b.hi - b.lo + 1) // 1024
                        AS BIGINT) AS est
            FROM pick p, b ORDER BY lang, q""",
        "lm_scores": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            tr AS (SELECT * FROM toks WHERE doc_id % 10 <> 0),
            ev AS (SELECT * FROM toks WHERE doc_id % 10 = 0),
            uni AS (SELECT w AS word, CAST(count(*) AS BIGINT) AS c1
                    FROM (SELECT unnest(ws) AS w FROM tr) GROUP BY 1),
            v AS (SELECT count(*) AS v FROM uni),
            bi_tr AS (
              SELECT bg, CAST(count(*) AS BIGINT) AS c2 FROM (
                SELECT unnest([ws[i] || ' ' || ws[i+1]
                               for i in range(1, greatest(len(ws), 1))])
                       AS bg
                FROM tr) GROUP BY 1),
            ev_bi AS (
              SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS tf FROM (
                SELECT doc_id,
                       unnest([ws[i] || ' ' || ws[i+1]
                               for i in range(1, greatest(len(ws), 1))])
                       AS bg
                FROM ev) GROUP BY 1, 2),
            scored AS (
              SELECT e.doc_id,
                     sum(e.tf * ln((COALESCE(b.c2, 0) + 1.0)
                                   / (COALESCE(u.c1, 0) + v.v))) AS s,
                     CAST(sum(e.tf) AS BIGINT) AS n
              FROM ev_bi e
              CROSS JOIN v
              LEFT JOIN bi_tr b ON b.bg = e.bg
              LEFT JOIN uni u ON u.word = split_part(e.bg, ' ', 1)
              GROUP BY e.doc_id)
            SELECT doc_id, n AS n_bigrams,
                   floor((-s / n) * 1e4 + 0.5) / 1e4 AS nll
            FROM scored ORDER BY doc_id""",
        "lang_source_pmi": r"""
            WITH cells AS (SELECT lang, source,
                                  CAST(count(*) AS BIGINT) AS n
                           FROM documents GROUP BY 1, 2),
            l AS (SELECT lang, CAST(sum(n) AS BIGINT) AS nl
                  FROM cells GROUP BY 1),
            s AS (SELECT source, CAST(sum(n) AS BIGINT) AS ns
                  FROM cells GROUP BY 1),
            t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM cells)
            SELECT c.lang, c.source, c.n,
                   round(ln((c.n * t.nt) / (1.0 * l.nl * s.ns)), 6) AS pmi
            FROM cells c
            JOIN l USING (lang) JOIN s USING (source) CROSS JOIN t
            ORDER BY c.lang, c.source""",
        "intra_dup_ngrams": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            ng AS (
              SELECT doc_id, ng, CAST(count(*) AS BIGINT) AS c FROM (
                SELECT doc_id,
                       unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                               for i in range(1, greatest(len(ws) - 1, 1))])
                       AS ng
                FROM toks) GROUP BY 1, 2),
            per AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_ngrams,
                           CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END)
                                AS BIGINT) AS n_dup_occ
                    FROM ng GROUP BY doc_id)
            SELECT doc_id, n_ngrams, n_dup_occ,
                   floor(n_dup_occ * 1.0 / n_ngrams * 1e6 + 0.5) / 1e6
                     AS intra_dup_ratio
            FROM per ORDER BY doc_id""",
        "dedup_keep_best": r"""
            WITH corpus AS (
              SELECT doc_id, text, source FROM documents
              UNION ALL
              SELECT doc_id + 1000000, text,
                     'src' || CAST((doc_id * 7 + 3) % 25 AS VARCHAR)
              FROM documents WHERE doc_id % 5 = 0)
            SELECT md5(text) AS text_hash, doc_id, priority, n_dups
            FROM (
              SELECT doc_id, text, priority,
                row_number() OVER (PARTITION BY md5(text)
                                   ORDER BY priority, doc_id) AS rn,
                count(*) OVER (PARTITION BY md5(text)) AS n_dups
              FROM (SELECT doc_id, text,
                           CAST(substr(source, 4) AS BIGINT) AS priority
                    FROM corpus))
            WHERE rn = 1 ORDER BY doc_id""",
        "quality_classifier": r"""
            SELECT doc_id, CAST(score AS BIGINT) AS score,
                   CAST(score >= 0 AS BIGINT) AS label FROM (
              SELECT doc_id,
                SUM(CAST(CAST(concat('0x', substr(md5(word), 1, 8))
                              AS UBIGINT) % 2001 AS BIGINT) - 1000)
                  AS score
              FROM (SELECT doc_id,
                           unnest(regexp_extract_all(lower(text), '\S+'))
                             AS word
                    FROM documents)
              GROUP BY doc_id) ORDER BY doc_id""",
        "winnow_fingerprints": r"""
            WITH grams AS (
              SELECT doc_id,
                list_transform(range(1, len(lst) - 1),
                  i -> CAST(concat('0x', substr(md5(
                         lst[i] || ' ' || lst[i+1] || ' ' || lst[i+2]),
                         1, 8)) AS UBIGINT)) AS h
              FROM (SELECT doc_id,
                           regexp_extract_all(lower(text), '\S+') AS lst
                    FROM documents)
              WHERE len(lst) >= 3),
            mins AS (
              SELECT doc_id,
                CASE WHEN len(h) <= 4 THEN [list_min(h)]
                     ELSE list_transform(range(1, len(h) - 2),
                                         j -> list_min(h[j:j+3])) END
                  AS wmins
              FROM grams)
            SELECT doc_id, CAST(fp AS BIGINT) AS fp
            FROM (SELECT doc_id, unnest(list_distinct(wmins)) AS fp
                  FROM mins)
            ORDER BY doc_id, fp""",
        "table_profile": r"""
            SELECT 'event_type' AS "column", count(*) AS n_rows,
                   count(*) - count(event_type) AS n_nulls,
                   count(DISTINCT event_type) AS n_distinct FROM events
            UNION ALL
            SELECT 'props', count(*), count(*) - count(props),
                   count(DISTINCT props) FROM events
            UNION ALL
            SELECT 'user_id', count(*), count(*) - count(user_id),
                   count(DISTINCT user_id) FROM events
            ORDER BY 1""",
        "value_outliers": r"""
            WITH m AS (
              SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
              FROM events
              WHERE value IS NOT NULL AND event_type IS NOT NULL),
            s AS (
              SELECT event_type, count(*) AS n, sum(v) AS sv,
                     sum(v * v) AS svv
              FROM m GROUP BY event_type)
            SELECT m.event_type, CAST(count(*) FILTER (
              WHERE abs(m.v - sv * 1.0 / n) > 2.0 * sqrt(greatest(
                svv * 1.0 / n - (sv * 1.0 / n) * (sv * 1.0 / n), 0.0))
            ) AS BIGINT) AS n_outliers, CAST(max(n) AS BIGINT) AS n
            FROM m JOIN s USING (event_type)
            GROUP BY m.event_type ORDER BY m.event_type""",
        "spearman_qty_price": r"""
            WITH v AS (
              SELECT CAST(round(l_quantity * 100) AS BIGINT) AS a,
                     CAST(round(l_extendedprice * 100) AS BIGINT) AS b
              FROM lineitem),
            r AS (
              SELECT
                2 * rank() OVER (ORDER BY a)
                  + count(*) OVER (PARTITION BY a) - 1 AS ra,
                2 * rank() OVER (ORDER BY b)
                  + count(*) OVER (PARTITION BY b) - 1 AS rb
              FROM v),
            s AS (
              SELECT count(*) AS n, sum(ra) AS sa, sum(rb) AS sb,
                     sum(ra * ra) AS saa, sum(rb * rb) AS sbb,
                     sum(ra * rb) AS sab
              FROM r)
            SELECT floor(CAST(n * sab - sa * sb AS DOUBLE) /
                   sqrt(CAST(n * saa - sa * sa AS DOUBLE)
                        * CAST(n * sbb - sb * sb AS DOUBLE))
                   * 1e6 + 0.5) / 1e6 AS spearman,
                   CAST(n AS BIGINT) AS n
            FROM s""",
        "mad_outliers": r"""
            WITH v AS (
              SELECT event_type AS k,
                     CAST(round(value * 100) AS BIGINT) AS v
              FROM events WHERE value IS NOT NULL),
            m AS (
              SELECT k, count(*) AS n,
                     CAST(round(2 * quantile_cont(CAST(v AS DOUBLE), 0.5))
                          AS BIGINT) AS m2
              FROM v GROUP BY k),
            d AS (
              SELECT v.k, abs(2 * v.v - m.m2) AS d
              FROM v JOIN m USING (k)),
            md AS (
              SELECT k,
                     CAST(round(2 * quantile_cont(CAST(d AS DOUBLE), 0.5))
                          AS BIGINT) AS m4
              FROM d GROUP BY k),
            o AS (
              SELECT d.k,
                     sum(CASE WHEN 2 * d.d > 5 * md.m4
                         THEN 1 ELSE 0 END) AS n_out
              FROM d JOIN md USING (k) GROUP BY d.k)
            SELECT m.k AS event_type, CAST(m.n AS BIGINT) AS n,
                   CAST(m.m2 AS DOUBLE) / 2 / 100 AS median,
                   CAST(md.m4 AS DOUBLE) / 4 / 100 AS mad,
                   CAST(o.n_out AS BIGINT) AS n_outliers
            FROM m JOIN md USING (k) JOIN o USING (k)
            ORDER BY event_type""",
        "source_drift_kl": r"""
            WITH toks AS (
              SELECT source,
                     unnest(regexp_extract_all(lower(text), '\S+')) AS term
              FROM documents),
            vocab AS (
              SELECT term, count(*) AS ct
              FROM toks GROUP BY term
              ORDER BY ct DESC, term LIMIT 200),
            vt AS (SELECT sum(ct) AS nv FROM vocab),
            st AS (
              SELECT t.source, t.term, count(*) AS cst
              FROM toks t JOIN vocab v USING (term)
              GROUP BY t.source, t.term),
            ns AS (SELECT source, sum(cst) AS nsv FROM st GROUP BY source),
            contrib AS (
              SELECT st.source,
                     (st.cst / ns.nsv)
                       * ln((st.cst * vt.nv) / (ns.nsv * v.ct)) AS x
              FROM st JOIN ns USING (source)
                   JOIN vocab v ON st.term = v.term CROSS JOIN vt)
            SELECT c.source, CAST(ns.nsv AS BIGINT) AS n,
                   CAST(sum(CAST(sign(x) * floor(abs(x) * 1e9 + 0.5)
                                 AS BIGINT)) AS DOUBLE) / 1e9 AS kl
            FROM contrib c JOIN ns ON c.source = ns.source
            GROUP BY c.source, ns.nsv ORDER BY c.source""",
        "value_trend": r"""
            WITH v AS (
              SELECT event_type AS k,
                     CAST(CAST(ts AS DATE) - DATE '1970-01-01'
                          AS BIGINT) AS x,
                     CAST(round(value * 100) AS BIGINT) AS y
              FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
                            AND event_type IS NOT NULL),
            s AS (
              SELECT k, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                     sum(x * x) AS sxx, sum(x * y) AS sxy
              FROM v GROUP BY k),
            r AS (
              SELECT k, n,
                     CAST(CAST(n AS HUGEINT) * sxy
                          - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                     / CAST(NULLIF(CAST(n AS HUGEINT) * sxx
                                   - CAST(sx AS HUGEINT) * sx, 0)
                            AS DOUBLE) AS slope_raw,
                     sx, sy
              FROM s)
            SELECT k AS event_type, CAST(n AS BIGINT) AS n,
                   sign(slope_raw) * floor(abs(slope_raw) * 1e6 + 0.5)
                     / 1e6 AS slope,
                   sign((sy - slope_raw * sx) / n)
                     * floor(abs((sy - slope_raw * sx) / n) * 1e6 + 0.5)
                     / 1e6 AS b
            FROM r ORDER BY event_type""",
        "cumulative_users": r"""
            WITH f AS (
              SELECT user_id,
                     min(CAST(floor(epoch_us(ts) / 86400000000)
                              AS BIGINT)) AS day
              FROM events GROUP BY user_id)
            SELECT day AS day_bucket,
                   CAST(count(*) AS BIGINT) AS new_users,
                   CAST(sum(count(*)) OVER (ORDER BY day)
                        AS BIGINT) AS cum_users
            FROM f GROUP BY day ORDER BY day""",
        "segment_gini": r"""
            WITH spend AS (
              SELECT c.c_mktsegment AS segment,
                     sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS v
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
              GROUP BY c.c_mktsegment, o.o_custkey),
            g AS (
              SELECT segment, v,
                     row_number() OVER (PARTITION BY segment
                                        ORDER BY v) AS i
              FROM spend)
            SELECT segment, CAST(count(*) AS BIGINT) AS n,
                   floor(CAST(2 * sum(i * v) - (count(*) + 1) * sum(v)
                              AS DOUBLE)
                         / CAST(count(*) * sum(v) AS DOUBLE)
                         * 1e6 + 0.5) / 1e6 AS gini
            FROM g GROUP BY segment ORDER BY segment""",
        "term_cms": r"""
            WITH toks AS (
              SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS term
              FROM documents),
            cnt AS (SELECT term, count(*) AS n FROM toks GROUP BY term),
            qry AS (SELECT term FROM cnt ORDER BY n DESC, term LIMIT 30),
            rws AS (SELECT unnest([0, 1, 2, 3]) AS r),
            bkt AS (
              SELECT r, term, n,
                     CAST(concat('0x', substr(
                       md5('cms' || r || ':' || term), 1, 8))
                       AS UBIGINT) % 1024 AS b
              FROM cnt CROSS JOIN rws),
            cell AS (SELECT r, b, sum(n) AS s FROM bkt GROUP BY r, b)
            SELECT q.term AS value, CAST(min(cell.s) AS BIGINT) AS est
            FROM qry q
            JOIN bkt ON bkt.term = q.term
            JOIN cell ON cell.r = bkt.r AND cell.b = bkt.b
            GROUP BY q.term ORDER BY q.term""",
        "title_fuzzy": r"""
            WITH t AS (
              SELECT DISTINCT lower(substr(text, 1, 12)) AS title
              FROM documents WHERE text IS NOT NULL),
            d AS (SELECT title FROM t WHERE title <> '')
            SELECT a.title AS "left", b.title AS "right"
            FROM d a JOIN d b ON a.title < b.title
            WHERE levenshtein(a.title, b.title) = 1
            ORDER BY "left", "right" """,
        "dense_rank_docs": r"""
            SELECT doc_id, lang, n_chars,
                   CAST(dense_rank() OVER (PARTITION BY lang
                                           ORDER BY n_chars DESC)
                        AS BIGINT) AS dr
            FROM documents
            QUALIFY dr <= 3
            ORDER BY lang, dr, doc_id""",
        "concurrent_sessions": r"""
            WITH o AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            s2 AS (
              SELECT user_id, ts,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM o),
            sess AS (
              SELECT user_id, sid, min(epoch_us(ts)) AS st,
                     max(epoch_us(ts)) AS en
              FROM s2 GROUP BY user_id, sid),
            conc AS (
              SELECT s1.st AS t,
                     (SELECT count(*) FROM sess s2
                      WHERE s2.st <= s1.st AND s2.en >= s1.st) AS c
              FROM sess s1)
            SELECT CAST(t // 86400000000 AS BIGINT) AS day_bucket,
                   CAST(max(c) AS BIGINT) AS max_concurrent
            FROM conc GROUP BY 1 ORDER BY 1""",
        "bpe_pairs": r"""
            WITH t AS (SELECT lower(text) AS s FROM documents
                       WHERE text IS NOT NULL),
            p AS (
              SELECT substr(s, CAST(i AS INTEGER), 2) AS pair
              FROM t CROSS JOIN (
                SELECT unnest(range(1, (SELECT max(length(s)) FROM t)))
                  AS i)
              WHERE i <= length(s) - 1)
            SELECT CAST(row_number() OVER (ORDER BY count(*) DESC, pair)
                        AS BIGINT) AS rnk,
                   pair, count(*) AS n
            FROM p GROUP BY pair
            ORDER BY n DESC, pair LIMIT 50""",
        "hybrid_rrf": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            q AS (SELECT unnest(['batch', 'hash', 'scan']) AS term),
            stats AS (SELECT count(*) AS n, avg(len(ws)) AS avgdl
                      FROM toks),
            tf AS (SELECT t.doc_id, w.word AS term,
                          CAST(count(*) AS BIGINT) AS tf,
                          any_value(len(t.ws)) AS dl
                   FROM toks t, unnest(t.ws) AS w(word)
                   WHERE w.word IN (SELECT term FROM q)
                   GROUP BY t.doc_id, w.word),
            df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                   FROM tf GROUP BY term),
            scored AS (
              SELECT tf.doc_id,
                     sum(ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
                         * (tf.tf * (1.2 + 1.0))
                         / (tf.tf + 1.2 * (1.0 - 0.75
                                           + 0.75 * tf.dl / s.avgdl)))
                       AS raw
              FROM tf JOIN df USING (term), stats s
              GROUP BY tf.doc_id),
            lexcut AS (
              SELECT doc_id, floor(raw * 1e6 + 0.5) / 1e6 AS score
              FROM scored ORDER BY score DESC, doc_id LIMIT 20),
            lex AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY score DESC, doc_id)
                       AS lr
              FROM lexcut),
            qd AS (SELECT embedding AS qe FROM embeddings
                   WHERE vec_id = 0),
            dsc AS (SELECT e.vec_id AS doc_id,
                           list_cosine_similarity(qd.qe, e.embedding) AS s
                    FROM qd CROSS JOIN embeddings e),
            den AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY s DESC, doc_id) AS dr
              FROM dsc QUALIFY dr <= 20),
            f AS (
              SELECT coalesce(lex.doc_id, den.doc_id) AS doc_id,
                     coalesce(CAST(floor(1e9 / (60 + lr) + 0.5)
                                   AS BIGINT), 0)
                     + coalesce(CAST(floor(1e9 / (60 + dr) + 0.5)
                                     AS BIGINT), 0) AS rrf_ppb
              FROM lex FULL OUTER JOIN den
                   ON lex.doc_id = den.doc_id)
            SELECT CAST(row_number() OVER (ORDER BY rrf_ppb DESC, doc_id)
                        AS BIGINT) AS rnk,
                   doc_id, rrf_ppb
            FROM f ORDER BY rrf_ppb DESC, doc_id LIMIT 10""",
        "weekly_churn": r"""
            WITH uw AS (
              SELECT DISTINCT user_id,
                     CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week
              FROM events),
            mx AS (SELECT max(week) AS lw FROM uw),
            t AS (
              SELECT user_id, week,
                     CASE WHEN lead(week) OVER (PARTITION BY user_id
                                                ORDER BY week)
                               = week + 1
                          THEN 1 ELSE 0 END AS retained
              FROM uw)
            SELECT week, CAST(count(*) AS BIGINT) AS active,
                   CAST(sum(retained) AS BIGINT) AS retained,
                   CAST(count(*) - sum(retained) AS BIGINT) AS churned
            FROM t, mx WHERE week < mx.lw
            GROUP BY week ORDER BY week""",
        "revenue_forecast": (
            "SELECT CAST(sum("
            "CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) "
            "AS revenue_c4, count(*) AS n_rows FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01' "
            "AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7 "
            "AND l_quantity < 24"),
        "promo_revenue": (
            "WITH l AS (SELECT "
            "strftime(date_trunc('month', li.l_shipdate), '%Y-%m') "
            "AS ship_month, "
            "CAST(round(li.l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - li.l_discount) * 100) AS BIGINT) AS rev, "
            "CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END AS isp "
            "FROM lineitem li JOIN part p ON li.l_partkey = p.p_partkey) "
            "SELECT ship_month, "
            "CAST(sum(CASE WHEN isp = 1 THEN rev ELSE 0 END) AS BIGINT) "
            "AS promo_rev_c4, CAST(sum(rev) AS BIGINT) AS total_rev_c4, "
            "CAST(CAST(1000000 AS HUGEINT) * "
            "sum(CASE WHEN isp = 1 THEN rev ELSE 0 END) // sum(rev) "
            "AS BIGINT) AS promo_ppm "
            "FROM l GROUP BY 1 ORDER BY 1"),
        "customer_distribution": (
            "WITH per_cust AS (SELECT c.c_custkey, "
            "count(o.o_orderkey) AS c_count "
            "FROM customer c LEFT JOIN orders o "
            "ON c.c_custkey = o.o_custkey GROUP BY 1) "
            "SELECT c_count, count(*) AS custdist FROM per_cust "
            "GROUP BY 1 ORDER BY custdist DESC, c_count DESC"),
        "top_supplier": (
            "WITH rev AS (SELECT l_suppkey, CAST(sum("
            "CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) "
            "AS total_rev_c4 FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY 1) "
            "SELECT s.s_suppkey, s.s_name, r.total_rev_c4 "
            "FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey "
            "WHERE r.total_rev_c4 = (SELECT max(total_rev_c4) FROM rev) "
            "ORDER BY s.s_suppkey"),
        "idle_customer_balance": (
            "WITH bal AS (SELECT c_custkey, c_nationkey, "
            "CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c "
            "FROM customer), "
            "agg AS (SELECT sum(bal_c) AS s, count(*) AS n "
            "FROM bal WHERE bal_c > 0) "
            "SELECT CAST(b.c_nationkey AS BIGINT) AS c_nationkey, "
            "CAST(sum(b.bal_c) AS BIGINT) AS total_bal_c, "
            "count(*) AS n_custs "
            "FROM bal b, agg WHERE b.bal_c * agg.n > agg.s "
            "AND NOT EXISTS (SELECT 1 FROM orders o "
            "WHERE o.o_custkey = b.c_custkey "
            "AND o.o_orderdate >= TIMESTAMP '2000-07-01') "
            "GROUP BY 1 ORDER BY 1"),
        "nation_trade_volume": (
            "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
            "CAST(year(l.l_shipdate) AS BIGINT) AS l_year, "
            "CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) "
            "AS revenue_c4 "
            "FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey "
            "JOIN orders o ON o.o_orderkey = l.l_orderkey "
            "JOIN customer c ON c.c_custkey = o.o_custkey "
            "JOIN nation n1 ON s.s_nationkey = n1.n_nationkey "
            "JOIN nation n2 ON c.c_nationkey = n2.n_nationkey "
            "JOIN region r1 ON n1.n_regionkey = r1.r_regionkey "
            "JOIN region r2 ON n2.n_regionkey = r2.r_regionkey "
            "WHERE ((r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA') "
            "OR (r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')) "
            "AND l.l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l.l_shipdate < TIMESTAMP '1998-01-01' "
            "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"),
        "market_share": (
            "WITH cell AS (SELECT "
            "CAST(year(o.o_orderdate) AS BIGINT) AS o_year, "
            "CAST(round(l.l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - l.l_discount) * 100) AS BIGINT) AS rev, "
            "CASE WHEN sn.n_name = 'NATION_3' THEN 1 ELSE 0 END AS isn3 "
            "FROM lineitem l "
            "JOIN part p ON l.l_partkey = p.p_partkey "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "JOIN nation sn ON s.s_nationkey = sn.n_nationkey "
            "JOIN orders o ON o.o_orderkey = l.l_orderkey "
            "JOIN customer c ON c.c_custkey = o.o_custkey "
            "JOIN nation cn ON c.c_nationkey = cn.n_nationkey "
            "JOIN region r ON cn.n_regionkey = r.r_regionkey "
            "WHERE p.p_type = 'PROMO' AND r.r_name = 'EUROPE' "
            "AND o.o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o.o_orderdate < TIMESTAMP '1998-01-01') "
            "SELECT o_year, "
            "CAST(sum(CASE WHEN isn3 = 1 THEN rev ELSE 0 END) AS BIGINT) "
            "AS n3_rev_c4, CAST(sum(rev) AS BIGINT) AS total_rev_c4, "
            "CAST(CAST(1000000 AS HUGEINT) * "
            "sum(CASE WHEN isn3 = 1 THEN rev ELSE 0 END) // sum(rev) "
            "AS BIGINT) AS mkt_share_ppm "
            "FROM cell GROUP BY 1 ORDER BY 1"),
        "returned_items": (
            "SELECT c.c_custkey, c.c_name, n.n_name, CAST(sum("
            "CAST(round(l.l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) "
            "AS revenue_c4 "
            "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
            "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "WHERE l.l_returnflag = 'R' "
            "AND o.o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o.o_orderdate < TIMESTAMP '1996-07-01' "
            "GROUP BY 1, 2, 3 "
            "ORDER BY revenue_c4 DESC, c_custkey LIMIT 20"),
        "pareto_orders": (
            "WITH o AS (SELECT o_orderkey, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS price_c, "
            "CAST(date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) "
            "AS BIGINT) AS o_days FROM orders) "
            "SELECT a.o_orderkey, a.price_c, a.o_days FROM o a "
            "WHERE NOT EXISTS (SELECT 1 FROM o b "
            "WHERE b.price_c >= a.price_c AND b.o_days >= a.o_days "
            "AND (b.price_c > a.price_c OR b.o_days > a.o_days)) "
            "ORDER BY a.price_c DESC, a.o_days, a.o_orderkey"),
        "item_bfs": (
            "WITH RECURSIVE ui AS (SELECT DISTINCT user_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'view'), "
            "pairs AS (SELECT a.item AS ia, b.item AS ib, count(*) AS c "
            "FROM ui a JOIN ui b ON a.user_id = b.user_id "
            "AND a.item < b.item GROUP BY 1, 2), "
            "edges AS (SELECT ia, ib FROM pairs WHERE c >= 2 "
            "UNION ALL SELECT ib, ia FROM pairs WHERE c >= 2), "
            "seed AS (SELECT min(item) AS s FROM ui), "
            "bfs(item, dist) AS (SELECT s, 0 FROM seed UNION ALL "
            "SELECT e.ib, b.dist + 1 FROM bfs b "
            "JOIN edges e ON e.ia = b.item WHERE b.dist < 4) "
            "SELECT item, CAST(min(dist) AS BIGINT) AS dist "
            "FROM bfs GROUP BY 1 ORDER BY 1"),
        "pricing_summary": (
            "WITH l AS (SELECT l_returnflag, l_linestatus, "
            "CAST(l_quantity AS BIGINT) AS qty, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS base_c, "
            "CAST(round(l_discount * 100) AS BIGINT) AS disc_pct, "
            "CAST(round(l_tax * 100) AS BIGINT) AS tax_pct "
            "FROM lineitem) "
            "SELECT l_returnflag, l_linestatus, "
            "CAST(sum(qty) AS BIGINT) AS sum_qty, "
            "CAST(sum(base_c) AS BIGINT) AS sum_base_c, "
            "CAST(sum(base_c * (100 - disc_pct)) AS BIGINT) "
            "AS sum_disc_c4, "
            "CAST(sum(base_c * (100 - disc_pct) * (100 + tax_pct)) "
            "AS BIGINT) AS sum_charge_c6, "
            "CAST(sum(qty) AS DOUBLE) / CAST(count(*) AS DOUBLE) "
            "AS avg_qty, "
            "CAST(sum(base_c) AS DOUBLE) / CAST(count(*) AS DOUBLE) "
            "AS avg_price_c, "
            "CAST(sum(disc_pct) AS DOUBLE) / CAST(count(*) AS DOUBLE) "
            "AS avg_disc_pct, count(*) AS n_rows "
            "FROM l GROUP BY 1, 2 ORDER BY 1, 2"),
        "readability": (
            "WITH d AS (SELECT lang, "
            "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS w, "
            "CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) "
            "AS l, greatest(CAST(len(regexp_extract_all(text, '[.!?]')) "
            "AS BIGINT), 1) AS s FROM documents), "
            "m AS (SELECT lang, "
            "(2 * l * 100000000 + w) // (2 * w) AS lw, "
            "(2 * s * 100000000 + w) // (2 * w) AS sw "
            "FROM d WHERE w > 0) "
            "SELECT lang, count(*) AS n_docs, "
            "round(0.0588 * (CAST(sum(lw) AS DOUBLE) / "
            "CAST(count(*) AS DOUBLE) / 1000000.0) "
            "- 0.296 * (CAST(sum(sw) AS DOUBLE) / "
            "CAST(count(*) AS DOUBLE) / 1000000.0) - 15.8, 6) "
            "AS mean_cli FROM m GROUP BY 1 ORDER BY 1"),
        "weighted_median": (
            "WITH h AS (SELECT l_returnflag, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS v, "
            "CAST(l_quantity AS BIGINT) AS wt FROM lineitem), "
            "c AS (SELECT l_returnflag, v, sum(wt) AS w "
            "FROM h GROUP BY 1, 2), "
            "s AS (SELECT l_returnflag, v, "
            "sum(w) OVER (PARTITION BY l_returnflag ORDER BY v) AS cw, "
            "sum(w) OVER (PARTITION BY l_returnflag) AS tot FROM c) "
            "SELECT l_returnflag, CAST(min(v) AS BIGINT) "
            "AS wmedian_price_c FROM s WHERE 2 * cw >= tot "
            "GROUP BY 1 ORDER BY 1"),
        "conversion_lag": (
            "WITH x AS (SELECT user_id, epoch_us(ts) AS ts_us, "
            "event_type, max(CASE WHEN event_type = 'view' "
            "THEN epoch_us(ts) END) OVER (PARTITION BY user_id "
            "ORDER BY epoch_us(ts), event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv "
            "FROM events), "
            "l AS (SELECT ts_us - pv AS lag_us FROM x "
            "WHERE event_type = 'purchase' AND pv IS NOT NULL) "
            "SELECT quantile_cont(lag_us, 0.5) AS p50_lag_us, "
            "quantile_cont(lag_us, 0.95) AS p95_lag_us FROM l"),
        "source_ks": (
            "WITH h AS (SELECT source, CAST(n_chars AS BIGINT) AS v, "
            "CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2), "
            "pts AS (SELECT DISTINCT v FROM h), "
            "grid AS (SELECT t.source, pts.v FROM "
            "(SELECT DISTINCT source FROM h) t CROSS JOIN pts), "
            "j AS (SELECT grid.source, grid.v, coalesce(h.c, 0) AS c "
            "FROM grid LEFT JOIN h ON h.source = grid.source "
            "AND h.v = grid.v), "
            "s AS (SELECT source, v, "
            "sum(c) OVER (PARTITION BY source ORDER BY v) AS cs, "
            "sum(c) OVER (PARTITION BY source) AS ns FROM j), "
            "gt AS (SELECT v, sum(c) AS cv FROM h GROUP BY 1), "
            "gc AS (SELECT v, sum(cv) OVER (ORDER BY v) AS cg, "
            "sum(cv) OVER () AS ng FROM gt) "
            "SELECT s.source, CAST(max(s.ns) AS BIGINT) AS n_docs, "
            "CAST(CAST(1000000 AS HUGEINT) * "
            "max(abs(s.cs * gc.ng - gc.cg * s.ns)) "
            "// (max(s.ns) * max(gc.ng)) AS BIGINT) AS ks_ppm "
            "FROM s JOIN gc USING (v) GROUP BY 1 ORDER BY 1"),
        "event_transitions": (
            "WITH s AS (SELECT user_id, event_type, "
            "lead(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS nxt FROM events) "
            "SELECT event_type AS prev_type, nxt AS next_type, "
            "count(*) AS n FROM s WHERE nxt IS NOT NULL "
            "GROUP BY 1, 2 ORDER BY 1, 2"),
        "rfm_segments": (
            "WITH pc AS (SELECT o_custkey, "
            "CAST(date_diff('day', TIMESTAMP '1970-01-01', "
            "max(o_orderdate)) AS BIGINT) AS rd, "
            "count(*) AS f, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS m FROM orders GROUP BY 1), "
            "cuts AS (SELECT quantile_cont(rd, 0.5) AS cr, "
            "quantile_cont(f, 0.5) AS cf, quantile_cont(m, 0.5) AS cm "
            "FROM pc) "
            "SELECT CASE WHEN rd <= cr THEN 1 ELSE 2 END AS r_b, "
            "CASE WHEN f <= cf THEN 1 ELSE 2 END AS f_b, "
            "CASE WHEN m <= cm THEN 1 ELSE 2 END AS m_b, "
            "count(*) AS n_customers "
            "FROM pc, cuts GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"),
        "classifier_auc": (
            "WITH h AS (SELECT CAST(n_chars AS BIGINT) AS v, "
            "CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS pos, "
            "CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) "
            "AS BIGINT) AS neg FROM documents GROUP BY 1), "
            "s AS (SELECT v, pos, neg, "
            "coalesce(sum(neg) OVER (ORDER BY v "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "AS neg_below FROM h), "
            "t AS (SELECT sum(2 * neg_below * pos + neg * pos) AS u2, "
            "sum(pos) AS np, sum(neg) AS nn FROM s) "
            "SELECT CAST(np AS BIGINT) AS n_pos, "
            "CAST(nn AS BIGINT) AS n_neg, "
            "CAST(CAST(1000000 AS HUGEINT) * u2 // (2 * np * nn) "
            "AS BIGINT) AS auc_ppm FROM t"),
        "benford_digits": (
            "WITH d AS (SELECT CAST(substr(CAST("
            "CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), "
            "1, 1) AS BIGINT) AS digit FROM orders), "
            "c AS (SELECT digit, count(*) AS n_orders FROM d "
            "GROUP BY 1), t AS (SELECT sum(n_orders) AS nt FROM c) "
            "SELECT digit, CAST(n_orders AS BIGINT) AS n_orders, "
            "floor(nt * log10(1.0 + 1.0 / digit) * 1000000 + 0.5) "
            "/ 1000000.0 AS expected, "
            "floor((n_orders - nt * log10(1.0 + 1.0 / digit)) * "
            "(n_orders - nt * log10(1.0 + 1.0 / digit)) / "
            "(nt * log10(1.0 + 1.0 / digit)) * 1000000 + 0.5) "
            "/ 1000000.0 AS chi2_term "
            "FROM c, t ORDER BY digit"),
        "stickiness": (
            "WITH ud AS (SELECT DISTINCT user_id, "
            "CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, "
            "strftime(date_trunc('month', ts), '%Y-%m') AS month "
            "FROM events), "
            "dau AS (SELECT month, count(*) AS user_days, "
            "count(DISTINCT day) AS n_days FROM ud GROUP BY 1), "
            "mau AS (SELECT strftime(date_trunc('month', ts), '%Y-%m') "
            "AS month, count(DISTINCT user_id) AS mau "
            "FROM events GROUP BY 1) "
            "SELECT d.month, CAST(d.user_days AS BIGINT) AS user_days, "
            "CAST(d.n_days AS BIGINT) AS n_days, "
            "CAST(m.mau AS BIGINT) AS mau, "
            "CAST(CAST(1000000 AS HUGEINT) * d.user_days "
            "// (d.n_days * m.mau) AS BIGINT) AS stickiness_ppm "
            "FROM dau d JOIN mau m USING (month) ORDER BY 1"),
        "revenue_autocorr": (
            "WITH d AS (SELECT "
            "CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) "
            "AS day, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS rev FROM orders GROUP BY 1), "
            "p AS (SELECT a.rev AS x, b.rev AS y FROM d a "
            "JOIN d b ON b.day = a.day + 1), "
            "s AS (SELECT count(*) AS n, sum(CAST(x AS HUGEINT)) AS sx, "
            "sum(CAST(y AS HUGEINT)) AS sy, "
            "sum(CAST(x AS HUGEINT) * x) AS sxx, "
            "sum(CAST(y AS HUGEINT) * y) AS syy, "
            "sum(CAST(x AS HUGEINT) * y) AS sxy FROM p) "
            "SELECT CAST(n AS BIGINT) AS n_pairs, "
            "round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) "
            "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / "
            "sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
            "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * "
            "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) "
            "- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) "
            "AS autocorr FROM s"),
        "lang_source_chi2": (
            "WITH c AS (SELECT lang, source, "
            "CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1, 2), "
            "lt AS (SELECT lang, sum(n) AS ln FROM c GROUP BY 1), "
            "st AS (SELECT source, sum(n) AS sn FROM c GROUP BY 1), "
            "t AS (SELECT sum(n) AS nt FROM c), "
            "grid AS (SELECT l.lang, s.source, l.ln, s.sn "
            "FROM lt l CROSS JOIN st s), "
            "g AS (SELECT grid.lang, grid.source, "
            "coalesce(c.n, 0) AS obs, grid.ln, grid.sn "
            "FROM grid LEFT JOIN c ON c.lang = grid.lang "
            "AND c.source = grid.source), "
            "terms AS (SELECT CAST(floor((obs - ln * sn / nt.nt) * "
            "(obs - ln * sn / nt.nt) / (ln * sn / nt.nt) "
            "* 1000000 + 0.5) AS BIGINT) AS ti, nt.nt AS nt "
            "FROM g, t nt) "
            "SELECT CAST(max(nt) AS BIGINT) AS n_docs, "
            "(SELECT count(*) FROM lt) AS n_langs, "
            "(SELECT count(*) FROM st) AS n_sources, "
            "(SELECT (count(*) - 1) FROM lt) * "
            "(SELECT (count(*) - 1) FROM st) AS dof, "
            "sum(ti) / 1000000.0 AS chi2 FROM terms"),
        "small_qty_revenue": (
            "WITH avgq AS (SELECT l_partkey, "
            "0.2 * (CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / "
            "CAST(count(*) AS DOUBLE)) AS thr "
            "FROM lineitem GROUP BY 1), "
            "f AS (SELECT l.l_extendedprice FROM lineitem l "
            "JOIN avgq a ON l.l_partkey = a.l_partkey "
            "WHERE l.l_quantity < a.thr) "
            "SELECT count(*) AS n_rows, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "AS BIGINT) AS revenue_c, "
            "floor(CAST(sum(CAST(round(l_extendedprice * 100) "
            "AS BIGINT)) AS DOUBLE) / 7.0 * 1000000 + 0.5) / 1000000.0 "
            "AS avg_yearly_c FROM f"),
        "brand_band_revenue": (
            "SELECT CAST(sum("
            "CAST(round(l.l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) "
            "AS revenue_c4, count(*) AS n_rows "
            "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
            "WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10 "
            "AND l.l_quantity BETWEEN 1 AND 11) "
            "OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 25 "
            "AND l.l_quantity BETWEEN 10 AND 20) "
            "OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50 "
            "AND l.l_quantity BETWEEN 20 AND 30)"),
        "item_neighbors": (
            "WITH ui AS (SELECT DISTINCT user_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'view'), "
            "pairs AS (SELECT a.item AS ia, b.item AS ib, count(*) AS c "
            "FROM ui a JOIN ui b ON a.user_id = b.user_id "
            "AND a.item < b.item GROUP BY 1, 2), "
            "d AS (SELECT ia AS item, ib AS nbr, c FROM pairs "
            "UNION ALL SELECT ib, ia, c FROM pairs), "
            "r AS (SELECT item, nbr, c AS n_users, row_number() OVER "
            "(PARTITION BY item ORDER BY c DESC, nbr) AS rnk FROM d) "
            "SELECT item, rnk, nbr, n_users FROM r WHERE rnk <= 5 "
            "ORDER BY item, rnk"),
        "session_bounds": (
            "WITH o AS (SELECT user_id, ts, event_id, event_type, "
            "lag(ts) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS pts FROM events), "
            "s AS (SELECT *, sum(CASE WHEN pts IS NULL OR "
            "epoch_us(ts) - epoch_us(pts) > 1800000000 THEN 1 ELSE 0 "
            "END) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS sid FROM o), "
            "b AS (SELECT DISTINCT user_id, sid, "
            "first_value(event_type) OVER (PARTITION BY user_id, sid "
            "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND UNBOUNDED FOLLOWING) AS entry_type, "
            "last_value(event_type) OVER (PARTITION BY user_id, sid "
            "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND UNBOUNDED FOLLOWING) AS exit_type FROM s) "
            "SELECT entry_type, exit_type, count(*) AS n_sessions "
            "FROM b GROUP BY 1, 2 ORDER BY 1, 2"),
        "revenue_concentration": (
            "WITH pc2 AS (SELECT o_custkey, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS m FROM orders GROUP BY 1), "
            "cut AS (SELECT quantile_cont(m, 0.99) AS c FROM pc2) "
            "SELECT CAST(sum(CASE WHEN m > cut.c THEN 1 ELSE 0 END) "
            "AS BIGINT) AS top_customers, count(*) AS all_customers, "
            "CAST(CAST(1000000 AS HUGEINT) * "
            "sum(CASE WHEN m > cut.c THEN m ELSE 0 END) // sum(m) "
            "AS BIGINT) AS top_share_ppm FROM pc2, cut"),
        "item_components": (
            "WITH RECURSIVE ui AS (SELECT DISTINCT user_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'view'), "
            "pairs AS (SELECT a.item AS ia, b.item AS ib "
            "FROM ui a JOIN ui b ON a.user_id = b.user_id "
            "AND a.item < b.item GROUP BY 1, 2 "
            "HAVING count(*) >= 2), "
            "edges AS (SELECT ia, ib FROM pairs "
            "UNION ALL SELECT ib, ia FROM pairs), "
            "reach(a, b) AS ("
            "SELECT item, item FROM (SELECT DISTINCT item FROM ui) "
            "UNION "
            "SELECT r.a, e.ib FROM reach r JOIN edges e ON e.ia = r.b) "
            "SELECT a AS item, CAST(min(b) AS BIGINT) AS component "
            "FROM reach GROUP BY 1 ORDER BY 1"),
        "rolling_active_users": (
            "WITH ud AS (SELECT DISTINCT user_id, "
            "CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day "
            "FROM events), days AS (SELECT DISTINCT day FROM ud) "
            "SELECT d.day AS day, "
            "CAST(count(DISTINCT u.user_id) AS BIGINT) AS active_7d "
            "FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day "
            "GROUP BY 1 ORDER BY 1"),
        "dup_size_histogram": (
            "WITH g AS (SELECT md5(text) AS h, count(*) AS sz "
            "FROM documents GROUP BY 1) "
            "SELECT CAST(sz AS BIGINT) AS group_size, "
            "CAST(count(*) AS BIGINT) AS n_groups, "
            "CAST(sum(sz) AS BIGINT) AS n_docs "
            "FROM g GROUP BY 1 ORDER BY 1"),
        "fulfillment_lag": (
            "WITH ls AS (SELECT l_orderkey, "
            "max(CAST(epoch_us(l_shipdate) // 86400000000 AS BIGINT)) "
            "AS last_ship FROM lineitem GROUP BY 1), "
            "lag AS (SELECT o.o_orderpriority, ls.last_ship - "
            "CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) "
            "AS lag_days FROM ls "
            "JOIN orders o ON o.o_orderkey = ls.l_orderkey) "
            "SELECT o_orderpriority, "
            "quantile_cont(lag_days, 0.5) AS p50, "
            "quantile_cont(lag_days, 0.95) AS p95 "
            "FROM lag GROUP BY 1 ORDER BY 1"),
        "priority_late_orders": (
            "SELECT o_orderpriority, "
            "CAST(count(*) AS BIGINT) AS n_late_orders "
            "FROM orders o "
            "WHERE o.o_orderdate >= TIMESTAMP '1996-07-01' "
            "AND o.o_orderdate < TIMESTAMP '1996-10-01' "
            "AND EXISTS (SELECT 1 FROM lineitem l "
            "WHERE l.l_orderkey = o.o_orderkey "
            "AND CAST(epoch_us(l.l_shipdate) // 86400000000 AS BIGINT) "
            "- CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) "
            "> 60) GROUP BY 1 ORDER BY 1"),
        "slow_suppliers": (
            "WITH os AS (SELECT l_orderkey, l_suppkey, "
            "max(CAST(epoch_us(l_shipdate) // 86400000000 AS BIGINT)) "
            "AS smax FROM lineitem GROUP BY 1, 2), "
            "o AS (SELECT l_orderkey, max(smax) AS omax, "
            "count(*) AS nsupp, "
            "sum(CASE WHEN smax = (SELECT max(smax) FROM os x "
            "WHERE x.l_orderkey = os.l_orderkey) THEN 1 ELSE 0 END) "
            "AS natmax FROM os GROUP BY 1), "
            "w AS (SELECT os.l_suppkey FROM os "
            "JOIN o USING (l_orderkey) "
            "WHERE o.nsupp >= 2 AND o.natmax = 1 AND os.smax = o.omax) "
            "SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait "
            "FROM w JOIN supplier s ON s.s_suppkey = w.l_suppkey "
            "GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 10"),
        "user_entropy": (
            "WITH c AS (SELECT user_id, event_type, count(*) AS c "
            "FROM events GROUP BY 1, 2), "
            "s AS (SELECT user_id, "
            "CAST(sum(CAST(floor(c * ln(c) * 1000000000 + 0.5) "
            "AS BIGINT)) AS BIGINT) AS s, "
            "CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1) "
            "SELECT user_id, n AS n_events, "
            "CAST(floor((ln(n) - s / 1000000000.0 / n) * 1000000000 "
            "+ 0.5) AS BIGINT) AS entropy_nano "
            "FROM s ORDER BY entropy_nano DESC, user_id LIMIT 20"),
        "vocab_growth": (
            "WITH toks AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '\\S+') AS ws "
            "FROM documents), "
            "tri AS (SELECT doc_id, ws[u.i] || ' ' || ws[u.i+1] || ' ' "
            "|| ws[u.i+2] AS term FROM toks, "
            "unnest(range(1, greatest(len(ws) - 1, 1))) u(i)), "
            "ft AS (SELECT term, min(doc_id) AS first_doc FROM tri "
            "GROUP BY 1), "
            "b AS (SELECT first_doc // 50 AS bucket, "
            "count(*) AS new_terms FROM ft GROUP BY 1) "
            "SELECT CAST(bucket AS BIGINT) AS bucket, "
            "CAST(new_terms AS BIGINT) AS new_terms, "
            "CAST(sum(new_terms) OVER (ORDER BY bucket) AS BIGINT) "
            "AS vocab_size FROM b ORDER BY bucket"),
        "embedding_covariance": (
            "WITH q AS (SELECT vec_id, t.i AS i, "
            "CAST(round(CAST(embedding[CAST(t.i AS INTEGER) + 1] "
            "AS DOUBLE) * 1000000) "
            "AS BIGINT) AS v FROM embeddings, range(64) t(i)), "
            "p AS (SELECT a.i AS i, b.i AS j, count(*) AS n, "
            "sum(CAST(a.v AS HUGEINT) * b.v) AS sxy, "
            "sum(CAST(a.v AS HUGEINT)) AS sx, "
            "sum(CAST(b.v AS HUGEINT)) AS sy "
            "FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i "
            "GROUP BY 1, 2) "
            "SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, "
            "CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE) "
            "/ CAST(n * n AS DOUBLE) AS cov_micro2 "
            "FROM p ORDER BY i, j"),
        "fk_violations": (
            "WITH checks AS ("
            "SELECT 'documents_empty_text' AS chk, count(*) FILTER ("
            "text IS NULL OR length(text) = 0) AS n FROM documents "
            "UNION ALL SELECT 'lineitem_nonpositive_qty', "
            "count(*) FILTER (l_quantity <= 0) FROM lineitem "
            "UNION ALL SELECT 'lineitem_orderkey_orphans', count(*) "
            "FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o "
            "WHERE o.o_orderkey = l.l_orderkey) "
            "UNION ALL SELECT 'lineitem_partkey_orphans', count(*) "
            "FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM part p "
            "WHERE p.p_partkey = l.l_partkey) "
            "UNION ALL SELECT 'lineitem_suppkey_orphans', count(*) "
            "FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM supplier s "
            "WHERE s.s_suppkey = l.l_suppkey) "
            "UNION ALL SELECT 'orders_custkey_orphans', count(*) "
            "FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c "
            "WHERE c.c_custkey = o.o_custkey)) "
            "SELECT chk AS \"check\", CAST(n AS BIGINT) AS n_violations "
            "FROM checks ORDER BY 1"),
        "doc_novelty": (
            "WITH toks AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '\\S+') AS ws "
            "FROM documents), "
            "tri AS (SELECT DISTINCT doc_id, ws[u.i] || ' ' || "
            "ws[u.i+1] || ' ' || ws[u.i+2] AS term FROM toks, "
            "unnest(range(1, greatest(len(ws) - 1, 1))) u(i)), "
            "f AS (SELECT term, min(doc_id) AS fd FROM tri GROUP BY 1), "
            "per AS (SELECT t.doc_id, count(*) AS n_tri, "
            "sum(CASE WHEN f.fd = t.doc_id THEN 1 ELSE 0 END) AS n_new "
            "FROM tri t JOIN f ON f.term = t.term GROUP BY 1) "
            "SELECT doc_id, CAST(n_tri AS BIGINT) AS n_tri, "
            "CAST(n_new AS BIGINT) AS n_new, "
            "CAST(1000000 * n_new // n_tri AS BIGINT) AS novelty_ppm "
            "FROM per ORDER BY novelty_ppm, doc_id LIMIT 20"),
        "term_keyness": (
            "WITH w AS (SELECT source, "
            "unnest(regexp_extract_all(lower(text), '\\S+')) AS term "
            "FROM documents), "
            "c AS (SELECT source, term, count(*) AS a FROM w "
            "GROUP BY 1, 2), "
            "kt AS (SELECT term, sum(a) AS kt FROM c GROUP BY 1), "
            "ns AS (SELECT source, sum(a) AS ns FROM c GROUP BY 1), "
            "tot AS (SELECT sum(a) AS n FROM c), "
            "g AS (SELECT c.source, c.term, c.a AS k, "
            "(CASE WHEN c.a > 0 THEN CAST(floor(2.0 * c.a * "
            "ln(c.a * t.n / (kt.kt * ns.ns)) * 1000000000 + 0.5) "
            "AS BIGINT) ELSE 0 END "
            "+ CASE WHEN kt.kt - c.a > 0 THEN CAST(floor(2.0 * "
            "(kt.kt - c.a) * ln((kt.kt - c.a) * t.n / "
            "(kt.kt * (t.n - ns.ns))) * 1000000000 + 0.5) "
            "AS BIGINT) ELSE 0 END "
            "+ CASE WHEN ns.ns - c.a > 0 THEN CAST(floor(2.0 * "
            "(ns.ns - c.a) * ln((ns.ns - c.a) * t.n / "
            "((t.n - kt.kt) * ns.ns)) * 1000000000 + 0.5) "
            "AS BIGINT) ELSE 0 END "
            "+ CASE WHEN t.n - kt.kt - ns.ns + c.a > 0 THEN "
            "CAST(floor(2.0 * (t.n - kt.kt - ns.ns + c.a) * "
            "ln((t.n - kt.kt - ns.ns + c.a) * t.n / "
            "((t.n - kt.kt) * (t.n - ns.ns))) * 1000000000 + 0.5) "
            "AS BIGINT) ELSE 0 END) AS g2_nano "
            "FROM c JOIN kt USING (term) JOIN ns USING (source) "
            "CROSS JOIN tot t) "
            "SELECT source, term, CAST(k AS BIGINT) AS k, g2_nano "
            "FROM g ORDER BY g2_nano DESC, source, term LIMIT 20"),
        "truncation_twins": (
            "SELECT substr(text, 1, 50) AS prefix, "
            "CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(min(n_chars) AS BIGINT) AS min_chars, "
            "CAST(max(n_chars) AS BIGINT) AS max_chars, "
            "CAST(max(n_chars) - min(n_chars) AS BIGINT) AS len_spread "
            "FROM documents GROUP BY 1 HAVING count(*) >= 2 "
            "ORDER BY n_docs DESC, prefix"),
        "last_touch_attribution": (
            "WITH e AS (SELECT user_id, ts, event_id, event_type, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type IN ('click', 'purchase')), "
            "s AS (SELECT *, "
            "last_value(CASE WHEN event_type = 'click' THEN item END "
            "IGNORE NULLS) OVER w AS last_item, "
            "last_value(CASE WHEN event_type = 'click' THEN ts END "
            "IGNORE NULLS) OVER w AS last_ts FROM e "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) "
            "SELECT last_item AS item, "
            "CAST(count(*) AS BIGINT) AS n_purchases FROM s "
            "WHERE event_type = 'purchase' AND last_ts IS NOT NULL "
            "AND epoch_us(ts) - epoch_us(last_ts) <= 86400000000 "
            "GROUP BY 1 ORDER BY n_purchases DESC, item LIMIT 20"),
        "upsert_orders": (
            "WITH base AS (SELECT o_orderkey, o_orderstatus, 1 AS v, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents "
            "FROM orders "
            "UNION ALL SELECT o_orderkey, o_orderstatus, 2 AS v, "
            "CAST(round(o_totalprice * 100) AS BIGINT) + 1000 "
            "FROM orders WHERE o_orderkey % 7 = 0), "
            "w AS (SELECT o_orderkey, o_orderstatus, cents, "
            "row_number() OVER (PARTITION BY o_orderkey "
            "ORDER BY v DESC) AS rn FROM base) "
            "SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(cents) AS BIGINT) AS revenue_cents "
            "FROM w WHERE rn = 1 GROUP BY 1 ORDER BY 1"),
        "cheapest_supplier": (
            "WITH ps AS (SELECT l_partkey, l_suppkey, "
            "min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_c "
            "FROM lineitem "
            "JOIN part p ON p.p_partkey = l_partkey "
            "AND p.p_type = 'SMALL' AND p.p_size <= 15 "
            "JOIN supplier s ON s.s_suppkey = l_suppkey "
            "JOIN nation n ON n.n_nationkey = s.s_nationkey "
            "JOIN region r ON r.r_regionkey = n.n_regionkey "
            "WHERE r.r_name = 'EUROPE' GROUP BY 1, 2), "
            "m AS (SELECT *, min(cost_c) OVER (PARTITION BY l_partkey) "
            "AS cmin FROM ps) "
            "SELECT s.s_acctbal, s.s_name, n.n_name, m.l_partkey, "
            "p.p_name, m.cost_c "
            "FROM m JOIN supplier s ON s.s_suppkey = m.l_suppkey "
            "JOIN nation n ON n.n_nationkey = s.s_nationkey "
            "JOIN part p ON p.p_partkey = m.l_partkey "
            "WHERE m.cost_c = m.cmin "
            "ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, m.l_partkey "
            "LIMIT 100"),
        "product_profit": (
            "SELECT n.n_name AS n_name, "
            "CAST(year(o.o_orderdate) AS BIGINT) AS o_year, "
            "CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) "
            "AS profit_c4 "
            "FROM lineitem l "
            "JOIN part p ON p.p_partkey = l.l_partkey "
            "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
            "JOIN nation n ON n.n_nationkey = s.s_nationkey "
            "JOIN orders o ON o.o_orderkey = l.l_orderkey "
            "WHERE p.p_name LIKE '%gear%' "
            "GROUP BY 1, 2 ORDER BY n_name, o_year DESC"),
        "important_parts": (
            "WITH pr AS (SELECT l_partkey, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) "
            "AS value_c4 FROM lineitem GROUP BY 1) "
            "SELECT l_partkey, value_c4 FROM pr "
            "WHERE value_c4 * 10000 > (SELECT sum(value_c4) FROM pr) "
            "ORDER BY value_c4 DESC, l_partkey"),
        "shipmode_priority": (
            "SELECT CAST(year(l.l_shipdate) AS BIGINT) AS ship_year, "
            "CAST(sum(CASE WHEN o.o_orderpriority IN "
            "('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) "
            "AS high_line_count, "
            "CAST(sum(CASE WHEN o.o_orderpriority IN "
            "('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) "
            "AS low_line_count "
            "FROM lineitem l JOIN orders o "
            "ON o.o_orderkey = l.l_orderkey "
            "WHERE CAST(epoch_us(l.l_shipdate) // 86400000000 AS BIGINT) "
            "- CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) "
            ">= 60 "
            "GROUP BY 1 ORDER BY 1"),
        "part_supplier_variety": (
            "WITH d AS (SELECT DISTINCT p.p_brand, p.p_type, p.p_size, "
            "l.l_suppkey FROM lineitem l "
            "JOIN part p ON p.p_partkey = l.l_partkey "
            "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
            "WHERE p.p_type <> 'PROMO' AND s.s_acctbal >= 0) "
            "SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size, "
            "CAST(count(*) AS BIGINT) AS supplier_cnt "
            "FROM d GROUP BY 1, 2, 3 "
            "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size "
            "LIMIT 40"),
        "promotion_suppliers": (
            "WITH ps AS (SELECT l_partkey, l_suppkey, "
            "CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) "
            "AS qty FROM lineitem "
            "JOIN part p ON p.p_partkey = l_partkey "
            "WHERE p.p_name LIKE '%bolt%' AND year(l_shipdate) = 1996 "
            "GROUP BY 1, 2), "
            "w AS (SELECT *, sum(qty) OVER (PARTITION BY l_partkey) "
            "AS tot FROM ps) "
            "SELECT s.s_suppkey, s.s_name, n.n_name "
            "FROM supplier s JOIN nation n "
            "ON n.n_nationkey = s.s_nationkey "
            "WHERE s.s_suppkey IN "
            "(SELECT DISTINCT l_suppkey FROM w WHERE 2 * qty > tot) "
            "ORDER BY s.s_name, s.s_suppkey"),
        "qty_price_slope": (
            "WITH b AS (SELECT p.p_brand AS p_brand, "
            "CAST(round(l_quantity) AS BIGINT) AS x, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS y "
            "FROM lineitem JOIN part p ON p.p_partkey = l_partkey), "
            "s AS (SELECT p_brand, CAST(count(*) AS HUGEINT) AS n, "
            "CAST(sum(x) AS HUGEINT) AS sx, "
            "CAST(sum(y) AS HUGEINT) AS sy, "
            "CAST(sum(x * y) AS HUGEINT) AS sxy, "
            "CAST(sum(x * x) AS HUGEINT) AS sxx "
            "FROM b GROUP BY 1) "
            "SELECT p_brand, CAST(n AS BIGINT) AS n, "
            "CAST(n * sxy - sx * sy AS VARCHAR) AS slope_num, "
            "CAST(n * sxx - sx * sx AS VARCHAR) AS slope_den "
            "FROM s ORDER BY p_brand"),
        "k_anonymity": (
            "SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, "
            "c_mktsegment, CAST(count(*) AS BIGINT) AS n "
            "FROM customer GROUP BY 1, 2 HAVING count(*) < 10 "
            "ORDER BY 1, 2"),
        "segment_ttest": (
            "WITH x AS (SELECT c_mktsegment AS seg, "
            "CAST(round(c_acctbal * 100) AS BIGINT) AS c "
            "FROM customer), "
            "s AS (SELECT seg, count(*) AS n, "
            "CAST(sum(c) AS HUGEINT) AS s, "
            "CAST(sum(c * c) AS HUGEINT) AS ss FROM x GROUP BY 1), "
            "d AS (SELECT seg, n, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) "
            "AS m, (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * "
            "CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / "
            "CAST(n - 1 AS DOUBLE) AS v FROM s) "
            "SELECT a.seg AS seg_a, b.seg AS seg_b, "
            "CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b, "
            "(a.m - b.m) / sqrt(a.v / CAST(a.n AS DOUBLE) + "
            "b.v / CAST(b.n AS DOUBLE)) AS t_stat "
            "FROM d a JOIN d b ON a.seg < b.seg "
            "ORDER BY seg_a, seg_b"),
        "event_bursts": (
            "WITH e AS (SELECT user_id, "
            "CAST(epoch_us(ts) AS BIGINT) AS t FROM events), "
            "w AS (SELECT user_id, count(*) OVER (PARTITION BY user_id "
            "ORDER BY t RANGE BETWEEN CURRENT ROW "
            "AND 60000000 FOLLOWING) AS c FROM e) "
            "SELECT CAST(user_id AS BIGINT) AS user_id, "
            "CAST(max(c) AS BIGINT) AS max_burst "
            "FROM w GROUP BY 1 ORDER BY 1"),
        "sorted_neighbor_dups": (
            "WITH t AS (SELECT doc_id, lower(text) AS lt, "
            "substr(lower(text), 1, 16) AS k FROM documents), "
            "r AS (SELECT doc_id, lt, "
            "row_number() OVER (ORDER BY k, doc_id) AS rn FROM t), "
            "p AS (SELECT a.doc_id AS left_id, b.doc_id AS right_id, "
            "a.lt AS ta, b.lt AS tb FROM r a JOIN r b "
            "ON b.rn - a.rn BETWEEN 1 AND 3), "
            "j AS (SELECT left_id, right_id, "
            "len(list_intersect("
            "list_filter(list_distinct(string_split_regex(ta, '\\s+')), "
            "x -> x <> ''), "
            "list_filter(list_distinct(string_split_regex(tb, '\\s+')), "
            "x -> x <> ''))) AS c, "
            "len(list_filter(list_distinct(string_split_regex(ta, "
            "'\\s+')), x -> x <> '')) AS na, "
            "len(list_filter(list_distinct(string_split_regex(tb, "
            "'\\s+')), x -> x <> '')) AS nb FROM p) "
            "SELECT left_id, right_id, CAST(c AS BIGINT) AS n_common "
            "FROM j WHERE c > 0 AND 2 * c >= na + nb - c "
            "ORDER BY 1, 2"),
        "winsorized_chars": (
            "WITH c AS (SELECT lang, CAST(n_chars AS BIGINT) AS v "
            "FROM documents), "
            "r AS (SELECT lang, v, "
            "row_number() OVER (PARTITION BY lang ORDER BY v) AS rn, "
            "count(*) OVER (PARTITION BY lang) AS n FROM c), "
            "cuts AS (SELECT lang, CAST(max(n) AS BIGINT) AS n, "
            "max(CASE WHEN rn = (n * 5 + 99) // 100 THEN v END) "
            "AS lo_cut, "
            "max(CASE WHEN rn = (n * 95 + 99) // 100 THEN v END) "
            "AS hi_cut FROM r GROUP BY 1) "
            "SELECT c.lang, cuts.n, cuts.lo_cut, cuts.hi_cut, "
            "CAST(sum(least(greatest(c.v, cuts.lo_cut), cuts.hi_cut)) "
            "AS BIGINT) AS win_sum "
            "FROM c JOIN cuts ON cuts.lang = c.lang "
            "GROUP BY 1, 2, 3, 4 ORDER BY 1"),
        "assoc_rules": (
            "WITH ui AS (SELECT DISTINCT user_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'view'), "
            "ic AS (SELECT item, CAST(count(*) AS BIGINT) AS c "
            "FROM ui GROUP BY 1), "
            "p AS (SELECT a.item AS item_a, b.item AS item_b, "
            "CAST(count(*) AS BIGINT) AS n_both FROM ui a "
            "JOIN ui b ON a.user_id = b.user_id AND a.item < b.item "
            "GROUP BY 1, 2), "
            "top AS (SELECT * FROM p "
            "ORDER BY n_both DESC, item_a, item_b LIMIT 50) "
            "SELECT t.item_a, t.item_b, t.n_both, "
            "ia.c AS n_a, ib.c AS n_b, "
            "CAST((1000000 * t.n_both) // ia.c AS BIGINT) "
            "AS conf_ab_ppm, "
            "CAST((1000000 * t.n_both) // ib.c AS BIGINT) "
            "AS conf_ba_ppm "
            "FROM top t JOIN ic ia ON ia.item = t.item_a "
            "JOIN ic ib ON ib.item = t.item_b "
            "ORDER BY t.n_both DESC, t.item_a, t.item_b"),
        "geo_mean_chars": (
            "WITH c AS (SELECT lang, CAST(n_chars AS BIGINT) AS v "
            "FROM documents WHERE n_chars >= 1), "
            "s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CAST(floor(ln(CAST(v AS DOUBLE)) * 1e9 + 0.5) "
            "AS BIGINT)) AS BIGINT) AS sum_ln_nano FROM c GROUP BY 1) "
            "SELECT lang, n, sum_ln_nano, "
            "CAST(floor(exp(CAST(sum_ln_nano AS DOUBLE) / 1e9 "
            "/ CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS gm_micro "
            "FROM s ORDER BY lang"),
        "time_weighted_value": (
            "WITH o AS (SELECT user_id, "
            "CAST(round(value * 100) AS BIGINT) AS cents, "
            "epoch_us(ts) AS t, "
            "lead(epoch_us(ts)) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS nt FROM events), "
            "i AS (SELECT user_id, cents, (nt - t) // 1000000 AS dt "
            "FROM o WHERE nt IS NOT NULL), "
            "g AS (SELECT user_id, CAST(count(*) AS BIGINT) "
            "AS n_intervals, CAST(sum(dt) AS BIGINT) AS sum_dt_sec, "
            "CAST(sum(cents * dt) AS BIGINT) AS num FROM i "
            "GROUP BY 1) "
            "SELECT user_id, n_intervals, sum_dt_sec, "
            "CAST((100 * num) // sum_dt_sec AS BIGINT) AS twa_centi "
            "FROM g WHERE sum_dt_sec > 0 ORDER BY user_id"),
        "bounce_rate": (
            "WITH o AS (SELECT user_id, event_type, ts, event_id, "
            "lag(ts) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS pts FROM events), "
            "m AS (SELECT *, CASE WHEN pts IS NULL OR "
            "epoch_us(ts) - epoch_us(pts) > 1800000000 "
            "THEN 1 ELSE 0 END AS is_new FROM o), "
            "s AS (SELECT user_id, event_type, "
            "sum(is_new) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS rn FROM m), "
            "g AS (SELECT user_id, sid, "
            "CAST(count(*) AS BIGINT) AS ne, "
            "arg_min(event_type, rn) AS entry_type FROM s "
            "GROUP BY 1, 2) "
            "SELECT entry_type, CAST(count(*) AS BIGINT) AS n_sessions, "
            "CAST(sum(CASE WHEN ne = 1 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_bounces, "
            "CAST((1000000 * sum(CASE WHEN ne = 1 THEN 1 ELSE 0 END)) "
            "// count(*) AS BIGINT) AS bounce_ppm "
            "FROM g GROUP BY 1 ORDER BY 1"),
        "vocab_jaccard_langs": (
            "WITH v AS (SELECT DISTINCT lang, tok FROM ("
            "SELECT lang, unnest(regexp_extract_all(lower(text), "
            "'\\S+')) AS tok FROM documents)), "
            "c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n "
            "FROM v GROUP BY 1), "
            "p AS (SELECT a.lang AS la, b.lang AS lb, "
            "CAST(count(*) AS BIGINT) AS cmn FROM v a "
            "JOIN v b ON a.tok = b.tok AND a.lang < b.lang "
            "GROUP BY 1, 2) "
            "SELECT p.la AS lang_a, p.lb AS lang_b, "
            "ca.n AS n_a, cb.n AS n_b, p.cmn AS n_common, "
            "CAST((1000000 * p.cmn) // (ca.n + cb.n - p.cmn) "
            "AS BIGINT) AS jaccard_ppm "
            "FROM p JOIN c ca ON ca.lang = p.la "
            "JOIN c cb ON cb.lang = p.lb ORDER BY 1, 2"),
        "score_calibration": (
            "WITH o AS (SELECT "
            "CAST(round(value * 100) AS BIGINT) AS c, event_id, "
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p "
            "FROM events), "
            "b AS (SELECT ntile(10) OVER (ORDER BY c, event_id) "
            "AS bin, p FROM o) "
            "SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n, "
            "CAST(sum(p) AS BIGINT) AS n_pos, "
            "CAST((1000000 * sum(p)) // count(*) AS BIGINT) "
            "AS pos_rate_ppm FROM b GROUP BY 1 ORDER BY 1"),
        "cross_source_dups": (
            "WITH v AS (SELECT DISTINCT source, "
            "md5(substr(text, 1, 200)) AS h FROM documents), "
            "c AS (SELECT source, CAST(count(*) AS BIGINT) AS n "
            "FROM v GROUP BY 1), "
            "p AS (SELECT a.source AS sa, b.source AS sb, "
            "CAST(count(*) AS BIGINT) AS cmn FROM v a "
            "JOIN v b ON a.h = b.h AND a.source < b.source "
            "GROUP BY 1, 2) "
            "SELECT p.sa AS source_a, p.sb AS source_b, "
            "ca.n AS n_a, cb.n AS n_b, p.cmn AS n_common, "
            "CAST((1000000 * p.cmn) // (ca.n + cb.n - p.cmn) "
            "AS BIGINT) AS jaccard_ppm "
            "FROM p JOIN c ca ON ca.source = p.sa "
            "JOIN c cb ON cb.source = p.sb ORDER BY 1, 2"),
        "user_recs": (
            "WITH ui AS (SELECT DISTINCT user_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'view'), "
            "pairs AS (SELECT a.item AS ia, b.item AS ib, "
            "count(*) AS c FROM ui a JOIN ui b "
            "ON a.user_id = b.user_id AND a.item < b.item "
            "GROUP BY 1, 2), "
            "d AS (SELECT ia AS item, ib AS nbr, c FROM pairs "
            "UNION ALL SELECT ib, ia, c FROM pairs), "
            "nb AS (SELECT item, nbr, c FROM (SELECT item, nbr, c, "
            "row_number() OVER (PARTITION BY item "
            "ORDER BY c DESC, nbr) AS rnk FROM d) WHERE rnk <= 5), "
            "cand AS (SELECT u.user_id, nb.nbr AS item, "
            "CAST(sum(nb.c) AS BIGINT) AS score FROM ui u "
            "JOIN nb ON nb.item = u.item GROUP BY 1, 2), "
            "unseen AS (SELECT c.* FROM cand c "
            "LEFT JOIN ui s ON s.user_id = c.user_id "
            "AND s.item = c.item WHERE s.item IS NULL), "
            "r AS (SELECT user_id, item, score, "
            "CAST(row_number() OVER (PARTITION BY user_id "
            "ORDER BY score DESC, item) AS BIGINT) AS rnk "
            "FROM unseen) "
            "SELECT user_id, rnk, item, score FROM r WHERE rnk <= 3 "
            "ORDER BY user_id, rnk"),
        "embedding_dim_median": (
            "WITH q AS (SELECT CAST(t.i + 1 AS BIGINT) AS dim, "
            "CAST(round(CAST(embedding[CAST(t.i AS INTEGER) + 1] "
            "AS DOUBLE) * 1000000) AS BIGINT) AS v "
            "FROM embeddings, range(64) t(i)), "
            "c AS (SELECT dim, v, CAST(count(*) AS BIGINT) AS w "
            "FROM q GROUP BY 1, 2), "
            "s AS (SELECT dim, v, "
            "sum(w) OVER (PARTITION BY dim ORDER BY v) AS cw, "
            "sum(w) OVER (PARTITION BY dim) AS tot FROM c) "
            "SELECT dim, CAST(min(tot) AS BIGINT) AS n, "
            "CAST(min(v) AS BIGINT) AS median_micro FROM s "
            "WHERE 2 * cw >= tot GROUP BY dim ORDER BY dim"),
        "improving_users": (
            "WITH p AS (SELECT user_id, "
            "epoch_us(ts) // 604800000000 AS wk, "
            "CAST(count(*) AS BIGINT) AS c FROM events "
            "WHERE event_type = 'purchase' GROUP BY 1, 2), "
            "w AS (SELECT user_id, wk, c, "
            "lag(c) OVER (PARTITION BY user_id ORDER BY wk) AS pc "
            "FROM p), "
            "g AS (SELECT user_id, CAST(count(*) AS BIGINT) "
            "AS n_weeks, CAST(arg_min(c, wk) AS BIGINT) AS first_cnt, "
            "CAST(arg_max(c, wk) AS BIGINT) AS last_cnt, "
            "bool_and(pc IS NULL OR c >= pc) AS ok FROM w GROUP BY 1) "
            "SELECT user_id, n_weeks, first_cnt, last_cnt FROM g "
            "WHERE ok AND n_weeks >= 3 ORDER BY user_id"),
        "revenue_changepoint": (
            "WITH d AS (SELECT "
            "epoch_us(o_orderdate) // 86400000000 AS day, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS cents FROM orders GROUP BY 1), "
            "s AS (SELECT day, cents, "
            "row_number() OVER (ORDER BY day) AS k, "
            "sum(cents) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) "
            "AS p, count(*) OVER () AS n, sum(cents) OVER () AS tot "
            "FROM d), "
            "v AS (SELECT day, k, n, "
            "abs(CAST(n AS HUGEINT) * p - CAST(k AS HUGEINT) * tot) "
            "AS val FROM s) "
            "SELECT CAST(day AS BIGINT) AS day, CAST(k AS BIGINT) AS k, "
            "CAST(n AS BIGINT) AS n_days, "
            "CAST(val AS BIGINT) AS cusum_abs FROM v "
            "ORDER BY val DESC, k LIMIT 1"),
        "source_ttr": (
            "WITH w AS (SELECT source, "
            "unnest(regexp_extract_all(lower(text), '\\S+')) AS tok "
            "FROM documents), "
            "g AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c "
            "FROM w GROUP BY 1, 2) "
            "SELECT source, CAST(count(*) AS BIGINT) AS n_types, "
            "CAST(sum(c) AS BIGINT) AS n_tokens, "
            "CAST(sum(length(tok) * c) AS BIGINT) AS sum_chars, "
            "CAST((1000000 * count(*)) // sum(c) AS BIGINT) AS ttr_ppm "
            "FROM g GROUP BY 1 ORDER BY 1"),
        "trailing_spend": (
            "WITH p AS (SELECT event_id, user_id, ts, "
            "CAST(round(value * 100) AS BIGINT) AS cents FROM events "
            "WHERE event_type = 'purchase') "
            "SELECT event_id, user_id, "
            "CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) "
            "AS BIGINT) AS spend_1h_c FROM p ORDER BY event_id"),
        "merge_orders": (
            "WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS s, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS c "
            "FROM orders), "
            "kept AS (SELECT k, s, CASE WHEN k % 11 = 0 THEN c + 1000 "
            "ELSE c END AS c FROM base WHERE k % 13 <> 0), "
            "ins AS (SELECT k + 1000000000 AS k, 'N' AS s, "
            "CAST(5000 AS BIGINT) AS c FROM base WHERE k % 17 = 0), "
            "m AS (SELECT * FROM kept UNION ALL SELECT * FROM ins) "
            "SELECT s AS o_orderstatus, "
            "CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(c) AS BIGINT) AS revenue_cents FROM m "
            "GROUP BY 1 ORDER BY 1"),
        "smb_join_revenue": (
            "SELECT c.c_mktsegment, "
            "CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS revenue_cents "
            "FROM orders o JOIN customer c "
            "ON o.o_custkey = c.c_custkey "
            "GROUP BY 1 ORDER BY 1"),
        "rapid_reorders": (
            "WITH o AS (SELECT o_custkey AS custkey, o_orderkey, "
            "o_orderdate, lag(o_orderdate) OVER (PARTITION BY "
            "o_custkey ORDER BY o_orderdate, o_orderkey) AS pd "
            "FROM orders), "
            "g AS (SELECT custkey, CAST(count(*) AS BIGINT) "
            "AS n_orders, CAST(sum(CASE WHEN pd IS NOT NULL AND "
            "epoch_us(o_orderdate) - epoch_us(pd) <= 86400000000 "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_rapid FROM o "
            "GROUP BY 1) "
            "SELECT custkey, n_orders, n_rapid FROM g "
            "WHERE n_rapid >= 1 ORDER BY custkey"),
        "item_abandonment": (
            "WITH u AS (SELECT DISTINCT "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item, "
            "event_type AS etype, user_id FROM events "
            "WHERE event_type IN ('view', 'purchase')), "
            "g AS (SELECT item, "
            "CAST(sum(CASE WHEN etype = 'view' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS viewers, "
            "CAST(sum(CASE WHEN etype = 'purchase' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS buyers FROM u GROUP BY 1) "
            "SELECT item, viewers, buyers, "
            "CAST((1000000 * buyers) // viewers AS BIGINT) AS conv_ppm "
            "FROM g WHERE viewers > 0 ORDER BY item"),
        "events_grouping_sets": (
            "SELECT COALESCE(event_type, 'ALL') AS etype, "
            "COALESCE(h, -1) AS hour, count(*) AS n FROM ("
            "SELECT event_type, "
            "CAST(extract(hour FROM ts) AS BIGINT) AS h FROM events) "
            "GROUP BY GROUPING SETS ((event_type), (h), "
            "(event_type, h), ()) ORDER BY 1, 2"),
        "weekday_revenue": (
            "SELECT CAST(isodow(o_orderdate) AS BIGINT) AS isodow, "
            "count(*) AS n_orders, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS revenue_cents FROM orders "
            "GROUP BY 1 ORDER BY 1"),
        "fim_split": (
            "WITH d AS (SELECT doc_id, text, length(text) AS n "
            "FROM documents WHERE length(text) >= 3), "
            "c AS (SELECT doc_id, text, n, "
            "CAST(CAST(concat('0x', substr(md5(concat(CAST(doc_id "
            "AS VARCHAR), ':1')), 1, 8)) AS UBIGINT) "
            "% CAST(n - 1 AS UBIGINT) + 1 AS BIGINT) AS a, "
            "CAST(CAST(concat('0x', substr(md5(concat(CAST(doc_id "
            "AS VARCHAR), ':2')), 1, 8)) AS UBIGINT) "
            "% CAST(n - 1 AS UBIGINT) + 1 AS BIGINT) AS b FROM d), "
            "p AS (SELECT doc_id, text, n, least(a, b) AS p1, "
            "greatest(a, b) AS p2 FROM c) "
            "SELECT doc_id, CAST(n AS BIGINT) AS n_chars, p1, p2, "
            "md5(concat(substr(text, p2 + 1), substr(text, 1, p1), "
            "substr(text, p1 + 1, p2 - p1))) AS spm_md5 "
            "FROM p ORDER BY doc_id"),
        "exact_median_price": (
            "WITH v AS (SELECT CAST(round(l_extendedprice * 100) "
            "AS BIGINT) AS c FROM lineitem), "
            "n AS (SELECT CAST(count(*) AS BIGINT) AS n, "
            "CAST((count(*) + 1) // 2 AS BIGINT) AS k FROM v) "
            "SELECT n.n, n.k, (SELECT c FROM v ORDER BY c "
            "LIMIT 1 OFFSET (SELECT k - 1 FROM n)) AS median_cents "
            "FROM n"),
        "linear_attribution": (
            "WITH e AS (SELECT user_id, ts, event_id, event_type, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS rn FROM events "
            "WHERE event_type IN ('click', 'purchase')), "
            "p AS (SELECT user_id, ts, rn FROM e "
            "WHERE event_type = 'purchase'), "
            "c AS (SELECT user_id, ts, rn, item FROM e "
            "WHERE event_type = 'click'), "
            "j AS (SELECT p.user_id, p.rn AS prn, c.item FROM p "
            "JOIN c ON c.user_id = p.user_id AND c.rn < p.rn "
            "AND epoch_us(p.ts) - epoch_us(c.ts) <= 86400000000), "
            "g AS (SELECT item, 1000000 // (count(*) OVER "
            "(PARTITION BY user_id, prn)) AS cr FROM j), "
            "a AS (SELECT item, CAST(count(*) AS BIGINT) "
            "AS n_touches, CAST(sum(cr) AS BIGINT) AS credit_ppm "
            "FROM g GROUP BY 1) "
            "SELECT item, n_touches, credit_ppm FROM a "
            "ORDER BY credit_ppm DESC, item LIMIT 20"),
        "dp_lang_counts": (
            "WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n "
            "FROM documents GROUP BY 1), "
            "u AS (SELECT lang, n, (CAST(CAST(concat('0x', "
            "substr(md5(concat('dp:', lang)), 1, 8)) AS UBIGINT) "
            "AS DOUBLE) + 0.5) / 4294967296.0 AS uu FROM c), "
            "s AS (SELECT lang, n, uu - 0.5 AS sv FROM u) "
            "SELECT lang, n AS n_true, "
            "CAST(floor(CAST(n AS DOUBLE) + "
            "(-1.0 * (CASE WHEN sv >= 0 THEN 1.0 ELSE -1.0 END) * "
            "ln(1.0 - 2.0 * abs(sv)))) AS BIGINT) AS n_dp "
            "FROM s ORDER BY lang"),
        "event_debounce": (
            "WITH RECURSIVE e AS (SELECT user_id, event_type, "
            "event_id, epoch_us(ts) AS t, row_number() OVER "
            "(PARTITION BY user_id, event_type ORDER BY ts, event_id) "
            "AS rn FROM events), "
            "k AS (SELECT user_id, event_type, event_id, t, rn "
            "FROM e WHERE rn = 1 "
            "UNION ALL "
            "SELECT n1.user_id, n1.event_type, n1.event_id, n1.t, "
            "n1.rn FROM k JOIN e n1 ON n1.user_id = k.user_id "
            "AND n1.event_type = k.event_type AND n1.rn > k.rn "
            "AND n1.t >= k.t + 86400000000 "
            "WHERE NOT EXISTS (SELECT 1 FROM e n2 "
            "WHERE n2.user_id = n1.user_id "
            "AND n2.event_type = n1.event_type AND n2.rn > k.rn "
            "AND n2.t >= k.t + 86400000000 AND n2.rn < n1.rn)) "
            "SELECT user_id, event_type, event_id, t AS ts_us "
            "FROM k ORDER BY user_id, event_type, ts_us"),
        "link_prediction": (
            "WITH ui AS (SELECT DISTINCT user_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'view'), "
            "pairs AS (SELECT a.item AS ia, b.item AS ib, "
            "count(*) AS n FROM ui a JOIN ui b "
            "ON a.user_id = b.user_id AND a.item < b.item "
            "GROUP BY 1, 2), "
            "edges AS (SELECT ia, ib FROM pairs WHERE n >= 2), "
            "adj AS (SELECT ia AS node, ib AS nbr FROM edges "
            "UNION ALL SELECT ib, ia FROM edges), "
            "w AS (SELECT node, CAST(floor(1000000000.0 / "
            "ln(CAST(count(*) AS DOUBLE)) + 0.5) AS BIGINT) AS wn "
            "FROM adj GROUP BY 1), "
            "wedge AS (SELECT a.nbr AS x, b.nbr AS y, w.wn FROM adj a "
            "JOIN adj b ON a.node = b.node AND a.nbr < b.nbr "
            "JOIN w ON w.node = a.node), "
            "cand AS (SELECT x, y, CAST(sum(wn) AS BIGINT) "
            "AS score_nano, CAST(count(*) AS BIGINT) AS n_common "
            "FROM wedge GROUP BY 1, 2), "
            "nonedge AS (SELECT c.* FROM cand c LEFT JOIN edges e "
            "ON e.ia = c.x AND e.ib = c.y WHERE e.ia IS NULL) "
            "SELECT x AS item_a, y AS item_b, n_common, score_nano "
            "FROM nonedge ORDER BY score_nano DESC, item_a, item_b "
            "LIMIT 20"),
        "revenue_trend_mk": (
            "WITH d AS (SELECT CAST(epoch_us(o_orderdate) // "
            "86400000000 AS BIGINT) AS day, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS rev_c FROM orders GROUP BY 1), "
            "p AS (SELECT b.day - a.day AS dx, b.rev_c - a.rev_c AS dy "
            "FROM d a JOIN d b ON b.day > a.day) "
            "SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_days, "
            "CAST(count(*) AS BIGINT) AS n_pairs, "
            "CAST(sum(CASE WHEN dy > 0 THEN 1 WHEN dy < 0 THEN -1 "
            "ELSE 0 END) AS BIGINT) AS s_stat, "
            "quantile_disc(CAST(dy AS DOUBLE) / dx, 0.5) AS theil_sen "
            "FROM p"),
        "revenue_ewma": (
            "WITH RECURSIVE d AS (SELECT CAST(epoch_us(o_orderdate) // "
            "86400000000 AS BIGINT) AS day, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS rev_c FROM orders GROUP BY 1), "
            "r AS (SELECT row_number() OVER (ORDER BY day) AS rn, "
            "day, rev_c FROM d), "
            "s AS (SELECT rn, day, rev_c, CAST(rev_c AS DOUBLE) AS ewma "
            "FROM r WHERE rn = 1 "
            "UNION ALL "
            "SELECT r.rn, r.day, r.rev_c, "
            "0.2 * CAST(r.rev_c AS DOUBLE) + 0.8 * s.ewma "
            "FROM s JOIN r ON r.rn = s.rn + 1) "
            "SELECT day, rev_c, ewma FROM s"),
        "event_trigrams": (
            "WITH s AS (SELECT user_id, event_type, "
            "lead(event_type, 1) OVER w AS t2, "
            "lead(event_type, 2) OVER w AS t3 FROM events "
            "WINDOW w AS (PARTITION BY user_id "
            "ORDER BY ts, event_id)) "
            "SELECT event_type AS t1, t2, t3, "
            "CAST(count(*) AS BIGINT) AS n FROM s "
            "WHERE t3 IS NOT NULL GROUP BY 1, 2, 3 "
            "ORDER BY t1, t2, t3"),
        "ltv_cohort_curve": (
            "WITH fw AS (SELECT user_id, min(CAST(epoch_us(ts) // "
            "604800000000 AS BIGINT)) AS cw FROM events GROUP BY 1), "
            "p AS (SELECT user_id, CAST(epoch_us(ts) // 604800000000 "
            "AS BIGINT) AS w, CAST(round(value * 100) AS BIGINT) AS c "
            "FROM events WHERE event_type = 'purchase'), "
            "cell AS (SELECT fw.cw AS cohort_week, p.w - fw.cw "
            "AS age_week, CAST(sum(p.c) AS BIGINT) AS rev_c "
            "FROM p JOIN fw ON p.user_id = fw.user_id GROUP BY 1, 2) "
            "SELECT cohort_week, age_week, rev_c, "
            "CAST(sum(rev_c) OVER (PARTITION BY cohort_week "
            "ORDER BY age_week) AS BIGINT) AS cum_rev_c FROM cell "
            "ORDER BY cohort_week, age_week"),
        "lang_chars_moments": (
            "WITH s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n, "
            "sum(CAST(n_chars AS HUGEINT)) AS s1, "
            "sum(CAST(n_chars AS HUGEINT) * n_chars) AS s2, "
            "sum(CAST(n_chars AS HUGEINT) * n_chars * n_chars) AS s3, "
            "sum(CAST(n_chars AS HUGEINT) * n_chars * n_chars "
            "* n_chars) AS s4 FROM documents GROUP BY 1), "
            "m AS (SELECT lang, n, CAST(s1 AS DOUBLE) / n AS mean, "
            "CAST(s2 AS DOUBLE) / n AS r2, "
            "CAST(s3 AS DOUBLE) / n AS r3, "
            "CAST(s4 AS DOUBLE) / n AS r4 FROM s), "
            "mm AS (SELECT lang, n, mean, r2 - mean * mean AS m2, "
            "r3 - 3.0 * mean * r2 + 2.0 * mean * mean * mean AS m3, "
            "r4 - 4.0 * mean * r3 + 6.0 * mean * mean * r2 "
            "- 3.0 * mean * mean * mean * mean AS m4 FROM m) "
            "SELECT lang, n AS n_docs, mean AS mean_chars, "
            "m2 AS var_chars, m3 / (sqrt(m2) * m2) AS skew_chars, "
            "m4 / (m2 * m2) - 3.0 AS kurt_chars FROM mm "
            "ORDER BY lang"),
        "degree_assortativity": (
            "WITH ui AS (SELECT DISTINCT user_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'view'), "
            "pairs AS (SELECT a.item AS ia, b.item AS ib, "
            "count(*) AS cnt FROM ui a JOIN ui b "
            "ON a.user_id = b.user_id AND a.item < b.item "
            "GROUP BY 1, 2), "
            "edges AS (SELECT ia, ib FROM pairs WHERE cnt >= 2), "
            "adj AS (SELECT ia AS node, ib AS nbr FROM edges "
            "UNION ALL SELECT ib, ia FROM edges), "
            "deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d "
            "FROM adj GROUP BY 1), "
            "de AS (SELECT da.d AS x, db.d AS y FROM adj a "
            "JOIN deg da ON da.node = a.node "
            "JOIN deg db ON db.node = a.nbr), "
            "s AS (SELECT CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(x) AS BIGINT) AS sx, "
            "CAST(sum(y) AS BIGINT) AS sy, "
            "CAST(sum(x * x) AS BIGINT) AS sxx, "
            "CAST(sum(y * y) AS BIGINT) AS syy, "
            "CAST(sum(x * y) AS BIGINT) AS sxy FROM de) "
            "SELECT n // 2 AS n_edges, "
            "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / "
            "sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) "
            "* (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) "
            "AS assortativity FROM s"),
        "scd2_history": (
            "WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'purchase'), "
            "o AS (SELECT user_id, t, item, lag(item) OVER "
            "(PARTITION BY user_id ORDER BY t, event_id) AS pit "
            "FROM p), "
            "ch AS (SELECT user_id, item, t FROM o "
            "WHERE pit IS NULL OR pit <> item) "
            "SELECT user_id, item, t AS valid_from_us, "
            "coalesce(lead(t) OVER (PARTITION BY user_id ORDER BY t), "
            "-1) AS valid_to_us FROM ch "
            "ORDER BY user_id, valid_from_us"),
        "event_rle": (
            "WITH o AS (SELECT user_id, event_type, "
            "lag(event_type) OVER w AS pt, row_number() OVER w AS rn "
            "FROM events WINDOW w AS (PARTITION BY user_id "
            "ORDER BY ts, event_id)), "
            "f AS (SELECT user_id, rn, CASE WHEN pt IS NULL OR "
            "pt <> event_type THEN 1 ELSE 0 END AS st FROM o), "
            "g AS (SELECT user_id, rn, sum(st) OVER "
            "(PARTITION BY user_id ORDER BY rn) AS run_id FROM f), "
            "r AS (SELECT user_id, run_id, CAST(count(*) AS BIGINT) "
            "AS rl FROM g GROUP BY 1, 2) "
            "SELECT user_id, CAST(sum(rl) AS BIGINT) AS n_events, "
            "CAST(count(*) AS BIGINT) AS n_runs, "
            "CAST(max(rl) AS BIGINT) AS longest_run, "
            "CAST((1000000 * count(*)) // sum(rl) AS BIGINT) "
            "AS ratio_ppm FROM r GROUP BY 1 ORDER BY 1"),
        "media_dimensions": (
            "WITH r AS (SELECT doc_id, 'https://media.example/' || "
            "doc_id || '/img-0.png' AS media_ref FROM documents), "
            "d AS (SELECT doc_id, media_ref, "
            "CAST(concat('0x', substr(md5(media_ref), 1, 2)) "
            "AS INTEGER) AS b0, "
            "CAST(concat('0x', substr(md5(media_ref), 3, 2)) "
            "AS INTEGER) AS b1 FROM r) "
            "SELECT doc_id, media_ref, "
            "CAST(64 + b0 % 192 AS BIGINT) AS width, "
            "CAST(64 + b1 % 192 AS BIGINT) AS height, "
            "CAST(8 AS BIGINT) AS bit_depth, "
            "CAST(2 AS BIGINT) AS color_type FROM d ORDER BY doc_id"),
        "zonemap_prune": (
            "SELECT o_orderpriority AS priority, "
            "CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS revenue_cents FROM orders "
            "WHERE epoch_us(o_orderdate) // 86400000000 >= 10286 "
            "AND epoch_us(o_orderdate) // 86400000000 < 10317 "
            "GROUP BY 1 ORDER BY 1"),
        "funnel_1h": (
            "WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t "
            "FROM events), "
            "p AS (SELECT user_id, t FROM e "
            "WHERE event_type = 'purchase'), "
            "c AS (SELECT user_id, t FROM e "
            "WHERE event_type = 'click'), "
            "v AS (SELECT user_id, t FROM e "
            "WHERE event_type = 'view'), "
            "okc AS (SELECT c.user_id, c.t FROM c "
            "WHERE EXISTS (SELECT 1 FROM v "
            "WHERE v.user_id = c.user_id AND v.t < c.t "
            "AND c.t - v.t <= 3600000000)), "
            "ap AS (SELECT p.user_id, p.t FROM p "
            "WHERE EXISTS (SELECT 1 FROM okc "
            "WHERE okc.user_id = p.user_id AND okc.t < p.t "
            "AND p.t - okc.t <= 3600000000)) "
            "SELECT pu.user_id, pu.np AS n_purchases, "
            "coalesce(au.na, 0) AS n_attributed "
            "FROM (SELECT user_id, CAST(count(*) AS BIGINT) AS np "
            "FROM p GROUP BY 1) pu "
            "LEFT JOIN (SELECT user_id, CAST(count(*) AS BIGINT) "
            "AS na FROM ap GROUP BY 1) au USING (user_id) "
            "ORDER BY user_id"),
        "kcore_items": (
            "WITH RECURSIVE ui AS (SELECT DISTINCT user_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'view'), "
            "prs AS (SELECT a.item AS ia, b.item AS ib, count(*) AS n "
            "FROM ui a JOIN ui b ON a.user_id = b.user_id "
            "AND a.item < b.item GROUP BY 1, 2), "
            "edges AS (SELECT ia, ib FROM prs WHERE n >= 2), "
            "core AS (SELECT 0 AS rnd, ia AS node, ib AS nbr "
            "FROM edges UNION ALL SELECT 0, ib, ia FROM edges "
            "UNION ALL "
            "SELECT rnd, node, nbr FROM ("
            "WITH sel AS (SELECT rnd + 1 AS rnd, node, nbr, "
            "count(*) OVER (PARTITION BY node) AS dn FROM core), "
            "pairk AS (SELECT any_value(rnd) AS rnd, "
            "least(node, nbr) AS a, greatest(node, nbr) AS b, "
            "min(dn) AS md FROM sel GROUP BY 2, 3), "
            "surv AS (SELECT rnd, a AS node, b AS nbr FROM pairk "
            "WHERE md >= 5 UNION ALL SELECT rnd, b, a FROM pairk "
            "WHERE md >= 5) "
            "SELECT rnd, node, nbr FROM surv "
            "WHERE (SELECT count(*) FROM surv) "
            "< (SELECT count(*) FROM sel))), "
            "last AS (SELECT node, nbr FROM core "
            "WHERE rnd = (SELECT max(rnd) FROM core)), "
            "fin AS (SELECT node, nbr, count(*) OVER "
            "(PARTITION BY node) AS dn FROM last), "
            "fp AS (SELECT least(node, nbr) AS a, "
            "greatest(node, nbr) AS b, min(dn) AS md FROM fin "
            "GROUP BY 1, 2), "
            "fs AS (SELECT a AS node FROM fp WHERE md >= 5 "
            "UNION ALL SELECT b FROM fp WHERE md >= 5) "
            "SELECT node AS item, CAST(count(*) AS BIGINT) "
            "AS core_degree FROM fs GROUP BY 1 ORDER BY 1"),
        "mutual_nn": (
            "WITH scored AS (SELECT a.vec_id AS s, b.vec_id AS t, "
            "list_cosine_similarity(a.embedding, b.embedding) AS sc "
            "FROM embeddings a JOIN embeddings b "
            "ON a.vec_id <> b.vec_id), "
            "top1 AS (SELECT s, t FROM (SELECT s, t, row_number() "
            "OVER (PARTITION BY s ORDER BY sc DESC, t) AS rn "
            "FROM scored) WHERE rn = 1) "
            "SELECT x.s AS vec_a, x.t AS vec_b FROM top1 x "
            "JOIN top1 y ON x.s = y.t AND x.t = y.s AND x.s < x.t "
            "ORDER BY 1, 2"),
        "monthly_seasonality": (
            "WITH m AS (SELECT CAST(year(o_orderdate) * 12 "
            "+ month(o_orderdate) - 1 AS BIGINT) AS month_bucket, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS rev_c FROM orders GROUP BY 1), "
            "w AS (SELECT month_bucket, rev_c, "
            "CAST(sum(rev_c) OVER win AS BIGINT) AS s, "
            "CAST(count(*) OVER win AS BIGINT) AS c FROM m "
            "WINDOW win AS (ORDER BY month_bucket "
            "ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING)) "
            "SELECT month_bucket, rev_c, (2 * s + 12) // 24 AS ma12_c, "
            "(1000000 * rev_c) // ((2 * s + 12) // 24) AS index_ppm "
            "FROM w WHERE c = 12 ORDER BY month_bucket"),
        "assoc_triples": (
            "WITH ui AS (SELECT DISTINCT user_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'view'), "
            "tri AS (SELECT a.item AS item_a, b.item AS item_b, "
            "c.item AS item_c, CAST(count(*) AS BIGINT) AS n_users "
            "FROM ui a JOIN ui b ON a.user_id = b.user_id "
            "AND a.item < b.item JOIN ui c "
            "ON a.user_id = c.user_id AND b.item < c.item "
            "GROUP BY 1, 2, 3) "
            "SELECT item_a, item_b, item_c, n_users FROM tri "
            "ORDER BY n_users DESC, item_a, item_b, item_c LIMIT 30"),
        "jaccard_histogram": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            ngrams AS (
              SELECT DISTINCT doc_id, ng FROM (
                SELECT doc_id,
                       unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                               for i in range(1, greatest(len(ws) - 1, 1))])
                       AS ng
                FROM toks)),
            df AS (SELECT ng, count(*) AS c FROM ngrams GROUP BY ng),
            surv AS (SELECT n.doc_id, n.ng FROM ngrams n
                     JOIN df USING (ng) WHERE df.c <= 32),
            sizes AS (SELECT doc_id, count(*) AS sz FROM surv
                      GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                     count(*) AS n_common
              FROM surv a JOIN surv b
                ON a.ng = b.ng AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            scored AS (
              SELECT round(i.n_common / (sa.sz + sb.sz - i.n_common), 6)
                       AS j
              FROM inter i JOIN sizes sa ON sa.doc_id = i.left_id
                           JOIN sizes sb ON sb.doc_id = i.right_id
              WHERE i.n_common / (sa.sz + sb.sz - i.n_common) >= 0.1)
            SELECT CAST(floor(j * 10) AS BIGINT) AS bin,
                   CAST(count(*) AS BIGINT) AS n_pairs
            FROM scored GROUP BY 1 ORDER BY 1""",
        "survival_km": (
            "WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t "
            "FROM events), "
            "fv AS (SELECT user_id, min(t) AS tv FROM e "
            "WHERE event_type = 'view' GROUP BY 1), "
            "fp AS (SELECT e.user_id, min(e.t) AS tp FROM e "
            "JOIN fv USING (user_id) WHERE e.event_type = 'purchase' "
            "AND e.t >= fv.tv GROUP BY 1), "
            "le AS (SELECT user_id, max(t) AS tl FROM e GROUP BY 1), "
            "du AS (SELECT fv.user_id, CASE WHEN fp.tp IS NOT NULL "
            "THEN (fp.tp - fv.tv) // 86400000000 "
            "ELSE (le.tl - fv.tv) // 86400000000 END AS d, "
            "CASE WHEN fp.tp IS NOT NULL THEN 1 ELSE 0 END AS ev "
            "FROM fv JOIN le USING (user_id) "
            "LEFT JOIN fp ON fp.user_id = fv.user_id), "
            "evt AS (SELECT d AS t_days, CAST(sum(ev) AS BIGINT) "
            "AS n_events FROM du GROUP BY 1 HAVING sum(ev) > 0), "
            "risk AS (SELECT t_days, n_events, "
            "(SELECT CAST(count(*) AS BIGINT) FROM du "
            "WHERE du.d >= evt.t_days) AS n_risk FROM evt), "
            "term AS (SELECT t_days, n_risk, n_events, "
            "CASE WHEN n_events = n_risk THEN -1000000000000000 "
            "ELSE CAST(floor(ln(1.0 - CAST(n_events AS DOUBLE) "
            "/ n_risk) * 1000000000 + 0.5) AS BIGINT) END AS trm "
            "FROM risk) "
            "SELECT t_days, n_risk, n_events, "
            "CAST(sum(trm) OVER (ORDER BY t_days) AS BIGINT) "
            "AS log_surv_nano FROM term ORDER BY t_days"),
        "late_events": (
            "WITH o AS (SELECT event_id, epoch_us(ts) AS t "
            "FROM events), "
            "w AS (SELECT event_id, t, max(t) OVER (ORDER BY event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm "
            "FROM o) "
            "SELECT t // 86400000000 AS day, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(count(*) FILTER (WHERE wm IS NOT NULL "
            "AND t < wm - 3600000000) AS BIGINT) AS n_late "
            "FROM w GROUP BY 1 ORDER BY 1"),
        "ndcg_eval": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            q AS (SELECT unnest(['batch', 'hash', 'scan']) AS term),
            stats AS (SELECT count(*) AS n, avg(len(ws)) AS avgdl
                      FROM toks),
            tf AS (SELECT t.doc_id, w.word AS term,
                          CAST(count(*) AS BIGINT) AS tf,
                          any_value(len(t.ws)) AS dl
                   FROM toks t, unnest(t.ws) AS w(word)
                   WHERE w.word IN (SELECT term FROM q)
                   GROUP BY t.doc_id, w.word),
            df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                   FROM tf GROUP BY term),
            scored AS (
              SELECT tf.doc_id,
                     sum(ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
                         * (tf.tf * (1.2 + 1.0))
                         / (tf.tf + 1.2 * (1.0 - 0.75
                                           + 0.75 * tf.dl / s.avgdl)))
                       AS raw
              FROM tf JOIN df USING (term), stats s
              GROUP BY tf.doc_id),
            r AS (SELECT doc_id, row_number() OVER (
                    ORDER BY floor(raw * 1e6 + 0.5) / 1e6 DESC, doc_id)
                    AS rnk
                  FROM scored ORDER BY rnk LIMIT 20),
            gold AS (SELECT doc_id FROM toks
                     WHERE list_contains(ws, 'batch')
                       AND list_contains(ws, 'hash')
                       AND list_contains(ws, 'scan')),
            ng AS (SELECT CAST(count(*) AS BIGINT) AS n_gold FROM gold),
            dcg AS (SELECT CAST(coalesce(sum(CAST(floor(
                      1000000000.0 / log2(rnk + 1.0) + 0.5)
                      AS BIGINT)), 0) AS BIGINT) AS dcg_nano
                    FROM r WHERE doc_id IN (SELECT doc_id FROM gold)),
            idcg AS (SELECT CAST(sum(CAST(floor(
                       1000000000.0 / log2(i + 1.0) + 0.5)
                       AS BIGINT)) AS BIGINT) AS idcg_nano
                     FROM range(1, 21) t(i)
                     WHERE i <= (SELECT least(20, n_gold) FROM ng))
            SELECT n_gold, dcg_nano, idcg_nano,
                   (1000000 * dcg_nano) // idcg_nano AS ndcg_ppm
            FROM ng, dcg, idcg""",
        "nucleus_vocab": r"""
            WITH toks AS (
              SELECT lang,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            words AS (SELECT lang, unnest(ws) AS term FROM toks),
            tc AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS c
                   FROM words GROUP BY 1, 2),
            r AS (SELECT lang, term, c,
                    CAST(sum(c) OVER (PARTITION BY lang
                         ORDER BY c DESC, term) AS BIGINT) AS cum,
                    row_number() OVER (PARTITION BY lang
                         ORDER BY c DESC, term) AS rn,
                    CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT)
                      AS total,
                    CAST(count(*) OVER (PARTITION BY lang) AS BIGINT)
                      AS vs
                  FROM tc),
            k AS (SELECT lang, any_value(vs) AS vocab_size,
                         CAST(min(rn) AS BIGINT) AS nucleus_terms,
                         any_value(total) AS total_mass
                  FROM r WHERE 2 * cum >= total GROUP BY 1)
            SELECT k.lang, k.vocab_size, k.nucleus_terms,
                   r.cum AS nucleus_mass, k.total_mass
            FROM k JOIN r ON r.lang = k.lang AND r.rn = k.nucleus_terms
            ORDER BY k.lang""",
        "phrase_search": (
            r"SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
            r"CAST(count(*) FILTER (WHERE regexp_matches(lower(text), "
            r"'(?:^|\s)batch\s+hash(?:\s|$)')) AS BIGINT) AS n_match "
            r"FROM documents GROUP BY 1 ORDER BY 1"),
        "title_entity_clusters": r"""
            WITH RECURSIVE t AS (
              SELECT DISTINCT lower(substr(text, 1, 12)) AS title
              FROM documents WHERE text IS NOT NULL),
            d AS (SELECT title FROM t WHERE title <> ''),
            e AS (SELECT a.title AS l, b.title AS r
                  FROM d a JOIN d b ON a.title < b.title
                  WHERE levenshtein(a.title, b.title) = 1),
            lab AS (
              SELECT node, node AS label FROM
                (SELECT l AS node FROM e UNION SELECT r FROM e)
              UNION ALL
              SELECT node, label FROM (
                WITH cur AS (SELECT node, label FROM lab),
                prop AS (
                  SELECT node, label FROM cur
                  UNION ALL SELECT e.r, cur.label FROM e
                            JOIN cur ON cur.node = e.l
                  UNION ALL SELECT e.l, cur.label FROM e
                            JOIN cur ON cur.node = e.r),
                nl AS (SELECT node, min(label) AS label FROM prop
                       GROUP BY 1)
                SELECT nl.node, nl.label FROM nl
                WHERE EXISTS (SELECT 1 FROM nl n2
                              JOIN cur c ON c.node = n2.node
                              WHERE n2.label < c.label))),
            fin AS (SELECT node, min(label) AS label FROM lab
                    GROUP BY 1)
            SELECT label AS canonical_title,
                   CAST(count(*) AS BIGINT) AS n_members
            FROM fin GROUP BY 1 ORDER BY 1""",
        "popularity_hitrate": (
            "WITH e AS (SELECT user_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item, "
            "epoch_us(ts) // 86400000000 AS day, event_type "
            "FROM events WHERE event_type IN ('view', 'purchase')), "
            "tv AS (SELECT DISTINCT user_id, item FROM e "
            "WHERE event_type = 'view' AND day < 19743), "
            "pop AS (SELECT item, count(*) AS n FROM tv GROUP BY 1 "
            "ORDER BY n DESC, item LIMIT 20), "
            "ranked AS (SELECT item, row_number() OVER "
            "(ORDER BY n DESC, item) AS rnk FROM pop), "
            "gold AS (SELECT DISTINCT user_id, item FROM e "
            "WHERE event_type = 'purchase' AND day >= 19743), "
            "gu AS (SELECT DISTINCT user_id FROM gold), "
            "recs AS (SELECT gu.user_id, r.item, row_number() OVER "
            "(PARTITION BY gu.user_id ORDER BY r.rnk) AS k "
            "FROM gu CROSS JOIN ranked r "
            "WHERE NOT EXISTS (SELECT 1 FROM tv "
            "WHERE tv.user_id = gu.user_id AND tv.item = r.item)), "
            "hit AS (SELECT gu.user_id, "
            "max(CASE WHEN g.item IS NOT NULL THEN 1 ELSE 0 END) AS h "
            "FROM gu LEFT JOIN (SELECT user_id, item FROM recs "
            "WHERE k <= 3) rr ON rr.user_id = gu.user_id "
            "LEFT JOIN gold g ON g.user_id = rr.user_id "
            "AND g.item = rr.item GROUP BY 1) "
            "SELECT CAST(count(*) AS BIGINT) AS n_users, "
            "CAST(sum(h) AS BIGINT) AS n_hits, "
            "(1000000 * CAST(sum(h) AS BIGINT)) // count(*) "
            "AS hitrate_ppm FROM hit"),
        "ht_estimate": (
            "WITH w AS (SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) "
            "AS n_tokens, least(CAST(len(regexp_extract_all(text, "
            "'\\S+')) AS BIGINT) * 5000, 1000000) AS w_ppm "
            "FROM documents), "
            "s AS (SELECT * FROM w WHERE CAST(concat('0x', "
            "substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) "
            "% 1000000 < w_ppm), "
            "t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt FROM w), "
            "h AS (SELECT CAST(count(*) AS BIGINT) AS n_sampled, "
            "CAST(sum((n_tokens * 1000000) // w_ppm) AS BIGINT) "
            "AS ht FROM s) "
            "SELECT h.n_sampled, h.ht AS ht_total_tokens, "
            "t.tt AS true_total_tokens, "
            "(1000000 * abs(h.ht - t.tt)) // t.tt AS err_ppm "
            "FROM h, t"),
        "bootstrap_ci": (
            "WITH reps AS (SELECT i AS rep FROM range(0, 20) t(i)), "
            "w AS (SELECT d.lang, d.n_chars, r.rep, "
            "(CAST(CAST(concat('0x', substr(md5(concat(CAST(d.doc_id "
            "AS VARCHAR), ':boot:', CAST(r.rep AS VARCHAR))), 1, 8)) "
            "AS UBIGINT) AS DOUBLE) + 0.5) / 4294967296.0 AS u "
            "FROM documents d CROSS JOIN reps r), "
            "ww AS (SELECT lang, rep, n_chars, "
            "CASE WHEN u < 0.36787944117144233 THEN 0 "
            "WHEN u < 0.7357588823428847 THEN 1 "
            "WHEN u < 0.9196986029286058 THEN 2 "
            "WHEN u < 0.9810118431238462 THEN 3 "
            "WHEN u < 0.9963401531726563 THEN 4 "
            "WHEN u < 0.9994058151824183 THEN 5 "
            "WHEN u < 0.9999167588507119 THEN 6 "
            "ELSE 7 END AS wt FROM w), "
            "est AS (SELECT lang, rep, "
            "(1000000 * CAST(sum(wt * n_chars) AS BIGINT)) "
            "// CAST(sum(wt) AS BIGINT) AS est FROM ww GROUP BY 1, 2) "
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_reps, "
            "CAST(quantile_disc(est, 0.1) AS BIGINT) AS lo_micro, "
            "CAST(quantile_disc(est, 0.9) AS BIGINT) AS hi_micro "
            "FROM est GROUP BY 1 ORDER BY 1"),
        "index_compression": r"""
            WITH posts AS (
              SELECT DISTINCT unnest(list_filter(
                       regexp_split_to_array(lower(text), '\s+'),
                       w -> w <> '')) AS term, doc_id
              FROM documents),
            df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                   FROM posts GROUP BY 1),
            top AS (SELECT term FROM df
                    ORDER BY df DESC, term LIMIT 20),
            gaps AS (SELECT p.term,
                       CASE WHEN lag(p.doc_id) OVER w IS NULL
                            THEN p.doc_id + 1
                            ELSE p.doc_id - lag(p.doc_id) OVER w
                       END AS g
                     FROM posts p JOIN top USING (term)
                     WINDOW w AS (PARTITION BY p.term
                                  ORDER BY p.doc_id)),
            bits AS (SELECT term,
                       CAST(count(*) AS BIGINT) AS n_postings,
                       CAST(sum(2 * (length(printf('%b', g)) - 1) + 1)
                            AS BIGINT) AS gamma_bits
                     FROM gaps GROUP BY 1)
            SELECT term, n_postings, gamma_bits,
                   64 * n_postings AS raw_bits,
                   (1000000 * gamma_bits) // (64 * n_postings)
                     AS ratio_ppm
            FROM bits ORDER BY term""",
        "hll_twin": (
            "WITH du AS (SELECT DISTINCT event_type, user_id "
            "FROM events), "
            "s1 AS (SELECT event_type, CAST((CAST(user_id AS HUGEINT) "
            "+ 11400714819323198485) % 18446744073709551616 "
            "AS UBIGINT) AS x FROM du), "
            "x1 AS (SELECT event_type, xor(x, x >> 30) AS x FROM s1), "
            "m1 AS (SELECT event_type, CAST((CAST(x AS HUGEINT) "
            "* 484763065 + ((CAST(x % 4294967296 AS HUGEINT) "
            "* 3210233709) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS UBIGINT) AS x FROM x1), "
            "x2 AS (SELECT event_type, xor(x, x >> 27) AS x FROM m1), "
            "m2 AS (SELECT event_type, CAST((CAST(x AS HUGEINT) "
            "* 321982955 + ((CAST(x % 4294967296 AS HUGEINT) "
            "* 2496678331) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS UBIGINT) AS x FROM x2), "
            "h AS (SELECT event_type, xor(x, x >> 31) AS h FROM m2), "
            "rk AS (SELECT event_type, CAST(h >> 52 AS BIGINT) "
            "AS bucket, CASE WHEN h % 4503599627370496 = 0 THEN 53 "
            "ELSE 53 - length(printf('%b', "
            "CAST(h % 4503599627370496 AS BIGINT))) END AS rnk "
            "FROM h), "
            "regs AS (SELECT event_type, bucket, max(rnk) AS rnk "
            "FROM rk GROUP BY 1, 2), "
            "agg AS (SELECT event_type, CAST(count(*) AS BIGINT) "
            "AS nz, sum(CAST(power(2, 53 - rnk) AS HUGEINT)) AS s_nz "
            "FROM regs GROUP BY 1), "
            "ex AS (SELECT event_type, CAST(count(DISTINCT user_id) "
            "AS BIGINT) AS n_exact FROM events GROUP BY 1), "
            "fin AS (SELECT event_type, nz, 4096 - nz AS zeros, "
            "(0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0 "
            "/ (CAST(s_nz + (4096 - nz) * CAST(9007199254740992 "
            "AS HUGEINT) AS DOUBLE) / 9007199254740992.0) AS e "
            "FROM agg), "
            "o AS (SELECT f.event_type, x.n_exact, f.nz "
            "AS nonzero_regs, CAST(floor(CASE WHEN f.e <= 2.5 "
            "* 4096.0 AND f.zeros > 0 THEN 4096.0 * ln(4096.0 "
            "/ CAST(f.zeros AS DOUBLE)) ELSE f.e END) AS BIGINT) "
            "AS hll_estimate FROM fin f JOIN ex x USING (event_type)) "
            "SELECT event_type, n_exact, nonzero_regs, hll_estimate, "
            "(1000000 * abs(hll_estimate - n_exact)) // n_exact "
            "AS err_ppm FROM o ORDER BY event_type"),
        "cdc_chunks": (
            "WITH pos AS (SELECT doc_id, len(text) AS L, "
            "unnest([i for i in range(0, len(text))]) AS i, "
            "unnest([CAST(ord(substr(text, i + 1, 1)) AS BIGINT) "
            "for i in range(0, len(text))]) AS c FROM documents), "
            "w AS (SELECT doc_id, i, L, (c "
            "+ coalesce(lag(c, 1) OVER win, 0) * 257 "
            "+ coalesce(lag(c, 2) OVER win, 0) * 66049 "
            "+ coalesce(lag(c, 3) OVER win, 0) * 16974593 "
            "+ coalesce(lag(c, 4) OVER win, 0) * 67503107 "
            "+ coalesce(lag(c, 5) OVER win, 0) * 168429323 "
            "+ coalesce(lag(c, 6) OVER win, 0) * 336663071 "
            "+ coalesce(lag(c, 7) OVER win, 0) * 623063367) "
            "% 2147483647 AS h FROM pos "
            "WINDOW win AS (PARTITION BY doc_id ORDER BY i)), "
            "b AS (SELECT doc_id, CAST(count(*) FILTER "
            "(WHERE h % 64 = 0 AND i >= 7 AND i <= L - 2) AS BIGINT) "
            "AS nb FROM w GROUP BY doc_id) "
            "SELECT d.doc_id, CAST(len(d.text) AS BIGINT) AS n_chars, "
            "coalesce(b.nb, 0) + 1 AS n_chunks FROM documents d "
            "LEFT JOIN b ON b.doc_id = d.doc_id ORDER BY 1"),
        "lang_cross_entropy": (
            "WITH bg AS (SELECT lang, unnest([substr(lower(text), i, "
            "2) for i in range(1, len(text))]) AS bg "
            "FROM documents), "
            "c AS (SELECT lang, bg, CAST(count(*) AS BIGINT) AS c "
            "FROM bg GROUP BY 1, 2), "
            "v AS (SELECT CAST(count(DISTINCT bg) AS BIGINT) AS v "
            "FROM c), "
            "t AS (SELECT lang, CAST(sum(c) AS BIGINT) AS t FROM c "
            "GROUP BY 1), "
            "langs AS (SELECT DISTINCT lang FROM c), "
            "contrib AS (SELECT ce.lang AS eval_lang, tr.lang "
            "AS train_lang, ce.c AS ec, CAST(floor(ln(CAST("
            "coalesce(ct.c, 0) + 1 AS DOUBLE) / (tt.t + v.v)) "
            "* 1000000000 + 0.5) AS BIGINT) AS lp "
            "FROM c ce CROSS JOIN langs tr "
            "JOIN t tt ON tt.lang = tr.lang CROSS JOIN v "
            "LEFT JOIN c ct ON ct.lang = tr.lang AND ct.bg = ce.bg), "
            "agg AS (SELECT eval_lang, train_lang, "
            "CAST(-sum(ec * lp) AS BIGINT) AS tot FROM contrib "
            "GROUP BY 1, 2) "
            "SELECT a.eval_lang, a.train_lang, "
            "a.tot // te.t AS ce_nano_per_char FROM agg a "
            "JOIN t te ON te.lang = a.eval_lang ORDER BY 1, 2"),
        "zipf_slope": r"""
            WITH w AS (SELECT unnest(list_filter(
                         regexp_split_to_array(lower(text), '\s+'),
                         x -> x <> '')) AS term FROM documents),
            tc AS (SELECT term, CAST(count(*) AS BIGINT) AS c
                   FROM w GROUP BY 1 ORDER BY c DESC, term LIMIT 100),
            r AS (SELECT CAST(floor(ln(CAST(row_number() OVER (
                    ORDER BY c DESC, term) AS DOUBLE)) * 1000000000
                    + 0.5) AS BIGINT) AS x,
                  CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000000
                    + 0.5) AS BIGINT) AS y
                  FROM tc),
            s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
                  CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
                  sum(CAST(x AS HUGEINT) * x) AS sxx,
                  sum(CAST(x AS HUGEINT) * y) AS sxy FROM r)
            SELECT n AS n_terms,
                   CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE) AS zipf_slope
            FROM s""",
        "burst_viterbi": (
            "WITH RECURSIVE e AS (SELECT user_id, epoch_us(ts) AS t, "
            "event_id FROM events), "
            "g AS (SELECT user_id, "
            "CAST(floor(((1.0 / 3600.0) * (CAST(gap AS DOUBLE) "
            "/ 1000000.0) - ln(1.0 / 3600.0)) * 1000000000.0 + 0.5) "
            "AS BIGINT) AS costl, "
            "CAST(floor(((4.0 / 3600.0) * (CAST(gap AS DOUBLE) "
            "/ 1000000.0) - ln(4.0 / 3600.0)) * 1000000000.0 + 0.5) "
            "AS BIGINT) AS costh, "
            "row_number() OVER (PARTITION BY user_id ORDER BY rn) "
            "AS i FROM (SELECT user_id, gap, row_number() OVER "
            "(PARTITION BY user_id ORDER BY t, event_id) AS rn "
            "FROM (SELECT user_id, t, event_id, t - lag(t) OVER "
            "(PARTITION BY user_id ORDER BY t, event_id) AS gap "
            "FROM e) WHERE gap IS NOT NULL)), "
            "dp AS (SELECT user_id, i, costl AS cl, "
            "CAST(0 AS BIGINT) AS nl, costh AS ch, "
            "CAST(1 AS BIGINT) AS nh FROM g WHERE i = 1 "
            "UNION ALL "
            "SELECT d.user_id, g.i, "
            "g.costl + CASE WHEN d.cl <= d.ch + 1000000000 THEN d.cl "
            "ELSE d.ch + 1000000000 END, "
            "CASE WHEN d.cl <= d.ch + 1000000000 THEN d.nl "
            "ELSE d.nh END, "
            "g.costh + CASE WHEN d.ch <= d.cl + 1000000000 THEN d.ch "
            "ELSE d.cl + 1000000000 END, "
            "CASE WHEN d.ch <= d.cl + 1000000000 THEN d.nh "
            "ELSE d.nl END + 1 "
            "FROM dp d JOIN g ON g.user_id = d.user_id "
            "AND g.i = d.i + 1), "
            "fin AS (SELECT user_id, max(i) AS mi FROM dp GROUP BY 1) "
            "SELECT d.user_id, d.i AS n_gaps, "
            "CASE WHEN d.cl <= d.ch THEN d.cl ELSE d.ch END "
            "AS cost_nano, "
            "CASE WHEN d.cl <= d.ch THEN d.nl ELSE d.nh END "
            "AS n_high FROM dp d JOIN fin ON fin.user_id = d.user_id "
            "AND fin.mi = d.i ORDER BY d.user_id"),
        "audio_metadata": (
            "WITH r AS (SELECT doc_id, 'https://media.example/' || "
            "doc_id || '/audio-0.wav' AS media_ref FROM documents), "
            "d AS (SELECT doc_id, media_ref, 200 + "
            "CAST(concat('0x', substr(md5(media_ref), 5, 2)) "
            "AS INTEGER) * 7 AS dur_ms FROM r) "
            "SELECT doc_id, media_ref, CAST(8000 AS BIGINT) "
            "AS rate_hz, CAST(1 AS BIGINT) AS channels, "
            "CAST(2 AS BIGINT) AS sample_bytes, "
            "CAST(8 * dur_ms AS BIGINT) AS n_frames, "
            "CAST((8 * dur_ms) * 1000 // 8000 AS BIGINT) "
            "AS duration_ms FROM d ORDER BY doc_id"),
        "item_cheapest_path": (
            "WITH RECURSIVE ui AS (SELECT DISTINCT user_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'view'), "
            "prs AS (SELECT a.item AS ia, b.item AS ib, "
            "CAST(count(*) AS BIGINT) AS n FROM ui a JOIN ui b "
            "ON a.user_id = b.user_id AND a.item < b.item "
            "GROUP BY 1, 2), "
            "edges AS (SELECT ia, ib, 1000000 // n AS w FROM prs "
            "WHERE n >= 2), "
            "adj AS (SELECT ia AS node, ib AS nbr, w FROM edges "
            "UNION ALL SELECT ib, ia, w FROM edges), "
            "d AS (SELECT (SELECT min(node) FROM adj) AS node, "
            "CAST(0 AS BIGINT) AS cost "
            "UNION ALL "
            "SELECT node, cost FROM ("
            "WITH cur AS (SELECT node, cost FROM d), "
            "relax AS (SELECT a.nbr AS node, c.cost + a.w AS cost "
            "FROM cur c JOIN adj a ON a.node = c.node "
            "UNION ALL SELECT node, cost FROM cur), "
            "nd AS (SELECT node, min(cost) AS cost FROM relax "
            "GROUP BY 1) "
            "SELECT nd.node, nd.cost FROM nd "
            "WHERE EXISTS (SELECT 1 FROM nd n2 LEFT JOIN cur c "
            "ON c.node = n2.node WHERE c.node IS NULL "
            "OR n2.cost < c.cost))) "
            "SELECT node AS item, CAST(min(cost) AS BIGINT) AS cost "
            "FROM d GROUP BY 1 ORDER BY 1"),
        "edge_churn": (
            "WITH ui AS (SELECT DISTINCT user_id, "
            "epoch_us(ts) // 604800000000 AS week, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'view'), "
            "e AS (SELECT DISTINCT a.week, a.item AS ia, b.item AS ib "
            "FROM ui a JOIN ui b ON a.user_id = b.user_id "
            "AND a.week = b.week AND a.item < b.item), "
            "wc AS (SELECT week, CAST(count(*) AS BIGINT) AS n "
            "FROM e GROUP BY 1), "
            "cons AS (SELECT w1.week AS week_a, w2.week AS week_b, "
            "w1.n AS n_a, w2.n AS n_b FROM wc w1 "
            "JOIN wc w2 ON w2.week = w1.week + 1), "
            "inter AS (SELECT c.week_a, CAST(count(*) AS BIGINT) "
            "AS n_common FROM cons c JOIN e e1 "
            "ON e1.week = c.week_a JOIN e e2 ON e2.week = c.week_b "
            "AND e2.ia = e1.ia AND e2.ib = e1.ib GROUP BY 1) "
            "SELECT c.week_a, c.week_b, c.n_a, c.n_b, i.n_common, "
            "(1000000 * i.n_common) // (c.n_a + c.n_b - i.n_common) "
            "AS jaccard_ppm FROM cons c "
            "JOIN inter i ON i.week_a = c.week_a "
            "ORDER BY c.week_a"),
        "l_diversity": (
            "WITH c AS (SELECT CAST(c_nationkey AS BIGINT) "
            "AS c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) "
            "AS c FROM customer GROUP BY 1, 2) "
            "SELECT c_nationkey, CAST(sum(c) AS BIGINT) "
            "AS n_customers, CAST(count(*) AS BIGINT) AS l_distinct, "
            "CAST(floor((ln(sum(c)) - sum(CAST(floor(c * ln(c) "
            "* 1000000000 + 0.5) AS BIGINT)) / 1000000000.0 "
            "/ sum(c)) * 1000000000 + 0.5) AS BIGINT) "
            "AS entropy_nano FROM c GROUP BY 1 ORDER BY 1"),
        "apportion_sample": (
            "WITH cell AS (SELECT lang, source, "
            "CAST(count(*) AS BIGINT) AS n_docs "
            "FROM documents GROUP BY 1, 2), "
            "tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS t "
            "FROM cell), "
            "q AS (SELECT lang, source, n_docs, "
            "(1000 * n_docs) // t AS base, "
            "(1000 * n_docs) % t AS rem FROM cell, tot), "
            "lft AS (SELECT 1000 - CAST(sum(base) AS BIGINT) AS l "
            "FROM q), "
            "r AS (SELECT *, row_number() OVER "
            "(ORDER BY rem DESC, lang, source) AS rk FROM q) "
            "SELECT lang, source, n_docs, CAST(base + CASE WHEN "
            "rk <= (SELECT l FROM lft) THEN 1 ELSE 0 END AS BIGINT) "
            "AS seats FROM r ORDER BY lang, source"),
        "sq8_topk": (
            _SQ8_CODES_SQL +
            ", codes AS (SELECT vec_id, ex.dim, "
            "CAST(floor(mn * 16777216.0 + 0.5) AS BIGINT) "
            "+ (CASE WHEN mx = mn THEN 0 ELSE "
            "CAST(floor((val - mn) * 255.0 / (mx - mn)) AS BIGINT) END) "
            "* CAST(floor((mx - mn) / 255.0 * 16777216.0 + 0.5) "
            "AS BIGINT) AS xf FROM ex JOIN grid ON grid.dim = ex.dim), "
            "q AS (SELECT vec_id AS query_id, dim, xf FROM codes "
            "WHERE vec_id IN (SELECT vec_id FROM embeddings "
            "ORDER BY vec_id LIMIT 5)), "
            "scored AS (SELECT q.query_id, c.vec_id AS neighbor_id, "
            "CAST(sum(q.xf * c.xf) AS BIGINT) AS iscore "
            "FROM q JOIN codes c ON c.dim = q.dim GROUP BY 1, 2), "
            "ranked AS (SELECT query_id, neighbor_id, iscore, "
            "row_number() OVER (PARTITION BY query_id "
            "ORDER BY iscore DESC, neighbor_id) AS rank FROM scored) "
            "SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, "
            "iscore FROM ranked WHERE rank <= 10 ORDER BY query_id, rank"),
        "kcenter_sample": _kcenter_oracle(8),
        "dict_encoding": (
            " UNION ALL ".join(
                "SELECT '{tab}.{col}' AS col, n_rows, n_distinct, "
                "plain_bytes, dict_data + (n_rows * bits + 7) // 8 "
                "AS dict_bytes FROM (SELECT "
                "CAST(sum(c) AS BIGINT) AS n_rows, "
                "CAST(count(*) AS BIGINT) AS n_distinct, "
                "CAST(sum(c * strlen(v)) AS BIGINT) "
                "AS plain_bytes, "
                "CAST(sum(strlen(v)) AS BIGINT) AS dict_data, "
                "CASE WHEN count(*) <= 1 THEN 0 ELSE "
                "length(printf('%b', count(*) - 1)) END AS bits "
                "FROM (SELECT {col} AS v, CAST(count(*) AS BIGINT) "
                "AS c FROM {tab} GROUP BY 1))".format(tab=t, col=c)
                for t, c in [("documents", "lang"),
                             ("documents", "source"),
                             ("events", "event_type"),
                             ("customer", "c_mktsegment"),
                             ("orders", "o_orderpriority")])
            + " ORDER BY col"),
        "t_closeness": (
            "WITH cell AS (SELECT CAST(c_nationkey AS BIGINT) AS nat, "
            "c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS c "
            "FROM customer GROUP BY 1, 2), "
            "segs AS (SELECT DISTINCT seg FROM cell), "
            "nats AS (SELECT nat, CAST(sum(c) AS BIGINT) AS ng "
            "FROM cell GROUP BY 1), "
            "gl AS (SELECT seg, CAST(sum(c) AS BIGINT) AS cg "
            "FROM cell GROUP BY 1), "
            "tot AS (SELECT CAST(sum(c) AS BIGINT) AS n, "
            "CAST(count(DISTINCT seg) AS BIGINT) AS k FROM cell), "
            "grid AS (SELECT nats.nat, nats.ng, segs.seg, "
            "COALESCE(cell.c, 0) AS c, gl.cg, tot.n, tot.k "
            "FROM nats CROSS JOIN segs "
            "LEFT JOIN cell ON cell.nat = nats.nat "
            "AND cell.seg = segs.seg "
            "JOIN gl ON gl.seg = segs.seg CROSS JOIN tot), "
            "cum AS (SELECT nat, ng, n, k, CAST(sum(c * n - cg * ng) "
            "OVER (PARTITION BY nat ORDER BY seg) AS HUGEINT) AS d "
            "FROM grid) "
            "SELECT nat AS c_nationkey, CAST(max(ng) AS BIGINT) "
            "AS n_customers, CAST(sum(abs(d)) * 1000000000 "
            "// (max(ng) * max(n) * (max(k) - 1)) AS BIGINT) "
            "AS emd_nano FROM cum GROUP BY 1 ORDER BY 1"),
        "mannwhitney": (
            "WITH j AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) "
            "AS BIGINT) AS v, CASE WHEN c_mktsegment = 'BUILDING' "
            "THEN 1 ELSE 0 END AS g FROM orders "
            "JOIN customer ON o_custkey = c_custkey "
            "WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')), "
            "cell AS (SELECT v, CAST(sum(g) AS BIGINT) AS n1c, "
            "CAST(count(*) AS BIGINT) AS t FROM j GROUP BY 1), "
            "sc AS (SELECT *, CAST(COALESCE(sum(t) OVER (ORDER BY v "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "AS BIGINT) AS cb FROM cell), "
            "a AS (SELECT CAST(sum(n1c * (2 * cb + t + 1)) AS HUGEINT) "
            "AS r12, CAST(sum(n1c) AS HUGEINT) AS n1, "
            "CAST(sum(t - n1c) AS HUGEINT) AS n2, "
            "CAST(sum(t * t * t - t) AS HUGEINT) AS tie FROM sc) "
            "SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2, "
            "CAST(r12 - n1 * (n1 + 1) AS BIGINT) AS u2, "
            "CAST(floor((CAST(r12 - n1 * (n1 + 1) - n1 * n2 AS DOUBLE) "
            "/ 2.0) / sqrt(CAST(n1 * n2 * ((n1 + n2) * (n1 + n2) "
            "* (n1 + n2) - (n1 + n2) - tie) AS DOUBLE) "
            "/ CAST(12 * (n1 + n2) * (n1 + n2 - 1) AS DOUBLE)) "
            "* 1000000000 + 0.5) AS BIGINT) AS z_nano FROM a"),
        "dup_spans": ("""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            occ AS (
              SELECT doc_id, CAST(u['pos'] AS BIGINT) AS pos,
                     CAST(u['ng'] AS VARCHAR) AS ng FROM (
                SELECT doc_id,
                       unnest([{'pos': i - 1,
                                'ng': ws[i] || ' ' || ws[i+1] || ' ' ||
                                      ws[i+2] || ' ' || ws[i+3] || ' ' ||
                                      ws[i+4]}
                               for i in range(1, greatest(len(ws) - 3, 1))])
                       AS u
                FROM toks)),
            freq AS (SELECT ng FROM occ GROUP BY ng HAVING count(*) >= 2),
            dup AS (SELECT doc_id, pos FROM occ JOIN freq USING (ng)),
            steps AS (
              SELECT doc_id,
                     least(5, COALESCE(lead(pos) OVER (PARTITION BY doc_id
                           ORDER BY pos) - pos, 5)) AS step
              FROM dup),
            cov AS (SELECT doc_id, CAST(sum(step) AS BIGINT)
                           AS covered_tokens
                    FROM steps GROUP BY doc_id),
            tot AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens
                    FROM toks WHERE len(ws) > 0)
            SELECT t.doc_id, t.n_tokens,
                   COALESCE(c.covered_tokens, 0) AS covered_tokens,
                   round(COALESCE(c.covered_tokens, 0) * 1.0 / t.n_tokens,
                         6) AS dup_span_ratio
            FROM tot t LEFT JOIN cov c USING (doc_id)
            ORDER BY t.doc_id"""),
        "pca_power": _pca_power_oracle(),
        "random_walks": "WITH ui AS (SELECT DISTINCT user_id, CAST(json_extract(props, '$.k') AS BIGINT) AS item FROM events WHERE event_type = 'view'), pairs AS (SELECT a.item AS ia, b.item AS ib, count(*) AS cnt FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item GROUP BY 1, 2), edges AS (SELECT ia, ib FROM pairs WHERE cnt >= 2), sym AS (SELECT ia AS node, ib AS nbr FROM edges UNION ALL SELECT ib, ia FROM edges), adj AS MATERIALIZED (SELECT node, nbr, row_number() OVER (PARTITION BY node ORDER BY nbr) - 1 AS rnk, count(*) OVER (PARTITION BY node) AS deg FROM sym), w0 AS (SELECT DISTINCT node AS start, node AS cur FROM sym), w1 AS MATERIALIZED (SELECT w.start, a.nbr AS cur FROM w0 w JOIN adj a ON a.node = w.cur AND a.rnk = CAST(CAST(concat('0x', substr(md5(concat(CAST(w.start AS VARCHAR), ':walk:1:', CAST(w.cur AS VARCHAR))), 1, 8)) AS UBIGINT) % CAST(a.deg AS UBIGINT) AS BIGINT)), w2 AS MATERIALIZED (SELECT w.start, a.nbr AS cur FROM w1 w JOIN adj a ON a.node = w.cur AND a.rnk = CAST(CAST(concat('0x', substr(md5(concat(CAST(w.start AS VARCHAR), ':walk:2:', CAST(w.cur AS VARCHAR))), 1, 8)) AS UBIGINT) % CAST(a.deg AS UBIGINT) AS BIGINT)), w3 AS MATERIALIZED (SELECT w.start, a.nbr AS cur FROM w2 w JOIN adj a ON a.node = w.cur AND a.rnk = CAST(CAST(concat('0x', substr(md5(concat(CAST(w.start AS VARCHAR), ':walk:3:', CAST(w.cur AS VARCHAR))), 1, 8)) AS UBIGINT) % CAST(a.deg AS UBIGINT) AS BIGINT)) SELECT start, CAST(0 AS BIGINT) AS step, cur AS node FROM w0 UNION ALL SELECT start, 1, cur FROM w1 UNION ALL SELECT start, 2, cur FROM w2 UNION ALL SELECT start, 3, cur FROM w3 ORDER BY start, step",
        "negative_samples": "WITH pos AS (SELECT DISTINCT user_id, CAST(json_extract(props, '$.k') AS BIGINT) AS item FROM events WHERE event_type = 'purchase'), cat AS (SELECT item, row_number() OVER (ORDER BY item) - 1 AS idx FROM (SELECT DISTINCT CAST(json_extract(props, '$.k') AS BIGINT) AS item FROM events WHERE event_type IN ('view', 'purchase'))), nc AS (SELECT count(*) AS n FROM cat), d AS (SELECT p.user_id, p.item, t.i AS r, CAST(CAST(concat('0x', substr(md5(concat(CAST(p.user_id AS VARCHAR), ':', CAST(p.item AS VARCHAR), ':neg:', CAST(t.i AS VARCHAR))), 1, 8)) AS UBIGINT) % (SELECT CAST(n AS UBIGINT) FROM nc) AS BIGINT) AS idx FROM pos p, range(4) t(i)), c AS (SELECT d.user_id, d.item, d.r, cat.item AS neg_item FROM d JOIN cat USING (idx)), ok AS (SELECT c.* FROM c WHERE NOT EXISTS (SELECT 1 FROM pos q WHERE q.user_id = c.user_id AND q.item = c.neg_item)), rk AS (SELECT user_id, item, neg_item, row_number() OVER (PARTITION BY user_id, item ORDER BY r) - 1 AS neg_rank FROM ok) SELECT user_id, item AS pos_item, CAST(neg_rank AS BIGINT) AS neg_rank, neg_item FROM rk WHERE neg_rank < 2 ORDER BY user_id, pos_item, neg_rank",
        "decayed_popularity": "WITH v AS (SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS item, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events WHERE event_type = 'view'), mt AS (SELECT max(sec) AS t FROM v), w AS (SELECT item, CAST(floor(exp(-CAST((SELECT t FROM mt) - sec AS DOUBLE) / 604800.0) * 1000000000 + 0.5) AS BIGINT) AS wn FROM v) SELECT item, CAST(count(*) AS BIGINT) AS n_views, CAST(sum(wn) AS BIGINT) AS decayed_nano FROM w GROUP BY item ORDER BY decayed_nano DESC, item LIMIT 10",
        "mst_coview": "WITH RECURSIVE ui AS MATERIALIZED (SELECT DISTINCT user_id, CAST(json_extract(props, '$.k') AS BIGINT) AS item FROM events WHERE event_type = 'view'), prs AS MATERIALIZED (SELECT a.item AS ia, b.item AS ib, CAST(count(*) AS BIGINT) AS cnt FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item GROUP BY 1, 2 HAVING count(*) >= 2), nds AS MATERIALIZED (SELECT ia AS node FROM prs UNION SELECT ib FROM prs), kr(rnd, kind, node, lbl, ia, ib, cnt) AS (SELECT 0, 0, node, node, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM nds UNION ALL SELECT rnd, kind, node, lbl, ia, ib, cnt FROM (WITH cur AS (SELECT * FROM kr WHERE kind = 0), ce AS (SELECT e.ia, e.ib, e.cnt, la.lbl AS la, lb.lbl AS lb FROM prs e JOIN cur la ON la.node = e.ia JOIN cur lb ON lb.node = e.ib WHERE la.lbl <> lb.lbl), pick AS (SELECT * FROM ce ORDER BY cnt DESC, ia, ib LIMIT 1), nl AS (SELECT c.rnd + 1 AS rnd, 0 AS kind, c.node AS node, CASE WHEN c.lbl = greatest((SELECT la FROM pick), (SELECT lb FROM pick)) THEN least((SELECT la FROM pick), (SELECT lb FROM pick)) ELSE c.lbl END AS lbl, CAST(NULL AS BIGINT) AS ia, CAST(NULL AS BIGINT) AS ib, CAST(NULL AS BIGINT) AS cnt FROM cur c WHERE EXISTS (SELECT 1 FROM pick)), ed AS (SELECT (SELECT max(rnd) FROM cur) + 1 AS rnd, 1 AS kind, CAST(NULL AS BIGINT) AS node, CAST(NULL AS BIGINT) AS lbl, ia, ib, cnt FROM pick) SELECT * FROM nl UNION ALL SELECT * FROM ed)) SELECT ia, ib, cnt AS n_users FROM kr WHERE kind = 1 ORDER BY ia, ib",
        "textrank_keywords": _textrank_sql(),
        "label_propagation": 'WITH scored AS (SELECT a.vec_id AS s, b.vec_id AS t, list_cosine_similarity(a.embedding, b.embedding) AS sc FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id), knn AS MATERIALIZED (SELECT s, t FROM (SELECT s, t, row_number() OVER (PARTITION BY s ORDER BY sc DESC, t) AS rn FROM scored) WHERE rn <= 5), l0 AS (SELECT vec_id, CASE WHEN vec_id % 5 = 0 THEN CAST(label AS BIGINT) ELSE -1 END AS lbl, CASE WHEN vec_id % 5 = 0 THEN 1 ELSE 0 END AS seed FROM embeddings), v1 AS (SELECT k.s AS vec_id, l.lbl, count(*) AS c FROM knn k JOIN l0 l ON l.vec_id = k.t WHERE l.lbl >= 0 GROUP BY 1, 2), p1 AS (SELECT vec_id, lbl FROM (SELECT vec_id, lbl, row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, lbl) AS rn FROM v1) WHERE rn = 1), l1 AS MATERIALIZED (SELECT l.vec_id, CASE WHEN l.seed = 1 THEN l.lbl ELSE coalesce(p.lbl, -1) END AS lbl, l.seed FROM l0 l LEFT JOIN p1 p USING (vec_id)), v2 AS (SELECT k.s AS vec_id, l.lbl, count(*) AS c FROM knn k JOIN l1 l ON l.vec_id = k.t WHERE l.lbl >= 0 GROUP BY 1, 2), p2 AS (SELECT vec_id, lbl FROM (SELECT vec_id, lbl, row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, lbl) AS rn FROM v2) WHERE rn = 1), l2 AS MATERIALIZED (SELECT l.vec_id, CASE WHEN l.seed = 1 THEN l.lbl ELSE coalesce(p.lbl, -1) END AS lbl, l.seed FROM l1 l LEFT JOIN p2 p USING (vec_id)), v3 AS (SELECT k.s AS vec_id, l.lbl, count(*) AS c FROM knn k JOIN l2 l ON l.vec_id = k.t WHERE l.lbl >= 0 GROUP BY 1, 2), p3 AS (SELECT vec_id, lbl FROM (SELECT vec_id, lbl, row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, lbl) AS rn FROM v3) WHERE rn = 1), l3 AS MATERIALIZED (SELECT l.vec_id, CASE WHEN l.seed = 1 THEN l.lbl ELSE coalesce(p.lbl, -1) END AS lbl, l.seed FROM l2 l LEFT JOIN p3 p USING (vec_id)) SELECT vec_id, lbl AS pred_label, CAST(seed AS BIGINT) AS is_seed FROM l3 ORDER BY vec_id',
        "hard_negatives": 'WITH scored AS (SELECT a.vec_id AS vec_id, b.vec_id AS neg_id, list_cosine_similarity(a.embedding, b.embedding) AS sc FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id AND a.label <> b.label) SELECT vec_id, CAST(rn - 1 AS BIGINT) AS neg_rank, neg_id FROM (SELECT vec_id, neg_id, row_number() OVER (PARTITION BY vec_id ORDER BY sc DESC, neg_id) AS rn FROM scored) WHERE rn <= 2 ORDER BY vec_id, neg_rank',
        "dedup_safe_folds": "WITH h AS (SELECT doc_id, md5(text) AS hh FROM documents), c AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY hh) AS cluster_id FROM h) SELECT doc_id, cluster_id, CAST(CAST(concat('0x', substr(md5(concat(CAST(cluster_id AS VARCHAR), ':fold')), 1, 8)) AS UBIGINT) % 5 AS BIGINT) AS fold FROM c ORDER BY doc_id",
        "quantile_normalize": 'WITH g AS (SELECT n_chars, row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS gr FROM documents), s AS (SELECT doc_id, source, n_chars, row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) - 1 AS r, count(*) OVER (PARTITION BY source) AS ns, (SELECT count(*) FROM documents) AS n FROM documents), ix AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars, CASE WHEN ns = 1 THEN (n - 1) // 2 ELSE (r * (n - 1)) // (ns - 1) END AS idx FROM s) SELECT i.doc_id, i.source, i.n_chars, CAST(g.n_chars AS BIGINT) AS normalized_chars FROM ix i JOIN g ON g.gr = i.idx ORDER BY i.doc_id',
        "bpe_encode": (
            f"SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/bpe_encode.parquet')}')"),
        "hbos_outliers": 'WITH ex AS MATERIALIZED (SELECT vec_id, t.i AS d, CAST(embedding[CAST(t.i AS INTEGER) + 1] AS DOUBLE) AS v FROM embeddings, range(64) t(i)), mm AS (SELECT d, min(v) AS mn, max(v) AS mx FROM ex GROUP BY 1), b AS MATERIALIZED (SELECT vec_id, ex.d, CASE WHEN mx = mn THEN 0 ELSE least(9, CAST(floor((v - mn) * 10.0 / (mx - mn)) AS BIGINT)) END AS bin FROM ex JOIN mm ON mm.d = ex.d), cnt AS (SELECT d, bin, count(*) AS c FROM b GROUP BY 1, 2), nn AS (SELECT count(*) AS n FROM embeddings), term AS (SELECT d, bin, CAST(floor(ln(CAST((SELECT n FROM nn) AS DOUBLE) / c) * 1000000000 + 0.5) AS BIGINT) AS tn FROM cnt) SELECT vec_id, hbos_nano FROM (SELECT vec_id, CAST(sum(tn) AS BIGINT) AS hbos_nano FROM b JOIN term USING (d, bin) GROUP BY 1) ORDER BY hbos_nano DESC, vec_id LIMIT 20',
        "conformal_interval": 'WITH d AS (SELECT lang, doc_id % 2 AS split, CAST(n_chars AS BIGINT) AS v FROM documents), cal AS (SELECT lang, v FROM d WHERE split = 0), med AS (SELECT lang, v AS med FROM (SELECT lang, v, row_number() OVER (PARTITION BY lang ORDER BY v) AS rn, count(*) OVER (PARTITION BY lang) AS n FROM cal) WHERE rn = (n - 1) // 2 + 1), sc AS (SELECT c.lang, abs(c.v - m.med) AS s FROM cal c JOIN med m USING (lang)), q AS (SELECT lang, s AS qhat FROM (SELECT lang, s, row_number() OVER (PARTITION BY lang ORDER BY s) AS rn, count(*) OVER (PARTITION BY lang) AS n FROM sc) WHERE rn = least(n, (9 * (n + 1) + 9) // 10)), tst AS (SELECT lang, v FROM d WHERE split = 1), cov AS (SELECT t.lang, CAST(count(*) AS BIGINT) AS n_test, CAST(sum(CASE WHEN abs(t.v - m.med) <= q.qhat THEN 1 ELSE 0 END) AS BIGINT) AS n_covered FROM tst t JOIN med m USING (lang) JOIN q USING (lang) GROUP BY 1), nc AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_cal FROM cal GROUP BY 1) SELECT m.lang, nc.n_cal, cov.n_test, m.med, q.qhat, cov.n_covered FROM med m JOIN q USING (lang) JOIN cov USING (lang) JOIN nc USING (lang) ORDER BY m.lang',
        "token_waterfill": "WITH ns AS (SELECT source, CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS n FROM documents GROUP BY 1), tot AS (SELECT CAST(sum(n) // 2 AS BIGINT) AS b, count(*) AS m FROM ns), ordered AS (SELECT source, n, row_number() OVER (ORDER BY n, source) AS k, COALESCE(CAST(sum(n) OVER (ORDER BY n, source ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS p FROM ns), cand AS (SELECT DISTINCT t FROM (SELECT n AS t FROM ns UNION ALL SELECT greatest(0, ((SELECT b FROM tot) - p) // ((SELECT m FROM tot) - k + 1)) FROM ordered)), ev AS (SELECT c.t, CAST(sum(least(ns.n, c.t)) AS BIGINT) AS f FROM cand c CROSS JOIN ns GROUP BY 1), ts AS (SELECT COALESCE(max(t), 0) AS tstar FROM ev WHERE f <= (SELECT b FROM tot)), lv AS (SELECT (SELECT b FROM tot) - CAST(sum(least(n, (SELECT tstar FROM ts))) AS BIGINT) AS l FROM ns), pri AS (SELECT source, row_number() OVER (ORDER BY n DESC, source) AS r FROM ns WHERE n > (SELECT tstar FROM ts)) SELECT ns.source, ns.n AS n_tokens, least(ns.n, (SELECT tstar FROM ts)) + CASE WHEN pri.r IS NOT NULL AND pri.r <= (SELECT l FROM lv) THEN 1 ELSE 0 END AS alloc FROM ns LEFT JOIN pri USING (source) ORDER BY ns.source",
        "mmr_select": _mmr_oracle(),
        "length_emd": 'WITH h AS (SELECT source, CAST(n_chars AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2), ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1), prs AS (SELECT a.source AS sa, b.source AS sb FROM ns a JOIN ns b ON a.source < b.source), ev AS (SELECT p.sa, p.sb, h.v, CAST(sum(CASE WHEN h.source = p.sa THEN c ELSE 0 END) AS BIGINT) AS ca, CAST(sum(CASE WHEN h.source = p.sb THEN c ELSE 0 END) AS BIGINT) AS cb FROM prs p JOIN h ON h.source = p.sa OR h.source = p.sb GROUP BY 1, 2, 3), w AS (SELECT sa, sb, v, CAST(sum(ca) OVER (PARTITION BY sa, sb ORDER BY v) AS BIGINT) AS cuma, CAST(sum(cb) OVER (PARTITION BY sa, sb ORDER BY v) AS BIGINT) AS cumb, lead(v) OVER (PARTITION BY sa, sb ORDER BY v) AS nv FROM ev), t AS (SELECT sa, sb, CAST(sum(abs(cuma * (SELECT n FROM ns WHERE source = sb) - cumb * (SELECT n FROM ns WHERE source = sa)) * (nv - v)) AS BIGINT) AS w1 FROM w WHERE nv IS NOT NULL GROUP BY 1, 2) SELECT t.sa AS source_a, t.sb AS source_b, na.n AS n_a, nb.n AS n_b, t.w1 AS w1_num FROM t JOIN ns na ON na.source = t.sa JOIN ns nb ON nb.source = t.sb ORDER BY source_a, source_b',
        "isotonic_calibration": "WITH o AS (SELECT CAST(round(value * 100) AS BIGINT) AS c, event_id, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p FROM events), b AS (SELECT ntile(10) OVER (ORDER BY c, event_id) AS bin, p FROM o), g AS (SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(p) AS BIGINT) AS pos FROM b GROUP BY 1), wins AS (SELECT j.bin AS j, k.bin AS k, CAST((1000000 * sum(x.pos)) // sum(x.n) AS BIGINT) AS r FROM g j JOIN g k ON j.bin <= k.bin JOIN g x ON x.bin BETWEEN j.bin AND k.bin GROUP BY 1, 2), inn AS (SELECT w.j, i.bin AS i, min(w.r) AS mn FROM wins w JOIN g i ON w.j <= i.bin AND w.k >= i.bin GROUP BY 1, 2), iso AS (SELECT i, CAST(max(mn) AS BIGINT) AS iso_ppm FROM inn GROUP BY 1) SELECT g.bin, g.n, g.pos AS n_pos, iso.iso_ppm FROM g JOIN iso ON iso.i = g.bin ORDER BY g.bin",
        "curriculum_order": 'WITH d AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS v FROM documents), b AS (SELECT doc_id, source, v, CAST(ntile(10) OVER (ORDER BY v, doc_id) AS BIGINT) AS decile FROM d), r AS (SELECT doc_id, decile, source, v, row_number() OVER (PARTITION BY decile, source ORDER BY v, doc_id) - 1 AS rr FROM b), p AS (SELECT doc_id, decile, CAST(row_number() OVER (ORDER BY decile, rr, source) - 1 AS BIGINT) AS position FROM r) SELECT doc_id, decile, position FROM p ORDER BY doc_id',
        "padding_waste": "WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS v FROM documents), cfg AS (SELECT * FROM (VALUES ('random', 16), ('random', 64), ('sorted', 16), ('sorted', 64)) t(ordering, b)), rnk AS (SELECT doc_id, v, row_number() OVER (ORDER BY doc_id) - 1 AS r_rand, row_number() OVER (ORDER BY v, doc_id) - 1 AS r_sort FROM d), ba AS (SELECT c.ordering, c.b, (CASE WHEN c.ordering = 'random' THEN r_rand ELSE r_sort END) // c.b AS bid, v FROM rnk JOIN cfg c ON TRUE), ag AS (SELECT ordering, b, bid, CAST(count(*) AS BIGINT) AS rws, max(v) AS mx, CAST(sum(v) AS BIGINT) AS sv FROM ba GROUP BY 1, 2, 3) SELECT ordering, CAST(b AS BIGINT) AS batch_size, CAST(count(*) AS BIGINT) AS n_batches, CAST((1000000 * (sum(rws * mx) - sum(sv))) // sum(rws * mx) AS BIGINT) AS waste_ppm FROM ag GROUP BY 1, 2 ORDER BY ordering, batch_size",
        "rank_rbo": "WITH toks AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '')) AS term FROM documents), st AS MATERIALIZED (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1), a AS MATERIALIZED (SELECT term, row_number() OVER (ORDER BY df DESC, term) AS ra FROM st), b AS MATERIALIZED (SELECT term, row_number() OVER (ORDER BY tf DESC, term) AS rb FROM st) SELECT CAST(50 AS BIGINT) AS depth, CAST(sum(tn) AS BIGINT) AS rbo_nano FROM (SELECT CAST(floor((1 - 0.9) * power(0.9, CAST(t.i AS DOUBLE)) * (SELECT count(*) FROM a JOIN b USING (term) WHERE a.ra <= t.i + 1 AND b.rb <= t.i + 1) / (t.i + 1) * 1000000000 + 0.5) AS BIGINT) AS tn FROM range(50) t(i))",
        "clustering_coefficient": 'WITH ui AS (SELECT DISTINCT user_id, CAST(regexp_extract(props, \'"k":\\s*(-?\\d+)\', 1) AS BIGINT) AS item FROM events WHERE event_type = \'view\'), e0 AS (SELECT a.item AS a, b.item AS b, count(*) AS n FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item GROUP BY 1, 2), e AS MATERIALIZED (SELECT a, b FROM e0 WHERE n >= 2), tri AS (SELECT CAST(count(*) AS BIGINT) AS t FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b), deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1), wdg AS (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS w FROM deg) SELECT tri.t AS n_triangles, wdg.w AS n_wedges, CAST(CASE WHEN wdg.w = 0 THEN 0 ELSE (1000000 * 3 * tri.t) // wdg.w END AS BIGINT) AS cc_ppm FROM tri, wdg',
        "markov_stationary": _markov_stationary_oracle(),
        "join_cardinality_model": 'WITH cfg AS (SELECT \'orders_customer\' AS j), oc AS (SELECT CAST(count(*) AS BIGINT) AS nl, CAST(count(DISTINCT o_custkey) AS BIGINT) AS dl FROM orders), cc AS (SELECT CAST(count(*) AS BIGINT) AS nr, CAST(count(DISTINCT c_custkey) AS BIGINT) AS dr FROM customer), tc AS (SELECT CAST(count(*) AS BIGINT) AS t FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey), lo AS (SELECT CAST(count(*) AS BIGINT) AS nl, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS dl FROM lineitem), oo AS (SELECT CAST(count(*) AS BIGINT) AS nr, CAST(count(DISTINCT o_orderkey) AS BIGINT) AS dr FROM orders), tl AS (SELECT CAST(count(*) AS BIGINT) AS t FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey) SELECT * FROM (SELECT \'orders_customer\' AS "join", oc.nl AS n_left, cc.nr AS n_right, oc.dl AS d_left, cc.dr AS d_right, (oc.nl * cc.nr) // greatest(oc.dl, cc.dr) AS est, tc.t AS true_n, (1000000 * abs((oc.nl * cc.nr) // greatest(oc.dl, cc.dr) - tc.t)) // greatest(tc.t, 1) AS err_ppm FROM oc, cc, tc UNION ALL SELECT \'lineitem_orders\', lo.nl, oo.nr, lo.dl, oo.dr, (lo.nl * oo.nr) // greatest(lo.dl, oo.dr), tl.t, (1000000 * abs((lo.nl * oo.nr) // greatest(lo.dl, oo.dr) - tl.t)) // greatest(tl.t, 1) FROM lo, oo, tl) ORDER BY "join"',
        "oov_rate": "WITH toks AS (SELECT source, unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '')) AS term FROM documents), tc AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1), vocab AS (SELECT term FROM (SELECT term, row_number() OVER (ORDER BY c DESC, term) AS rn FROM tc) WHERE rn <= 1000), per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens, CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov FROM toks t LEFT JOIN vocab v ON v.term = t.term GROUP BY 1) SELECT source, n_tokens, n_oov, (1000000 * n_oov) // n_tokens AS oov_ppm FROM per ORDER BY source",
        "pps_systematic": 'WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w FROM documents), tot AS (SELECT CAST(sum(w) AS BIGINT) AS t FROM d), c AS (SELECT doc_id, w, COALESCE(CAST(sum(w) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum0 FROM d) SELECT doc_id, w AS n_chars, (cum0 * 50) // (SELECT t FROM tot) AS pick_idx FROM c WHERE ((cum0 + w) * 50) // (SELECT t FROM tot) > (cum0 * 50) // (SELECT t FROM tot) ORDER BY doc_id',
        "hill_tail": 'WITH r AS (SELECT CAST(n_chars AS BIGINT) AS v, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn FROM documents), ref AS (SELECT v AS xr FROM r WHERE rn = 101), s AS (SELECT CAST(sum(CAST(floor(ln(CAST(v AS DOUBLE) / (SELECT xr FROM ref)) * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS sl FROM r WHERE rn <= 100) SELECT CAST(100 AS BIGINT) AS k, s.sl AS sum_log_nano, CAST(CASE WHEN s.sl = 0 THEN 0 ELSE (CAST(100000000000 AS BIGINT) * 1000000) // s.sl END AS BIGINT) AS alpha_micro FROM s',
        "gini_split": 'WITH h AS (SELECT CAST(n_chars AS BIGINT) AS v, lang, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2), grid AS (SELECT DISTINCT v FROM h), langs AS (SELECT DISTINCT lang FROM h), cell AS (SELECT g.v, l.lang, COALESCE(h.c, 0) AS c FROM grid g CROSS JOIN langs l LEFT JOIN h ON h.v = g.v AND h.lang = l.lang), cum AS (SELECT v, lang, CAST(sum(c) OVER (PARTITION BY lang ORDER BY v) AS BIGINT) AS cl, CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS t FROM cell), agg AS (SELECT v, CAST(sum(cl) AS BIGINT) AS n_l, CAST(sum(t - cl) AS BIGINT) AS n_r, CAST(sum(cl * cl) AS BIGINT) AS sl2, CAST(sum((t - cl) * (t - cl)) AS BIGINT) AS sr2 FROM cum GROUP BY 1) SELECT v, n_l AS n_left, sl2 * n_r + sr2 * n_l AS gain_num, n_l * n_r AS gain_den FROM agg WHERE n_r > 0 ORDER BY v',
        "term_burstiness": "WITH toks AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '')) AS term FROM documents), pd AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2), st AS (SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(c) AS BIGINT) AS sum_c, CAST(sum(c * c) AS BIGINT) AS sum_c2 FROM pd GROUP BY 1), top AS (SELECT * FROM st ORDER BY df DESC, term LIMIT 50), nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents) SELECT term, df, sum_c, sum_c2, (1000000 * ((SELECT n FROM nd) * sum_c2 - sum_c * sum_c)) // (sum_c * (SELECT n FROM nd)) AS vmr_ppm FROM top ORDER BY term",
        "coverage_select": _coverage_oracle(),
        "curation_pipeline": _CURATION_SQL,
        "good_turing": "WITH toks AS (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '')) AS term FROM documents), tc AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1), fof AS (SELECT c AS r, CAST(count(*) AS BIGINT) AS n_r FROM tc GROUP BY 1) SELECT f.r, f.n_r, CAST((f.r + 1) * COALESCE(f2.n_r, 0) AS BIGINT) AS gt_num, f.n_r AS gt_den FROM fof f LEFT JOIN fof f2 ON f2.r = f.r + 1 ORDER BY f.r",
        "join_order_costs": "WITH s AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM customer) AS nc, (SELECT CAST(count(DISTINCT c_custkey) AS BIGINT) FROM customer) AS dcc, (SELECT CAST(count(*) AS BIGINT) FROM orders) AS no_, (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders) AS doc_, (SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT) FROM orders) AS doo, (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS nl, (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lineitem) AS dlo), x AS (SELECT *, (nc * no_) // greatest(dcc, doc_) AS n1a, (nl * no_) // greatest(dlo, doo) AS n1b FROM s), y AS (SELECT *, n1a + (n1a * nl) // greatest(least(doo, n1a), dlo) AS costa, n1b + (n1b * nc) // greatest(least(doc_, n1b), dcc) AS costb FROM x), r AS (SELECT 'C,O,L' AS join_order, costa AS cost FROM y UNION ALL SELECT 'O,C,L', costa FROM y UNION ALL SELECT 'L,O,C', costb FROM y UNION ALL SELECT 'O,L,C', costb FROM y) SELECT join_order, cost, CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_best FROM (SELECT *, row_number() OVER (ORDER BY cost, join_order) AS rn FROM r) ORDER BY join_order",
        "shapley_coverage": "WITH lx AS MATERIALIZED (SELECT lang, CAST(row_number() OVER (ORDER BY lang) - 1 AS BIGINT) AS li FROM (SELECT DISTINCT lang FROM documents)), tl AS MATERIALIZED (SELECT DISTINCT t.term, lx.li FROM (SELECT lang, unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '')) AS term FROM documents) t JOIN lx USING (lang)), tm AS (SELECT term, CAST(sum(1 << li) AS BIGINT) AS mask FROM tl GROUP BY 1), mc AS MATERIALIZED (SELECT mask, CAST(count(*) AS BIGINT) AS c FROM tm GROUP BY 1), subsets AS (SELECT CAST(t.i AS BIGINT) AS s FROM range(32) t(i)), vv AS MATERIALIZED (SELECT su.s, CAST(COALESCE(sum(CASE WHEN CAST(mc.mask AS BIGINT) & su.s <> 0 THEN mc.c ELSE 0 END), 0) AS BIGINT) AS v FROM subsets su CROSS JOIN mc GROUP BY 1), phi AS (SELECT l.lang, l.li, CAST(sum((CASE bit_count(su.s) WHEN 0 THEN 24 WHEN 1 THEN 6 WHEN 2 THEN 4 WHEN 3 THEN 6 ELSE 24 END) * (v1.v - v0.v)) AS BIGINT) AS phi_num FROM lx l JOIN subsets su ON (su.s & (1 << l.li)) = 0 JOIN vv v0 ON v0.s = su.s JOIN vv v1 ON v1.s = (su.s | (1 << l.li)) GROUP BY 1, 2) SELECT p.lang, p.phi_num, CAST(120 AS BIGINT) AS phi_den, (SELECT v FROM vv WHERE s = (1 << p.li)) AS v_solo, (SELECT v FROM vv WHERE s = 31) AS v_all FROM phi p ORDER BY p.lang",
        "modularity": "WITH RECURSIVE ui AS (SELECT DISTINCT user_id, CAST(json_extract(props, '$.k') AS BIGINT) AS item FROM events WHERE event_type = 'view'), prs AS (SELECT a.item AS ia, b.item AS ib FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item GROUP BY 1, 2 HAVING count(*) >= 2), ed AS MATERIALIZED (SELECT ia AS a, ib AS b FROM prs), sym AS MATERIALIZED (SELECT a, b FROM ed UNION ALL SELECT b, a FROM ed), nodes AS (SELECT DISTINCT a AS node FROM sym), reach(x, y) AS (SELECT node, node FROM nodes UNION SELECT r.x, s.b FROM reach r JOIN sym s ON s.a = r.y), comp AS MATERIALIZED (SELECT x AS node, CAST(min(y) AS BIGINT) AS c FROM reach GROUP BY 1), ecs AS (SELECT cp.c, CAST(count(*) AS BIGINT) AS ec FROM ed JOIN comp cp ON cp.node = ed.a GROUP BY 1), dcs AS (SELECT cp.c, CAST(count(*) AS BIGINT) AS dc FROM sym JOIN comp cp ON cp.node = sym.a GROUP BY 1), mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ed), q AS (SELECT CAST(sum(4 * (SELECT m FROM mm) * COALESCE(e.ec, 0) - d.dc * d.dc) AS BIGINT) AS qn FROM dcs d LEFT JOIN ecs e USING (c)) SELECT (SELECT m FROM mm) AS n_edges, (SELECT CAST(count(DISTINCT c) AS BIGINT) FROM comp) AS n_components, q.qn AS q_num, 4 * (SELECT m FROM mm) * (SELECT m FROM mm) AS q_den FROM q",
        "runs_test": 'WITH d AS (SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev FROM orders GROUP BY 1), md AS (SELECT rev AS med FROM (SELECT rev, row_number() OVER (ORDER BY rev, day) AS rn, count(*) OVER () AS n FROM d) WHERE rn = (n - 1) // 2 + 1), sg AS (SELECT day, CASE WHEN rev > (SELECT med FROM md) THEN 1 ELSE 0 END AS s, LAG(CASE WHEN rev > (SELECT med FROM md) THEN 1 ELSE 0 END) OVER (ORDER BY day) AS ps FROM d), st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(s) AS BIGINT) AS n1, CAST(count(*) - sum(s) AS BIGINT) AS n2, CAST(1 + sum(CASE WHEN ps IS NOT NULL AND s <> ps THEN 1 ELSE 0 END) AS BIGINT) AS r FROM sg) SELECT n AS n_days, n1 AS n_above, n2 AS n_below, r AS n_runs, CAST(CASE WHEN n1 = 0 OR n2 = 0 OR n < 2 THEN 0 ELSE floor((r - (2.0 * n1 * n2 / n + 1.0)) / sqrt((2.0 * n1 * n2 * (2.0 * n1 * n2 - n)) / (n * n * (n - 1.0))) * 1000000000 + 0.5) END AS BIGINT) AS z_nano FROM st',
        "heaps_fit": "WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '') AS ws FROM documents), tg AS MATERIALIZED (SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, greatest(len(ws) - 1, 1))]) AS ng FROM toks), occ AS (SELECT doc_id // 50 AS b, CAST(count(*) AS BIGINT) AS c FROM tg GROUP BY 1), fs AS (SELECT ng, min(doc_id) AS md FROM tg GROUP BY 1), vb AS (SELECT md // 50 AS b, CAST(count(*) AS BIGINT) AS v FROM fs GROUP BY 1), grid AS (SELECT b FROM occ UNION SELECT b FROM vb), mg AS (SELECT g.b, COALESCE(o.c, 0) AS c, COALESCE(vb.v, 0) AS v FROM grid g LEFT JOIN occ o ON o.b = g.b LEFT JOIN vb ON vb.b = g.b), cum AS (SELECT b, CAST(sum(c) OVER (ORDER BY b) AS BIGINT) AS cn, CAST(sum(v) OVER (ORDER BY b) AS BIGINT) AS cv FROM mg), pts AS (SELECT CAST(floor(ln(CAST(cn AS DOUBLE)) * 1000000000 + 0.5) AS BIGINT) AS x, CAST(floor(ln(CAST(cv AS DOUBLE)) * 1000000000 + 0.5) AS BIGINT) AS y FROM cum WHERE cn > 0 AND cv > 0), s AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, sum(CAST(x AS HUGEINT) * x) AS sxx, sum(CAST(x AS HUGEINT) * y) AS sxy FROM pts) SELECT n AS n_points, CAST(floor(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) / CAST(n * CAST(sxx AS HUGEINT) - CAST(sx AS HUGEINT) * sx AS DOUBLE) * 1000000000 + 0.5) AS BIGINT) AS beta_nano, CAST(floor((sy - CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) / CAST(n * CAST(sxx AS HUGEINT) - CAST(sx AS HUGEINT) * sx AS DOUBLE) * sx) / n + 0.5) AS BIGINT) AS logk_nano FROM s",
        "lead_lag": "WITH RECURSIVE d AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS v, CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS p FROM events GROUP BY 1), bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM d), grid(day) AS (SELECT lo FROM bounds UNION ALL SELECT day + 1 FROM grid WHERE day < (SELECT hi FROM bounds)), g AS MATERIALIZED (SELECT grid.day, COALESCE(d.v, 0) AS v, COALESCE(d.p, 0) AS p FROM grid LEFT JOIN d USING (day)), lags AS (SELECT CAST(t.i AS BIGINT) AS lag FROM range(8) t(i)), pr AS (SELECT l.lag, a.v AS x, b.p AS y FROM lags l JOIN g a ON TRUE JOIN g b ON b.day = a.day + l.lag), s AS (SELECT lag, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy FROM pr GROUP BY 1) SELECT lag, n AS n_pairs, n * sxy - sx * sy AS cov_num FROM s ORDER BY lag",
        "video_framesample": "WITH r AS (SELECT doc_id, 'https://media.example/' || doc_id || '/clip-0.mp4' AS media_ref FROM documents), d AS (SELECT doc_id, media_ref, 1000 + CAST(concat('0x', substr(md5(media_ref), 5, 2)) AS INTEGER) * 37 AS dur FROM r), f AS (SELECT doc_id, media_ref, dur, (dur * 25) // 1000 AS nf FROM d) SELECT doc_id, media_ref, CAST(dur AS BIGINT) AS duration_ms, CAST(nf AS BIGINT) AS n_frames, CAST(CASE WHEN nf > 0 THEN (nf + 4) // 5 ELSE 0 END AS BIGINT) AS n_sampled, CAST(CASE WHEN nf > 0 THEN 0 ELSE -1 END AS BIGINT) AS first_idx, CAST(CASE WHEN nf > 0 THEN ((nf - 1) // 5) * 5 ELSE -1 END AS BIGINT) AS last_idx FROM f ORDER BY doc_id",
        "jonckheere": 'WITH h AS (SELECT source, CAST(n_chars AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2), pr AS (SELECT a.v AS va, a.c AS ca, b.v AS vb, b.c AS cb FROM h a JOIN h b ON a.source < b.source), j AS (SELECT CAST(sum(CASE WHEN va < vb THEN 2 * ca * cb WHEN va = vb THEN ca * cb ELSE 0 END) AS BIGINT) AS j2 FROM pr), ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS ni FROM h GROUP BY 1), s AS (SELECT CAST(sum(ni) AS BIGINT) AS n, CAST(sum(ni * ni) AS BIGINT) AS ssq, CAST(sum(ni * ni * (2 * ni + 3)) AS BIGINT) AS scu, CAST(count(*) AS BIGINT) AS k FROM ns) SELECT s.n, s.k AS k_groups, j.j2, (s.n * s.n - s.ssq) // 2 AS mu2, CAST(floor(((j.j2 - (s.n * s.n - s.ssq) // 2) / 2.0) / sqrt(CAST(s.n * s.n * (2 * s.n + 3) - s.scu AS DOUBLE) / 72.0) * 1000000000 + 0.5) AS BIGINT) AS z_nano FROM s, j',
        "james_stein": 'WITH st AS (SELECT source, CAST(sum(n_chars) AS HUGEINT) AS s, CAST(sum(CAST(n_chars AS BIGINT) * n_chars) AS HUGEINT) AS q, CAST(count(*) AS HUGEINT) AS n FROM documents GROUP BY 1), mi AS (SELECT source, n, (1000000 * s) // n AS m, (CAST(1000000 AS HUGEINT) * 1000000 * (n * q - s * s)) // (n * n * n) AS vm FROM st), g AS (SELECT CAST(count(*) AS HUGEINT) AS k, sum(m) AS sm, sum(vm) AS svm FROM mi), g2 AS (SELECT k, sm // k AS mbar, svm // k AS vbar FROM g), s2t AS (SELECT CAST(sum((m - (SELECT mbar FROM g2)) * (m - (SELECT mbar FROM g2))) AS HUGEINT) AS s2 FROM mi), ft AS (SELECT greatest(CAST(0 AS HUGEINT), (SELECT s2 FROM s2t) - ((SELECT k FROM g2) - 3) * (SELECT vbar FROM g2)) AS f) SELECT source, CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS mean_micro, CAST(CASE WHEN (SELECT s2 FROM s2t) = 0 THEN (SELECT mbar FROM g2) ELSE (SELECT mbar FROM g2) + ((SELECT f FROM ft) * (m - (SELECT mbar FROM g2))) // (SELECT s2 FROM s2t) END AS BIGINT) AS shrunk_micro FROM mi ORDER BY source',
        "lttb_downsample": 'WITH RECURSIVE d AS MATERIALIZED (SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev FROM orders GROUP BY 1), idx AS MATERIALIZED (SELECT day, rev, row_number() OVER (ORDER BY day) - 1 AS i FROM d), mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM idx), sel(b, pd, pr) AS (SELECT CAST(-1 AS BIGINT), (SELECT day FROM idx WHERE i = 0), (SELECT rev FROM idx WHERE i = 0) UNION ALL SELECT nb, day, rev FROM (WITH cur AS (SELECT * FROM sel), st AS (SELECT cur.b + 1 AS nb, cur.pd, cur.pr, (SELECT m FROM mm) AS m FROM cur), cand AS (SELECT s.nb, s.pd, s.pr, s.m, i.day, i.rev FROM st s JOIN idx i ON i.i >= 1 + s.nb * (s.m - 2) // 20 AND i.i < 1 + (s.nb + 1) * (s.m - 2) // 20 WHERE s.nb < 20 AND s.m > 2), nxtb AS (SELECT s.nb, CAST(sum(i.day) AS BIGINT) AS sxn, CAST(sum(i.rev) AS BIGINT) AS syn, CAST(count(*) AS BIGINT) AS den FROM st s JOIN idx i ON i.i >= 1 + (s.nb + 1) * (s.m - 2) // 20 AND i.i < 1 + (s.nb + 2) * (s.m - 2) // 20 WHERE s.nb < 19 GROUP BY 1), anchor AS (SELECT s.nb, CASE WHEN s.nb < 19 AND nx.den > 0 THEN nx.sxn ELSE (SELECT day FROM idx WHERE i = s.m - 1) END AS sxn, CASE WHEN s.nb < 19 AND nx.den > 0 THEN nx.syn ELSE (SELECT rev FROM idx WHERE i = s.m - 1) END AS syn, CASE WHEN s.nb < 19 AND nx.den > 0 THEN nx.den ELSE 1 END AS den FROM st s LEFT JOIN nxtb nx ON nx.nb = s.nb), scored AS (SELECT c.nb, c.day, c.rev, abs((c.pd * a.den - a.sxn) * (c.rev - c.pr) - (c.pd - c.day) * (a.syn - c.pr * a.den)) AS sc FROM cand c JOIN anchor a ON a.nb = c.nb) SELECT nb, day, rev FROM scored ORDER BY sc DESC, day LIMIT 1)), pts AS (SELECT b, pd AS day, pr AS rev FROM sel UNION ALL SELECT 99, (SELECT day FROM idx WHERE i = (SELECT m FROM mm) - 1), (SELECT rev FROM idx WHERE i = (SELECT m FROM mm) - 1) WHERE (SELECT m FROM mm) > 1) SELECT CAST(row_number() OVER (ORDER BY b) - 1 AS BIGINT) AS ord, day, rev FROM pts ORDER BY ord',
        "sprt_crossing": "WITH e AS (SELECT epoch_us(ts) AS tsu, event_id, CASE WHEN event_type = 'purchase' THEN 223143551 ELSE -64538521 END AS llr FROM events), w AS (SELECT CAST(sum(llr) OVER (ORDER BY tsu, event_id) AS BIGINT) AS c, CAST(row_number() OVER (ORDER BY tsu, event_id) - 1 AS BIGINT) AS r FROM e), x AS (SELECT r, c FROM w WHERE c >= 2944438979 OR c <= -2944438979 ORDER BY r LIMIT 1) SELECT CAST(COALESCE(CASE WHEN (SELECT c FROM x) >= 2944438979 THEN 1 WHEN (SELECT c FROM x) <= -2944438979 THEN -1 END, 0) AS BIGINT) AS decision, CAST(COALESCE((SELECT r FROM x), -1) AS BIGINT) AS crossing_rank, CAST(COALESCE((SELECT c FROM x), 0) AS BIGINT) AS cum_llr_nano",
        "lis_revenue": 'WITH RECURSIVE d AS MATERIALIZED (SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev FROM orders GROUP BY 1), idx AS MATERIALIZED (SELECT day, rev, row_number() OVER (ORDER BY day) - 1 AS i FROM d), lis(i, l) AS (SELECT i, CAST(1 AS BIGINT) FROM idx UNION SELECT b.i, a.l + 1 FROM lis a JOIN idx xa ON xa.i = a.i JOIN idx b ON b.i > xa.i AND b.rev > xa.rev), ml AS (SELECT i, CAST(max(l) AS BIGINT) AS l FROM lis GROUP BY 1), mx AS (SELECT max(l) AS best FROM ml) SELECT (SELECT CAST(count(*) AS BIGINT) FROM idx) AS n_days, CAST(COALESCE((SELECT best FROM mx), 0) AS BIGINT) AS lis_len, CAST(COALESCE((SELECT min(idx.day) FROM ml JOIN idx ON idx.i = ml.i WHERE ml.l = (SELECT best FROM mx)), -1) AS BIGINT) AS end_day',
        "voptimal_histogram": _voptimal_oracle(),
        "knapsack_sources": "WITH RECURSIVE stt AS MATERIALIZED (SELECT source, CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS nt FROM documents GROUP BY 1), toks AS (SELECT source, list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '') AS ws FROM documents), tri AS (SELECT DISTINCT source, ng FROM (SELECT source, unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, greatest(len(ws) - 1, 1))]) AS ng FROM toks)), vv AS (SELECT source, CAST(count(*) AS BIGINT) AS v FROM tri GROUP BY 1), it AS MATERIALIZED (SELECT s.source, CAST(s.nt // 100 AS BIGINT) AS w, CAST(COALESCE(vv.v, 0) AS BIGINT) AS v, CAST(row_number() OVER (ORDER BY s.source) AS BIGINT) AS i FROM stt s LEFT JOIN vv USING (source)), cap AS (SELECT CAST((sum(nt) // 2) // 100 AS BIGINT) AS c FROM stt), caps(c) AS (SELECT CAST(0 AS BIGINT) UNION ALL SELECT c + 1 FROM caps WHERE c < (SELECT c FROM cap)), kn(i, c, d) AS (SELECT CAST(0 AS BIGINT), c, CAST(0 AS BIGINT) FROM caps UNION ALL SELECT i, c, d FROM (WITH cur AS (SELECT * FROM kn), stp AS (SELECT cur.i + 1 AS ni, (SELECT w FROM it WHERE it.i = cur.i + 1) AS wi, (SELECT v FROM it WHERE it.i = cur.i + 1) AS vi, cur.c, cur.d FROM cur WHERE cur.i + 1 <= (SELECT count(*) FROM it)) SELECT s.ni AS i, s.c AS c, CASE WHEN tk.d IS NOT NULL AND tk.d + s.vi > s.d THEN tk.d + s.vi ELSE s.d END AS d FROM stp s LEFT JOIN cur tk ON tk.c = s.c - s.wi)), bt(i, c) AS (SELECT CAST((SELECT count(*) FROM it) AS BIGINT), (SELECT c FROM cap) UNION ALL SELECT b.i - 1, b.c - CASE WHEN (SELECT d FROM kn k1 WHERE k1.i = b.i AND k1.c = b.c) <> (SELECT d FROM kn k0 WHERE k0.i = b.i - 1 AND k0.c = b.c) THEN (SELECT w FROM it WHERE it.i = b.i) ELSE 0 END FROM bt b WHERE b.i >= 1) SELECT it.source, it.w AS w_units, it.v AS value, CAST(CASE WHEN (SELECT d FROM kn k1 WHERE k1.i = it.i AND k1.c = bt.c) <> (SELECT d FROM kn k0 WHERE k0.i = it.i - 1 AND k0.c = bt.c) THEN 1 ELSE 0 END AS BIGINT) AS chosen FROM it JOIN bt ON bt.i = it.i ORDER BY it.source",
        "theil_index": "WITH st AS MATERIALIZED (SELECT source, CAST(sum(n_chars) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1), g AS (SELECT CAST(sum(s) AS BIGINT) AS gs, CAST(sum(n) AS BIGINT) AS gn FROM st), rw AS (SELECT d.source, CAST(floor((CAST(d.n_chars AS DOUBLE) * st.n / st.s) * ln(CAST(d.n_chars AS DOUBLE) * st.n / st.s) * 1000000000 + 0.5) AS BIGINT) AS wn, CAST(floor((CAST(d.n_chars AS DOUBLE) * (SELECT gn FROM g) / (SELECT gs FROM g)) * ln(CAST(d.n_chars AS DOUBLE) * (SELECT gn FROM g) / (SELECT gs FROM g)) * 1000000000 + 0.5) AS BIGINT) AS gt FROM documents d JOIN st USING (source)), ws AS (SELECT source, CAST(sum(wn) AS BIGINT) AS w, CAST(sum(gt) AS BIGINT) AS gg FROM rw GROUP BY 1), wt AS (SELECT 'within' AS scope, ws.source, ws.w // st.n AS t_nano FROM ws JOIN st USING (source)), bt AS (SELECT 'between' AS scope, '*' AS source, CAST(sum(CAST(floor((CAST(st.s AS DOUBLE) / (SELECT gs FROM g)) * ln(CAST(st.s * (SELECT gn FROM g) AS DOUBLE) / CAST((SELECT gs FROM g) * st.n AS DOUBLE)) * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS t_nano FROM st), tt AS (SELECT 'total' AS scope, '*' AS source, CAST((SELECT sum(gg) FROM ws) // (SELECT gn FROM g) AS BIGINT) AS t_nano) SELECT * FROM wt UNION ALL SELECT * FROM bt UNION ALL SELECT * FROM tt ORDER BY scope, source",
    }
