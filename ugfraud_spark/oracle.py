"""DuckDB oracle SQL builders.

Each builder returns ANSI SQL that reproduces, on the same parquet
tables, exactly what the paired Spark query computes. Iterative kernels
(PageRank, CC min-propagation, LPA, GANG, ZooBP, SpEagle) are defined as
*fixed-iteration* kernels so the oracle is expressible as a
programmatically unrolled CTE chain — parity is then exact by
construction; true convergence is separately asserted in pytest against
numpy oracles.

Cross-engine float discipline:
- every literal that participates in double arithmetic is written
  ``x::DOUBLE`` (DuckDB decimal literals would otherwise compute in
  DECIMAL and diverge from Spark's double);
- final float columns are ``ROUND(x, 6)`` in both engines, absorbing
  summation-order low-bit differences.
"""

from __future__ import annotations

from .sources.tables import PART_OFFSET, PRIOR_MOD, PRIOR_MULT, UNI_MOD

# ---------------------------------------------------------------- fragments

def uni_frag(mod: int) -> str:
    """Unipartite edge derivation; ``mod`` must equal the Spark side's
    ``tables.uni_mod_for(sf_dir)`` for the scale being checked (the
    registry renders the driver's sf0.01; tests re-render for sf0.001
    via ``registry.build_registry``)."""
    return (
        f"SELECT DISTINCT (l_orderkey % {mod}) AS src, "
        f"(l_partkey % {mod}) AS dst FROM lineitem "
        f"WHERE (l_orderkey % {mod}) <> (l_partkey % {mod})"
    )

UND = "SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM uni"

SYM = "SELECT a AS src, b AS dst FROM und UNION ALL SELECT b AS src, a AS dst FROM und"

BIP = (
    f"SELECT src, dst, CAST(1.0 AS DOUBLE) AS weight, sign FROM ("
    f"SELECT l_orderkey AS src, l_partkey + {PART_OFFSET} AS dst, "
    f"MIN(CASE WHEN l_quantity >= 25 THEN 1 ELSE 2 END) AS sign "
    f"FROM lineitem GROUP BY 1, 2)"
)

# YelpChi-shaped bipartite: constant 201-product side (tables.bip_yelp_edges)
BIP_YELP = (
    f"SELECT src, dst, CAST(1.0 AS DOUBLE) AS weight, sign FROM ("
    f"SELECT l_orderkey AS src, l_partkey % 201 + {PART_OFFSET} AS dst, "
    f"MIN(CASE WHEN l_quantity >= 25 THEN 1 ELSE 2 END) AS sign "
    f"FROM lineitem GROUP BY 1, 2)"
)

VERTS = "SELECT src AS id FROM uni UNION SELECT dst FROM uni"

BIP_VERTS = "SELECT src AS id FROM bip UNION SELECT dst FROM bip"


def prior_expr(id_col: str = "id") -> str:
    return (
        f"(({id_col} * {PRIOR_MULT}) % {PRIOR_MOD}) / CAST({PRIOR_MOD} AS DOUBLE)"
    )


def _with(ctes: list[tuple[str, str]], final: str) -> str:
    # AS MATERIALIZED (DuckDB) prevents exponential re-evaluation when an
    # unrolled iteration references its predecessor CTE multiple times
    # (observed 282s → 1.3s on the 10-round CC oracle at sf0.01). These
    # strings are only ever executed by DuckDB, never by Spark.
    body = ",\n".join(f"{name} AS MATERIALIZED (\n{sql}\n)" for name, sql in ctes)
    return f"WITH {body}\n{final}"


# ----------------------------------------------------------------- queries


def sql_bip_edges() -> str:
    return _with([("bip", BIP)], "SELECT src, dst, weight, sign FROM bip")


def sql_out_degree_top(k: int = 20, mod: int = UNI_MOD) -> str:
    return _with(
        [("uni", uni_frag(mod))],
        "SELECT src AS id, COUNT(*) AS out_deg FROM uni GROUP BY src "
        f"ORDER BY out_deg DESC, id ASC LIMIT {k}",
    )


def sql_degree_histogram(bucket: int = 5, mod: int = UNI_MOD) -> str:
    return _with(
        [("uni", uni_frag(mod)),
         ("deg", "SELECT dst AS id, COUNT(*) AS d FROM uni GROUP BY dst")],
        f"SELECT CAST(FLOOR(d / {bucket}) AS BIGINT) AS bucket, COUNT(*) AS n_vertices "
        "FROM deg GROUP BY 1",
    )


def sql_pagerank(iters: int = 5, damping: float = 0.85, mod: int = UNI_MOD,
                 reverse: bool = False, alias: str = "pagerank") -> str:
    """``reverse=True`` ranks the TRANSPOSED graph (CheiRank): the same
    recurrence over src/dst-swapped edges; the vertex set is symmetric
    so only the edge CTE changes."""
    ctes = (
        [("uni0", uni_frag(mod)),
         ("uni", "SELECT dst AS src, src AS dst FROM uni0")]
        if reverse else [("uni", uni_frag(mod))]
    ) + [
        ("v", VERTS),
        ("od", "SELECT src AS id, COUNT(*) AS out_deg FROM uni GROUP BY src"),
        ("nn", "SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v"),
        ("r0", "SELECT v.id, CAST(1.0 AS DOUBLE) / nn.n AS pr FROM v, nn"),
    ]
    d = f"CAST({damping!r} AS DOUBLE)"
    for t in range(1, iters + 1):
        prev = f"r{t-1}"
        ctes.append(
            (
                f"r{t}",
                f"SELECT v.id, (CAST(1.0 AS DOUBLE) - {d}) / nn.n "
                f"+ {d} * COALESCE(s.mass, CAST(0.0 AS DOUBLE)) AS pr\n"
                f"FROM v CROSS JOIN nn LEFT JOIN (\n"
                f"  SELECT uni.dst AS id, SUM({prev}.pr / od.out_deg) AS mass\n"
                f"  FROM uni JOIN {prev} ON {prev}.id = uni.src "
                f"JOIN od ON od.id = uni.src GROUP BY uni.dst\n"
                f") s ON s.id = v.id",
            )
        )
    return _with(ctes, f"SELECT id, ROUND(pr, 6) AS {alias} FROM r{iters}")


def sql_pagerank_residuals(iters: int = 5, damping: float = 0.85,
                           mod: int = UNI_MOD) -> str:
    """Mirror of pagerank.residual_curve: the sql_pagerank recurrence
    verbatim, per-iteration Σ floor(|Δ|·1e9) as exact BIGINT nano-units
    (floor of identical doubles is engine-independent), one division."""
    ctes = [
        ("uni", uni_frag(mod)),
        ("v", VERTS),
        ("od", "SELECT src AS id, COUNT(*) AS out_deg FROM uni GROUP BY src"),
        ("nn", "SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v"),
        ("r0", "SELECT v.id, CAST(1.0 AS DOUBLE) / nn.n AS pr FROM v, nn"),
    ]
    d = f"CAST({damping!r} AS DOUBLE)"
    for t in range(1, iters + 1):
        prev = f"r{t-1}"
        ctes.append(
            (
                f"r{t}",
                f"SELECT v.id, (CAST(1.0 AS DOUBLE) - {d}) / nn.n "
                f"+ {d} * COALESCE(s.mass, CAST(0.0 AS DOUBLE)) AS pr\n"
                f"FROM v CROSS JOIN nn LEFT JOIN (\n"
                f"  SELECT uni.dst AS id, SUM({prev}.pr / od.out_deg) AS mass\n"
                f"  FROM uni JOIN {prev} ON {prev}.id = uni.src "
                f"JOIN od ON od.id = uni.src GROUP BY uni.dst\n"
                f") s ON s.id = v.id",
            )
        )
    unions = " UNION ALL ".join(
        f"SELECT {t} AS iter, CAST(SUM(CAST(FLOOR(ABS(r{t}.pr - r{t-1}.pr)"
        f" * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS l1_residual "
        f"FROM r{t} JOIN r{t-1} ON r{t-1}.id = r{t}.id"
        for t in range(1, iters + 1))
    return _with(ctes, unions)


def sql_topic_ppr(iters: int = 5, k: int = 3, seed_cap: int = 30,
                  damping: float = 0.85, mod: int = UNI_MOD) -> str:
    """Mirror of pagerank.topic_ppr: K personalized-teleport recurrences
    carried as K columns through ONE unrolled iteration chain — the SQL
    shape deliberately matches the engine's one-join-one-agg-per-step
    batching. Seeds for topic t = vertices with id < seed_cap and
    id % k == t; teleport (1-d)/n_t on seeds; init v_t = tp_t/(1-d)
    (the same stored-division IEEE sequence the Spark side runs)."""
    d = f"CAST({damping!r} AS DOUBLE)"
    one = "CAST(1.0 AS DOUBLE)"
    zero = "CAST(0.0 AS DOUBLE)"
    tp_cols = ", ".join(
        f"COALESCE(CASE WHEN s.topic = {t} THEN ({one} - {d}) / c.n END, "
        f"{zero}) AS tp{t}"
        for t in range(k)
    )
    ctes = [
        ("uni", uni_frag(mod)),
        ("v", VERTS),
        ("od", "SELECT src AS id, COUNT(*) AS out_deg FROM uni GROUP BY src"),
        ("seeds",
         f"SELECT id, id % {k} AS topic FROM v WHERE id < {seed_cap}"),
        ("cnt",
         "SELECT topic, CAST(COUNT(*) AS DOUBLE) AS n FROM seeds "
         "GROUP BY topic"),
        ("tp",
         f"SELECT v.id, {tp_cols} FROM v "
         "LEFT JOIN seeds s ON s.id = v.id "
         "LEFT JOIN cnt c ON c.topic = s.topic"),
        ("r0",
         "SELECT id, "
         + ", ".join(f"tp{t} / ({one} - {d}) AS v{t}" for t in range(k))
         + " FROM tp"),
    ]
    for i in range(1, iters + 1):
        prev = f"r{i-1}"
        mass = ", ".join(
            f"SUM({prev}.v{t} / od.out_deg) AS m{t}" for t in range(k))
        upd = ", ".join(
            f"tp.tp{t} + {d} * COALESCE(s.m{t}, {zero}) AS v{t}"
            for t in range(k))
        ctes.append((
            f"r{i}",
            f"SELECT tp.id, {upd} FROM tp LEFT JOIN (\n"
            f"  SELECT uni.dst AS id, {mass} FROM uni "
            f"JOIN {prev} ON {prev}.id = uni.src "
            f"JOIN od ON od.id = uni.src GROUP BY uni.dst\n"
            f") s ON s.id = tp.id",
        ))
    final = "SELECT id, " + ", ".join(
        f"ROUND(v{t}, 6) AS ppr_{t}" for t in range(k)
    ) + f" FROM r{iters}"
    return _with(ctes, final)


def sql_redirect_resolution(doublings: int = 3) -> str:
    """Mirror of crawl.redirect_resolution_demo: same synthetic map,
    unrolled pointer-doubling self-joins, same resolved test."""
    ctes = [
        ("nn", "SELECT COUNT(*) AS n FROM documents"),
        ("red",
         "SELECT doc_id AS src, (doc_id * 3 + 7) % nn.n AS dst "
         "FROM documents, nn WHERE doc_id % 13 = 0"),
        ("f0",
         "SELECT d.doc_id AS id, COALESCE(r.dst, d.doc_id) AS nxt "
         "FROM documents d LEFT JOIN red r ON r.src = d.doc_id"),
    ]
    for k in range(1, doublings + 1):
        ctes.append((
            f"f{k}",
            f"SELECT a.id, b.nxt FROM f{k-1} a "
            f"JOIN f{k-1} b ON b.id = a.nxt",
        ))
    return _with(
        ctes,
        f"SELECT r.src AS id, f.nxt AS final_id, "
        f"(r2.src IS NULL) AS resolved "
        f"FROM red r JOIN f{doublings} f ON f.id = r.src "
        f"LEFT JOIN red r2 ON r2.src = f.nxt",
    )


def sql_host_rank(iters: int = 5, damping: float = 0.85,
                  mod: int = UNI_MOD,
                  n_hosts: int | None = None) -> str:
    """Mirror of quotient.host_graph (intra-host pairs excluded) |>
    pagerank.pagerank_weighted: the host-ranking kernel. Weights are
    integer-valued doubles (link counts), so every W_out sum is exact;
    mass sums mirror the engine's (pr / out_w) * w term order."""
    if n_hosts is None:
        from .operators.quotient import N_HOSTS
        n_hosts = N_HOSTS
    ctes = [
        ("uni", uni_frag(mod)),
        ("hg",
         f"SELECT (src % {n_hosts}) AS sh, (dst % {n_hosts}) AS dh, "
         f"CAST(COUNT(*) AS DOUBLE) AS w FROM uni "
         f"WHERE (src % {n_hosts}) <> (dst % {n_hosts}) GROUP BY 1, 2"),
        ("v", "SELECT sh AS id FROM hg UNION SELECT dh FROM hg"),
        ("ow", "SELECT sh AS id, SUM(w) AS out_w FROM hg GROUP BY sh"),
        ("nn", "SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v"),
        ("h0", "SELECT v.id, CAST(1.0 AS DOUBLE) / nn.n AS pr FROM v, nn"),
    ]
    d = f"CAST({damping!r} AS DOUBLE)"
    for t in range(1, iters + 1):
        prev = f"h{t-1}"
        ctes.append((
            f"h{t}",
            f"SELECT v.id, (CAST(1.0 AS DOUBLE) - {d}) / nn.n "
            f"+ {d} * COALESCE(s.mass, CAST(0.0 AS DOUBLE)) AS pr\n"
            f"FROM v CROSS JOIN nn LEFT JOIN (\n"
            f"  SELECT hg.dh AS id, SUM(({prev}.pr / ow.out_w) * hg.w) "
            f"AS mass FROM hg JOIN {prev} ON {prev}.id = hg.sh "
            f"JOIN ow ON ow.id = hg.sh GROUP BY hg.dh\n"
            f") s ON s.id = v.id",
        ))
    return _with(ctes, f"SELECT id, ROUND(pr, 6) AS host_rank FROM h{iters}")


def sql_host_top_pages(iters: int = 5, k: int = 3,
                       n_hosts: int | None = None,
                       mod: int = UNI_MOD) -> str:
    """Mirror of quotient.host_top_pages over sql_pagerank scores: the
    rank chain nests as a materialized CTE subquery; identical host
    map, (score desc, id) ROW_NUMBER per host, same k-cut."""
    if n_hosts is None:
        from .operators.quotient import N_HOSTS
        n_hosts = N_HOSTS
    return _with(
        [("prq", sql_pagerank(iters, mod=mod)),
         ("ranked",
          f"SELECT (id % {n_hosts}) AS host, id, pagerank AS score, "
          f"ROW_NUMBER() OVER (PARTITION BY id % {n_hosts} "
          f"ORDER BY pagerank DESC, id) AS rnk FROM prq")],
        f"SELECT host, rnk, id, score FROM ranked WHERE rnk <= {k}",
    )


def sql_butterflies(max_deg: int = 256) -> str:
    """Mirror of triangles.butterflies: identical product-degree cap,
    u<v wedge self-join on the product key, integer C(c,2)."""
    return _with(
        [("bip", BIP),
         ("ok",
          f"SELECT dst FROM (SELECT dst, COUNT(*) AS d FROM bip "
          f"GROUP BY dst) WHERE d <= {max_deg}"),
         ("e", "SELECT src, dst FROM bip WHERE dst IN (SELECT dst FROM ok)"),
         ("pr",
          "SELECT l.src AS u, r.src AS v, COUNT(*) AS c FROM e l "
          "JOIN e r ON r.dst = l.dst AND l.src < r.src "
          "GROUP BY l.src, r.src HAVING COUNT(*) >= 2"),
         ("bf",
          "SELECT u, v, (c * (c - 1)) // 2 AS bf FROM pr"),
         ("per",
          "SELECT u AS usr, bf FROM bf UNION ALL SELECT v AS usr, bf "
          "FROM bf")],
        'SELECT usr AS "user", CAST(SUM(bf) AS BIGINT) AS n_butterflies '
        "FROM per GROUP BY usr",
    )


def sql_rich_club(ks: tuple = (1, 2, 4, 8, 16, 32, 64),
                  mod: int = UNI_MOD) -> str:
    """Mirror of degrees.rich_club: same histogram collapse, same grid
    inequality join, identical (2·e)/(n·(n−1)) double expression."""
    klist = ", ".join(str(int(k)) for k in ks)
    return _with(
        [("uni", uni_frag(mod)),
         ("und", UND),
         ("deg",
          "SELECT id, COUNT(*) AS deg FROM (SELECT a AS id FROM und "
          "UNION ALL SELECT b AS id FROM und) GROUP BY id"),
         ("m",
          "SELECT LEAST(da.deg, db.deg) AS m FROM und "
          "JOIN deg da ON da.id = und.a JOIN deg db ON db.id = und.b"),
         ("eh", "SELECT m, COUNT(*) AS ec FROM m GROUP BY m"),
         ("nh", "SELECT deg, COUNT(*) AS nc FROM deg GROUP BY deg"),
         ("grid", f"SELECT UNNEST([{klist}]) AS k"),
         ("nk",
          "SELECT k, CAST(SUM(nc) AS BIGINT) AS n_k FROM grid "
          "JOIN nh ON nh.deg > grid.k GROUP BY k"),
         ("ek",
          "SELECT k, CAST(SUM(ec) AS BIGINT) AS e_k FROM grid "
          "JOIN eh ON eh.m > grid.k GROUP BY k")],
        "SELECT nk.k, nk.n_k, COALESCE(ek.e_k, 0) AS e_k, "
        "CAST(2.0 AS DOUBLE) * CAST(COALESCE(ek.e_k, 0) AS DOUBLE) "
        "/ CAST(nk.n_k * (nk.n_k - 1) AS DOUBLE) AS phi "
        "FROM nk LEFT JOIN ek ON ek.k = nk.k WHERE nk.n_k >= 2",
    )


def sql_knn_curve(mod: int = UNI_MOD) -> str:
    """Mirror of degrees.knn_curve: symmetric endpoint-degree join,
    exact sums per degree class, one division."""
    return _with(
        [("uni", uni_frag(mod)),
         ("und", UND),
         ("deg",
          "SELECT id, COUNT(*) AS deg FROM (SELECT a AS id FROM und "
          "UNION ALL SELECT b AS id FROM und) GROUP BY id"),
         ("sym",
          "SELECT a AS v, b AS u FROM und "
          "UNION ALL SELECT b AS v, a AS u FROM und"),
         ("j",
          "SELECT dv.deg AS deg, du.deg AS du FROM sym "
          "JOIN deg dv ON dv.id = sym.v JOIN deg du ON du.id = sym.u"),
         ("pc",
          "SELECT deg, CAST(SUM(du) AS BIGINT) AS s_nbr, "
          "CAST(COUNT(*) AS BIGINT) AS n_ends FROM j GROUP BY deg"),
         ("sz",
          "SELECT deg, CAST(COUNT(*) AS BIGINT) AS n_vertices "
          "FROM deg GROUP BY deg")],
        "SELECT pc.deg, sz.n_vertices, "
        "CAST(pc.s_nbr AS DOUBLE) / CAST(pc.n_ends AS DOUBLE) "
        "AS avg_nbr_deg FROM pc JOIN sz ON sz.deg = pc.deg",
    )


def sql_degree_deciles(mod: int = UNI_MOD) -> str:
    """Mirror of degrees.degree_deciles: cumulative-below over the
    degree histogram, tie-sharing floor(10·below/n) buckets."""
    return _with(
        [("uni", uni_frag(mod)),
         ("und", UND),
         ("deg",
          "SELECT id, COUNT(*) AS deg FROM (SELECT a AS id FROM und "
          "UNION ALL SELECT b AS id FROM und) GROUP BY id"),
         ("nh", "SELECT deg, COUNT(*) AS nc FROM deg GROUP BY deg"),
         ("cum",
          "SELECT deg, COALESCE(SUM(nc) OVER (ORDER BY deg "
          "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
          "AS below FROM nh"),
         ("n", "SELECT COUNT(*) AS n FROM deg")],
        "SELECT deg.id, deg.deg, "
        "CAST((10 * cum.below) // n.n AS INTEGER) AS decile "
        "FROM deg JOIN cum USING (deg), n",
    )


def sql_cc_minprop(iters: int = 30, mod: int = UNI_MOD) -> str:
    """k rounds of synchronous min-label propagation over the undirected
    graph; labels converge to the min vertex id per component once
    k >= diameter (asserted in pytest)."""
    ctes = [
        ("uni", uni_frag(mod)),
        ("und", UND),
        ("sym", SYM),
        ("v", VERTS),
        ("c0", "SELECT id, id AS lbl FROM v"),
    ]
    for t in range(1, iters + 1):
        prev = f"c{t-1}"
        ctes.append(
            (
                f"c{t}",
                f"SELECT v.id, LEAST({prev}.lbl, COALESCE(s.m, {prev}.lbl)) AS lbl\n"
                f"FROM v JOIN {prev} ON {prev}.id = v.id LEFT JOIN (\n"
                f"  SELECT sym.dst AS id, MIN({prev}.lbl) AS m FROM sym "
                f"JOIN {prev} ON {prev}.id = sym.src GROUP BY sym.dst\n"
                f") s ON s.id = v.id",
            )
        )
    return _with(ctes, f"SELECT id, lbl AS component FROM c{iters}")


def _lpa_ctes(iters: int, mod: int) -> list[tuple[str, str]]:
    """The shared LPA register chain behind sql_lpa and
    sql_lpa_modularity, leaving label frames l0..l{iters}."""
    ctes = [
        ("uni", uni_frag(mod)),
        ("und", UND),
        ("sym", SYM),
        ("v", VERTS),
        ("l0", "SELECT id, id AS lbl FROM v"),
    ]
    for t in range(1, iters + 1):
        prev = f"l{t-1}"
        ctes.append(
            (
                f"l{t}",
                f"SELECT v.id, COALESCE(w.lbl, {prev}.lbl) AS lbl\n"
                f"FROM v JOIN {prev} ON {prev}.id = v.id LEFT JOIN (\n"
                f"  SELECT id, lbl FROM (\n"
                f"    SELECT sym.dst AS id, {prev}.lbl AS lbl, COUNT(*) AS c,\n"
                f"      ROW_NUMBER() OVER (PARTITION BY sym.dst "
                f"ORDER BY COUNT(*) DESC, {prev}.lbl ASC) AS rn\n"
                f"    FROM sym JOIN {prev} ON {prev}.id = sym.src "
                f"GROUP BY sym.dst, {prev}.lbl\n"
                f"  ) WHERE rn = 1\n"
                f") w ON w.id = v.id",
            )
        )
    return ctes


def sql_label_spreading(iters: int = 5, seed_mod: int = 13,
                        mod: int = UNI_MOD) -> str:
    """Mirror of labelprop.label_spreading: identical clamp expression
    per round, SUM/COUNT mean over the symmetrized edges, ROUND 6 at
    the end only."""
    clamp = (f"CASE WHEN id % {seed_mod} = 0 "
             f"THEN CAST(id % 2 AS DOUBLE) ELSE {{0}} END")
    ctes = [
        ("uni", uni_frag(mod)), ("und", UND), ("sym", SYM),
        ("v", "SELECT DISTINCT src AS id FROM sym"),
        ("s0",
         f"SELECT id, {clamp.format('CAST(0.5 AS DOUBLE)')} AS score "
         f"FROM v"),
    ]
    for t in range(1, iters + 1):
        ctes.append((
            f"m{t}",
            f"SELECT sym.dst AS id, SUM(s.score) / COUNT(*) AS mean "
            f"FROM sym JOIN s{t-1} s ON s.id = sym.src GROUP BY sym.dst",
        ))
        ctes.append((
            f"s{t}",
            f"SELECT id, {clamp.format('mean')} AS score FROM m{t}",
        ))
    return _with(
        ctes,
        f"SELECT id, ROUND(score, 6) AS score, "
        f"CAST(CASE WHEN id % {seed_mod} = 0 THEN 1 ELSE 0 END AS BIGINT) "
        f"AS is_seed FROM s{iters}",
    )


def sql_wl_refinement(iters: int = 3, mod: int = UNI_MOD) -> str:
    """Mirror of labelprop.wl_refinement: degree-string init, sorted
    neighbor-color lists (binary collation = Spark's UTF8 ordering)
    joined with '|' and md5'd, class sizes at the end."""
    ctes = [
        ("uni", uni_frag(mod)), ("und", UND), ("sym", SYM),
        ("deg", "SELECT src AS id, COUNT(*) AS d FROM sym GROUP BY src"),
        ("s0", "SELECT id, CAST(d AS VARCHAR) AS c FROM deg"),
    ]
    for t in range(1, iters + 1):
        ctes.append((
            f"nc{t}",
            f"SELECT sym.dst AS id, list(s.c ORDER BY s.c) AS nc "
            f"FROM sym JOIN s{t-1} s ON s.id = sym.src GROUP BY sym.dst",
        ))
        ctes.append((
            f"s{t}",
            f"SELECT n.id, md5(s.c || '|' || array_to_string(n.nc, '|')) "
            f"AS c FROM nc{t} n JOIN s{t-1} s ON s.id = n.id",
        ))
    return _with(
        ctes + [("sizes",
                 f"SELECT c, CAST(COUNT(*) AS BIGINT) AS class_size "
                 f"FROM s{iters} GROUP BY c")],
        f"SELECT s.id, s.c AS wl_color, z.class_size "
        f"FROM s{iters} s JOIN sizes z ON z.c = s.c",
    )


def sql_lpa(iters: int = 4, mod: int = UNI_MOD) -> str:
    """Synchronous label propagation, deterministic tie-break: the new
    label is the neighbor label with the highest count, ties broken by
    the smallest label; isolated vertices keep their own."""
    return _with(_lpa_ctes(iters, mod),
                 f"SELECT id, lbl AS label FROM l{iters}")


def sql_lpa_modularity(iters: int = 4, mod: int = UNI_MOD) -> str:
    """Mirror of labelprop.lpa_modularity: Newman modularity of the LPA
    communities with the INTEGER-EXACT numerator
    Σ_c (4m·e_c − d_c²) and one double division by 4m² — no float
    accumulation, no rounding site (see the engine docstring)."""
    ctes = _lpa_ctes(iters, mod)
    ctes += [
        ("lab", f"SELECT id, lbl AS label FROM l{iters}"),
        ("m1", "SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und"),
        ("deg",
         "SELECT id, CAST(COUNT(*) AS BIGINT) AS d FROM "
         "(SELECT a AS id FROM und UNION ALL SELECT b FROM und) "
         "GROUP BY id"),
        ("dc",
         "SELECT lab.label, SUM(deg.d) AS dc FROM deg "
         "JOIN lab ON lab.id = deg.id GROUP BY lab.label"),
        ("ec",
         "SELECT la.label, CAST(COUNT(*) AS BIGINT) AS ec FROM und "
         "JOIN lab la ON la.id = und.a JOIN lab lb ON lb.id = und.b "
         "WHERE la.label = lb.label GROUP BY la.label"),
        ("num",
         "SELECT SUM(4 * m1.m * COALESCE(ec.ec, 0) - dc.dc * dc.dc) "
         "AS num, CAST(COUNT(*) AS BIGINT) AS n_communities "
         "FROM dc LEFT JOIN ec USING (label) CROSS JOIN m1"),
    ]
    return _with(
        ctes,
        "SELECT CAST(num.num AS DOUBLE) / "
        "CAST(4 * m1.m * m1.m AS DOUBLE) AS modularity, "
        "num.n_communities, m1.m AS m_edges FROM num CROSS JOIN m1",
    )


def sql_lpa_conductance(iters: int = 4, mod: int = UNI_MOD) -> str:
    """Mirror of labelprop.lpa_conductance: exact BIGINT cut/volume per
    LPA community, ONE double division, whole-graph community → 0.0."""
    ctes = _lpa_ctes(iters, mod)
    ctes += [
        ("lab", f"SELECT id, lbl AS label FROM l{iters}"),
        ("m1", "SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und"),
        ("deg",
         "SELECT id, CAST(COUNT(*) AS BIGINT) AS d FROM "
         "(SELECT a AS id FROM und UNION ALL SELECT b FROM und) "
         "GROUP BY id"),
        ("vol",
         "SELECT lab.label, SUM(deg.d) AS volume FROM deg "
         "JOIN lab ON lab.id = deg.id GROUP BY lab.label"),
        ("tg",
         "SELECT la.label AS la, lb.label AS lb FROM und "
         "JOIN lab la ON la.id = und.a JOIN lab lb ON lb.id = und.b"),
        ("cut",
         "SELECT label, CAST(COUNT(*) AS BIGINT) AS cut FROM ("
         "SELECT la AS label FROM tg WHERE la <> lb "
         "UNION ALL SELECT lb FROM tg WHERE la <> lb) GROUP BY label"),
    ]
    return _with(
        ctes,
        "SELECT vol.label, CAST(COALESCE(cut.cut, 0) AS BIGINT) "
        "AS cut_edges, vol.volume, "
        "CASE WHEN LEAST(vol.volume, 2 * m1.m - vol.volume) = 0 "
        "THEN CAST(0.0 AS DOUBLE) ELSE "
        "CAST(COALESCE(cut.cut, 0) AS DOUBLE) / "
        "CAST(LEAST(vol.volume, 2 * m1.m - vol.volume) AS DOUBLE) END "
        "AS conductance "
        "FROM vol LEFT JOIN cut USING (label) CROSS JOIN m1",
    )


def sql_triangles(mod: int = UNI_MOD) -> str:
    """Per-vertex triangle counts over the canonical undirected edges
    (each triangle a<b<c enumerated once)."""
    tri = (
        "SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM und e1 "
        "JOIN und e2 ON e2.a = e1.b "
        "JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b"
    )
    return _with(
        [("uni", uni_frag(mod)), ("und", UND), ("tri", tri),
         ("m", "SELECT x AS id FROM tri UNION ALL SELECT y FROM tri "
               "UNION ALL SELECT z FROM tri")],
        "SELECT id, COUNT(*) AS triangles FROM m GROUP BY id",
    )


def sql_clustering(mod: int = UNI_MOD) -> str:
    """Local clustering coefficient per vertex: mirror of
    triangles.clustering_coefficient over the same canonical undirected
    edge set (integer numerator 2·tri, division in DOUBLE, ROUND 6)."""
    tri = (
        "SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM und e1 "
        "JOIN und e2 ON e2.a = e1.b "
        "JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b"
    )
    return _with(
        [("uni", uni_frag(mod)), ("und", UND), ("tri", tri),
         ("m", "SELECT x AS id FROM tri UNION ALL SELECT y FROM tri "
               "UNION ALL SELECT z FROM tri"),
         ("tcnt", "SELECT id, COUNT(*) AS triangles FROM m GROUP BY id"),
         ("deg",
          "SELECT id, COUNT(*) AS degree FROM ("
          "SELECT a AS id FROM und UNION ALL SELECT b FROM und"
          ") GROUP BY id")],
        "SELECT d.id, d.degree, COALESCE(t.triangles, 0) AS triangles, "
        "CASE WHEN d.degree >= 2 THEN "
        "ROUND(CAST(2 * COALESCE(t.triangles, 0) AS DOUBLE) "
        "/ CAST(d.degree * (d.degree - 1) AS DOUBLE), 6) "
        "ELSE CAST(0.0 AS DOUBLE) END AS clustering "
        "FROM deg d LEFT JOIN tcnt t ON t.id = d.id",
    )


def sql_assortativity(mod: int = UNI_MOD) -> str:
    """Mirror of triangles.degree_assortativity: the IDENTICAL explicit
    population-moment closed form (not DuckDB's corr(), whose sample
    convention could differ), over the symmetrized edge list."""
    return _with(
        [("uni", uni_frag(mod)), ("und", UND),
         ("deg",
          "SELECT id, COUNT(*) AS d FROM ("
          "SELECT a AS id FROM und UNION ALL SELECT b FROM und"
          ") GROUP BY id"),
         ("sym", "SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und"),
         ("xy",
          "SELECT CAST(da.d AS DOUBLE) AS x, CAST(db.d AS DOUBLE) AS y "
          "FROM sym JOIN deg da ON da.id = sym.a "
          "JOIN deg db ON db.id = sym.b"),
         ("s",
          "SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy, "
          "SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy "
          "FROM xy")],
        "SELECT n AS n_ends, ROUND("
        "(sxy / n - (sx / n) * (sy / n)) / SQRT("
        "(sxx / n - (sx / n) * (sx / n)) * (syy / n - (sy / n) * (sy / n))"
        "), 6) AS assortativity FROM s",
    )


def sql_birank(alpha: float = 0.85, iters: int = 5) -> str:
    """Mirror of birank.birank: one-time symmetric normalization,
    alternating half-steps unrolled, hash priors via prior_expr,
    ROUND 6 at the end."""
    a = _d(alpha)
    b = _d(1.0 - alpha)
    ctes = [
        ("bip", BIP),
        ("e",
         "SELECT src, dst, CAST(weight AS DOUBLE) AS w FROM bip"),
        ("du", "SELECT src, SUM(w) AS du FROM e GROUP BY src"),
        ("dp", "SELECT dst, SUM(w) AS dp FROM e GROUP BY dst"),
        ("en",
         "SELECT e.src, e.dst, e.w / SQRT(du.du * dp.dp) AS s "
         "FROM e JOIN du USING (src) JOIN dp USING (dst)"),
        ("u0",
         f"SELECT id, {prior_expr('id')} AS x FROM "
         f"(SELECT DISTINCT src AS id FROM e)"),
        ("pp0",
         f"SELECT id, {prior_expr('id')} AS x FROM "
         f"(SELECT DISTINCT dst AS id FROM e)"),
    ]
    prev_u = "u0"
    for t in range(1, iters + 1):
        ctes.append((
            f"p{t}",
            f"SELECT m.id, {a} * m.m + {b} * pp0.x AS x FROM ("
            f"SELECT en.dst AS id, SUM(en.s * u.x) AS m FROM en "
            f"JOIN {prev_u} u ON u.id = en.src GROUP BY en.dst) m "
            f"JOIN pp0 ON pp0.id = m.id",
        ))
        ctes.append((
            f"u{t}",
            f"SELECT m.id, {a} * m.m + {b} * u0.x AS x FROM ("
            f"SELECT en.src AS id, SUM(en.s * p.x) AS m FROM en "
            f"JOIN p{t} p ON p.id = en.dst GROUP BY en.src) m "
            f"JOIN u0 ON u0.id = m.id",
        ))
        prev_u = f"u{t}"
    return _with(
        ctes,
        f"SELECT id, ROUND(x, 6) AS birank FROM u{iters} "
        f"UNION ALL SELECT id, ROUND(x, 6) AS birank FROM p{iters}",
    )


def sql_graphlet_orbits3(mod: int = UNI_MOD) -> str:
    """Mirror of triangles.graphlet_orbits3: identical closed forms
    over degree, neighbor-degree sum, and the triangle count — all
    integer arithmetic."""
    tri = (
        "SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM und e1 "
        "JOIN und e2 ON e2.a = e1.b "
        "JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b"
    )
    return _with(
        [("uni", uni_frag(mod)), ("und", UND), ("sym", SYM),
         ("tri", tri),
         ("m", "SELECT x AS id FROM tri UNION ALL SELECT y FROM tri "
               "UNION ALL SELECT z FROM tri"),
         ("tcnt", "SELECT id, COUNT(*) AS t FROM m GROUP BY id"),
         ("deg",
          "SELECT src AS id, COUNT(*) AS d FROM sym GROUP BY src"),
         ("nbr",
          "SELECT sym.src AS id, SUM(dd.d - 1) AS snd FROM sym "
          "JOIN deg dd ON dd.id = sym.dst GROUP BY sym.src")],
        "SELECT deg.id, CAST(deg.d AS BIGINT) AS o0, "
        "CAST(nbr.snd - 2 * COALESCE(t.t, 0) AS BIGINT) AS o1, "
        "CAST((deg.d * (deg.d - 1)) // 2 - COALESCE(t.t, 0) AS BIGINT) "
        "AS o2, CAST(COALESCE(t.t, 0) AS BIGINT) AS o3 "
        "FROM deg JOIN nbr ON nbr.id = deg.id "
        "LEFT JOIN tcnt t ON t.id = deg.id",
    )


def sql_oddball(mod: int = UNI_MOD) -> str:
    """Mirror of triangles.oddball_egonet: egonet sizes from degree +
    per-vertex triangles, OLS fit in 6dp-rounded log-log space with
    DECIMAL-summed moments, per-vertex |y − (a + b·x)| computed FROM
    the 6dp-rounded a and b (downstream-from-rounded convention)."""
    tri = (
        "SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM und e1 "
        "JOIN und e2 ON e2.a = e1.b "
        "JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b"
    )
    dec = "CAST(ROUND({0}, 6) AS DECIMAL(28,6))"
    return _with(
        [("uni", uni_frag(mod)), ("und", UND), ("tri", tri),
         ("m", "SELECT x AS id FROM tri UNION ALL SELECT y FROM tri "
               "UNION ALL SELECT z FROM tri"),
         ("tcnt", "SELECT id, COUNT(*) AS triangles FROM m GROUP BY id"),
         ("deg",
          "SELECT id, COUNT(*) AS degree FROM ("
          "SELECT a AS id FROM und UNION ALL SELECT b FROM und"
          ") GROUP BY id"),
         ("ego",
          "SELECT d.id, d.degree + 1 AS n_ego, "
          "d.degree + COALESCE(t.triangles, 0) AS e_ego "
          "FROM deg d LEFT JOIN tcnt t ON t.id = d.id"),
         ("xy",
          "SELECT id, n_ego, e_ego, "
          "ROUND(LN(CAST(n_ego AS DOUBLE)), 6) AS x, "
          "ROUND(LN(CAST(e_ego AS DOUBLE)), 6) AS y FROM ego"),
         ("s",
          f"SELECT CAST(COUNT(*) AS DOUBLE) AS n, "
          f"CAST(SUM({dec.format('x')}) AS DOUBLE) AS sx, "
          f"CAST(SUM({dec.format('y')}) AS DOUBLE) AS sy, "
          f"CAST(SUM({dec.format('x * y')}) AS DOUBLE) AS sxy, "
          f"CAST(SUM({dec.format('x * x')}) AS DOUBLE) AS sxx FROM xy"),
         ("fit0",
          "SELECT n, sx, sy, CASE WHEN n * sxx - sx * sx = 0 "
          "THEN CAST(0.0 AS DOUBLE) "
          "ELSE ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) "
          "END AS b FROM s"),
         ("fit",
          "SELECT b, ROUND((sy - b * sx) / n, 6) AS a FROM fit0")],
        "SELECT xy.id, xy.n_ego, xy.e_ego, "
        "ROUND(ABS(xy.y - (f.a + f.b * xy.x)), 6) AS score "
        "FROM xy, fit f",
    )


def sql_host_graph(mod: int = UNI_MOD, n_hosts: int | None = None) -> str:
    """Mirror of quotient.host_graph: collapse the directed page-level
    edge set onto host buckets and count page links per host pair."""
    if n_hosts is None:
        from .operators.quotient import N_HOSTS
        n_hosts = N_HOSTS
    return _with(
        [("uni", uni_frag(mod)),
         ("hg",
          f"SELECT (src % {n_hosts}) AS src_host, "
          f"(dst % {n_hosts}) AS dst_host, "
          f"CAST(COUNT(*) AS BIGINT) AS n_links FROM uni GROUP BY 1, 2")],
        "SELECT src_host, dst_host, n_links FROM hg",
    )


def sql_host_stats(mod: int = UNI_MOD, n_hosts: int | None = None) -> str:
    """Mirror of quotient.host_graph |> quotient.host_stats: per-host
    outgoing link budget with the intra-host fraction."""
    if n_hosts is None:
        from .operators.quotient import N_HOSTS
        n_hosts = N_HOSTS
    return _with(
        [("uni", uni_frag(mod)),
         ("hg",
          f"SELECT (src % {n_hosts}) AS src_host, "
          f"(dst % {n_hosts}) AS dst_host, "
          f"CAST(COUNT(*) AS BIGINT) AS n_links FROM uni GROUP BY 1, 2"),
         ("hs",
          "SELECT src_host AS host, "
          "CAST(SUM(n_links) AS BIGINT) AS out_links, "
          "CAST(SUM(CASE WHEN src_host = dst_host THEN n_links ELSE 0 END)"
          " AS BIGINT) AS intra_links FROM hg GROUP BY 1")],
        "SELECT host, out_links, intra_links, "
        "ROUND(CAST(intra_links AS DOUBLE) / CAST(out_links AS DOUBLE), 6)"
        " AS intra_frac FROM hs",
    )


def sql_reciprocity(mod: int = UNI_MOD) -> str:
    """Mirror of degrees.reciprocity: edges are distinct, so the
    forward⋈reverse inner join counts each reciprocated edge once."""
    return _with(
        [("uni", uni_frag(mod)),
         ("r",
          "SELECT CAST(COUNT(*) AS BIGINT) AS n_recip FROM uni a "
          "JOIN (SELECT dst AS src, src AS dst FROM uni) b "
          "USING (src, dst)"),
         ("t", "SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM uni")],
        "SELECT n_edges, n_recip, ROUND(CAST(n_recip AS DOUBLE) "
        "/ CAST(n_edges AS DOUBLE), 6) AS reciprocity FROM t, r",
    )


def sql_powerlaw_alpha(dmin: int = 2, mod: int = UNI_MOD) -> str:
    """Mirror of degrees.powerlaw_alpha: CSN discrete-data MLE approximation (eq. 3.7) over
    in-degrees >= dmin, each log term rounded to 6 dp and summed as
    exact DECIMAL so the scalar is order-independent."""
    return _with(
        [("uni", uni_frag(mod)),
         ("deg",
          "SELECT dst AS id, COUNT(*) AS d FROM uni GROUP BY dst"),
         ("tail", f"SELECT d FROM deg WHERE d >= {dmin}"),
         ("s",
          f"SELECT CAST(COUNT(*) AS BIGINT) AS n_tail, "
          f"CAST(SUM(CAST(ROUND(LN(CAST(d AS DOUBLE) / {_d(dmin - 0.5)}), 6)"
          f" AS DECIMAL(28,6))) AS DOUBLE) AS s FROM tail")],
        "SELECT n_tail, ROUND(CAST(1.0 AS DOUBLE) "
        "+ CAST(n_tail AS DOUBLE) / s, 6) AS alpha FROM s",
    )


def sql_degree_entropy(mod: int = UNI_MOD) -> str:
    """Mirror of degrees.degree_entropy: in-degree histogram, exact
    DECIMAL-summed −p·ln p terms, final ROUND 6."""
    return _with(
        [("uni", uni_frag(mod)),
         ("deg",
          "SELECT dst AS id, COUNT(*) AS d FROM uni GROUP BY dst"),
         ("tot", "SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices FROM deg"),
         ("hist", "SELECT d, COUNT(*) AS n_k FROM deg GROUP BY d")],
        "SELECT MAX(t.n_vertices) AS n_vertices, "
        "CAST(COUNT(*) AS BIGINT) AS n_degrees, "
        "ROUND(CAST(SUM(CAST(ROUND("
        "-(CAST(n_k AS DOUBLE) / CAST(t.n_vertices AS DOUBLE)) "
        "* LN(CAST(n_k AS DOUBLE) / CAST(t.n_vertices AS DOUBLE)), 6) "
        "AS DECIMAL(28,6))) AS DOUBLE), 6) AS entropy "
        "FROM hist, tot t",
    )


def sql_bowtie(iters: int = 10, mod: int = UNI_MOD) -> str:
    """Mirror of bowtie.bowtie: two unrolled directed reachability
    chains from the min-id pivot (forward and reverse), identical
    fixed round count, same region CASE order."""
    ctes = [
        ("uni", uni_frag(mod)),
        ("v", VERTS),
        ("f0", "SELECT MIN(id) AS id FROM v"),
        ("b0", "SELECT MIN(id) AS id FROM v"),
    ]
    for k in range(1, iters + 1):
        ctes.append((
            f"f{k}",
            f"SELECT DISTINCT id FROM (SELECT id FROM f{k-1} UNION ALL "
            f"SELECT uni.dst AS id FROM uni JOIN f{k-1} r "
            f"ON r.id = uni.src)",
        ))
        ctes.append((
            f"b{k}",
            f"SELECT DISTINCT id FROM (SELECT id FROM b{k-1} UNION ALL "
            f"SELECT uni.src AS id FROM uni JOIN b{k-1} r "
            f"ON r.id = uni.dst)",
        ))
    return _with(
        ctes,
        f"SELECT v.id, CASE "
        f"WHEN f.id IS NOT NULL AND b.id IS NOT NULL THEN 'SCC' "
        f"WHEN f.id IS NOT NULL THEN 'OUT' "
        f"WHEN b.id IS NOT NULL THEN 'IN' "
        f"ELSE 'OTHER' END AS region "
        f"FROM v LEFT JOIN f{iters} f ON f.id = v.id "
        f"LEFT JOIN b{iters} b ON b.id = v.id",
    )


def sql_scc_labels(iters: int = 10, trim_rounds: int = 3,
                   mod: int = UNI_MOD) -> str:
    """Mirror of bowtie.scc_labels: the sql_bowtie reachability chains
    intersected into the pivot core, then the identical alternating
    trim rounds over the remainder; survivors emit certified=0 with
    their own id as the placeholder label."""
    ctes = [
        ("uni", uni_frag(mod)),
        ("v", VERTS),
        ("f0", "SELECT MIN(id) AS id FROM v"),
        ("b0", "SELECT MIN(id) AS id FROM v"),
    ]
    for k in range(1, iters + 1):
        ctes.append((
            f"f{k}",
            f"SELECT DISTINCT id FROM (SELECT id FROM f{k-1} UNION ALL "
            f"SELECT uni.dst AS id FROM uni JOIN f{k-1} r "
            f"ON r.id = uni.src)",
        ))
        ctes.append((
            f"b{k}",
            f"SELECT DISTINCT id FROM (SELECT id FROM b{k-1} UNION ALL "
            f"SELECT uni.src AS id FROM uni JOIN b{k-1} r "
            f"ON r.id = uni.dst)",
        ))
    ctes += [
        ("core",
         f"SELECT f.id FROM f{iters} f JOIN b{iters} b ON b.id = f.id"),
        ("a0",
         "SELECT id FROM v WHERE id NOT IN (SELECT id FROM core)"),
        ("r0e",
         "SELECT src, dst FROM uni WHERE src IN (SELECT id FROM a0) "
         "AND dst IN (SELECT id FROM a0)"),
    ]
    for t in range(1, trim_rounds + 1):
        ctes.append((
            f"a{t}",
            f"SELECT id FROM a{t-1} WHERE id IN (SELECT dst FROM r{t-1}e) "
            f"AND id IN (SELECT src FROM r{t-1}e)",
        ))
        ctes.append((
            f"r{t}e",
            f"SELECT src, dst FROM r{t-1}e "
            f"WHERE src IN (SELECT id FROM a{t}) "
            f"AND dst IN (SELECT id FROM a{t})",
        ))
    ctes.append(("p", "SELECT MIN(id) AS pivot FROM v"))
    last = f"a{trim_rounds}"
    return _with(
        ctes,
        f"SELECT c.id, CAST(p.pivot AS BIGINT) AS scc_id, "
        f"CAST(1 AS BIGINT) AS certified FROM core c, p "
        f"UNION ALL "
        f"SELECT id, CAST(id AS BIGINT) AS scc_id, CAST(1 AS BIGINT) "
        f"AS certified FROM a0 WHERE id NOT IN (SELECT id FROM {last}) "
        f"UNION ALL "
        f"SELECT id, CAST(id AS BIGINT) AS scc_id, CAST(0 AS BIGINT) "
        f"AS certified FROM {last}",
    )


def sql_cocitation(max_out: int | None = None,
                   mod: int = UNI_MOD) -> str:
    """Mirror of triangles.cocitation: identical out-degree cap before
    the wedge self-join, same (a < b) canonical pair. The default cap
    is IMPORTED from the engine so a retune can't desynchronize the
    gate."""
    if max_out is None:
        from .operators.triangles import COCITE_MAX_OUT
        max_out = COCITE_MAX_OUT
    return _with(
        [("uni", uni_frag(mod)),
         ("ok",
          f"SELECT src FROM uni GROUP BY src "
          f"HAVING COUNT(*) <= {max_out}"),
         ("e", "SELECT u.src, u.dst FROM uni u JOIN ok USING (src)")],
        "SELECT l.dst AS a, r.dst AS b, CAST(COUNT(*) AS BIGINT) "
        "AS n_common FROM e l JOIN e r "
        "ON l.src = r.src AND l.dst < r.dst GROUP BY 1, 2",
    )


def sql_simrank2(c: float | None = None, max_out: int | None = None,
                 mod: int = UNI_MOD) -> str:
    """Mirror of simrank.simrank2: identical hub cap, identical
    co-citation pair domain, identical FLOOR-quantized micro-unit
    state (floor of the same IEEE double is engine-independent; ROUND
    is not), exact BIGINT gather, raw-double score expressions with
    zero rounding sites. Constants imported from the engine."""
    from .operators.simrank import SIMRANK_C, SIMRANK_MAX_OUT
    if c is None:
        c = SIMRANK_C
    if max_out is None:
        max_out = SIMRANK_MAX_OUT
    cd = f"CAST({c!r} AS DOUBLE)"
    return _with(
        [("uni", uni_frag(mod)),
         ("oks",
          f"SELECT src FROM uni GROUP BY src "
          f"HAVING COUNT(*) <= {max_out}"),
         ("e", "SELECT u.src, u.dst FROM uni u JOIN oks USING (src)"),
         ("ind", "SELECT dst AS id, COUNT(*) AS n FROM e GROUP BY 1"),
         ("prs",
          "SELECT l.dst AS a, r.dst AS b, COUNT(*) AS n_common "
          "FROM e l JOIN e r ON l.src = r.src AND l.dst < r.dst "
          "GROUP BY 1, 2"),
         ("s1t",
          f"SELECT p.a, p.b, p.n_common, ia.n AS na, ib.n AS nb, "
          f"({cd} * CAST(p.n_common AS DOUBLE)) "
          f"/ CAST(ia.n * ib.n AS DOUBLE) AS s1 "
          f"FROM prs p JOIN ind ia ON ia.id = p.a "
          f"JOIN ind ib ON ib.id = p.b"),
         ("s1m",
          "SELECT a, b, n_common, na, nb, s1, "
          "CAST(FLOOR(s1 * CAST(1000000 AS DOUBLE)) AS BIGINT) "
          "AS s1_micro FROM s1t"),
         ("st",
          "SELECT a AS u, b AS v, s1_micro FROM s1m "
          "UNION ALL SELECT b, a, s1_micro FROM s1m "
          "UNION ALL SELECT DISTINCT src, src, "
          "CAST(1000000 AS BIGINT) FROM e"),
         ("g",
          "SELECT ea.dst AS a, eb.dst AS b, "
          "CAST(SUM(st.s1_micro) AS BIGINT) AS acc "
          "FROM st JOIN e ea ON ea.src = st.u "
          "JOIN e eb ON eb.src = st.v "
          "WHERE ea.dst < eb.dst GROUP BY 1, 2")],
        f"SELECT s.a, s.b, s.n_common, s.s1, "
        f"({cd} * CAST(COALESCE(g.acc, 0) AS DOUBLE)) "
        f"/ CAST(s.na * s.nb AS DOUBLE) / CAST(1000000 AS DOUBLE) AS s2 "
        f"FROM s1m s LEFT JOIN g ON g.a = s.a AND g.b = s.b",
    )


def sql_bibliographic_coupling(max_in: int | None = None,
                               mod: int = UNI_MOD) -> str:
    """Mirror of triangles.bibliographic_coupling: identical in-degree
    cap before the shared-target wedge self-join, (a < b) canonical."""
    if max_in is None:
        from .operators.triangles import COCITE_MAX_OUT
        max_in = COCITE_MAX_OUT
    return _with(
        [("uni", uni_frag(mod)),
         ("ok",
          f"SELECT dst FROM uni GROUP BY dst "
          f"HAVING COUNT(*) <= {max_in}"),
         ("e", "SELECT u.src, u.dst FROM uni u JOIN ok USING (dst)")],
        "SELECT l.src AS a, r.src AS b, CAST(COUNT(*) AS BIGINT) "
        "AS n_shared FROM e l JOIN e r "
        "ON l.dst = r.dst AND l.src < r.src GROUP BY 1, 2",
    )


def sql_resource_allocation(max_out: int | None = None,
                            mod: int = UNI_MOD) -> str:
    """Mirror of triangles.resource_allocation: identical cap, weight
    ROUND(1.0/od, 6)::DECIMAL(28,6) (IEEE division is bit-identical
    across engines and the rounding is tie-free for od < 128), exact
    decimal sum, one final cast to double."""
    if max_out is None:
        from .operators.triangles import COCITE_MAX_OUT
        max_out = COCITE_MAX_OUT
    return _with(
        [("uni", uni_frag(mod)),
         ("ok",
          f"SELECT src, COUNT(*) AS od FROM uni GROUP BY src "
          f"HAVING COUNT(*) <= {max_out}"),
         ("e",
          "SELECT u.src, u.dst, CAST(ROUND(CAST(1.0 AS DOUBLE) / ok.od, 6) "
          "AS DECIMAL(28,6)) AS w FROM uni u JOIN ok USING (src)")],
        "SELECT l.dst AS a, r.dst AS b, CAST(SUM(l.w) AS DOUBLE) "
        "AS ra_score FROM e l JOIN e r "
        "ON l.src = r.src AND l.dst < r.dst GROUP BY 1, 2",
    )


def sql_adamic_adar(max_out: int | None = None, mod: int = UNI_MOD) -> str:
    """Mirror of triangles.adamic_adar: the SAME driver-computed 6-dp
    weight literals (aa_weight_rows) as a VALUES dim table — neither
    engine evaluates ln() — exact decimal sum, one cast to double."""
    from .operators.triangles import COCITE_MAX_OUT, aa_weight_rows

    if max_out is None:
        max_out = COCITE_MAX_OUT
    vals = ", ".join(f"({d}, CAST({w} AS DECIMAL(28,6)))"
                     for d, w in aa_weight_rows(max_out))
    return _with(
        [("uni", uni_frag(mod)),
         ("wt", f"SELECT * FROM (VALUES {vals}) AS t(od, w)"),
         ("dg", "SELECT src, COUNT(*) AS od FROM uni GROUP BY src"),
         ("e",
          "SELECT u.src, u.dst, wt.w FROM uni u "
          "JOIN dg USING (src) JOIN wt USING (od)")],
        "SELECT l.dst AS a, r.dst AS b, CAST(SUM(l.w) AS DOUBLE) "
        "AS aa_score FROM e l JOIN e r "
        "ON l.src = r.src AND l.dst < r.dst GROUP BY 1, 2",
    )


def sql_jaccard_inlinks(max_out: int | None = None,
                        mod: int = UNI_MOD) -> str:
    """Mirror of triangles.jaccard_inlinks: identical out-degree cap
    gating BOTH the wedge join and the in-degree counts, exact BIGINT
    intersection/union, one integer→double division."""
    if max_out is None:
        from .operators.triangles import COCITE_MAX_OUT
        max_out = COCITE_MAX_OUT
    return _with(
        [("uni", uni_frag(mod)),
         ("ok",
          f"SELECT src FROM uni GROUP BY src "
          f"HAVING COUNT(*) <= {max_out}"),
         ("e", "SELECT u.src, u.dst FROM uni u JOIN ok USING (src)"),
         ("ind", "SELECT dst, COUNT(*) AS d FROM e GROUP BY dst"),
         ("cn",
          "SELECT l.dst AS a, r.dst AS b, CAST(COUNT(*) AS BIGINT) "
          "AS n_common FROM e l JOIN e r "
          "ON l.src = r.src AND l.dst < r.dst GROUP BY 1, 2")],
        "SELECT cn.a, cn.b, cn.n_common, "
        "cn.n_common / (ia.d + ib.d - cn.n_common) AS jaccard "
        "FROM cn JOIN ind ia ON ia.dst = cn.a "
        "JOIN ind ib ON ib.dst = cn.b",
    )


def sql_ktruss(k: int = 4, rounds: int = 6, mod: int = UNI_MOD) -> str:
    """Unrolled k-truss peeling: ``rounds`` fixed iterations of
    (triangle support over remaining edges → drop support < k-2).
    The engine's monotone early-exit is output-identical to running
    the full unroll (a fixpoint round removes nothing)."""
    ctes = [("uni", uni_frag(mod)), ("und", UND),
            ("t0", "SELECT a, b FROM und")]
    for r in range(1, rounds + 1):
        p = f"t{r-1}"
        ctes += [
            (f"tri{r}",
             f"SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM {p} e1 "
             f"JOIN {p} e2 ON e2.a = e1.b "
             f"JOIN {p} e3 ON e3.a = e1.a AND e3.b = e2.b"),
            (f"sup{r}",
             f"SELECT a, b, COUNT(*) AS s FROM ("
             f"SELECT x AS a, y AS b FROM tri{r} "
             f"UNION ALL SELECT y, z FROM tri{r} "
             f"UNION ALL SELECT x, z FROM tri{r}) GROUP BY a, b"),
            (f"t{r}",
             f"SELECT e.a, e.b FROM {p} e LEFT JOIN sup{r} s "
             f"ON s.a = e.a AND s.b = e.b "
             f"WHERE COALESCE(s.s, 0) >= {k - 2}"),
        ]
    return _with(ctes, f"SELECT a, b FROM t{rounds}")


def sql_trussness(k_max: int = 5, rounds: int = 6,
                  mod: int = UNI_MOD) -> str:
    """Mirror of triangles.trussness: the monotone truss sweep — each
    level's peel chain starts from the previous level's survivors;
    trussness = MAX level containing the edge (level 2 = all)."""
    ctes = [("uni", uni_frag(mod)), ("und", UND),
            ("l2", "SELECT a, b FROM und")]
    prev_level = "l2"
    members = ["SELECT a, b, 2 AS lv FROM l2"]
    for k in range(3, k_max + 1):
        p = prev_level
        for r in range(1, rounds + 1):
            ctes += [
                (f"tri{k}_{r}",
                 f"SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM {p} e1 "
                 f"JOIN {p} e2 ON e2.a = e1.b "
                 f"JOIN {p} e3 ON e3.a = e1.a AND e3.b = e2.b"),
                (f"sup{k}_{r}",
                 f"SELECT a, b, COUNT(*) AS s FROM ("
                 f"SELECT x AS a, y AS b FROM tri{k}_{r} "
                 f"UNION ALL SELECT y, z FROM tri{k}_{r} "
                 f"UNION ALL SELECT x, z FROM tri{k}_{r}) GROUP BY a, b"),
                (f"l{k}_{r}",
                 f"SELECT e.a, e.b FROM {p} e LEFT JOIN sup{k}_{r} s "
                 f"ON s.a = e.a AND s.b = e.b "
                 f"WHERE COALESCE(s.s, 0) >= {k - 2}"),
            ]
            p = f"l{k}_{r}"
        prev_level = p
        members.append(f"SELECT a, b, {k} AS lv FROM {prev_level}")
    union = " UNION ALL ".join(members)
    return _with(
        ctes,
        f"SELECT a, b, CAST(MAX(lv) AS INT) AS trussness FROM ({union}) "
        f"GROUP BY a, b",
    )


def _d(v: float) -> str:
    """Emit a float as a DuckDB DOUBLE literal (exact repr roundtrip)."""
    return f"CAST({v!r} AS DOUBLE)"


def _lse(a: str, b: str) -> str:
    return (
        f"(GREATEST({a}, {b}) + LN(EXP(({a}) - GREATEST({a}, {b})) "
        f"+ EXP(({b}) - GREATEST({a}, {b}))))"
    )


def _logp_cte(key_sql: str, prior: str, eps: float = 1e-5) -> str:
    """(key, lp0, lp1): clamped log prior like ``SpEagle.py:58-64``."""
    p = (
        f"CASE WHEN ({prior}) = 1.0 THEN {_d(1.0 - eps)} "
        f"WHEN ({prior}) = 0.0 THEN {_d(eps)} ELSE ({prior}) END"
    )
    return f"SELECT {key_sql}, LN(1.0::DOUBLE - {p}) AS lp0, LN({p}) AS lp1"


def review_prior_expr(src: str = "src", dst: str = "dst") -> str:
    return prior_expr(f"({src} * 131 + {dst})")


def sql_speagle(iters: int = 2, numerical_eps: float = 1e-5,
                eps: float = 0.1, output: str = "review") -> str:
    """Synchronous SpEagle BP unrolled; ``output`` ∈ review|user|prod."""
    import math

    hs_ur, hd_ur = math.log(1 - numerical_eps), math.log(numerical_eps)
    hs_rp, hd_rp = math.log(1 - eps), math.log(eps)

    ctes: list[tuple[str, str]] = [
        ("bip", BIP),
        ("upri", _logp_cte("id", prior_expr("id"))
         + " FROM (SELECT DISTINCT src AS id FROM bip)"),
        ("ppri", _logp_cte("id", prior_expr("id"))
         + " FROM (SELECT DISTINCT dst AS id FROM bip)"),
        ("rpri", _logp_cte("src, dst", review_prior_expr()) + " FROM bip"),
        ("base",
         "SELECT b.src, b.dst, r.lp0 AS r0, r.lp1 AS r1, "
         "u.lp0 AS u0, u.lp1 AS u1, p.lp0 AS p0, p.lp1 AS p1 "
         "FROM bip b JOIN rpri r ON r.src = b.src AND r.dst = b.dst "
         "JOIN upri u ON u.id = b.src JOIN ppri p ON p.id = b.dst"),
        ("m0",
         "SELECT src, dst, " + ", ".join(
             f"CAST(0.0 AS DOUBLE) AS {c}"
             for c in ["ur0", "ur1", "ru0", "ru1", "rp0", "rp1", "pr0", "pr1"]
         ) + " FROM bip"),
    ]

    def msg_sql(hs: float, hd: float, v0: str, v1: str, name: str) -> list[str]:
        t0 = _lse(f"{_d(hs)} + ({v0})", f"{_d(hd)} + ({v1})")
        t1 = _lse(f"{_d(hd)} + ({v0})", f"{_d(hs)} + ({v1})")
        return [f"{t0} AS {name}_t0", f"{t1} AS {name}_t1"]

    for t in range(1, iters + 1):
        prev = f"m{t-1}"
        ctes.append((
            f"ub{t}",
            f"SELECT src, SUM(ru0) AS sru0, SUM(ru1) AS sru1 FROM {prev} GROUP BY src",
        ))
        ctes.append((
            f"pb{t}",
            f"SELECT dst, SUM(rp0) AS srp0, SUM(rp1) AS srp1 FROM {prev} GROUP BY dst",
        ))
        # v-columns: belief minus the reverse message (SpEagle.py:193)
        inner = (
            "SELECT b.src, b.dst,\n"
            "  b.u0 + ub.sru0 - m.ru0 AS vur0, b.u1 + ub.sru1 - m.ru1 AS vur1,\n"
            "  b.r0 + m.ur0 + m.pr0 - m.ur0 AS vru0, "
            "b.r1 + m.ur1 + m.pr1 - m.ur1 AS vru1,\n"
            "  b.r0 + m.ur0 + m.pr0 - m.pr0 AS vrp0, "
            "b.r1 + m.ur1 + m.pr1 - m.pr1 AS vrp1,\n"
            "  b.p0 + pb.srp0 - m.rp0 AS vpr0, b.p1 + pb.srp1 - m.rp1 AS vpr1\n"
            f"FROM base b JOIN {prev} m ON m.src = b.src AND m.dst = b.dst "
            f"JOIN ub{t} ub ON ub.src = b.src JOIN pb{t} pb ON pb.dst = b.dst"
        )
        mids = []
        mids += msg_sql(hs_ur, hd_ur, "vur0", "vur1", "ur")
        mids += msg_sql(hs_ur, hd_ur, "vru0", "vru1", "ru")
        mids += msg_sql(hs_rp, hd_rp, "vrp0", "vrp1", "rp")
        mids += msg_sql(hs_rp, hd_rp, "vpr0", "vpr1", "pr")
        mid = "SELECT src, dst, " + ", ".join(mids) + f" FROM (\n{inner}\n)"
        outs = []
        for name in ["ur", "ru", "rp", "pr"]:
            z = _lse(f"{name}_t0", f"{name}_t1")
            outs.append(f"{name}_t0 - {z} AS {name}0")
            outs.append(f"{name}_t1 - {z} AS {name}1")
        ctes.append((f"m{t}", "SELECT src, dst, " + ", ".join(outs)
                     + f" FROM (\n{mid}\n)"))

    last = f"m{iters}"
    sm = lambda b0, b1: f"EXP(({b1}) - {_lse(b0, b1)})"  # noqa: E731
    if output == "review":
        final = (
            f"SELECT b.src, b.dst, ROUND("
            + sm("b.r0 + m.ur0 + m.pr0", "b.r1 + m.ur1 + m.pr1")
            + f", 6) AS belief FROM base b JOIN {last} m "
            "ON m.src = b.src AND m.dst = b.dst"
        )
    elif output == "user":
        ctes.append(
            ("fb",
             f"SELECT src, SUM(ru0) AS s0, SUM(ru1) AS s1 FROM {last} GROUP BY src")
        )
        final = (
            "SELECT u.id, ROUND("
            + sm("u.lp0 + fb.s0", "u.lp1 + fb.s1")
            + ", 6) AS belief FROM upri u JOIN fb ON fb.src = u.id"
        )
    elif output == "nodes":
        ctes.append(
            ("fbu",
             f"SELECT src, SUM(ru0) AS s0, SUM(ru1) AS s1 FROM {last} GROUP BY src")
        )
        ctes.append(
            ("fbp",
             f"SELECT dst, SUM(rp0) AS s0, SUM(rp1) AS s1 FROM {last} GROUP BY dst")
        )
        final = (
            "SELECT 'user' AS kind, u.id, ROUND("
            + sm("u.lp0 + fbu.s0", "u.lp1 + fbu.s1")
            + ", 6) AS belief FROM upri u JOIN fbu ON fbu.src = u.id "
            "UNION ALL SELECT 'prod' AS kind, p.id, ROUND("
            + sm("p.lp0 + fbp.s0", "p.lp1 + fbp.s1")
            + ", 6) AS belief FROM ppri p JOIN fbp ON fbp.dst = p.id"
        )
    else:
        ctes.append(
            ("fb",
             f"SELECT dst, SUM(rp0) AS s0, SUM(rp1) AS s1 FROM {last} GROUP BY dst")
        )
        final = (
            "SELECT p.id, ROUND("
            + sm("p.lp0 + fb.s0", "p.lp1 + fb.s1")
            + ", 6) AS belief FROM ppri p JOIN fb ON fb.dst = p.id"
        )
    return _with(ctes, final)


def sql_gang(iters: int = 5, weight: float = 0.008) -> str:
    """GANG linearized BP (reference ``GANG.py:115-137``):
    B ← prior_centered + 2w · (A·B) over the symmetric bipartite
    adjacency, fixed iterations, seeded deterministic priors."""
    w2 = f"CAST({2 * weight!r} AS DOUBLE)"
    ctes = [
        ("bip", BIP),
        ("bsym", "SELECT src, dst FROM bip UNION ALL SELECT dst AS src, src AS dst FROM bip"),
        ("v", BIP_VERTS),
        ("pri", f"SELECT id, {prior_expr('id')} - CAST(0.5 AS DOUBLE) AS p FROM v"),
        ("b0", "SELECT id, p AS b FROM pri"),
    ]
    for t in range(1, iters + 1):
        prev = f"b{t-1}"
        ctes.append(
            (
                f"b{t}",
                f"SELECT pri.id, pri.p + {w2} * COALESCE(s.m, CAST(0.0 AS DOUBLE)) AS b\n"
                f"FROM pri LEFT JOIN (\n"
                f"  SELECT bsym.dst AS id, SUM({prev}.b) AS m FROM bsym "
                f"JOIN {prev} ON {prev}.id = bsym.src GROUP BY bsym.dst\n"
                f") s ON s.id = pri.id",
            )
        )
    return _with(ctes, f"SELECT id, ROUND(b, 6) AS belief FROM b{iters}")


def sql_ground_truth_users() -> str:
    return _with(
        [("bip", BIP)],
        "SELECT src AS id, MAX(CASE WHEN sign = 2 THEN 1 ELSE 0 END) AS gt "
        "FROM bip GROUP BY src",
    )


_RPRI_SCALED = (
    "SELECT src, dst, CASE WHEN raw = 0.0 THEN 1e-07 "
    "WHEN raw = 1.0 THEN CAST(1.0 AS DOUBLE) - 1e-07 ELSE raw END AS belief "
    "FROM (SELECT src, dst, (p - MIN(p) OVER ()) / (MAX(p) OVER () - MIN(p) OVER ()) "
    "AS raw FROM rpri)"
)


def sql_prior_scaled_review() -> str:
    return _with(
        [("bip", BIP),
         ("rpri", f"SELECT src, dst, {review_prior_expr()} AS p FROM bip"),
         ("sc", _RPRI_SCALED)],
        "SELECT src, dst, ROUND(belief, 6) AS belief FROM sc",
    )


def sql_prior_eval() -> str:
    """AUC (Mann-Whitney with average tie ranks) + sklearn-style AP of
    the scaled review prior vs sign ground truth — full SQL mirror of
    eval_Prior."""
    return _with(
        [("bip", BIP),
         ("rpri", f"SELECT src, dst, {review_prior_expr()} AS p FROM bip"),
         ("sc", _RPRI_SCALED),
         ("d",
          "SELECT sc.belief AS score, CASE WHEN b.sign = 2 THEN 1 ELSE 0 END AS label "
          "FROM sc JOIN bip b ON b.src = sc.src AND b.dst = sc.dst"),
         ("g",
          "SELECT score AS s, COUNT(*) AS c, SUM(label) AS pos FROM d GROUP BY score"),
         ("o",
          "SELECT s, c, pos, "
          "COALESCE(SUM(c) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING "
          "AND 1 PRECEDING), 0) AS lower_c, "
          "SUM(pos) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING "
          "AND CURRENT ROW) AS ctp, "
          "SUM(c) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING "
          "AND CURRENT ROW) AS cn FROM g")],
        "SELECT ROUND((SUM(pos * (lower_c + (c + 1) / 2.0::DOUBLE)) "
        "- SUM(pos) * (SUM(pos) + 1) / 2.0::DOUBLE) "
        "/ (SUM(pos) * (SUM(c) - SUM(pos))), 6) AS auc, "
        "ROUND(SUM(pos * ctp / CAST(cn AS DOUBLE)) / SUM(pos), 6) AS ap FROM o",
    )


def sql_fraudar_colweights() -> str:
    """L7 column reweighting: 1/log(colDegree + 5) (``Fraudar.py:165-172``)."""
    return _with(
        [("bip", BIP)],
        "SELECT dst AS id, ROUND(CAST(1.0 AS DOUBLE) / LN(COUNT(*) + 5.0::DOUBLE), 6) "
        "AS col_weight FROM bip GROUP BY dst",
    )


def sql_zoobp(iters: int = 5, ep: float = 0.01) -> str:
    """ZooBP with H=[[.5,-.5],[-.5,.5]] closed form (SURVEY F6): centered
    scalar beliefs, b ← e + (ep/2)·Σ_{u~v} s(u,v)·b(u), s=+1 for sign=1
    (positive edge) and −1 for sign=2. Paper-faithful fixpoint; the
    reference's scalar-logsumexp deviation (``ZooBP.py:144``) is
    documented in SURVEY §7 and not replicated."""
    h = f"CAST({ep / 2.0!r} AS DOUBLE)"
    ctes = [
        ("bip", BIP),
        ("bsgn",
         "SELECT src, dst, CASE WHEN sign = 1 THEN 1.0 ELSE -1.0 END::DOUBLE AS s "
         "FROM bip UNION ALL "
         "SELECT dst AS src, src AS dst, CASE WHEN sign = 1 THEN 1.0 ELSE -1.0 END::DOUBLE AS s "
         "FROM bip"),
        ("v", BIP_VERTS),
        ("pri", f"SELECT id, {prior_expr('id')} - CAST(0.5 AS DOUBLE) AS p FROM v"),
        ("z0", "SELECT id, p AS b FROM pri"),
    ]
    for t in range(1, iters + 1):
        prev = f"z{t-1}"
        ctes.append(
            (
                f"z{t}",
                f"SELECT pri.id, pri.p + {h} * COALESCE(s.m, CAST(0.0 AS DOUBLE)) AS b\n"
                f"FROM pri LEFT JOIN (\n"
                f"  SELECT bsgn.dst AS id, SUM(bsgn.s * {prev}.b) AS m FROM bsgn "
                f"JOIN {prev} ON {prev}.id = bsgn.src GROUP BY bsgn.dst\n"
                f") s ON s.id = pri.id",
            )
        )
    return _with(ctes, f"SELECT id, ROUND(b, 6) AS belief FROM z{iters}")


def sql_zoobp_literal(ep: float = 0.01) -> str:
    """Bug-compatible ZooBP closed form (see operators/zoobp.py
    zoobp_literal): the reference's literal ``B = E + logsumexp(M·B)``
    fixpoint collapses to B = (prior − 0.5) + s*, where s* depends only
    on the edge sign counts and the centered priors of the two smallest
    user ids / first two first-appearance products."""
    epl = _d(ep)
    return _with(
        [("bip", BIP),
         ("v", BIP_VERTS),
         ("pri", f"SELECT id, {prior_expr('id')} - CAST(0.5 AS DOUBLE) AS c FROM v"),
         ("cnt",
          "SELECT SUM(CASE WHEN sign = 1 THEN 1 ELSE 0 END)::DOUBLE AS n_pos, "
          "SUM(CASE WHEN sign = 2 THEN 1 ELSE 0 END)::DOUBLE AS n_neg, "
          "(SELECT COUNT(*)::DOUBLE FROM pri) AS n_l FROM bip"),
         ("u12",
          "SELECT MIN(c) FILTER (rn = 1) AS c_u1, MIN(c) FILTER (rn = 2) AS c_u2 "
          "FROM (SELECT c, ROW_NUMBER() OVER (ORDER BY id) AS rn FROM "
          "(SELECT DISTINCT src AS id FROM bip) u JOIN pri USING (id)) WHERE rn <= 2"),
         ("p12",
          "SELECT MIN(c) FILTER (rn = 1) AS c_p1, MIN(c) FILTER (rn = 2) AS c_p2 "
          "FROM (SELECT c, ROW_NUMBER() OVER (ORDER BY fu, dst) AS rn FROM "
          "(SELECT dst, MIN(src) AS fu FROM bip GROUP BY dst) p "
          "JOIN pri ON pri.id = p.dst) WHERE rn <= 2"),
         ("vs",
          f"SELECT 0.5::DOUBLE * {epl} * n_pos * c_p1 "
          f"- 0.25::DOUBLE * {epl} * {epl} * n_pos * c_u1 AS v1, "
          f"-0.5::DOUBLE * {epl} * n_neg * c_p2 "
          f"- 0.25::DOUBLE * {epl} * {epl} * n_neg * c_u2 AS v2, "
          f"0.5::DOUBLE * {epl} * n_pos * c_u1 "
          f"- 0.25::DOUBLE * {epl} * {epl} * n_pos * c_p1 AS v3, "
          f"-0.5::DOUBLE * {epl} * n_neg * c_u2 "
          f"- 0.25::DOUBLE * {epl} * {epl} * n_neg * c_p2 AS v4, n_l "
          "FROM cnt, u12, p12"),
         ("sstar",
          "SELECT LN((2.0::DOUBLE * n_l - 8.0::DOUBLE) "
          "+ EXP(v1) + EXP(-v1) + EXP(v2) + EXP(-v2) "
          "+ EXP(v3) + EXP(-v3) + EXP(v4) + EXP(-v4)) AS s FROM vs")],
        "SELECT pri.id, ROUND(pri.c + sstar.s, 6) AS belief FROM pri, sstar",
    )


# ------------------------------------------------- training-data pipeline

from .functions import text as _tx  # noqa: E402

_SHINGLES = (
    "SELECT doc_id, w || ' ' || w1 || ' ' || w2 AS sh FROM (\n"
    "  SELECT doc_id, w,\n"
    "    LEAD(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,\n"
    "    LEAD(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w2\n"
    "  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w,\n"
    "        UNNEST(range(len(string_split(text, ' ')))) AS pos FROM documents)\n"
    ") WHERE w2 IS NOT NULL"
)


def sql_dedup_exact() -> str:
    return (
        "SELECT MD5(text) AS text_md5, MIN(doc_id) AS keep_id, "
        "COUNT(*) AS n_docs FROM documents GROUP BY MD5(text)"
    )


def _minhash_ctes(h: int, src: str = "documents", suffix: str = ""):
    aggs = ", ".join(
        f"MIN(MD5('{j}:' || sh)) AS mh{j}" for j in range(h)
    )
    return [
        (f"sh{suffix}", _SHINGLES.replace("FROM documents", f"FROM {src}")),
        (f"sig{suffix}",
         f"SELECT doc_id, {aggs} FROM sh{suffix} GROUP BY doc_id"),
    ]


def sql_minhash_signatures(h: int = 12) -> str:
    return _with(_minhash_ctes(h), "SELECT * FROM sig")


def sql_simhash(bits: int = 16) -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN SUBSTRING(MD5(w), {b + 1}, 1) IN "
        f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits)
    )
    bitstr = " || ".join(
        f"CASE WHEN v{b} > 0 THEN '1' ELSE '0' END" for b in range(bits)
    )
    return _with(
        [("tok",
          "SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents"),
         ("agg", f"SELECT doc_id, {votes} FROM tok GROUP BY doc_id")],
        f"SELECT doc_id, {bitstr} AS simhash FROM agg",
    )


def _ngram_jaccard_ctes(h: int = 12, bands: int = 4, rows: int = 3,
                        max_bucket: int = 512) -> tuple[list, str]:
    """(ctes, final select) for the full near-dup pipeline — shared by
    ``sql_ngram_jaccard`` and ``sql_dedup_clusters``."""
    ctes = _minhash_ctes(h)
    band_selects = []
    for b in range(bands):
        cols = " || '|' || ".join(f"mh{b * rows + r}" for r in range(rows))
        band_selects.append(
            f"SELECT doc_id, {b} AS band, MD5({cols}) AS bkey FROM sig"
        )
    ctes += [
        ("bands", " UNION ALL ".join(band_selects)),
        ("bands_kept",
         "SELECT doc_id, band, bkey FROM ("
         "SELECT doc_id, band, bkey, COUNT(*) OVER (PARTITION BY band, bkey)"
         f" AS bn FROM bands) WHERE bn <= {max_bucket}"),
        ("pairs",
         "SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b "
         "FROM bands_kept l JOIN bands_kept r "
         "ON l.band = r.band AND l.bkey = r.bkey "
         "AND l.doc_id < r.doc_id"),
        ("dsh", "SELECT DISTINCT doc_id, sh FROM sh"),
        ("cnt", "SELECT doc_id, COUNT(*) AS n FROM dsh GROUP BY doc_id"),
        ("isect",
         "SELECT p.doc_a, p.doc_b, COUNT(*) AS i FROM pairs p "
         "JOIN dsh a ON a.doc_id = p.doc_a "
         "JOIN dsh b ON b.doc_id = p.doc_b AND b.sh = a.sh "
         "GROUP BY p.doc_a, p.doc_b"),
    ]
    final = (
        "SELECT p.doc_a, p.doc_b, ROUND(COALESCE(i.i, 0) "
        "/ CAST(ca.n + cb.n - COALESCE(i.i, 0) AS DOUBLE), 6) AS jaccard "
        "FROM pairs p LEFT JOIN isect i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b "
        "JOIN cnt ca ON ca.doc_id = p.doc_a JOIN cnt cb ON cb.doc_id = p.doc_b"
    )
    return ctes, final


def sql_containment_pairs(h: int = 12, bands: int = 4, rows: int = 3,
                          max_bucket: int = 512) -> str:
    """Mirror of dedup.containment_pairs: same LSH candidates and
    shingle-set intersection as the Jaccard path, but scored
    |A∩B| / min(|A|,|B|) — the asymmetric near-dup signal Jaccard
    dilutes when a short document sits wholly inside a long one."""
    ctes, _ = _ngram_jaccard_ctes(h, bands, rows, max_bucket)
    final = (
        "SELECT p.doc_a, p.doc_b, ROUND(COALESCE(i.i, 0) "
        "/ CAST(LEAST(ca.n, cb.n) AS DOUBLE), 6) AS containment "
        "FROM pairs p LEFT JOIN isect i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b "
        "JOIN cnt ca ON ca.doc_id = p.doc_a JOIN cnt cb ON cb.doc_id = p.doc_b"
    )
    return _with(ctes, final)


def sql_ngram_jaccard(h: int = 12, bands: int = 4, rows: int = 3,
                      max_bucket: int = 512) -> str:
    """``max_bucket`` mirrors dedup.MAX_BUCKET: band buckets above the
    cap are excluded before the self-join on BOTH engines (integer
    count — exact)."""
    ctes, final = _ngram_jaccard_ctes(h, bands, rows, max_bucket)
    return _with(ctes, final)


def sql_winnow_dup_pairs(w: int | None = None,
                         min_shared: int | None = None,
                         max_bucket: int | None = None) -> str:
    """Mirror of dedup.winnow_dup_pairs: identical md5-hex shingle
    hashes, window-min selection (degenerate <w-window rule included),
    per-doc distinct fingerprints, the identical integer posting-list
    cap, and the same (a < b, count >= min_shared) pair join. All
    constants are imported from the engine."""
    from .operators.dedup import (WINNOW_MAX_BUCKET, WINNOW_MIN_SHARED,
                                  WINNOW_W)
    if w is None:
        w = WINNOW_W
    if min_shared is None:
        min_shared = WINNOW_MIN_SHARED
    if max_bucket is None:
        max_bucket = WINNOW_MAX_BUCKET
    return _with(
        [("sp",
          "SELECT doc_id, string_split(text, ' ') AS w FROM documents"),
         ("shl",
          "SELECT doc_id, list_transform(range(1, LEN(w) - 1), "
          "i -> MD5(w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS hl "
          "FROM sp"),
         ("winl",
          f"SELECT doc_id, list_transform("
          f"range(1, GREATEST(LEN(hl) - {w} + 1, 1) + 1), "
          f"j -> list_aggregate(list_slice(hl, j, j + {w} - 1), 'min')) "
          f"AS wins FROM shl WHERE LEN(hl) >= 1"),
         ("fpu", "SELECT doc_id, UNNEST(wins) AS fp FROM winl"),
         ("fp", "SELECT DISTINCT doc_id, fp FROM fpu"),
         ("kept",
          "SELECT doc_id, fp FROM (SELECT doc_id, fp, "
          "COUNT(*) OVER (PARTITION BY fp) AS b FROM fp) "
          f"WHERE b <= {max_bucket}")],
        "SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, "
        "CAST(COUNT(*) AS BIGINT) AS n_shared "
        "FROM kept l JOIN kept r ON l.fp = r.fp AND l.doc_id < r.doc_id "
        f"GROUP BY 1, 2 HAVING COUNT(*) >= {min_shared}",
    )


def sql_dedup_training_pairs(n_neg: int = 100, threshold: float = 0.5,
                             h: int = 12, bands: int = 4, rows: int = 3,
                             max_bucket: int = 512) -> str:
    """Mirror of dedup.dedup_training_pairs: the jaccard chain nested,
    identical counter-hash negative draws, NOT EXISTS anti-join."""
    from .operators.dedup import PAIR_A, PAIR_B, PAIR_P

    ctes, jfinal = _ngram_jaccard_ctes(h, bands, rows, max_bucket)
    ctes.append(("jac", jfinal))

    def scr(x: str) -> str:
        return (f"((({x}) * {PAIR_A} + {PAIR_B}) % {PAIR_P} "
                f"* {PAIR_A} + {PAIR_B}) % {PAIR_P}")

    ctes += [
        ("nn2", "SELECT COUNT(*) AS n FROM documents"),
        ("draws",
         f"SELECT UNNEST(range(0, {n_neg})) AS i"),
        ("rawneg",
         f"SELECT LEAST({scr('i * 2')} % nn2.n, "
         f"{scr('i * 2 + 1')} % nn2.n) AS doc_a, "
         f"GREATEST({scr('i * 2')} % nn2.n, "
         f"{scr('i * 2 + 1')} % nn2.n) AS doc_b "
         "FROM draws, nn2"),
        ("neg",
         "SELECT DISTINCT doc_a, doc_b FROM rawneg "
         "WHERE doc_a <> doc_b AND NOT EXISTS ("
         "SELECT 1 FROM pairs p WHERE p.doc_a = rawneg.doc_a "
         "AND p.doc_b = rawneg.doc_b)"),
    ]
    return _with(
        ctes,
        f"SELECT doc_a, doc_b, 1 AS label FROM jac "
        f"WHERE jaccard >= {threshold!r}::DOUBLE "
        "UNION ALL SELECT doc_a, doc_b, 0 AS label FROM neg",
    )


def sql_minhash_calibration(h: int = 12, bands: int = 4, rows: int = 3,
                            max_bucket: int = 512) -> str:
    """Mirror of dedup.minhash_calibration: the ngram-jaccard chain's
    pairs + exact jaccard, joined back to the signature CTE; the match
    count is the identical 12-term CASE sum, est is one ROUND."""
    ctes, jfinal = _ngram_jaccard_ctes(h, bands, rows, max_bucket)
    ctes.append(("jac", jfinal))
    match = " + ".join(
        f"(CASE WHEN sa.mh{j} = sb.mh{j} THEN 1 ELSE 0 END)"
        for j in range(h))
    return _with(
        ctes,
        "SELECT j.doc_a, j.doc_b, "
        f"CAST({match} AS BIGINT) AS n_match, "
        f"ROUND(CAST({match} AS DOUBLE) / CAST({h} AS DOUBLE), 6) "
        "AS est_jaccard, j.jaccard "
        "FROM jac j JOIN sig sa ON sa.doc_id = j.doc_a "
        "JOIN sig sb ON sb.doc_id = j.doc_b",
    )


def sql_frontier_priority() -> str:
    """Mirror of crawl.frontier_priority_demo: the three certified
    chains nested as materialized CTEs, composed with the identical
    filters and joins."""
    return _with(
        [("fdelta", sql_crawl_delta()),
         ("fadm", sql_robots_admission()),
         ("fch", sql_host_churn())],
        "SELECT fdelta.doc_id, fdelta.doc_id % 37 AS host_id, "
        "fdelta.status, fch.churn "
        "FROM fdelta JOIN fadm ON fadm.doc_id = fdelta.doc_id "
        "AND fadm.allowed "
        "JOIN fch ON fch.host_id = fdelta.doc_id % 37 "
        "WHERE fdelta.status IN ('added', 'changed')",
    )


def sql_dedup_clusters(threshold: float = 0.8, h: int = 12, bands: int = 4,
                       rows: int = 3, max_bucket: int = 512) -> str:
    """Duplicate CLUSTERS: verified near-dup pairs (jaccard >=
    ``threshold``) -> exact transitive closure via a recursive CTE ->
    canonical = least doc_id reachable (incl. self). Mirrors
    dedup.dedup_clusters, whose engine-side closure is min-label
    propagation to fixpoint — both are the exact connected components
    of the thresholded pair graph, independently computed."""
    ctes, jfinal = _ngram_jaccard_ctes(h, bands, rows, max_bucket)
    ctes = ctes + [("jp", jfinal)]
    dup = f"SELECT doc_a, doc_b FROM jp WHERE jaccard >= {threshold!r}"
    return _closure_sql(ctes, dup, "doc_a", "doc_b", "doc_id")


def _closure_sql(ctes: list, dup_sql: str, a: str, b: str,
                 id_alias: str) -> str:
    """Shared cluster-closure assembly: pair CTE -> symmetric edge list
    -> recursive-CTE transitive closure -> canonical = least reachable
    id (incl. self) + cluster sizes. The recursive member cannot be
    MATERIALIZED; UNION (set) semantics bound the closure and
    guarantee termination."""
    ctes = ctes + [
        ("cl_dup", dup_sql),
        ("cl_e",
         f"SELECT {a} AS u, {b} AS v FROM cl_dup "
         f"UNION ALL SELECT {b} AS u, {a} AS v FROM cl_dup"),
    ]
    body = ",\n".join(f"{n} AS MATERIALIZED (\n{s}\n)" for n, s in ctes)
    return (
        "WITH RECURSIVE " + body + ",\n"
        "reach(u, v) AS (\n"
        "  SELECT u, v FROM cl_e\n"
        "  UNION\n"
        "  SELECT r.u, cl_e.v FROM reach r JOIN cl_e ON cl_e.u = r.v\n"
        "),\n"
        f"canon AS (SELECT u AS {id_alias}, LEAST(u, MIN(v)) AS "
        "canonical_id FROM reach GROUP BY u),\n"
        "sizes AS (SELECT canonical_id, COUNT(*) AS cluster_size "
        "FROM canon GROUP BY canonical_id)\n"
        f"SELECT c.{id_alias}, c.canonical_id, s.cluster_size, "
        f"CAST(c.{id_alias} = c.canonical_id AS INT) AS is_canonical "
        "FROM canon c JOIN sizes s USING (canonical_id)"
    )


def sql_doc_length_stats() -> str:
    """Mirror of attrs.grouped_percentiles over (lang, n_chars) — the
    oracle uses DuckDB's native ``quantile_cont`` (same linear-
    interpolation definition) instead of the engine's histogram walk:
    independent algorithms, equal numbers."""
    return (
        "SELECT lang, COUNT(*) AS n_rows, "
        "ROUND(quantile_cont(n_chars, 0.5), 6) AS p50, "
        "ROUND(quantile_cont(n_chars, 0.9), 6) AS p90, "
        "ROUND(quantile_cont(n_chars, 0.99), 6) AS p99 "
        "FROM documents GROUP BY lang"
    )


def sql_user_gap_stats() -> str:
    """Mirror of funnel.user_gap_stats: LEAD gaps floored to whole
    seconds, then DuckDB's native quantile_cont vs the engine's
    histogram walk — independent algorithms, equal numbers."""
    return _with(
        [("g",
          "SELECT user_id, CAST(FLOOR((LEAD(epoch_ms(ts)) OVER "
          "(PARTITION BY user_id ORDER BY ts, event_id) - epoch_ms(ts)) "
          "/ 1000.0) AS BIGINT) AS gap_s FROM events")],
        "SELECT user_id, COUNT(*) AS n_rows, "
        "ROUND(quantile_cont(gap_s, 0.5), 6) AS p50, "
        "ROUND(quantile_cont(gap_s, 0.9), 6) AS p90 "
        "FROM g WHERE gap_s IS NOT NULL GROUP BY user_id",
    )


def sql_capture_recapture(permille: int = 300) -> str:
    """Mirror of sketch.capture_recapture: distinct text-md5 universe,
    two independent low-32-bit hash-range captures, Lincoln-Petersen
    N̂ with one double division, rel_err FROM the rounded N̂."""
    cut = ((1 << 32) * permille) // 1000
    h = "('0x' || substr(md5({0}), 1, 8))::BIGINT"
    salted = h.format("fp || '#2'")
    return _with(
        [("fp", "SELECT DISTINCT md5(text) AS fp FROM documents"),
         ("marked",
          f"SELECT fp, ({h.format('fp')} < {cut}) AS in_a, "
          f"({salted} < {cut}) AS in_b FROM fp"),
         ("agg",
          "SELECT CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) "
          "AS n_a, "
          "CAST(SUM(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT) AS n_b, "
          "CAST(SUM(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT) "
          "AS n_both, CAST(COUNT(*) AS BIGINT) AS n_true FROM marked"),
         ("est",
          "SELECT n_a, n_b, n_both, n_true, "
          "ROUND(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) "
          "/ CAST(n_both AS DOUBLE), 6) AS n_hat FROM agg")],
        "SELECT n_a, n_b, n_both, n_true, n_hat, "
        "ROUND(ABS(n_hat - CAST(n_true AS DOUBLE)) "
        "/ CAST(n_true AS DOUBLE), 6) AS rel_err FROM est",
    )


def sql_hll_demo(m: int = 64) -> str:
    """Mirror of sketch.hll_demo: identical bucket/rho derivation
    (27 − len(bin(w)), no float log), exact dyadic 2^−reg terms, the
    same alpha_m literal imported from the operator module, and the
    verbatim small-range-correction branch."""
    from .operators.sketch import HLL_ALPHA

    def one(universe: str, src: str):
        return (
            f"SELECT '{universe}' AS universe, "
            f"CAST({m} AS BIGINT) AS m_registers, v_zero, est, n_true, "
            f"ROUND(ABS(est - CAST(n_true AS DOUBLE)) "
            f"/ CAST(n_true AS DOUBLE), 6) AS rel_err FROM (\n"
            f"  SELECT v_zero, CASE WHEN raw <= {_d(2.5 * m)} "
            f"AND v_zero > 0 THEN ROUND({_d(float(m))} * "
            f"LN({_d(float(m))} / CAST(v_zero AS DOUBLE)), 6) "
            f"ELSE ROUND(raw, 6) END AS est, n_true FROM (\n"
            f"    SELECT {_d(HLL_ALPHA)} * {_d(float(m * m))} / ssum "
            f"AS raw, v_zero, n_true FROM (\n"
            f"      SELECT SUM(CAST(1.0 AS DOUBLE) / (1 << reg)) AS ssum, "
            f"SUM(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS v_zero, "
            f"MAX(n_true) AS n_true FROM (\n"
            f"        SELECT COALESCE(r.reg, 0) AS reg FROM "
            f"(SELECT unnest(generate_series(0, {m - 1})) AS bucket) b "
            f"LEFT JOIN (\n"
            f"          SELECT bucket, MAX(rho) AS reg FROM (\n"
            f"            SELECT h % {m} AS bucket, CASE WHEN h // {m} = 0 "
            f"THEN 27 ELSE 27 - LENGTH(bin(h // {m})) END AS rho FROM (\n"
            f"              SELECT ('0x' || substr(md5(k), 1, 8))::BIGINT "
            f"AS h FROM ({src})\n"
            f"            )\n"
            f"          ) GROUP BY bucket\n"
            f"        ) r USING (bucket)\n"
            f"      ),\n"
            f"      (SELECT CAST(COUNT(*) AS BIGINT) AS n_true "
            f"FROM ({src}))\n"
            f"    )\n"
            f"  )\n"
            f")"
        )

    shingle_src = (
        "SELECT DISTINCT unnest(list_transform(generate_series(1, "
        "GREATEST(len(string_split(text, ' ')) - 2, 0)), "
        "i -> array_to_string(list_slice(string_split(text, ' '), "
        "i, i + 2), ' '))) AS k FROM documents"
    )
    lang_src = "SELECT DISTINCT lang AS k FROM documents"
    return one("shingles", shingle_src) + " UNION ALL " + one(
        "langs", lang_src)


def sql_cms_heavy_hitters(d: int = 4, w: int = 64, k: int = 20) -> str:
    """Mirror of sketch.cms_heavy_hitters over events.user_id: same
    scramble-hash grid, elementwise sum, min-over-rows estimate,
    (est DESC, key ASC) top-k. Shares the hash formula — the CMS
    guarantees themselves (est ≥ true everywhere, sketch additivity
    under any input split) are pinned by the operator's tests."""
    from .operators.walks import WALK_A, WALK_B, WALK_C, WALK_P
    from .operators.sketch import CMS_SALT

    return _with(
        [("cnt",
          "SELECT user_id AS key, COUNT(*) AS true_cnt "
          "FROM events GROUP BY 1"),
         ("cells",
          f"SELECT key, true_cnt, r.r AS r, "
          f"((((key % {WALK_P}) * (((r.r + 1) * {WALK_C} + {WALK_B}) "
          f"% {WALK_P}) + r.r * {WALK_B} + {CMS_SALT}) % {WALK_P}) "
          f"* {WALK_A} + {WALK_B}) % {WALK_P} % {w} AS bucket "
          f"FROM cnt CROSS JOIN "
          f"(SELECT UNNEST(generate_series(0, {d - 1})) AS r) r"),
         ("sketch",
          "SELECT r, bucket, CAST(SUM(true_cnt) AS BIGINT) AS cnt "
          "FROM cells GROUP BY 1, 2"),
         ("est",
          "SELECT c.key, c.true_cnt, CAST(MIN(s.cnt) AS BIGINT) AS est "
          "FROM cells c JOIN sketch s USING (r, bucket) GROUP BY 1, 2")],
        f"SELECT key, est, true_cnt FROM est "
        f"ORDER BY est DESC, key LIMIT {k}",
    )


def sql_quantile_transform(value_col: str = "n_chars") -> str:
    """Mirror of features.quantile_transform: value-frequency table,
    strict-below prefix sum over distinct values, midrank CDF."""
    return _with(
        [("freq",
          f"SELECT {value_col} AS v, COUNT(*) AS cnt FROM documents "
          f"GROUP BY 1"),
         ("nn", "SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents"),
         ("cdf",
          "SELECT v, ROUND((CAST(COALESCE(SUM(cnt) OVER (ORDER BY v "
          "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
          "AS DOUBLE) + CAST(0.5 AS DOUBLE) * cnt) / nn.n, 6) AS cdf "
          "FROM freq, nn")],
        f"SELECT d.doc_id, d.{value_col} AS v, cdf.cdf "
        f"FROM documents d JOIN cdf ON cdf.v = d.{value_col}",
    )


def sql_hashed_features(d: int = 32) -> str:
    """Mirror of features.hashed_features: same md5-slice hash
    (('0x'||substr(md5,1,8))::BIGINT == Spark's conv(substring,16,10)),
    same dim/sign bits, same zero-cell drop. The hash-slice
    equivalence itself is pinned independently against hashlib in
    tests/test_pipeline_ops.py."""
    return _with(
        [("tf",
          "SELECT doc_id, term, COUNT(*) AS tf FROM "
          "(SELECT doc_id, UNNEST(string_split(text, ' ')) AS term "
          "FROM documents) WHERE term != '' GROUP BY 1, 2"),
         ("h",
          "SELECT doc_id, tf, "
          "('0x' || substr(md5(term), 1, 8))::BIGINT AS h FROM tf")],
        f"SELECT doc_id, h % {d} AS dim, "
        f"CAST(SUM(CASE WHEN (h >> 8) % 2 = 0 THEN tf ELSE -tf END) "
        f"AS BIGINT) AS val "
        f"FROM h GROUP BY 1, 2 "
        f"HAVING SUM(CASE WHEN (h >> 8) % 2 = 0 THEN tf ELSE -tf END) <> 0",
    )


def sql_quantize_embeddings(bits: int = 8) -> str:
    """Mirror of features.quantize_embeddings: identical IEEE op
    sequence (sub, mul, div, FLOOR(x+0.5)) so codes match exactly;
    dequant rounded to 6dp on both sides. DuckDB FLOOR returns DOUBLE
    — cast AFTER flooring (exact integer-valued double), never a bare
    double→int cast (DuckDB rounds, Spark truncates)."""
    levels = (1 << bits) - 1
    return _with(
        [("flat",
          "SELECT vec_id, UNNEST(range(len(embedding))) AS dim, "
          "UNNEST(embedding::DOUBLE[]) AS x FROM embeddings"),
         ("ranges",
          "SELECT dim, MIN(x) AS lo, MAX(x) AS hi FROM flat GROUP BY 1"),
         ("q",
          f"SELECT f.vec_id, f.dim, "
          f"CASE WHEN r.hi = r.lo THEN 0 "
          f"ELSE CAST(FLOOR((f.x - r.lo) * {levels}.0::DOUBLE "
          f"/ (r.hi - r.lo) + 0.5::DOUBLE) AS BIGINT) END AS code, "
          f"r.lo, r.hi "
          f"FROM flat f JOIN ranges r USING (dim)")],
        f"SELECT vec_id, dim, code, "
        f"ROUND(lo + code * (hi - lo) / {levels}.0::DOUBLE, 6) AS dequant "
        f"FROM q",
    )


def sql_doc_novelty() -> str:
    """Mirror of dedup.doc_novelty: distinct per-doc trigram shingles,
    min-doc first occurrence, novel share with one ROUND 6 division."""
    return _with(
        [("t",
          "SELECT doc_id, string_split(text, ' ') AS toks "
          "FROM documents"),
         ("sh",
          "SELECT DISTINCT doc_id, unnest(list_transform("
          "generate_series(1, GREATEST(len(toks) - 2, 0)), "
          "i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS g "
          "FROM t"),
         ("first",
          "SELECT g, MIN(doc_id) AS d0 FROM sh GROUP BY g"),
         ("per_doc",
          "SELECT sh.doc_id, COUNT(*) AS n_grams, "
          "CAST(SUM(CASE WHEN sh.doc_id = f.d0 THEN 1 ELSE 0 END) "
          "AS BIGINT) AS n_novel "
          "FROM sh JOIN first f ON f.g = sh.g GROUP BY sh.doc_id")],
        "SELECT doc_id, n_grams, n_novel, "
        "ROUND(CAST(n_novel AS DOUBLE) / CAST(n_grams AS DOUBLE), 6) "
        "AS novelty FROM per_doc",
    )


def sql_heaps_law(bucket_docs: int = 50) -> str:
    """Mirror of tfidf.heaps_law: word-trigram types (the shingle
    stream), first-bucket-per-type vocabulary increments, bucket-level
    prefix sums, and the identical 6dp/DECIMAL OLS fit of ln V vs
    ln N."""
    return _with(
        [("t",
          "SELECT doc_id, string_split(text, ' ') AS toks "
          "FROM documents"),
         ("tok",
          "SELECT doc_id, unnest(list_transform(generate_series(1, "
          "GREATEST(len(toks) - 2, 0)), i -> array_to_string("
          "list_slice(toks, i, i + 2), ' '))) AS term FROM t"),
         ("newv",
          f"SELECT CAST(FLOOR(d0 / {bucket_docs}) AS BIGINT) "
          f"AS bucket, COUNT(*) AS nv FROM ("
          f"SELECT term, MIN(doc_id) AS d0 FROM tok GROUP BY term"
          f") GROUP BY 1"),
         ("ntok",
          f"SELECT CAST(FLOOR(doc_id / {bucket_docs}) AS BIGINT) "
          f"AS bucket, COUNT(*) AS nt FROM tok GROUP BY 1"),
         ("perb",
          "SELECT ntok.bucket, nt, COALESCE(nv, 0) AS nv "
          "FROM ntok LEFT JOIN newv USING (bucket)"),
         ("curve",
          "SELECT bucket, CAST(SUM(nt) OVER (ORDER BY bucket "
          "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens, "
          "CAST(SUM(nv) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) "
          "AS BIGINT) AS cum_vocab FROM perb"),
         ("xy",
          "SELECT bucket, cum_tokens, cum_vocab, "
          "ROUND(LN(CAST(cum_tokens AS DOUBLE)), 6) AS x, "
          "ROUND(LN(CAST(cum_vocab AS DOUBLE)), 6) AS y FROM curve"),
         ("s",
          "SELECT CAST(COUNT(*) AS DOUBLE) AS n, "
          "CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sx, "
          "CAST(SUM(CAST(ROUND(y, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sy, "
          "CAST(SUM(CAST(ROUND(x * y, 6) AS DECIMAL(28,6))) AS DOUBLE) "
          "AS sxy, "
          "CAST(SUM(CAST(ROUND(x * x, 6) AS DECIMAL(28,6))) AS DOUBLE) "
          "AS sxx FROM xy"),
         ("fit0",
          "SELECT n, sx, sy, CASE WHEN n * sxx - sx * sx = 0 "
          "THEN CAST(0.0 AS DOUBLE) "
          "ELSE ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) "
          "END AS beta FROM s"),
         ("fit",
          "SELECT beta, ROUND((sy - beta * sx) / n, 6) AS ln_k "
          "FROM fit0")],
        "SELECT xy.bucket, xy.cum_tokens, xy.cum_vocab, f.beta, f.ln_k "
        "FROM xy, fit f",
    )


def sql_zipf_alpha(cmin: int = 2) -> str:
    """Mirror of tfidf.zipf_alpha: trigram type counts, CSN discrete
    MLE with 6dp/DECIMAL-summed log terms."""
    return _with(
        [("t",
          "SELECT doc_id, string_split(text, ' ') AS toks "
          "FROM documents"),
         ("sh",
          "SELECT unnest(list_transform(generate_series(1, "
          "GREATEST(len(toks) - 2, 0)), i -> array_to_string("
          "list_slice(toks, i, i + 2), ' '))) AS g FROM t"),
         ("cnt",
          f"SELECT g, COUNT(*) AS c FROM sh GROUP BY g "
          f"HAVING COUNT(*) >= {cmin}"),
         ("s",
          f"SELECT CAST(COUNT(*) AS BIGINT) AS n_tail, "
          f"CAST(SUM(CAST(ROUND(LN(CAST(c AS DOUBLE) / {_d(cmin - 0.5)}),"
          f" 6) AS DECIMAL(28,6))) AS DOUBLE) AS s FROM cnt")],
        "SELECT n_tail, ROUND(CAST(1.0 AS DOUBLE) "
        "+ CAST(n_tail AS DOUBLE) / s, 6) AS alpha FROM s",
    )


def sql_postings_compression() -> str:
    """Mirror of tfidf.postings_compression: distinct postings,
    per-term lag gaps from the −1 sentinel, the identical integer
    varint-size CASE ladder, ROUND 6 ratio."""
    vb = (
        "CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2 "
        "WHEN gap < 2097152 THEN 3 WHEN gap < 268435456 THEN 4 "
        "ELSE 5 END"
    )
    return _with(
        [("tk",
          "SELECT doc_id, unnest(string_split(text, ' ')) AS term "
          "FROM documents"),
         ("post",
          "SELECT DISTINCT term, doc_id FROM tk WHERE term <> ''"),
         ("gaps",
          "SELECT term, doc_id - COALESCE(LAG(doc_id) OVER "
          "(PARTITION BY term ORDER BY doc_id), -1) AS gap FROM post"),
         ("agg",
          f"SELECT term, CAST(COUNT(*) AS BIGINT) AS n_postings, "
          f"CAST(COUNT(*) * 8 AS BIGINT) AS bytes_raw, "
          f"CAST(SUM({vb}) AS BIGINT) AS bytes_varint "
          f"FROM gaps GROUP BY term")],
        "SELECT term, n_postings, bytes_raw, bytes_varint, "
        "ROUND(CAST(bytes_varint AS DOUBLE) / CAST(bytes_raw AS DOUBLE), "
        "6) AS ratio FROM agg",
    )


def sql_spelling_variants(max_bucket: int = 64, min_len: int = 3) -> str:
    """Mirror of tfidf.spelling_variants_demo: identical typo
    planting, deletion-neighborhood candidates (list_transform over
    positions), same bucket cap, levenshtein() == 1 verify."""
    plant = (
        "text || (CASE WHEN doc_id % 9 = 0 THEN ' tble' ELSE '' END) "
        "|| (CASE WHEN doc_id % 10 = 0 THEN ' sparkk' ELSE '' END) "
        "|| (CASE WHEN doc_id % 12 = 0 THEN ' vakue' ELSE '' END)"
    )
    dels = (
        "list_transform(generate_series(1, LENGTH(term)), "
        "i -> substr(term, 1, i - 1) || substr(term, i + 1, LENGTH(term)))"
    )
    return _with(
        [("p", f"SELECT doc_id, {plant} AS text FROM documents"),
         ("tok",
          "SELECT unnest(string_split(text, ' ')) AS term FROM p"),
         ("vocab",
          f"SELECT term, COUNT(*) AS c FROM tok "
          f"WHERE LENGTH(term) >= {min_len} GROUP BY term"),
         ("variants",
          f"SELECT DISTINCT term, c, unnest(list_distinct("
          f"list_prepend(term, {dels}))) AS v FROM vocab"),
         ("ok",
          f"SELECT v FROM variants GROUP BY v "
          f"HAVING COUNT(*) <= {max_bucket}"),
         ("pruned",
          "SELECT variants.* FROM variants "
          "WHERE v IN (SELECT v FROM ok)"),
         ("cand",
          "SELECT DISTINCT a.term AS term_a, b.term AS term_b, "
          "a.c AS c_a, b.c AS c_b FROM pruned a JOIN pruned b "
          "ON a.v = b.v AND a.term < b.term")],
        "SELECT term_a, term_b, c_a, c_b, CAST(1 AS BIGINT) AS dist "
        "FROM cand WHERE levenshtein(term_a, term_b) = 1",
    )


def sql_vocab_topk(k: int = 50) -> str:
    """Mirror of tfidf.vocab_topk: the (count DESC, term ASC) total
    order makes the k-cut deterministic on both engines."""
    return (
        "SELECT term, COUNT(*) AS n_occurrences, "
        "COUNT(DISTINCT doc_id) AS doc_freq "
        "FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term "
        "FROM documents) WHERE term != '' "
        f"GROUP BY term ORDER BY n_occurrences DESC, term LIMIT {k}"
    )


def sql_incremental_dedup(threshold: float = 0.0, h: int = 12,
                          bands: int = 4, rows: int = 3,
                          max_bucket: int = 512, mod: int = 7) -> str:
    """Mirror of dedup.incremental_dedup over the doc_id % ``mod``
    corpus/batch split the registry query pins: per-side band keys,
    per-side bucket caps, a DIRECTIONAL batch x corpus band join, and
    candidate-only Jaccard verification."""
    ctes = [
        ("corpus_docs",
         f"SELECT * FROM documents WHERE doc_id % {mod} != 0"),
        ("batch_docs",
         f"SELECT * FROM documents WHERE doc_id % {mod} = 0"),
    ]
    ctes += _minhash_ctes(h, "corpus_docs", "_c")
    ctes += _minhash_ctes(h, "batch_docs", "_b")
    for suf in ("_c", "_b"):
        band_selects = []
        for b in range(bands):
            cols = " || '|' || ".join(
                f"mh{b * rows + r}" for r in range(rows)
            )
            band_selects.append(
                f"SELECT doc_id, {b} AS band, MD5({cols}) AS bkey "
                f"FROM sig{suf}"
            )
        ctes += [
            (f"bands{suf}", " UNION ALL ".join(band_selects)),
            (f"kept{suf}",
             "SELECT doc_id, band, bkey FROM ("
             "SELECT doc_id, band, bkey, "
             "COUNT(*) OVER (PARTITION BY band, bkey) AS bn "
             f"FROM bands{suf}) WHERE bn <= {max_bucket}"),
        ]
    ctes += [
        ("pairs",
         "SELECT DISTINCT b.doc_id AS new_id, c.doc_id AS old_id "
         "FROM kept_b b JOIN kept_c c "
         "ON b.band = c.band AND b.bkey = c.bkey"),
        ("dsh_b", "SELECT DISTINCT doc_id, sh FROM sh_b"),
        ("dsh_c", "SELECT DISTINCT doc_id, sh FROM sh_c"),
        ("cnt_b",
         "SELECT doc_id, COUNT(*) AS n FROM dsh_b GROUP BY doc_id"),
        ("cnt_c",
         "SELECT doc_id, COUNT(*) AS n FROM dsh_c GROUP BY doc_id"),
        ("isect",
         "SELECT p.new_id, p.old_id, COUNT(*) AS i FROM pairs p "
         "JOIN dsh_b a ON a.doc_id = p.new_id "
         "JOIN dsh_c b ON b.doc_id = p.old_id AND b.sh = a.sh "
         "GROUP BY p.new_id, p.old_id"),
    ]
    final = (
        "SELECT p.new_id, p.old_id, ROUND(COALESCE(i.i, 0) "
        "/ CAST(ca.n + cb.n - COALESCE(i.i, 0) AS DOUBLE), 6) AS jaccard "
        "FROM pairs p "
        "LEFT JOIN isect i ON i.new_id = p.new_id AND i.old_id = p.old_id "
        "JOIN cnt_b ca ON ca.doc_id = p.new_id "
        "JOIN cnt_c cb ON cb.doc_id = p.old_id"
    )
    if threshold > 0:
        final = (f"SELECT * FROM ({final}) "
                 f"WHERE jaccard >= {threshold!r}")
    return _with(ctes, final)


def sql_quality_repetition() -> str:
    """Mirror of text.repetition_exprs, by a DIFFERENT algorithm: the
    engine folds a sorted-run aggregate for the top-word count; this
    oracle unnests and group-by-maxes. DuckDB lists are 1-indexed;
    range(1, n) yields i = 1..n-1 so bigram i pairs w[i] with w[i+1]."""
    return _with(
        [("sp",
          "SELECT doc_id, string_split(text, ' ') AS w FROM documents"),
         ("tok", "SELECT doc_id, UNNEST(w) AS t FROM sp"),
         ("wc",
          "SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t"),
         ("top", "SELECT doc_id, MAX(c) AS topc FROM wc GROUP BY doc_id"),
         ("base",
          "SELECT doc_id, LEN(w) AS n, LEN(list_distinct(w)) AS d, "
          "LEN(list_distinct(list_transform(range(1, LEN(w)), "
          "i -> w[i] || ' ' || w[i + 1]))) AS db FROM sp")],
        "SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_tokens, "
        "ROUND(1 - b.d / CAST(b.n AS DOUBLE), 6) AS dup_word_frac, "
        "ROUND(top.topc / CAST(b.n AS DOUBLE), 6) AS top_word_frac, "
        "CASE WHEN b.n > 1 THEN "
        "ROUND(1 - b.db / CAST(b.n - 1 AS DOUBLE), 6) "
        "ELSE CAST(0.0 AS DOUBLE) END AS dup_bigram_frac "
        "FROM base b JOIN top USING (doc_id)",
    )


def sql_quality_score() -> str:
    """Mirror of quality.quality_score: the repetition chain nested
    for dup_word_frac, stopword_ratio/n_tokens inline, the identical
    fixed-order composite, one final ROUND."""
    from .functions.text import (STOPWORDS, sql_token_count,
                                 sql_word_occurrences)

    nt = sql_token_count("text")
    stop = " + ".join(sql_word_occurrences("text", w) for w in STOPWORDS)
    return _with(
        [("qr", sql_quality_repetition()),
         ("q",
          f"SELECT doc_id, {nt} AS n_tokens, "
          f"ROUND(({stop}) / CAST({nt} AS DOUBLE), 6) AS stopword_ratio "
          "FROM documents")],
        "SELECT q.doc_id, q.n_tokens, "
        "CAST(FLOOR((CAST(0.4 AS DOUBLE) * q.stopword_ratio "
        "+ CAST(0.3 AS DOUBLE) * (CAST(LEAST(q.n_tokens, 200) AS DOUBLE) "
        "/ CAST(200.0 AS DOUBLE)) "
        "+ CAST(0.3 AS DOUBLE) * (CAST(1.0 AS DOUBLE) "
        "- qr.dup_word_frac)) * 1e6) AS BIGINT) / 1e6 AS quality_score "
        "FROM q JOIN qr USING (doc_id)",
    )


def sql_host_dup_stats(n_hosts: int = 37) -> str:
    """Mirror of crawl.host_dup_stats: md5 canonical groups, per-host
    duplicate counts, one division."""
    return _with(
        [("keep",
          "SELECT MD5(text) AS fp, MIN(doc_id) AS keep_id "
          "FROM documents GROUP BY MD5(text)"),
         ("j",
          "SELECT d.doc_id, k.keep_id FROM documents d "
          "JOIN keep k ON k.fp = MD5(d.text)")],
        f"SELECT doc_id % {n_hosts} AS host_id, "
        "CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_dup, "
        "CAST(SUM(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END) "
        "AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS dup_rate "
        f"FROM j GROUP BY doc_id % {n_hosts}",
    )


def sql_host_mirror_pairs(n_hosts: int = 37, max_group: int = 64,
                          min_shared: int = 2) -> str:
    """Mirror of crawl.host_mirror_pairs_demo: identical planted
    mirror postings (doc_id % 9 == 0 also served by host+5), group cap
    before the self-join, a < b pair counts."""
    return _with(
        [("posting",
          f"SELECT DISTINCT fp, host FROM ("
          f"SELECT MD5(text) AS fp, doc_id % {n_hosts} AS host "
          "FROM documents UNION ALL "
          f"SELECT MD5(text) AS fp, (doc_id % {n_hosts} + 5) % {n_hosts} "
          "AS host FROM documents WHERE doc_id % 9 = 0)"),
         ("small",
          "SELECT fp FROM (SELECT fp, COUNT(*) AS g FROM posting "
          f"GROUP BY fp) WHERE g <= {max_group}"),
         ("kept",
          "SELECT fp, host FROM posting "
          "WHERE fp IN (SELECT fp FROM small)")],
        "SELECT l.host AS host_a, r.host AS host_b, "
        "CAST(COUNT(*) AS BIGINT) AS n_shared "
        "FROM kept l JOIN kept r ON r.fp = l.fp AND l.host < r.host "
        f"GROUP BY l.host, r.host HAVING COUNT(*) >= {min_shared}",
    )


def _kmeans_ctes(k: int = 8, iters: int = 3) -> list[tuple[str, str]]:
    """Shared CTE chain ending in a{iters-1}(vec_id, v, cluster) —
    the Lloyd assignment both sql_kmeans_assign and sql_semdedup
    consume."""
    dist = ("list_reduce(list_transform(e.v, (x, i) -> "
            "(x - c.cent[i]) * (x - c.cent[i])), (a, b) -> a + b)")
    ctes = [
        ("e", "SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings"),
        ("c0",
         f"SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster, "
         f"v AS cent FROM (SELECT vec_id, v FROM e ORDER BY vec_id "
         f"LIMIT {k})"),
    ]
    for t in range(iters):
        ctes.append((
            f"a{t}",
            f"SELECT vec_id, v, cluster FROM (\n"
            f"  SELECT e.vec_id, e.v, c.cluster, ROW_NUMBER() OVER "
            f"(PARTITION BY e.vec_id ORDER BY {dist}, c.cluster) AS rn\n"
            f"  FROM e CROSS JOIN c{t} c\n"
            f") WHERE rn = 1",
        ))
        if t == iters - 1:
            break
        ctes.append((
            f"u{t}",
            f"SELECT cluster, dim, SUM(CAST(ROUND(x * 1000000.0, 0) "
            f"AS BIGINT)) AS s, COUNT(*) AS n FROM (\n"
            f"  SELECT cluster, UNNEST(v) AS x, "
            f"UNNEST(range(len(v))) AS dim FROM a{t}\n"
            f") GROUP BY cluster, dim",
        ))
        ctes.append((
            f"c{t+1}",
            f"SELECT p.cluster, "
            f"CASE WHEN m.cent IS NULL THEN p.cent ELSE m.cent END AS cent "
            f"FROM c{t} p LEFT JOIN (\n"
            f"  SELECT cluster, list(CAST(s AS DOUBLE) / (n * 1000000.0) "
            f"ORDER BY dim) AS cent FROM u{t} GROUP BY cluster\n"
            f") m USING (cluster)",
        ))
    return ctes


def sql_kmeans_assign(k: int = 8, iters: int = 3) -> str:
    """Mirror of kmeans.kmeans_assign: init = k smallest vec_ids,
    per-iteration argmin with the identical sequential fold
    (list_transform + list_reduce; seed difference 0.0+e1 vs e1 is
    float-identical), centroid update via scaled-int64 sums and ONE
    double division, empty clusters keeping their previous centroid."""
    return _with(
        _kmeans_ctes(k, iters),
        f"SELECT vec_id, CAST(cluster AS INT) AS cluster FROM a{iters-1}")


def sql_semdedup(k: int = 8, iters: int = 3, tau: float = 0.35,
                 max_cluster: int = 4096) -> str:
    """Mirror of kmeans.semdedup: final-assignment cluster centroids
    via the same scaled-int64 mean, 6dp-rounded centroid similarity,
    and the dominance rule — drop x iff a same-cluster y with
    ROUND(cos,6) >= tau has a smaller (cent_sim, vec_id) key; clusters
    above max_cluster skip pruning."""
    last = f"a{iters-1}"

    def cos(x, y):
        return (f"list_dot_product({x}, {y}) / "
                f"(SQRT(list_dot_product({x}, {x})) * "
                f"SQRT(list_dot_product({y}, {y})))")

    ctes = _kmeans_ctes(k, iters) + [
        ("csum",
         f"SELECT cluster, dim, SUM(CAST(ROUND(x * 1000000.0, 0) "
         f"AS BIGINT)) AS s, COUNT(*) AS n FROM (\n"
         f"  SELECT cluster, UNNEST(v) AS x, "
         f"UNNEST(range(len(v))) AS dim FROM {last}\n"
         f") GROUP BY cluster, dim"),
        ("cent",
         "SELECT cluster, list(CAST(s AS DOUBLE) / (n * 1000000.0) "
         "ORDER BY dim) AS cent FROM csum GROUP BY cluster"),
        ("cs",
         f"SELECT a.vec_id, a.cluster, a.v, "
         f"ROUND({cos('a.v', 'c.cent')}, 6) AS cent_sim "
         f"FROM {last} a JOIN cent c USING (cluster)"),
        ("sizes",
         "SELECT cluster, COUNT(*) AS csize FROM cs GROUP BY cluster"),
        ("pr",
         f"SELECT cs.* FROM cs JOIN sizes USING (cluster) "
         f"WHERE csize <= {max_cluster}"),
        ("drops",
         f"SELECT DISTINCT x.vec_id FROM pr x JOIN pr y "
         f"ON x.cluster = y.cluster AND y.vec_id <> x.vec_id "
         f"AND ROUND({cos('x.v', 'y.v')}, 6) >= {_d(tau)} "
         f"AND (y.cent_sim < x.cent_sim OR (y.cent_sim = x.cent_sim "
         f"AND y.vec_id < x.vec_id))"),
    ]
    return _with(
        ctes,
        "SELECT cs.vec_id, CAST(cs.cluster AS INT) AS cluster, "
        "cs.cent_sim, CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END "
        "AS BIGINT) AS kept FROM cs LEFT JOIN drops d "
        "ON d.vec_id = cs.vec_id")


def sql_grouped_split(test_permille: int = 100) -> str:
    """Mirror of mix.grouped_split: the first 8 hex chars of
    md5(source) as an integer via positional nibble arithmetic
    (DuckDB has no hex→int conv), mod 1000 against the cut."""
    nib = " + ".join(
        f"(STRPOS('0123456789abcdef', SUBSTRING(h, {i}, 1)) - 1) "
        f"* {16 ** (8 - i)}"
        for i in range(1, 9)
    )
    return _with(
        [("hd", "SELECT doc_id, source, MD5(source) AS h FROM documents")],
        f"SELECT doc_id, source, CASE WHEN ({nib}) % 1000 "
        f"< {test_permille} THEN 'test' ELSE 'train' END AS split FROM hd",
    )


def sql_dsir_weights(target_lang: str = "en", n_buckets: int = 256,
                     keep_n: int = 200) -> str:
    """Mirror of mix.dsir_weights: identical md5 bucket hash, single-LN
    6dp-rounded per-bucket log-ratio, DECIMAL-summed per-doc weights,
    top-keep_n selection by (log_w DESC, doc_id)."""
    B = float(n_buckets)
    return _with(
        [("t",
          "SELECT doc_id, lang, string_split(text, ' ') AS toks "
          "FROM documents"),
         ("fs",
          "SELECT doc_id, lang, unnest(toks) AS f FROM t "
          "UNION ALL "
          "SELECT doc_id, lang, unnest(list_transform("
          "generate_series(1, len(toks) - 1), "
          "i -> array_to_string(list_slice(toks, i, i + 1), ' '))) AS f "
          "FROM t"),
         ("feats",
          f"SELECT doc_id, lang, "
          f"('0x' || substr(md5(f), 1, 8))::BIGINT % {n_buckets} "
          f"AS bucket FROM fs"),
         ("cnts",
          "SELECT doc_id, bucket, COUNT(*) AS cnt FROM feats "
          "GROUP BY doc_id, bucket"),
         ("ct",
          f"SELECT bucket, COUNT(*) AS c_t FROM feats "
          f"WHERE lang = '{target_lang}' GROUP BY bucket"),
         ("cr", "SELECT bucket, COUNT(*) AS c_r FROM feats GROUP BY bucket"),
         ("nt",
          f"SELECT CAST(COUNT(*) AS DOUBLE) AS n_t FROM feats "
          f"WHERE lang = '{target_lang}'"),
         ("nr", "SELECT CAST(COUNT(*) AS DOUBLE) AS n_r FROM feats"),
         ("bk",
          f"SELECT unnest(generate_series(0, {n_buckets - 1})) AS bucket"),
         ("lr",
          f"SELECT bk.bucket, ROUND(LN("
          f"(CAST(COALESCE(ct.c_t, 0) + 1 AS DOUBLE) * (nr.n_r + {_d(B)}))"
          f" / (CAST(COALESCE(cr.c_r, 0) + 1 AS DOUBLE) "
          f"* (nt.n_t + {_d(B)}))), 6) AS lr "
          f"FROM bk LEFT JOIN ct USING (bucket) "
          f"LEFT JOIN cr USING (bucket), nt, nr"),
         ("w",
          "SELECT c.doc_id, CAST(SUM(c.cnt) AS BIGINT) AS n_feats, "
          "ROUND(CAST(SUM(CAST(ROUND(c.cnt * l.lr, 6) "
          "AS DECIMAL(28,6))) AS DOUBLE), 6) AS log_w "
          "FROM cnts c JOIN lr l USING (bucket) GROUP BY c.doc_id"),
         ("sel",
          f"SELECT doc_id FROM w ORDER BY log_w DESC, doc_id "
          f"LIMIT {keep_n}")],
        "SELECT w.doc_id, w.n_feats, w.log_w, "
        "CAST(CASE WHEN s.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) "
        "AS selected FROM w LEFT JOIN sel s ON s.doc_id = w.doc_id",
    )


def sql_weighted_sample(k: int = 100) -> str:
    """Mirror of mix.weighted_sample: same md5-derived u, log-domain
    ES key rounded to 6 dp, top-k by (key DESC, doc_id)."""
    return _with(
        [("scored",
          f"SELECT doc_id, n_chars AS w, ROUND(LN(("
          f"('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT "
          f"+ 1) / {_d(float(1 << 32))}) "
          f"/ CAST(n_chars AS DOUBLE), 6) AS key FROM documents"),
         ("top",
          f"SELECT doc_id FROM scored ORDER BY key DESC, doc_id "
          f"LIMIT {k}")],
        "SELECT s.doc_id, s.w, s.key, "
        "CAST(CASE WHEN t.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) "
        "AS sampled FROM scored s LEFT JOIN top t ON t.doc_id = s.doc_id",
    )


def sql_corpus_sample_mix(rates: dict[str, float],
                          default_rate: float) -> str:
    """Mirror of mix.corpus_sample: keep a doc iff its Knuth hash falls
    below the stratum's integer cut. The cuts come from the SAME
    ``stratum_cuts`` call the engine uses — both engines evaluate pure
    int64 arithmetic on literals."""
    from .operators.mix import stratum_cuts
    from .sources.tables import PRIOR_MOD, PRIOR_MULT

    cuts = stratum_cuts(rates)
    cases = " ".join(
        f"WHEN lang = '{k}' THEN {c}" for k, c in sorted(cuts.items())
    )
    default_cut = int(float(default_rate) * PRIOR_MOD)
    return (
        "SELECT doc_id, lang, source FROM documents "
        f"WHERE (doc_id * {PRIOR_MULT}) % {PRIOR_MOD} < "
        f"CASE {cases} ELSE {default_cut} END"
    )


def sql_text_features(bits: int = 16) -> str:
    """One pass over documents with ALL the text-analysis operators:
    token count, quality stats, language-ID heuristic, fingerprint, AND
    the 16-bit SimHash — each previously its own query (merged to keep
    the registry within the driver's recording budget; operator coverage
    unchanged — the standalone ``sql_simhash`` builder stays for
    tests)."""
    nt = _tx.sql_token_count("text")
    stop = " + ".join(_tx.sql_word_occurrences("text", w) for w in _tx.STOPWORDS)
    scores = {
        lang: " + ".join(_tx.sql_word_occurrences("text", m) for m in markers)
        for lang, markers in _tx.LANG_MARKERS.items()
    }
    mx = "GREATEST(" + ", ".join(f"({s})" for s in scores.values()) + ")"
    case = " ".join(
        f"WHEN ({scores[lang]}) = mx THEN '{lang}'" for lang in sorted(scores)
    )
    tf = (
        "SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars, "
        f"{nt} AS n_tokens, "
        f"ROUND((LENGTH(text) - ({nt} - 1)) / CAST({nt} AS DOUBLE), 6) "
        "AS avg_token_len, "
        f"ROUND(({stop}) / CAST({nt} AS DOUBLE), 6) AS stopword_ratio, "
        f"lang, CASE {case} END AS pred_lang, "
        f"{_tx.sql_fingerprint('text')} AS fingerprint "
        f"FROM (SELECT doc_id, lang, text, {mx} AS mx FROM documents)"
    )
    votes = ", ".join(
        f"SUM(CASE WHEN SUBSTRING(MD5(w), {b + 1}, 1) IN "
        f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits)
    )
    bitstr = " || ".join(
        f"CASE WHEN v{b} > 0 THEN '1' ELSE '0' END" for b in range(bits)
    )
    return _with(
        [("tf", tf),
         ("tok",
          "SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents"),
         ("simagg", f"SELECT doc_id, {votes} FROM tok GROUP BY doc_id"),
         ("sim", f"SELECT doc_id, {bitstr} AS simhash FROM simagg")],
        "SELECT tf.*, sim.simhash FROM tf JOIN sim USING (doc_id)",
    )


def sql_fbox_sketch_check() -> str:
    """Oracle for the sketch-path agreement gate: the agreement flags are
    genuinely computed Spark-side (exact-Gram factors vs the randomized
    sketch that serves bench scale); DuckDB pins them to 1 and
    independently recomputes the user count the kernels must cover."""
    return _with(
        [("bip", BIP)],
        "SELECT 1 AS ok_sigma, 1 AS ok_corr, "
        "(SELECT COUNT(DISTINCT src) FROM bip) AS n_users",
    )


def sql_bulk_peel_invariant(fixture_dir: str = None) -> str:
    """Oracle for the ε-peel density invariant: ok is computed Spark-side
    (block density ≥ exact/2(1+ε)); DuckDB re-reads the exact density
    from the same reference-peel fixture, so a fixture swap or a Spark-
    side misread both surface as a hash mismatch."""
    d = fixture_dir or FIXTURE_DIR
    return (
        "SELECT 1 AS ok, ROUND(density, 6) AS exact_density "
        f"FROM read_parquet('{d}/fraudar_density.parquet') WHERE block = 1"
    )


def sql_multimodal_decode() -> str:
    """Asset metadata + the deterministic fake decode. The decode stub
    derives dimensions from the payload's md5 DIGEST BYTES
    (operators/multimodal.py): DuckDB's md5_number_upper(text) is the
    little-endian integer of digest bytes 0-7, so byte k =
    (md5_number_upper // 256^k) % 256."""
    b = "md5_number_upper(text)"
    return (
        "SELECT doc_id AS asset_id, "
        "CASE WHEN doc_id % 3 = 0 THEN 'image' "
        "WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind, "
        "CAST(LENGTH(text) AS INTEGER) AS byte_len, "
        "MD5(text) AS payload_md5, "
        f"CAST(16 + ({b} % 256) % 64 AS INTEGER) AS width, "
        f"CAST(16 + (({b} // 256) % 256) % 64 AS INTEGER) AS height, "
        f"CAST(CASE WHEN doc_id % 3 = 0 THEN 1 "
        f"ELSE 1 + (({b} // 65536) % 256) % 30 END AS INTEGER) AS n_frames "
        "FROM documents"
    )


def _ann_neardup_ctes(threshold: float = 0.35, n_planes: int = 8,
                      max_bucket: int = 4096):
    """(ctes, final) for sign-LSH near-dup pairs — shared by
    ``sql_ann_lsh_neardup`` and ``sql_ann_neardup_clusters``."""
    sgn = ("CASE WHEN ((p * 131 + d * 31) * 2654435761) % 1000003 % 2 = 0 "
           "THEN x ELSE -x END")
    return (
        [("e", "SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings"),
         ("dims",
          "SELECT vec_id, UNNEST(emb) AS x, UNNEST(range(len(emb))) AS d FROM e"),
         ("dots",
          f"SELECT vec_id, p, SUM({sgn}) AS s FROM dims "
          f"CROSS JOIN (SELECT UNNEST(range({n_planes})) AS p) GROUP BY vec_id, p"),
         ("buck0",
          "SELECT vec_id, STRING_AGG(CASE WHEN s > 0 THEN '1' ELSE '0' END, "
          "'' ORDER BY p) AS bucket FROM dots GROUP BY vec_id"),
         ("buck",
          "SELECT vec_id, bucket FROM (SELECT vec_id, bucket, "
          "COUNT(*) OVER (PARTITION BY bucket) AS bn FROM buck0) "
          f"WHERE bn <= {max_bucket}"),
         ("pairs",
          "SELECT l.vec_id AS vec_a, r.vec_id AS vec_b FROM buck l "
          "JOIN buck r ON l.bucket = r.bucket AND l.vec_id < r.vec_id"),
         ("scored",
          "SELECT p.vec_a, p.vec_b, "
          "ROUND(list_dot_product(a.emb, b.emb) / "
          "(SQRT(list_dot_product(a.emb, a.emb)) * "
          "SQRT(list_dot_product(b.emb, b.emb))), 6) AS cos "
          "FROM pairs p JOIN e a ON a.vec_id = p.vec_a "
          "JOIN e b ON b.vec_id = p.vec_b")],
        f"SELECT vec_a, vec_b, cos FROM scored WHERE cos >= {_d(threshold)}",
    )


def sql_ann_lsh_neardup(threshold: float = 0.35, n_planes: int = 8,
                        max_bucket: int = 4096) -> str:
    """Sign-LSH near-dup pairs: the ±1 hyperplanes are the same
    multiplicative-hash pattern the Spark side generates
    (ann.plane_sign), so both engines bucket identically; cosine is
    rounded to 6dp before the threshold on both sides. ``max_bucket``
    mirrors ann.MAX_BUCKET — oversized buckets excluded on both
    engines."""
    ctes, final = _ann_neardup_ctes(threshold, n_planes, max_bucket)
    return _with(ctes, final)


def sql_ann_neardup_clusters(threshold: float = 0.35, n_planes: int = 8,
                             max_bucket: int = 4096) -> str:
    """Embedding near-dup CLUSTERS: the thresholded cosine pair graph's
    exact transitive closure, canonical = least vec_id — mirror of
    ann.neardup_clusters (min-label propagation), independently
    computed via the shared recursive-CTE assembly."""
    ctes, final = _ann_neardup_ctes(threshold, n_planes, max_bucket)
    return _closure_sql(ctes, final, "vec_a", "vec_b", "vec_id")


FIXTURE_DIR = "/root/repo/fixtures/oracle/sf0.01"


def sql_fixture(name: str, select: str = "*") -> str:
    """Oracle = precomputed parquet produced by the ACTUAL reference
    implementation (scripts/make_oracle_fixtures.py runs the reference
    detectors through tests/refshims on the same graph derivation).
    tests/test_oracle_parity.py rewrites the sf0.01 path to the sf0.001
    fixture when checking at the smaller scale; live reference parity is
    additionally asserted in tests/test_reference_parity.py."""
    return f"SELECT {select} FROM read_parquet('{FIXTURE_DIR}/{name}.parquet')"


def sql_cosine_topk(query_ids: list[int], k: int = 3) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return _with(
        [("q",
          f"SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe "
          f"FROM embeddings WHERE vec_id IN ({ids})"),
         ("scored",
          "SELECT q.query_id, e.vec_id AS neighbor_id, "
          "ROUND(list_dot_product(q.qe, e.embedding::DOUBLE[]) / "
          "(SQRT(list_dot_product(q.qe, q.qe)) * "
          "SQRT(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 6) "
          "AS cos FROM q, embeddings e WHERE e.vec_id <> q.query_id"),
         ("ranked",
          "SELECT query_id, neighbor_id, cos, ROW_NUMBER() OVER "
          "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank "
          "FROM scored")],
        f"SELECT query_id, neighbor_id, cos, CAST(rank AS INTEGER) AS rank "
        f"FROM ranked WHERE rank <= {k}",
    )


# ------------------------------------------ attribute / subset / BFS ops

BIP_VERTS_ATTR = (
    f"SELECT id, CASE WHEN id >= {PART_OFFSET} THEN 'part' ELSE 'order' END "
    f"AS vtype, {prior_expr('id')} AS prior FROM ({BIP_VERTS}) bv"
)


def sql_attr_filter(vtype: str = "part", sign: int = 1) -> str:
    """P1 + P2 in one result: node σ/π rows (kind='node', id_b NULL) and
    edge σ/π rows (kind='edge') unioned."""
    return _with(
        [("bip", BIP), ("va", BIP_VERTS_ATTR)],
        f"SELECT 'node' AS kind, id AS id_a, CAST(NULL AS BIGINT) AS id_b, "
        f"ROUND(prior, 6) AS prior FROM va WHERE vtype = '{vtype}' "
        f"UNION ALL "
        f"SELECT 'edge' AS kind, src AS id_a, dst AS id_b, "
        f"ROUND({review_prior_expr()}, 6) AS prior FROM bip WHERE sign = {sign}",
    )


def sql_attr_index() -> str:
    """P3 both variants: node inverted index (vtype → ids) and edge
    inverted index (sign → src:dst pairs, helper.py:294-312) unioned."""
    return _with(
        [("bip", BIP), ("va", BIP_VERTS_ATTR)],
        "SELECT 'node' AS kind, vtype AS attr, COUNT(*) AS n_ids, "
        "STRING_AGG(CAST(id AS VARCHAR), ',' ORDER BY id) AS ids_csv "
        "FROM va GROUP BY vtype "
        "UNION ALL "
        "SELECT 'edge' AS kind, CAST(sign AS VARCHAR) AS attr, "
        "COUNT(*) AS n_ids, "
        "STRING_AGG(src || ':' || dst, ',' ORDER BY src, dst) AS ids_csv "
        "FROM bip GROUP BY sign",
    )


def sql_sampling_splits(frac: float = 0.25) -> str:
    """random_split (P6) + semi_data sample membership (P5) in one
    per-user frame, Knuth-hash order (unseeded reference sampling
    pinned, SURVEY §7)."""
    return _with(
        [("bip", BIP),
         ("gt",
          "SELECT src AS id, MAX(CASE WHEN sign = 2 THEN 1 ELSE 0 END) AS label "
          "FROM bip GROUP BY src"),
         ("rk",
          f"SELECT id, label, ROW_NUMBER() OVER (PARTITION BY label "
          f"ORDER BY (id * {PRIOR_MULT}) % {PRIOR_MOD}, id) AS rn, "
          f"COUNT(*) OVER (PARTITION BY label) AS n FROM gt")],
        f"SELECT id, label, CAST(rn <= FLOOR(n / 2) AS BOOLEAN) AS is_train, "
        f"CAST(rn <= CEIL(n * {frac}::DOUBLE) AS BOOLEAN) AS in_semi FROM rk",
    )


def sql_subset_above_degree(src_min: int = 3, dst_min: int = 5) -> str:
    return _with(
        [("bip", BIP),
         ("od", f"SELECT src FROM bip GROUP BY src HAVING COUNT(*) > {src_min}"),
         ("idg", f"SELECT dst FROM bip GROUP BY dst HAVING COUNT(*) > {dst_min}")],
        "SELECT b.src, b.dst FROM bip b "
        "JOIN od ON b.src = od.src JOIN idg ON b.dst = idg.dst",
    )


def sql_rank_stats(mod: int = UNI_MOD) -> str:
    """min / median-element / max of the uni in-degree list — the
    reference's sorted-list indexing (ranked[int(n/2)], helper.py:99-107)."""
    return _with(
        [("uni", uni_frag(mod)),
         ("deg", "SELECT dst AS id, COUNT(*) AS d FROM uni GROUP BY dst"),
         ("rk",
          "SELECT d, ROW_NUMBER() OVER (ORDER BY d ASC) - 1 AS rn FROM deg")],
        "SELECT (SELECT MIN(d) FROM deg) AS min_v, "
        "(SELECT d FROM rk WHERE rn = (SELECT CAST(FLOOR(COUNT(*) / 2) AS BIGINT) "
        "FROM deg)) AS med_v, "
        "(SELECT MAX(d) FROM deg) AS max_v",
    )


def sql_bfs_hops(iters: int = 6, mod: int = UNI_MOD) -> str:
    """Unrolled synchronous BFS relaxation from the min-id vertex over the
    symmetrized uni graph (matches operators/bfs.py superstep for
    superstep)."""
    ctes = [
        ("uni", uni_frag(mod)),
        ("und", UND),
        ("sym", SYM),
        ("v", VERTS),
        ("d0", "SELECT MIN(id) AS id, 0 AS dist FROM v"),
    ]
    for t in range(iters):
        ctes.append((
            f"d{t + 1}",
            f"SELECT id, MIN(dist) AS dist FROM ("
            f"SELECT id, dist FROM d{t} UNION ALL "
            f"SELECT e.dst AS id, d.dist + 1 AS dist "
            f"FROM sym e JOIN d{t} d ON e.src = d.id) GROUP BY id",
        ))
    return _with(ctes, f"SELECT id, dist FROM d{iters}")


def sql_sssp_weighted(iters: int = 6, mod: int = UNI_MOD) -> str:
    """Unrolled synchronous Bellman–Ford from the min-id vertex over the
    symmetrized uni graph with deterministic integer weights
    ``1 + (src + dst) % 5`` (symmetric in the endpoints, so both
    directions of an undirected edge carry the same cost — identical
    expression on the Spark side, operators/bfs.py:sssp_weighted)."""
    ctes = [
        ("uni", uni_frag(mod)),
        ("und", UND),
        ("sym", SYM),
        ("symw", "SELECT src, dst, 1 + (src + dst) % 5 AS w FROM sym"),
        ("v", VERTS),
        ("d0", "SELECT MIN(id) AS id, CAST(0 AS BIGINT) AS dist FROM v"),
    ]
    for t in range(iters):
        ctes.append((
            f"d{t + 1}",
            f"SELECT id, MIN(dist) AS dist FROM ("
            f"SELECT id, dist FROM d{t} UNION ALL "
            f"SELECT e.dst AS id, d.dist + e.w AS dist "
            f"FROM symw e JOIN d{t} d ON e.src = d.id) GROUP BY id",
        ))
    return _with(ctes, f"SELECT id, dist FROM d{iters}")


# -------------------------------------------------------------- streaming

def sql_windowed_event_stats(minutes: int = 60) -> str:
    """Tumbling-window per-type stats; Spark's window() on a 60-min width
    is epoch-aligned == date_trunc('hour'). window_start emitted as text
    to keep the cross-engine comparison timezone-proof."""
    assert minutes == 60, "oracle written for hour windows"
    return (
        "SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start, "
        "event_type, COUNT(*) AS n_events, "
        "ROUND(SUM(value), 6) AS sum_value "
        "FROM events GROUP BY 1, 2"
    )


def sql_sliding_event_stats(minutes: int = 60, slide: int = 30) -> str:
    """Mirror of streaming.events.sliding_event_stats: one
    epoch-aligned time_bucket branch per overlapping window (with
    len = 2·slide every event is in exactly two), same ROUND(SUM,6)
    as the tumbling oracle."""
    assert minutes == 2 * slide, "oracle written for len = 2*slide"
    b = f"time_bucket(INTERVAL '{slide} minutes', ts)"
    return _with(
        [("wins",
          f"SELECT CAST({b} AS VARCHAR) AS window_start, event_type, "
          f"value FROM events "
          f"UNION ALL "
          f"SELECT CAST({b} - INTERVAL '{slide} minutes' AS VARCHAR), "
          f"event_type, value FROM events")],
        "SELECT window_start, event_type, "
        "CAST(COUNT(*) AS BIGINT) AS n_events, "
        "ROUND(SUM(value), 6) AS sum_value FROM wins GROUP BY 1, 2",
    )


def sql_windowed_approx_distinct(minutes: int = 60, m: int = 16,
                                 alpha: float = 0.673) -> str:
    """Mirror of streaming.events.windowed_approx_distinct: the same
    md5-string register math as the HyperBall oracles, max-merged per
    tumbling window, same estimator expression — registers and
    estimate reproduce EXACTLY."""
    assert minutes == 60, "oracle written for hour windows"
    lz4 = ("CASE WHEN f = '1' THEN 3 WHEN f IN ('2','3') THEN 2 "
           "WHEN f IN ('4','5','6','7') THEN 1 ELSE 0 END")
    regs = ", ".join(
        f"MAX(CASE WHEN bucket = {j} THEN rho ELSE 0 END) AS c{j}"
        for j in range(m))
    ctes = [
        ("ev",
         "SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS id, "
         "MD5(CAST(user_id AS VARCHAR)) AS h FROM events"),
        ("hb",
         "SELECT id, STRPOS('0123456789abcdef', SUBSTRING(h, 1, 1)) - 1 "
         "AS bucket, CASE WHEN LENGTH(t) = 0 THEN 49 ELSE "
         f"(12 - LENGTH(t)) * 4 + {lz4} + 1 END AS rho FROM ("
         "SELECT id, h, TRIM(LEADING '0' FROM SUBSTRING(h, 2, 12)) AS t, "
         "SUBSTRING(TRIM(LEADING '0' FROM SUBSTRING(h, 2, 12)), 1, 1) AS f "
         "FROM ev)"),
        ("rw",
         f"SELECT id, COUNT(*) AS n_events, {regs} FROM hb GROUP BY id"),
        ("est", _hb_est_sql("rw", m, alpha)),
    ]
    return _with(
        ctes,
        "SELECT r.id AS window_start, r.n_events, "
        "e.ball_est AS approx_users FROM rw r JOIN est e USING (id)",
    )


def sql_purchase_attribution(window_minutes: int = 30) -> str:
    """Mirror of streaming.events.purchase_attribution: inclusive
    interval join, gap in exact integer microseconds."""
    return (
        f"SELECT p.user_id, p.event_id AS purchase_id, "
        f"c.event_id AS click_id, "
        f"date_diff('microsecond', c.ts, p.ts) AS gap_us "
        f"FROM events p JOIN events c ON c.user_id = p.user_id "
        f"AND p.event_type = 'purchase' AND c.event_type = 'click' "
        f"AND c.ts <= p.ts "
        f"AND c.ts >= p.ts - INTERVAL {window_minutes} MINUTE"
    )


def sql_parse_props() -> str:
    return (
        "SELECT event_id, "
        "CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events"
    )


# ------------------------------------------------- detector eval pipelines

_AUC_G = "SELECT score AS s, COUNT(*) AS c, SUM(label) AS pos FROM d GROUP BY score"
_AUC_O = (
    "SELECT s, c, pos, "
    "COALESCE(SUM(c) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING "
    "AND 1 PRECEDING), 0) AS lower_c, "
    "SUM(pos) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING "
    "AND CURRENT ROW) AS ctp, "
    "SUM(c) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING "
    "AND CURRENT ROW) AS cn FROM g"
)
_AUC_FINAL = (
    "SELECT ROUND((SUM(pos * (lower_c + (c + 1) / 2.0::DOUBLE)) "
    "- SUM(pos) * (SUM(pos) + 1) / 2.0::DOUBLE) "
    "/ (SUM(pos) * (SUM(c) - SUM(pos))), 6) AS auc, "
    "ROUND(SUM(pos * ctp / CAST(cn AS DOUBLE)) / SUM(pos), 6) AS ap FROM o"
)


def eval_wrap(score_query: str, id_col: str = "id",
              score_col: str = "belief") -> str:
    """§2.11 pipeline tail: wrap ANY full score query (its own WITH chain
    is legal inside a CTE body) with the user ground truth join and the
    exact AUC/AP rank statistics — the SQL mirror of the reference's
    load → model → score → evaluate entry points."""
    gt = (
        f"SELECT src AS id, MAX(CASE WHEN sign = 2 THEN 1 ELSE 0 END) AS gt "
        f"FROM ({BIP}) bipx GROUP BY src"
    )
    return _with(
        [("scores", score_query),
         ("gtx", gt),
         ("d",
          f"SELECT s.{score_col} AS score, gtx.gt AS label "
          f"FROM scores s JOIN gtx ON gtx.id = s.{id_col}"),
         ("g", _AUC_G),
         ("o", _AUC_O)],
        _AUC_FINAL,
    )


# ----------------------------------------------------- HITS and k-core

def sql_hits(iters: int = 5, mod: int = UNI_MOD) -> str:
    """Unrolled HITS: per iteration authority = Σ hub over in-edges then
    L2-normalize, hub = Σ authority over out-edges then L2-normalize —
    step-for-step the Spark kernel in operators/hits.py."""
    ctes = [
        ("uni", uni_frag(mod)),
        ("v", VERTS),
        ("s0", "SELECT id, CAST(1.0 AS DOUBLE) AS hub, "
               "CAST(1.0 AS DOUBLE) AS auth FROM v"),
    ]
    prev = "s0"
    for t in range(1, iters + 1):
        ctes.append((
            f"ar{t}",
            f"SELECT uni.dst AS id, SUM({prev}.hub) AS a_raw FROM uni "
            f"JOIN {prev} ON {prev}.id = uni.src GROUP BY uni.dst",
        ))
        ctes.append((
            f"sa{t}",
            f"SELECT {prev}.id, {prev}.hub, "
            f"COALESCE(ar{t}.a_raw, CAST(0.0 AS DOUBLE)) "
            f"/ (SELECT SQRT(SUM(a_raw * a_raw)) FROM ar{t}) AS auth "
            f"FROM {prev} LEFT JOIN ar{t} ON ar{t}.id = {prev}.id",
        ))
        ctes.append((
            f"hr{t}",
            f"SELECT uni.src AS id, SUM(sa{t}.auth) AS h_raw FROM uni "
            f"JOIN sa{t} ON sa{t}.id = uni.dst GROUP BY uni.src",
        ))
        ctes.append((
            f"s{t}",
            f"SELECT sa{t}.id, COALESCE(hr{t}.h_raw, CAST(0.0 AS DOUBLE)) "
            f"/ (SELECT SQRT(SUM(h_raw * h_raw)) FROM hr{t}) AS hub, sa{t}.auth "
            f"FROM sa{t} LEFT JOIN hr{t} ON hr{t}.id = sa{t}.id",
        ))
        prev = f"s{t}"
    return _with(
        ctes,
        f"SELECT id, ROUND(hub, 6) AS hub, ROUND(auth, 6) AS authority FROM {prev}",
    )


def sql_random_walks(n_walks: int = 2, length: int = 4, seed: int = 1,
                     mod: int = UNI_MOD) -> str:
    """Mirror of walks.random_walks: ranked out-adjacency, the same
    counter-based integer hash pick per unrolled step. Shares the
    engine's formula (the §32 caveat) — the semantic uniformity /
    structure claims are pinned by walks' own property tests."""
    from .operators.walks import WALK_A, WALK_B, WALK_C, WALK_P

    ctes = [
        ("uni", uni_frag(mod)),
        ("nbr",
         "SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src "
         "ORDER BY dst) - 1 AS idx FROM uni"),
        ("od", "SELECT src, COUNT(*) AS od FROM uni GROUP BY src"),
        ("s0",
         f"SELECT s.src * {n_walks} + w.w AS walk_id, s.src AS cur "
         f"FROM (SELECT DISTINCT src FROM uni) s CROSS JOIN "
         f"(SELECT UNNEST(generate_series(0, {n_walks - 1})) AS w) w"),
    ]
    for t in range(1, length + 1):
        ctes.append((
            f"s{t}",
            f"SELECT s.walk_id, n.dst AS cur FROM s{t-1} s "
            f"JOIN od ON od.src = s.cur "
            f"JOIN nbr n ON n.src = s.cur AND n.idx = "
            f"((((s.cur * {WALK_A} + s.walk_id * {WALK_B} "
            f"+ {t * WALK_C + seed}) % {WALK_P}) * {WALK_A} + {WALK_B}) "
            f"% {WALK_P}) % od.od",
        ))
    unions = " UNION ALL ".join(
        f"SELECT walk_id, {t} AS step, cur AS vertex FROM s{t}"
        for t in range(length + 1))
    return _with(ctes, unions)


def sql_neighbor_sample(f1: int = 3, f2: int = 2, seed: int = 7,
                        mod: int = UNI_MOD) -> str:
    """Mirror of walks.neighbor_sample: ONE row_number per src over the
    full adjacency (the naive form of the engine's salted two-phase
    top-k — identical output), same scrambled hash, same shared
    per-vertex hop-2 sampling joined onto hop 1."""
    from .operators.walks import WALK_A, WALK_B, WALK_C, WALK_P

    def adj(hop: int, f: int) -> str:
        return (
            "SELECT src, dst FROM (SELECT src, dst, ROW_NUMBER() OVER ("
            "PARTITION BY src ORDER BY "
            f"((((src * {WALK_A} + dst * {WALK_B} + {seed + hop * WALK_C})"
            f" % {WALK_P}) * {WALK_A} + {WALK_B}) % {WALK_P}), dst) AS rn "
            f"FROM uni) WHERE rn <= {f}"
        )

    return _with(
        [("uni", uni_frag(mod)), ("a1", adj(1, f1)), ("a2", adj(2, f2))],
        "SELECT src AS root, 1 AS hop, src, dst FROM a1 "
        "UNION ALL "
        "SELECT a1.src AS root, 2 AS hop, a1.dst AS src, a2.dst AS dst "
        "FROM a1 JOIN a2 ON a2.src = a1.dst",
    )


def sql_node2vec_walks(n_walks: int = 2, length: int = 4, seed: int = 1,
                       w_ret: int = 1, w_adj: int = 4, w_out: int = 16,
                       mod: int = UNI_MOD) -> str:
    """Mirror of walks.node2vec_walks: uniform hash pick at step 1,
    then per unrolled step the candidate fan-out with the CASE weight
    (return / directed-adjacent / far), per-walk cumulative-slot
    window, and the same scrambled counter hash mod Σw. Shares the
    engine's formula (§32 caveat) — the bias SEMANTICS are pinned by
    walks' own frequency property test."""
    from .operators.walks import WALK_A, WALK_B, WALK_C, WALK_P

    def h(t: int) -> str:
        return (f"((((cur * {WALK_A} + walk_id * {WALK_B} "
                f"+ {t * WALK_C + seed}) % {WALK_P}) * {WALK_A} "
                f"+ {WALK_B}) % {WALK_P})")

    ctes = [
        ("uni", uni_frag(mod)),
        ("nbr",
         "SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src "
         "ORDER BY dst) - 1 AS idx FROM uni"),
        ("od", "SELECT src, COUNT(*) AS od FROM uni GROUP BY src"),
        ("s0",
         f"SELECT s.src * {n_walks} + w.w AS walk_id, s.src AS cur "
         f"FROM (SELECT DISTINCT src FROM uni) s CROSS JOIN "
         f"(SELECT UNNEST(generate_series(0, {n_walks - 1})) AS w) w"),
        ("s1",
         f"SELECT s.walk_id, s.cur AS prev, n.dst AS cur FROM s0 s "
         f"JOIN od ON od.src = s.cur "
         f"JOIN nbr n ON n.src = s.cur AND n.idx = {h(1)} % od.od"),
    ]
    for t in range(2, length + 1):
        ctes.append((
            f"c{t}",
            f"SELECT s.walk_id, s.cur, n.idx, n.dst AS x,\n"
            f"  CASE WHEN n.dst = s.prev THEN {w_ret}\n"
            f"       WHEN e2.src IS NOT NULL THEN {w_adj}\n"
            f"       ELSE {w_out} END AS wt\n"
            f"FROM s{t-1} s JOIN nbr n ON n.src = s.cur\n"
            f"LEFT JOIN uni e2 ON e2.src = s.prev AND e2.dst = n.dst",
        ))
        ctes.append((
            f"s{t}",
            f"SELECT walk_id, cur AS prev, x AS cur FROM (\n"
            f"  SELECT walk_id, cur, x, wt,\n"
            f"    SUM(wt) OVER (PARTITION BY walk_id ORDER BY idx\n"
            f"      ROWS UNBOUNDED PRECEDING) AS cum,\n"
            f"    {h(t)} % SUM(wt) OVER (PARTITION BY walk_id) AS r\n"
            f"  FROM c{t})\n"
            f"WHERE cum - wt <= r AND r < cum",
        ))
    unions = ["SELECT walk_id, 0 AS step, cur AS vertex FROM s0"]
    unions += [f"SELECT walk_id, {t} AS step, cur AS vertex FROM s{t}"
               for t in range(1, length + 1)]
    return _with(ctes, " UNION ALL ".join(unions))


def sql_negative_samples(k: int = 3, oversample: int = 4, seed: int = 7,
                         mod: int = UNI_MOD) -> str:
    """Mirror of walks.negative_samples: same counter-hash proposals
    mod (max id + 1), vertex semi-join, edge anti-join, first-k-by-j
    window. Shares the formula (§32) — the 'negatives are never true
    edges / deterministic replay' semantics are pinned by the
    operator's own tests."""
    from .operators.walks import WALK_A, WALK_B, WALK_P

    m = k * oversample
    return _with(
        [("uni", uni_frag(mod)),
         ("v", VERTS),
         ("lim", "SELECT MAX(id) + 1 AS lim FROM v"),
         ("props",
          f"SELECT s.src, j.j, lim.lim FROM "
          f"(SELECT DISTINCT src FROM uni) s CROSS JOIN "
          f"(SELECT UNNEST(generate_series(0, {m - 1})) AS j) j "
          f"CROSS JOIN lim"),
         ("cand",
          f"SELECT src, j, (((src * {WALK_A} + j * {WALK_B} + {seed}) "
          f"% {WALK_P}) * {WALK_A} + {WALK_B}) % {WALK_P} % lim AS dst "
          f"FROM props"),
         ("ok",
          "SELECT c.src, c.j, c.dst FROM cand c "
          "JOIN v ON v.id = c.dst "
          "WHERE c.dst <> c.src "
          "AND NOT EXISTS (SELECT 1 FROM uni e "
          "WHERE e.src = c.src AND e.dst = c.dst)")],
        f"SELECT src, dst, neg_rank FROM ("
        f"SELECT src, dst, ROW_NUMBER() OVER "
        f"(PARTITION BY src ORDER BY j) AS neg_rank FROM ok) "
        f"WHERE neg_rank <= {k}",
    )


def sql_betweenness(k: int = 8, depth: int = 5, mod: int = UNI_MOD) -> str:
    """Mirror of betweenness.betweenness: k smallest out-degree>0 ids
    as pivots, forward path-count BFS unrolled ``depth`` rounds
    (sigma exact BIGINT), backward Brandes dependency sweep unrolled
    level-by-level with the identical per-term float shape
    (sigma_v/sigma_w)*(1+delta_w), summed per vertex over non-pv
    rows and rounded once."""
    ctes = [
        ("uni", uni_frag(mod)),
        ("v", VERTS),
        ("piv",
         f"SELECT src AS pv FROM (SELECT DISTINCT src FROM uni "
         f"ORDER BY src LIMIT {k})"),
        ("f0",
         "SELECT pv, pv AS id, 0 AS dist, CAST(1 AS BIGINT) "
         "AS sigma FROM piv"),
        ("vis0", "SELECT * FROM f0"),
    ]
    for t in range(1, depth + 1):
        ctes.append((
            f"f{t}",
            f"SELECT c.pv, c.id, {t} AS dist, c.sigma FROM (\n"
            f"  SELECT f.pv, uni.dst AS id, "
            f"CAST(SUM(f.sigma) AS BIGINT) AS sigma\n"
            f"  FROM uni JOIN f{t-1} f ON f.id = uni.src "
            f"GROUP BY f.pv, uni.dst\n"
            f") c LEFT JOIN vis{t-1} p ON p.pv = c.pv AND p.id = c.id "
            f"WHERE p.id IS NULL",
        ))
        ctes.append((
            f"vis{t}",
            f"SELECT * FROM vis{t-1} UNION ALL SELECT * FROM f{t}",
        ))
    vis = f"vis{depth}"
    ctes.append((
        f"d{depth}",
        f"SELECT pv, id, sigma, CAST(0.0 AS DOUBLE) AS delta "
        f"FROM {vis} WHERE dist = {depth}",
    ))
    for lvl in range(depth - 1, -1, -1):
        ctes.append((
            f"d{lvl}",
            f"SELECT vl.pv, vl.id, vl.sigma, "
            f"COALESCE(m.d, CAST(0.0 AS DOUBLE)) AS delta\n"
            f"FROM (SELECT pv, id, sigma FROM {vis} WHERE dist = {lvl}) vl\n"
            f"LEFT JOIN (\n"
            f"  SELECT vl2.pv, uni.src AS id, "
            f"SUM(vl2.sigma / w.sigma * (CAST(1.0 AS DOUBLE) + w.delta)) AS d\n"
            f"  FROM uni "
            f"JOIN (SELECT pv, id, sigma FROM {vis} WHERE dist = {lvl}) vl2 "
            f"ON vl2.id = uni.src\n"
            f"  JOIN d{lvl+1} w ON w.id = uni.dst AND w.pv = vl2.pv\n"
            f"  GROUP BY vl2.pv, uni.src\n"
            f") m ON m.pv = vl.pv AND m.id = vl.id",
        ))
    unions = " UNION ALL ".join(
        f"SELECT pv, id, delta FROM d{l}" for l in range(depth + 1))
    ctes.append(("acc", unions))
    return _with(
        ctes,
        "SELECT v.id, ROUND(COALESCE(b.bc, CAST(0.0 AS DOUBLE)), 6) AS bc "
        "FROM v LEFT JOIN (SELECT id, SUM(delta) AS bc FROM acc "
        "WHERE id <> pv GROUP BY id) b ON b.id = v.id",
    )


def sql_katz(iters: int = 5, alpha: float = 0.1, beta: float = 1.0,
             mod: int = UNI_MOD) -> str:
    """Unrolled Katz centrality: x_{t+1} = β + α·Σ in-neighbor x_t,
    x_0 ≡ β — mirror of pagerank.katz (no out-degree division)."""
    a = f"CAST({alpha!r} AS DOUBLE)"
    b = f"CAST({beta!r} AS DOUBLE)"
    ctes = [
        ("uni", uni_frag(mod)),
        ("v", VERTS),
        ("x0", f"SELECT id, {b} AS x FROM v"),
    ]
    for t in range(1, iters + 1):
        ctes.append((
            f"x{t}",
            f"SELECT v.id, {b} + {a} * COALESCE(s.mass, CAST(0.0 AS DOUBLE)) "
            f"AS x FROM v LEFT JOIN (\n"
            f"  SELECT uni.dst AS id, SUM(x{t-1}.x) AS mass FROM uni "
            f"JOIN x{t-1} ON x{t-1}.id = uni.src GROUP BY uni.dst\n"
            f") s ON s.id = v.id",
        ))
    return _with(
        ctes, f"SELECT id, ROUND(x, 6) AS katz FROM x{iters}")


def sql_eigenvector(iters: int = 5, mod: int = UNI_MOD) -> str:
    """Unrolled power iteration on Aᵀ with L2 normalization — mirror of
    hits.eigenvector_centrality (norms computed over the raw message
    rows, zero-fill once at the end, like the HITS oracle)."""
    ctes = [
        ("uni", uni_frag(mod)),
        ("v", VERTS),
        ("x0", "SELECT id, CAST(1.0 AS DOUBLE) AS x FROM v"),
    ]
    for t in range(1, iters + 1):
        ctes.append((
            f"m{t}",
            f"SELECT uni.dst AS id, SUM(x{t-1}.x) AS raw FROM uni "
            f"JOIN x{t-1} ON x{t-1}.id = uni.src GROUP BY uni.dst",
        ))
        ctes.append((
            f"x{t}",
            f"SELECT id, raw / (SELECT SQRT(SUM(raw * raw)) FROM m{t}) "
            f"AS x FROM m{t}",
        ))
    return _with(
        ctes,
        f"SELECT v.id, ROUND(COALESCE(x.x, CAST(0.0 AS DOUBLE)), 6) "
        f"AS eigen FROM v LEFT JOIN x{iters} x ON x.id = v.id",
    )


def sql_salsa(iters: int = 5, mod: int = UNI_MOD) -> str:
    """Unrolled SALSA (operators/salsa.py): per iteration the authority
    chain does backward(÷ind) then forward(÷outd) and the hub chain the
    mirror — both stochastic, so there is NO normalization CTE at all
    (L1 mass is preserved by construction). Division sits on the state
    side of each SpMV exactly like the Spark kernel (state/degree is a
    per-vertex value replicated per edge row by the join)."""
    ctes = [
        ("uni", uni_frag(mod)),
        ("v", VERTS),
        ("ind", "SELECT dst AS id, COUNT(*) AS n FROM uni GROUP BY dst"),
        ("outd", "SELECT src AS id, COUNT(*) AS n FROM uni GROUP BY src"),
        ("a0",
         "SELECT id, CAST(1.0 AS DOUBLE) / "
         "(SELECT CAST(COUNT(*) AS DOUBLE) FROM ind) AS x FROM ind"),
        ("h0",
         "SELECT id, CAST(1.0 AS DOUBLE) / "
         "(SELECT CAST(COUNT(*) AS DOUBLE) FROM outd) AS x FROM outd"),
    ]
    for t in range(1, iters + 1):
        ctes.append((
            f"hm{t}",
            f"SELECT uni.src AS id, SUM(a{t-1}.x / ind.n) AS x FROM uni "
            f"JOIN a{t-1} ON a{t-1}.id = uni.dst "
            f"JOIN ind ON ind.id = uni.dst GROUP BY uni.src",
        ))
        ctes.append((
            f"a{t}",
            f"SELECT uni.dst AS id, SUM(hm{t}.x / outd.n) AS x FROM uni "
            f"JOIN hm{t} ON hm{t}.id = uni.src "
            f"JOIN outd ON outd.id = uni.src GROUP BY uni.dst",
        ))
        ctes.append((
            f"am{t}",
            f"SELECT uni.dst AS id, SUM(h{t-1}.x / outd.n) AS x FROM uni "
            f"JOIN h{t-1} ON h{t-1}.id = uni.src "
            f"JOIN outd ON outd.id = uni.src GROUP BY uni.dst",
        ))
        ctes.append((
            f"h{t}",
            f"SELECT uni.src AS id, SUM(am{t}.x / ind.n) AS x FROM uni "
            f"JOIN am{t} ON am{t}.id = uni.dst "
            f"JOIN ind ON ind.id = uni.dst GROUP BY uni.src",
        ))
    return _with(
        ctes,
        f"SELECT v.id, ROUND(COALESCE(h.x, CAST(0.0 AS DOUBLE)), 6) AS hub, "
        f"ROUND(COALESCE(a.x, CAST(0.0 AS DOUBLE)), 6) AS authority "
        f"FROM v LEFT JOIN h{iters} h ON h.id = v.id "
        f"LEFT JOIN a{iters} a ON a.id = v.id",
    )


def sql_kcore(k: int, iters: int = 10, mod: int = UNI_MOD) -> str:
    """Unrolled k-core peeling over the symmetric undirected edges."""
    ctes = [("uni", uni_frag(mod)), ("und", UND), ("e0", SYM)]
    for t in range(1, iters + 1):
        prev = f"e{t-1}"
        ctes.append((
            f"a{t}",
            f"SELECT src FROM {prev} GROUP BY src HAVING COUNT(*) >= {k}",
        ))
        ctes.append((
            f"e{t}",
            f"SELECT e.src, e.dst FROM {prev} e "
            f"JOIN a{t} s ON s.src = e.src "
            f"JOIN a{t} d ON d.src = e.dst",
        ))
    return _with(ctes, f"SELECT DISTINCT src AS id FROM e{iters}")


def sql_coreness(k_max: int = 8, iters: int = 4,
                 mod: int = UNI_MOD) -> str:
    """Mirror of hits.coreness: the monotone peel sweep unrolled as a
    (k_max × iters) CTE grid — level k's rounds start from level
    k−1's surviving edge frame; coreness = MAX level containing the
    vertex (level 1 = the full vertex set)."""
    ctes = [("uni", uni_frag(mod)), ("und", UND), ("l1", SYM)]
    prev_level = "l1"
    members = ["SELECT DISTINCT src AS id, 1 AS c FROM l1"]
    for k in range(2, k_max + 1):
        prev = prev_level
        for t in range(1, iters + 1):
            ctes.append((
                f"a{k}_{t}",
                f"SELECT src FROM {prev} GROUP BY src "
                f"HAVING COUNT(*) >= {k}",
            ))
            ctes.append((
                f"e{k}_{t}",
                f"SELECT e.src, e.dst FROM {prev} e "
                f"JOIN a{k}_{t} s ON s.src = e.src "
                f"JOIN a{k}_{t} d ON d.src = e.dst",
            ))
            prev = f"e{k}_{t}"
        prev_level = prev
        members.append(
            f"SELECT DISTINCT src AS id, {k} AS c FROM {prev_level}")
    union = " UNION ALL ".join(members)
    return _with(
        ctes,
        f"SELECT id, CAST(MAX(c) AS INT) AS coreness FROM ({union}) "
        f"GROUP BY id",
    )


def sql_sessionize(gap_minutes: int = 30) -> str:
    """Gaps-and-islands mirror of F.session_window: a new session starts
    when the previous event of the same user is more than the gap away."""
    return _with(
        [("o",
          # >= because F.session_window is half-open [ts, ts+gap): an event
          # arriving at exactly gap_minutes starts a NEW session in Spark
          f"SELECT user_id, ts, value, event_id, CASE WHEN LAG(ts) OVER "
          f"(PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
          f"OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
          f">= INTERVAL {gap_minutes} MINUTE THEN 1 ELSE 0 END AS new_s "
          f"FROM events"),
         ("s",
          "SELECT user_id, ts, value, SUM(new_s) OVER (PARTITION BY user_id "
          "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM o")],
        "SELECT user_id, CAST(MIN(ts) AS VARCHAR) AS session_start, "
        "COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value "
        "FROM s GROUP BY user_id, sid",
    )


def sql_session_entry_exit(gap_minutes: int = 30) -> str:
    """Mirror of streaming.session_entry_exit: the sql_sessionize
    gaps-and-islands chain, entry/exit via tie-free (ts, event_id)
    row numbers, same exact counts + one division."""
    return _with(
        [("o",
          f"SELECT user_id, ts, event_id, event_type, CASE WHEN LAG(ts) "
          f"OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
          f"OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, "
          f"event_id) >= INTERVAL {gap_minutes} MINUTE THEN 1 ELSE 0 END "
          f"AS new_s FROM events"),
         ("s",
          "SELECT user_id, ts, event_id, event_type, SUM(new_s) OVER "
          "(PARTITION BY user_id ORDER BY ts, event_id "
          "ROWS UNBOUNDED PRECEDING) AS sid FROM o"),
         ("x",
          "SELECT user_id, sid, event_type, "
          "ROW_NUMBER() OVER (PARTITION BY user_id, sid "
          "ORDER BY ts, event_id) AS rn, "
          "ROW_NUMBER() OVER (PARTITION BY user_id, sid "
          "ORDER BY ts DESC, event_id DESC) AS rrn FROM s"),
         ("sess",
          "SELECT user_id, sid, "
          "MAX(CASE WHEN rn = 1 THEN event_type END) AS entry_type, "
          "MAX(CASE WHEN rrn = 1 THEN event_type END) AS exit_type, "
          "COUNT(*) AS n_events FROM x GROUP BY user_id, sid")],
        "SELECT entry_type, exit_type, "
        "CAST(COUNT(*) AS BIGINT) AS n_sessions, "
        "CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_bounce, "
        "CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE) "
        "/ CAST(COUNT(*) AS DOUBLE) AS bounce_rate "
        "FROM sess GROUP BY entry_type, exit_type",
    )


def sql_textrank(k: int = 30, iters: int | None = None,
                 damping: float = 0.85) -> str:
    """Mirror of tfidf.textrank_keywords: identical adjacent-pair word
    graph (canonical least/greatest, self-pairs dropped, symmetrized),
    the sql_host_rank weighted-PageRank chain shape verbatim, ROUND 6
    before the (score desc, word) top-k."""
    if iters is None:
        from .operators.tfidf import TEXTRANK_ITERS
        iters = TEXTRANK_ITERS
    d = f"CAST({damping!r} AS DOUBLE)"
    ctes = [
        ("sp", "SELECT string_split(text, ' ') AS w FROM documents"),
        ("st",
         "SELECT UNNEST(list_transform(range(1, LEN(w)), "
         "i -> LEAST(w[i], w[i + 1]))) AS a, "
         "UNNEST(list_transform(range(1, LEN(w)), "
         "i -> GREATEST(w[i], w[i + 1]))) AS b FROM sp"),
        ("wg",
         "SELECT a, b, CAST(COUNT(*) AS DOUBLE) AS w FROM st "
         "WHERE a <> b GROUP BY 1, 2"),
        ("hg",
         "SELECT a AS sh, b AS dh, w FROM wg "
         "UNION ALL SELECT b, a, w FROM wg"),
        ("v", "SELECT sh AS id FROM hg UNION SELECT dh FROM hg"),
        ("ow", "SELECT sh AS id, SUM(w) AS out_w FROM hg GROUP BY sh"),
        ("nn", "SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v"),
        ("h0", "SELECT v.id, CAST(1.0 AS DOUBLE) / nn.n AS pr FROM v, nn"),
    ]
    for t in range(1, iters + 1):
        prev = f"h{t-1}"
        ctes.append((
            f"h{t}",
            f"SELECT v.id, (CAST(1.0 AS DOUBLE) - {d}) / nn.n "
            f"+ {d} * COALESCE(s.mass, CAST(0.0 AS DOUBLE)) AS pr\n"
            f"FROM v CROSS JOIN nn LEFT JOIN (\n"
            f"  SELECT hg.dh AS id, SUM(({prev}.pr / ow.out_w) * hg.w) "
            f"AS mass FROM hg JOIN {prev} ON {prev}.id = hg.sh "
            f"JOIN ow ON ow.id = hg.sh GROUP BY hg.dh\n"
            f") s ON s.id = v.id",
        ))
    return _with(
        ctes,
        f"SELECT id AS word, ROUND(pr, 6) AS textrank FROM h{iters} "
        f"ORDER BY textrank DESC, word LIMIT {k}",
    )


def sql_funnel_counts(stages: tuple[str, ...] | None = None) -> str:
    """Mirror of funnel.funnel_counts: per-stage min-ts chaining with
    strict ts ordering, counts as BIGINTs, conv as one raw double
    division (NULL when stage 1 is empty)."""
    if stages is None:
        from .operators.funnel import FUNNEL_STAGES
        stages = FUNNEL_STAGES
    ctes = []
    for i, st in enumerate(stages, start=1):
        if i == 1:
            body = (
                f"SELECT user_id, MIN(ts) AS t FROM events "
                f"WHERE event_type = '{st}' GROUP BY 1"
            )
        else:
            body = (
                f"SELECT e.user_id, MIN(e.ts) AS t FROM events e "
                f"JOIN s{i - 1} p ON p.user_id = e.user_id "
                f"WHERE e.event_type = '{st}' AND e.ts > p.t GROUP BY 1"
            )
        ctes.append((f"s{i}", body))
        ctes.append((f"n{i}",
                     f"SELECT CAST(COUNT(*) AS BIGINT) AS c FROM s{i}"))
    selects = [
        f"SELECT {i} AS stage, '{st}' AS event_type, n{i}.c AS n_users, "
        f"CASE WHEN n1.c > 0 THEN CAST(n{i}.c AS DOUBLE) "
        f"/ CAST(n1.c AS DOUBLE) END AS conv "
        + (f"FROM n{i}, n1" if i > 1 else "FROM n1")
        for i, st in enumerate(stages, start=1)
    ]
    return _with(ctes, " UNION ALL ".join(selects))


def sql_retention_cohorts(max_weeks: int = 5) -> str:
    """Mirror of funnel.retention_cohorts: identical to-date / datediff
    / floor(days/7.0) week bucketing, exact BIGINT counts, one raw
    double division for the rate."""
    return _with(
        [("d0", "SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events"),
         ("ud",
          "SELECT DISTINCT user_id, "
          "CAST(FLOOR(CAST(DATE_DIFF('day', d0.d0, CAST(ts AS DATE)) "
          "AS DOUBLE) / 7.0) AS BIGINT) AS week "
          "FROM events CROSS JOIN d0"),
         ("fw",
          "SELECT user_id, MIN(week) AS cohort_week FROM ud GROUP BY 1"),
         ("sz",
          "SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS n_cohort "
          "FROM fw GROUP BY 1"),
         ("ac",
          f"SELECT f.cohort_week, u.week - f.cohort_week AS week_offset, "
          f"CAST(COUNT(*) AS BIGINT) AS n_active "
          f"FROM ud u JOIN fw f USING (user_id) "
          f"WHERE u.week - f.cohort_week < {max_weeks} GROUP BY 1, 2")],
        "SELECT a.cohort_week, a.week_offset, a.n_active, s.n_cohort, "
        "CAST(a.n_active AS DOUBLE) / CAST(s.n_cohort AS DOUBLE) AS rate "
        "FROM ac a JOIN sz s USING (cohort_week)",
    )


def sql_activity_gini() -> str:
    """Mirror of funnel.activity_gini: tie-block Gini over the exact
    (value, count) histogram — all BIGINT (doubled rank sum, no /2),
    one double division (NULL on an empty/zero corpus)."""
    return _with(
        [("uc",
          "SELECT user_id, COUNT(*) AS c FROM events GROUP BY 1"),
         ("h", "SELECT c AS v, COUNT(*) AS cnt FROM uc GROUP BY 1"),
         ("cm",
          "SELECT v, cnt, COALESCE(SUM(cnt) OVER (ORDER BY v "
          "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r "
          "FROM h"),
         ("ag",
          "SELECT CAST(SUM(cnt) AS BIGINT) AS n, "
          "CAST(SUM(v * cnt) AS BIGINT) AS s, "
          "CAST(SUM(v * (2 * cnt * r + cnt * (cnt + 1))) AS BIGINT) "
          "AS sr2 FROM cm")],
        "SELECT n AS n_users, s AS total_events, "
        "CASE WHEN n * s > 0 THEN "
        "CAST(sr2 - (n + 1) * s AS DOUBLE) / CAST(n * s AS DOUBLE) END "
        "AS gini FROM ag",
    )


def sql_chunk_documents(chunk_tokens: int | None = None,
                        overlap: int | None = None) -> str:
    """Mirror of packing.chunk_documents: identical stepped start
    grid, identical slice/join rendering, byte-identical chunk text."""
    from .operators.packing import CHUNK_OVERLAP, CHUNK_TOKENS
    if chunk_tokens is None:
        chunk_tokens = CHUNK_TOKENS
    if overlap is None:
        overlap = CHUNK_OVERLAP
    stride = chunk_tokens - overlap
    return _with(
        [("sp",
          "SELECT doc_id, string_split(text, ' ') AS w FROM documents "
          "WHERE LEN(string_split(text, ' ')) >= 1"),
         ("g",
          f"SELECT doc_id, UNNEST(range(1, LEN(w) + 1, {stride})) AS s, "
          f"w FROM sp")],
        f"SELECT doc_id, CAST((s - 1) // {stride} + 1 AS BIGINT) "
        f"AS chunk_id, "
        f"CAST(LEAST(LEN(w) - s + 1, {chunk_tokens}) AS BIGINT) "
        f"AS n_tokens, "
        f"array_to_string(list_slice(w, s, s + {chunk_tokens} - 1), ' ') "
        f"AS chunk_text FROM g",
    )


def sql_greedy_coloring(rounds: int | None = None,
                        mod: int = UNI_MOD) -> str:
    """Mirror of mis.greedy_coloring: the MIS unroll minus the
    domination step — winners take the round number as their color and
    leave; the unroll depth must cover the longest priority-decreasing
    path (51 observed at sf0.01, COLOR_ROUNDS = 64 for headroom)."""
    from .operators.mis import COLOR_ROUNDS, MIS_A, MIS_B, MIS_C, MIS_P
    if rounds is None:
        rounds = COLOR_ROUNDS
    ctes = [
        ("uni", uni_frag(mod)), ("und", UND),
        ("sym", "SELECT a AS v, b AS u FROM und "
                "UNION ALL SELECT b AS v, a AS u FROM und"),
        ("act0",
         f"SELECT v, ((v * {MIS_A} + {MIS_C + 1}) % {MIS_P} * {MIS_A} "
         f"+ {MIS_B}) % {MIS_P} AS h FROM (SELECT DISTINCT v FROM sym)"),
    ]
    for r in range(1, rounds + 1):
        p = f"act{r - 1}"
        ctes += [
            (f"nb{r}",
             f"SELECT s.v, SUM(CASE WHEN au.h < av.h OR "
             f"(au.h = av.h AND s.u < s.v) THEN 1 ELSE 0 END) AS nb "
             f"FROM sym s JOIN {p} av ON s.v = av.v "
             f"JOIN {p} au ON s.u = au.v GROUP BY s.v"),
            (f"sel{r}",
             f"SELECT a.v FROM {p} a LEFT JOIN nb{r} n ON a.v = n.v "
             f"WHERE COALESCE(n.nb, 0) = 0"),
            (f"act{r}",
             f"SELECT v, h FROM {p} "
             f"WHERE v NOT IN (SELECT v FROM sel{r})"),
        ]
    final = " UNION ALL ".join(
        f"SELECT v AS vertex, {r} AS color FROM sel{r}"
        for r in range(1, rounds + 1)
    )
    return _with(ctes, final)


def sql_graph_summary(mod: int = UNI_MOD) -> str:
    """Mirror of triangles.graph_summary: exact BIGINT wedge/triangle
    totals, one raw-double division per ratio (3T/W and 2E/n are exact
    doubles times/over exact integers — engine-identical)."""
    return _with(
        [("uni", uni_frag(mod)), ("und", UND),
         ("deg",
          "SELECT id, COUNT(*) AS d FROM (SELECT a AS id FROM und "
          "UNION ALL SELECT b FROM und) GROUP BY id"),
         ("base",
          "SELECT COUNT(*) AS n_vertices, "
          "CAST(SUM(d * (d - 1)) / 2 AS BIGINT) AS n_wedges FROM deg"),
         ("ne", "SELECT COUNT(*) AS n_edges FROM und"),
         ("tri",
          "SELECT COUNT(*) AS n_triangles FROM und e1 "
          "JOIN und e2 ON e2.a = e1.b "
          "JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b")],
        "SELECT n_vertices, n_edges, n_wedges, n_triangles, "
        "3::DOUBLE * n_triangles / n_wedges AS transitivity, "
        "2::DOUBLE * n_edges / n_vertices AS avg_degree "
        "FROM base, ne, tri",
    )


def sql_greedy_matching(rounds: int | None = None, seed: int = 1,
                        mod: int = UNI_MOD) -> str:
    """Mirror of mis.greedy_matching: same hashed edge priority,
    per-endpoint ROW_NUMBER argmins, handshake intersection, endpoint
    retirement — unrolled; rounds past the empty-set fixpoint are
    no-ops."""
    from .operators.mis import MATCH_ROUNDS, MIS_A, MIS_B, MIS_C, MIS_P
    if rounds is None:
        rounds = MATCH_ROUNDS
    pr = (f"(((a * 131 + b) * {MIS_A} + {MIS_C + seed}) % {MIS_P} "
          f"* {MIS_A} + {MIS_B}) % {MIS_P}")
    ctes = [
        ("uni", uni_frag(mod)), ("und", UND),
        ("e0", f"SELECT a, b, {pr} AS h FROM und"),
    ]
    outs = []
    for r in range(1, rounds + 1):
        prev = f"e{r-1}"
        ctes.append((
            f"w{r}",
            f"SELECT a, b FROM ("
            f"SELECT a, b, ROW_NUMBER() OVER (PARTITION BY v "
            f"ORDER BY h, a, b) AS rn FROM ("
            f"SELECT a AS v, a, b, h FROM {prev} "
            f"UNION ALL SELECT b AS v, a, b, h FROM {prev})"
            f") WHERE rn = 1 GROUP BY a, b HAVING COUNT(*) = 2",
        ))
        ctes.append((
            f"e{r}",
            f"SELECT e.a, e.b, e.h FROM {prev} e WHERE e.a NOT IN ("
            f"SELECT a FROM w{r} UNION SELECT b FROM w{r}) "
            f"AND e.b NOT IN ("
            f"SELECT a FROM w{r} UNION SELECT b FROM w{r})",
        ))
        outs.append(
            f"SELECT a, b, CAST({r} AS INT) AS match_round FROM w{r}")
    return _with(ctes, " UNION ALL ".join(outs))


def sql_scan_classify(eps: float | None = None, mu: int | None = None,
                      mod: int = UNI_MOD) -> str:
    """Mirror of scan.scan_classify: per-edge triangle support from
    the same enumeration, 6dp σ, ε-core recursive-CTE components
    (min reachable id, isolated cores self-labeled), role CASE."""
    from .operators.scan import SCAN_EPS, SCAN_MU
    eps = SCAN_EPS if eps is None else eps
    mu = SCAN_MU if mu is None else mu
    tri = (
        "SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM und e1 "
        "JOIN und e2 ON e2.a = e1.b "
        "JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b"
    )
    ctes = [
        ("uni", uni_frag(mod)), ("und", UND), ("tri", tri),
        ("te",
         "SELECT a, b, COUNT(*) AS t FROM ("
         "SELECT x AS a, y AS b FROM tri "
         "UNION ALL SELECT x, z FROM tri "
         "UNION ALL SELECT y, z FROM tri) GROUP BY a, b"),
        ("deg",
         "SELECT id, COUNT(*) AS d FROM ("
         "SELECT a AS id FROM und UNION ALL SELECT b FROM und"
         ") GROUP BY id"),
        ("sig",
         "SELECT und.a, und.b, ROUND(CAST(COALESCE(te.t, 0) + 2 "
         "AS DOUBLE) / SQRT(CAST((da.d + 1) * (db.d + 1) AS DOUBLE)), 6) "
         "AS sigma FROM und LEFT JOIN te USING (a, b) "
         "JOIN deg da ON da.id = und.a JOIN deg db ON db.id = und.b"),
        ("epse",
         f"SELECT a, b FROM sig WHERE sigma >= {_d(eps)}"),
        ("neps",
         "SELECT id, COUNT(*) AS n_eps FROM ("
         "SELECT a AS id FROM epse UNION ALL SELECT b FROM epse"
         ") GROUP BY id"),
        ("verts",
         "SELECT deg.id, COALESCE(neps.n_eps, 0) AS n_eps "
         "FROM deg LEFT JOIN neps ON neps.id = deg.id"),
        ("cores", f"SELECT id FROM verts WHERE n_eps >= {mu}"),
        ("cce",
         "SELECT a, b FROM epse WHERE a IN (SELECT id FROM cores) "
         "AND b IN (SELECT id FROM cores)"),
        ("cc_sym",
         "SELECT a AS u, b AS v FROM cce "
         "UNION ALL SELECT b AS u, a AS v FROM cce"),
    ]
    body = ",\n".join(f"{n} AS MATERIALIZED (\n{s}\n)" for n, s in ctes)
    return (
        "WITH RECURSIVE " + body + ",\n"
        "reach(u, v) AS (\n"
        "  SELECT u, v FROM cc_sym\n"
        "  UNION\n"
        "  SELECT r.u, cc_sym.v FROM reach r JOIN cc_sym ON cc_sym.u = r.v\n"
        "),\n"
        "comp AS (SELECT u AS id, LEAST(u, MIN(v)) AS component "
        "FROM reach GROUP BY u),\n"
        "core_cluster AS (SELECT c.id, COALESCE(comp.component, c.id) "
        "AS cluster FROM cores c LEFT JOIN comp ON comp.id = c.id),\n"
        "att AS (SELECT t.id, COUNT(DISTINCT t.cluster) AS n_cl, "
        "MIN(t.cluster) AS min_cl FROM (\n"
        "  SELECT e.a AS id, k.cluster FROM epse e "
        "JOIN core_cluster k ON k.id = e.b\n"
        "  UNION ALL SELECT e.b AS id, k.cluster FROM epse e "
        "JOIN core_cluster k ON k.id = e.a\n"
        ") t WHERE t.id NOT IN (SELECT id FROM cores) GROUP BY t.id)\n"
        "SELECT v.id, CAST(v.n_eps AS BIGINT) AS n_eps, "
        "CASE WHEN k.cluster IS NOT NULL THEN 'core' "
        "WHEN COALESCE(att.n_cl, 0) = 0 THEN 'outlier' "
        "WHEN att.n_cl = 1 THEN 'border' ELSE 'hub' END AS role, "
        "CAST(CASE WHEN k.cluster IS NOT NULL THEN k.cluster "
        "WHEN COALESCE(att.n_cl, 0) = 1 THEN att.min_cl "
        "ELSE -1 END AS BIGINT) AS cluster "
        "FROM verts v LEFT JOIN core_cluster k ON k.id = v.id "
        "LEFT JOIN att ON att.id = v.id"
    )


def sql_mis(rounds: int | None = None, mod: int = UNI_MOD) -> str:
    """Mirror of mis.maximal_independent_set: unrolled greedy-by-hash
    rounds (select local priority minima among actives, remove winners
    + neighbors). Extra rounds past the fixpoint select nothing, so a
    fixed unroll matches the engine's early exit."""
    from .operators.mis import MIS_A, MIS_B, MIS_C, MIS_P, MIS_ROUNDS
    if rounds is None:
        rounds = MIS_ROUNDS
    ctes = [
        ("uni", uni_frag(mod)), ("und", UND),
        ("sym", "SELECT a AS v, b AS u FROM und "
                "UNION ALL SELECT b AS v, a AS u FROM und"),
        ("act0",
         f"SELECT v, ((v * {MIS_A} + {MIS_C + 1}) % {MIS_P} * {MIS_A} "
         f"+ {MIS_B}) % {MIS_P} AS h FROM (SELECT DISTINCT v FROM sym)"),
    ]
    for r in range(1, rounds + 1):
        p = f"act{r - 1}"
        ctes += [
            (f"e{r}",
             f"SELECT s.v, s.u, av.h AS h_v, au.h AS h_u FROM sym s "
             f"JOIN {p} av ON s.v = av.v JOIN {p} au ON s.u = au.v"),
            (f"nb{r}",
             f"SELECT v, SUM(CASE WHEN h_u < h_v OR (h_u = h_v AND u < v) "
             f"THEN 1 ELSE 0 END) AS nb FROM e{r} GROUP BY v"),
            (f"sel{r}",
             f"SELECT a.v FROM {p} a LEFT JOIN nb{r} n ON a.v = n.v "
             f"WHERE COALESCE(n.nb, 0) = 0"),
            (f"dom{r}",
             f"SELECT DISTINCT e.v FROM e{r} e JOIN sel{r} s ON e.u = s.v"),
            (f"act{r}",
             f"SELECT v, h FROM {p} WHERE v NOT IN (SELECT v FROM sel{r}) "
             f"AND v NOT IN (SELECT v FROM dom{r})"),
        ]
    final = " UNION ALL ".join(
        f"SELECT v AS vertex, {r} AS mis_round FROM sel{r}"
        for r in range(1, rounds + 1)
    )
    return _with(ctes, final)


def sql_kleinberg_bursts(s: float = 2.0, gamma: float = 1.0,
                         t_max: int = 40) -> str:
    """Mirror of funnel.kleinberg_bursts: dense global day grid,
    6dp-rounded emission/transition costs frozen into DECIMAL(28,6),
    the identical forward recurrence (ties prefer base state) unrolled
    ``t_max`` steps with pass-through beyond the actual range, then
    the decision-table backtrack. All comparisons are exact decimal
    arithmetic, so the decoded path equals the engine's bit for bit."""
    ctes = [
        ("d0",
         "SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n "
         "FROM events GROUP BY 1, 2"),
        ("rng",
         "SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM d0"),
        ("days",
         "SELECT CAST(unnest(generate_series(0, "
         "CAST(dmax - dmin AS INTEGER))) AS INTEGER) AS idx, dmin "
         "FROM rng"),
        ("types", "SELECT DISTINCT event_type FROM d0"),
        ("grid",
         "SELECT t.event_type, d.idx, d.dmin + d.idx AS day, "
         "COALESCE(d0.n, 0) AS n FROM types t CROSS JOIN days d "
         "LEFT JOIN d0 ON d0.event_type = t.event_type "
         "AND d0.day = d.dmin + d.idx"),
        ("tstat",
         "SELECT event_type, SUM(n) AS s1, COUNT(*) AS tt "
         "FROM grid GROUP BY event_type"),
        ("lam",
         f"SELECT event_type, CAST(s1 AS DOUBLE) / tt AS l0, "
         f"{_d(s)} * (CAST(s1 AS DOUBLE) / tt) AS l1, "
         f"CAST(ROUND({_d(gamma)} * LN(CAST(tt AS DOUBLE)), 6) "
         f"AS DECIMAL(28,6)) AS g FROM tstat"),
        ("em",
         "SELECT g.event_type, g.idx, g.day, g.n, "
         "CAST(ROUND(l.l0 - g.n * LN(l.l0), 6) AS DECIMAL(28,6)) AS e0, "
         "CAST(ROUND(l.l1 - g.n * LN(l.l1), 6) AS DECIMAL(28,6)) AS e1, "
         "l.g FROM grid g JOIN lam l USING (event_type)"),
        ("s0",
         "SELECT event_type, e0 AS c0, e1 + g AS c1, g "
         "FROM em WHERE idx = 0"),
    ]
    for t in range(1, t_max):
        ctes.append((
            f"dec{t}",
            f"SELECT p.event_type, "
            f"CASE WHEN p.c0 <= p.c1 THEN 0 ELSE 1 END AS p0, "
            f"CASE WHEN p.c0 + p.g <= p.c1 THEN 0 ELSE 1 END AS p1, "
            f"CASE WHEN e.idx IS NULL THEN 0 ELSE 1 END AS ex "
            f"FROM s{t-1} p LEFT JOIN "
            f"(SELECT * FROM em WHERE idx = {t}) e USING (event_type)",
        ))
        ctes.append((
            f"s{t}",
            f"SELECT p.event_type, "
            f"CASE WHEN e.idx IS NULL THEN p.c0 "
            f"ELSE e.e0 + LEAST(p.c0, p.c1) END AS c0, "
            f"CASE WHEN e.idx IS NULL THEN p.c1 "
            f"ELSE e.e1 + LEAST(p.c0 + p.g, p.c1) END AS c1, p.g "
            f"FROM s{t-1} p LEFT JOIN "
            f"(SELECT * FROM em WHERE idx = {t}) e USING (event_type)",
        ))
    ctes.append((
        f"st{t_max-1}",
        f"SELECT event_type, CASE WHEN c0 <= c1 THEN 0 ELSE 1 END AS st "
        f"FROM s{t_max-1}",
    ))
    for t in range(t_max - 1, 0, -1):
        ctes.append((
            f"st{t-1}",
            f"SELECT b.event_type, CASE WHEN d.ex = 0 THEN b.st "
            f"ELSE (CASE WHEN b.st = 0 THEN d.p0 ELSE d.p1 END) END AS st "
            f"FROM st{t} b JOIN dec{t} d USING (event_type)",
        ))
    outs = " UNION ALL ".join(
        f"SELECT e.event_type, e.day, CAST(e.n AS BIGINT) AS n_events, "
        f"CAST(s.st AS BIGINT) AS state FROM "
        f"(SELECT * FROM em WHERE idx = {t}) e "
        f"JOIN st{t} s USING (event_type)"
        for t in range(t_max)
    )
    return _with(ctes, outs)


def sql_event_rate_anomaly(z_threshold: float = 2.0) -> str:
    """Mirror of funnel.event_rate_anomaly: identical integer-sum
    rewrite, one sqrt + one division (DuckDB SUM(BIGINT) is HUGEINT —
    exact, and the final CASTs land on the same doubles)."""
    return _with(
        [("b",
          "SELECT event_type, date_trunc('hour', ts) AS window_start, "
          "COUNT(*) AS n_events FROM events GROUP BY 1, 2"),
         ("s",
          "SELECT event_type, COUNT(*) AS n_b, SUM(n_events) AS s1, "
          "SUM(n_events * n_events) AS s2 FROM b GROUP BY 1")],
        "SELECT b.event_type, b.window_start, b.n_events, "
        "CAST(s.n_b * b.n_events - s.s1 AS DOUBLE) "
        "/ sqrt(CAST(s.n_b * s.s2 - s.s1 * s.s1 AS DOUBLE)) AS z, "
        "abs(CAST(s.n_b * b.n_events - s.s1 AS DOUBLE) "
        "/ sqrt(CAST(s.n_b * s.s2 - s.s1 * s.s1 AS DOUBLE))) "
        f">= {z_threshold}::DOUBLE AS is_anomaly "
        "FROM b JOIN s USING (event_type) "
        "WHERE s.n_b * s.s2 - s.s1 * s.s1 > 0",
    )


def sql_crawl_delta() -> str:
    """Mirror of crawl.crawl_delta_demo: same deterministic two-epoch
    construction, one FULL OUTER JOIN, same CASE ladder. DuckDB's
    md5(VARCHAR) digests the UTF-8 bytes — exactly Spark's
    md5(text CAST AS binary)."""
    return _with(
        [("snap_old",
          "SELECT doc_id, md5(text) AS fp FROM documents "
          "WHERE doc_id % 7 <> 0"),
         ("snap_new",
          "SELECT doc_id, md5(CASE WHEN doc_id % 5 = 0 "
          "THEN text || '#v2' ELSE text END) AS fp "
          "FROM documents WHERE doc_id % 11 <> 3")],
        "SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, "
        "CASE WHEN o.fp IS NULL THEN 'added' "
        "WHEN n.fp IS NULL THEN 'removed' "
        "WHEN o.fp = n.fp THEN 'unchanged' "
        "ELSE 'changed' END AS status "
        "FROM snap_old o FULL OUTER JOIN snap_new n "
        "ON o.doc_id = n.doc_id",
    )


def sql_importance_sample(k_expected: float = 2000.0, seed: int = 5,
                          iters: int = 5, mod: int = UNI_MOD) -> str:
    """Mirror of mix.importance_sample over sql_pagerank's 6dp ranks:
    identical integer hash, identical double product k·pr·P, exact
    compare — the rank chain nests as a materialized CTE."""
    from .operators.mix import SAMPLE_A, SAMPLE_B, SAMPLE_P

    return _with(
        [("prq", sql_pagerank(iters, mod=mod))],
        "SELECT id, pagerank FROM prq WHERE "
        f"CAST((((id * {SAMPLE_A} + {seed}) % {SAMPLE_P}) * {SAMPLE_A} "
        f"+ {SAMPLE_B}) % {SAMPLE_P} AS DOUBLE) < "
        f"CAST({k_expected!r} AS DOUBLE) * pagerank "
        f"* CAST({SAMPLE_P} AS DOUBLE)",
    )


def sql_host_churn(n_hosts: int = 37) -> str:
    """Mirror of crawl.host_churn over sql_crawl_delta: exact
    conditional BIGINT sums per host fold, one double division."""
    return _with(
        [("cd", sql_crawl_delta())],
        "SELECT doc_id % "
        f"{n_hosts} AS host_id, "
        "CAST(SUM(CASE WHEN status = 'added' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_added, "
        "CAST(SUM(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_removed, "
        "CAST(SUM(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_changed, "
        "CAST(SUM(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_unchanged, "
        "CAST(SUM(CASE WHEN status <> 'unchanged' THEN 1 ELSE 0 END) "
        "AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS churn "
        "FROM cd GROUP BY doc_id % "
        f"{n_hosts}",
    )


def sql_langid_agreement() -> str:
    """Mirror of quality.langid_agreement: the text_features lang CASE
    rendered identically, grouped by the label."""
    scores = {
        lang: " + ".join(_tx.sql_word_occurrences("text", m) for m in markers)
        for lang, markers in _tx.LANG_MARKERS.items()
    }
    mx = "GREATEST(" + ", ".join(f"({s})" for s in scores.values()) + ")"
    case = " ".join(
        f"WHEN ({scores[lang]}) = mx THEN '{lang}'" for lang in sorted(scores)
    )
    return _with(
        [("p",
          f"SELECT lang, CASE {case} END AS pred_lang FROM "
          f"(SELECT lang, text, {mx} AS mx FROM documents)")],
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_agree, "
        "CAST(SUM(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS DOUBLE) "
        "/ CAST(COUNT(*) AS DOUBLE) AS rate "
        "FROM p GROUP BY lang",
    )


def sql_host_lang_entropy(n_hosts: int = 37) -> str:
    """Mirror of quotient.host_lang_entropy: same conditional counts,
    same fixed-order five-term entropy expression."""
    from .operators.quotient import ENTROPY_LANGS

    counts = ", ".join(
        f"CAST(SUM(CASE WHEN lang = '{lang}' THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS c_{lang}"
        for lang in ENTROPY_LANGS
    )
    terms = " + ".join(
        f"(CASE WHEN c_{lang} > 0 THEN (CAST(c_{lang} AS DOUBLE) "
        f"/ CAST(n_docs AS DOUBLE)) * LN(CAST(c_{lang} AS DOUBLE) "
        f"/ CAST(n_docs AS DOUBLE)) ELSE 0.0 END)"
        for lang in ENTROPY_LANGS
    )
    return _with(
        [("g",
          f"SELECT doc_id % {n_hosts} AS host_id, "
          f"CAST(COUNT(*) AS BIGINT) AS n_docs, {counts} "
          f"FROM documents GROUP BY doc_id % {n_hosts}")],
        f"SELECT host_id, n_docs, ROUND(-({terms}), 6) AS entropy FROM g",
    )


def sql_vocab_drift(min_count: int = 5) -> str:
    """Mirror of crawl.vocab_drift_demo: same epochs over raw text,
    exact counts, one LN of the identical left-associated double
    ratio, ROUND 6."""
    def counts(name: str, where: str) -> str:
        return (
            "SELECT t, COUNT(*) AS c FROM (SELECT UNNEST("
            "string_split(text, ' ')) AS t FROM documents "
            f"WHERE {where}) WHERE t <> '' GROUP BY t"
        )

    return _with(
        [("po", counts("c_old", "doc_id % 7 <> 0")),
         ("pn", counts("c_new", "doc_id % 11 <> 3")),
         ("tot_o",
          "SELECT CAST(SUM(c) AS BIGINT) AS n_old FROM po"),
         ("tot_n",
          "SELECT CAST(SUM(c) AS BIGINT) AS n_new FROM pn")],
        "SELECT po.t AS term, po.c AS c_old, pn.c AS c_new, "
        "ROUND(LN((CAST(pn.c AS DOUBLE) * tot_o.n_old) "
        "/ (CAST(po.c AS DOUBLE) * tot_n.n_new)), 6) AS log_ratio "
        "FROM po JOIN pn ON pn.t = po.t, tot_o, tot_n "
        f"WHERE po.c >= {min_count} AND pn.c >= {min_count}",
    )


def sql_skipgram_pairs(window: int = 3, min_count: int = 5) -> str:
    """Mirror of lmscore.skipgram_pairs via the naive position
    self-join: non-empty tokens at raw whitespace offsets, pairs at
    offset distance 1..window — the quadratic form of the engine's
    zero-shuffle array expressions."""
    return _with(
        [("sp",
          "SELECT doc_id, string_split(text, ' ') AS w FROM documents"),
         ("g",
          "SELECT doc_id, UNNEST(range(1, LEN(w) + 1)) AS i, w FROM sp"),
         ("tok",
          "SELECT doc_id, i, w[i] AS word FROM g WHERE w[i] <> ''")],
        "SELECT a.word AS w1, b.word AS w2, COUNT(*) AS n "
        "FROM tok a JOIN tok b ON b.doc_id = a.doc_id "
        f"AND b.i - a.i BETWEEN 1 AND {window} "
        f"GROUP BY a.word, b.word HAVING COUNT(*) >= {min_count}",
    )


def sql_decayed_activity(half_life_hours: int = 1,
                         horizon: int = 40) -> str:
    """Mirror of funnel.decayed_activity: same integer age bucketing
    (// on nonnegative ms deltas == Spark's div), exact BIGINT weight
    sum, one double division by 2^horizon."""
    ms = 3_600_000 * half_life_hours
    unit = float(2 ** horizon)
    return _with(
        [("ref", "SELECT MAX(epoch_ms(ts)) AS ref_ms FROM events"),
         ("a",
          f"SELECT user_id, (ref.ref_ms - epoch_ms(ts)) // {ms} AS age "
          "FROM events, ref"),
         ("w",
          f"SELECT user_id, CASE WHEN age <= {horizon} THEN "
          f"CAST(power(2, {horizon} - age) AS BIGINT) ELSE 0 END AS wm "
          "FROM a")],
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
        "CAST(SUM(wm) AS BIGINT) AS score_micro, "
        f"CAST(SUM(wm) AS DOUBLE) / {unit!r} AS score "
        "FROM w GROUP BY user_id",
    )


def sql_robots_admission() -> str:
    """Mirror of robots.robots_admission_demo: same URL synthesis,
    same pure-function rule table, arg_max on prefix length (lengths
    distinct per host, so longest-match is tie-free in both engines)."""
    return _with(
        [("urls",
          "SELECT doc_id, doc_id % 37 AS host_id, "
          "'/' || source || '/' || lang || '/' || CAST(doc_id AS VARCHAR) "
          "AS path FROM documents"),
         ("hosts", "SELECT DISTINCT host_id FROM urls"),
         ("rules",
          "SELECT host_id, '/' AS prefix, TRUE AS allow FROM hosts "
          "UNION ALL SELECT host_id, '/src1', FALSE FROM hosts "
          "WHERE host_id % 3 = 0 "
          "UNION ALL SELECT host_id, '/src12', TRUE FROM hosts "
          "WHERE host_id % 3 = 0 "
          "UNION ALL SELECT host_id, '/src', FALSE FROM hosts "
          "WHERE host_id % 4 = 1 "
          "UNION ALL SELECT host_id, '/src7/en', TRUE FROM hosts "
          "WHERE host_id % 4 = 1"),
         ("m",
          "SELECT u.doc_id, u.host_id, r.prefix, r.allow "
          "FROM urls u JOIN rules r ON r.host_id = u.host_id "
          "AND starts_with(u.path, r.prefix)")],
        "SELECT doc_id, host_id, arg_max(allow, length(prefix)) AS allowed, "
        "arg_max(prefix, length(prefix)) AS rule_prefix "
        "FROM m GROUP BY doc_id, host_id",
    )


def sql_inverted_index() -> str:
    """Mirror of tfidf.inverted_index: positions are 1-based offsets
    into the raw whitespace split (empty slots keep their index),
    string_agg ORDER BY pos matches Spark's sort_array+concat_ws."""
    return _with(
        [("sp",
          "SELECT doc_id, string_split(text, ' ') AS w FROM documents"),
         ("g",
          "SELECT doc_id, UNNEST(range(1, LEN(w) + 1)) AS pos, w FROM sp"),
         ("tok",
          "SELECT doc_id, w[pos] AS term, pos FROM g WHERE w[pos] <> ''"),
         ("post",
          "SELECT term, doc_id, COUNT(*) AS tf, "
          "string_agg(CAST(pos AS VARCHAR), ',' ORDER BY pos) AS positions "
          "FROM tok GROUP BY term, doc_id"),
         ("df",
          "SELECT term, COUNT(*) AS doc_freq FROM post GROUP BY term")],
        "SELECT p.term, p.doc_id, p.tf, d.doc_freq, p.positions "
        "FROM post p JOIN df d USING (term)",
    )


def sql_corpus_keep_decision() -> str:
    """Mirror of funnel.corpus_keep_decision: the quality / exact-dup /
    contamination oracles nest as materialized CTE subqueries (the
    source_reputation pattern) and the first-failing-stage CASE is
    rendered in the identical order."""
    from .operators.dedup import CONTAM_BENCH_MOD

    return _with(
        [("qf", sql_quality_filter()),
         ("de", sql_dedup_exact()),
         ("ct", sql_contamination()),
         ("kp", "SELECT DISTINCT keep_id FROM de"),
         ("pd",
          "SELECT d.doc_id, d.lang, q.n_tokens, "
          "CASE WHEN NOT q.keep THEN 'quality' "
          "WHEN k.keep_id IS NULL THEN 'duplicate' "
          f"WHEN d.doc_id % {CONTAM_BENCH_MOD} = 0 THEN 'benchmark' "
          "WHEN COALESCE(c.contaminated, FALSE) THEN 'contaminated' "
          "ELSE '' END AS drop_reason "
          "FROM documents d JOIN qf q USING (doc_id) "
          "LEFT JOIN kp k ON k.keep_id = d.doc_id "
          "LEFT JOIN ct c ON c.doc_id = d.doc_id")],
        "SELECT doc_id, lang, n_tokens, drop_reason = '' AS keep_doc, "
        "drop_reason FROM pd",
    )


def sql_event_transitions() -> str:
    """Mirror of funnel.event_transitions: identical (ts, event_id)
    in-user ordering, exact BIGINT counts, one raw double division."""
    return _with(
        [("sq",
          "SELECT user_id, event_type AS from_type, "
          "LEAD(event_type) OVER (PARTITION BY user_id "
          "ORDER BY ts, event_id) AS to_type FROM events"),
         ("c",
          "SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n "
          "FROM sq WHERE to_type IS NOT NULL GROUP BY 1, 2"),
         ("t",
          "SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot "
          "FROM c GROUP BY 1")],
        "SELECT c.from_type, c.to_type, c.n, "
        "CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS prob "
        "FROM c JOIN t USING (from_type)",
    )


def sql_source_lm_profile() -> str:
    """Mirror of lmscore.source_lm_profile: the lm chain nested, exact
    DECIMAL(28,6) sum of the 6dp per-doc scores, one division + one
    round."""
    return _with(
        [("lm", sql_lm_doc_scores())],
        "SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "ROUND(CAST(SUM(CAST(lm.avg_logprob AS DECIMAL(28,6))) AS DOUBLE)"
        " / CAST(COUNT(*) AS DOUBLE), 6) AS mean_logprob "
        "FROM lm JOIN documents d USING (doc_id) GROUP BY d.source",
    )


def sql_retrieval_tau(query_terms: list[str], k: int = 20) -> str:
    """Mirror of lmscore.retrieval_tau over the BM25 and raw-TF lists:
    same ROW_NUMBER ranks, the C(k,2) pair self-join, integer
    concordance counts, one division."""
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return _with(
        [("bm", sql_bm25_retrieval(query_terms, k)),
         ("ra",
          "SELECT doc_id, ROW_NUMBER() OVER "
          "(ORDER BY score DESC, doc_id) AS r_a FROM bm"),
         ("tfh",
          "SELECT doc_id, COUNT(*) AS n_hits FROM (SELECT doc_id, "
          "UNNEST(string_split(text, ' ')) AS t FROM documents) "
          f"WHERE t IN ({terms}) GROUP BY doc_id "
          f"ORDER BY n_hits DESC, doc_id LIMIT {k}"),
         ("rb",
          "SELECT doc_id, ROW_NUMBER() OVER "
          "(ORDER BY n_hits DESC, doc_id) AS r_b FROM tfh"),
         ("j",
          "SELECT ra.doc_id, ra.r_a, rb.r_b FROM ra "
          "JOIN rb USING (doc_id)"),
         ("p",
          "SELECT CASE WHEN (l.r_a < r.r_a) = (l.r_b < r.r_b) "
          "THEN 1 ELSE 0 END AS conc "
          "FROM j l JOIN j r ON l.doc_id < r.doc_id"),
         ("pa",
          "SELECT CAST(COALESCE(SUM(conc), 0) AS BIGINT) AS concordant, "
          "CAST(COALESCE(SUM(1 - conc), 0) AS BIGINT) AS discordant "
          "FROM p"),
         ("nn", "SELECT CAST(COUNT(*) AS BIGINT) AS n_common FROM j")],
        "SELECT nn.n_common, pa.concordant, pa.discordant, "
        "CASE WHEN nn.n_common >= 2 THEN "
        "CAST(pa.concordant - pa.discordant AS DOUBLE) "
        "/ CAST((nn.n_common * (nn.n_common - 1)) // 2 AS DOUBLE) "
        "END AS tau FROM pa, nn",
    )


def sql_rrf_fusion(query_terms: list[str], k: int = 20,
                   kc: int = 60) -> str:
    """Mirror of tfidf.rrf_fusion: sql_bm25_retrieval nested, the TF
    baseline inline, ROW_NUMBER ranks over the same total orders, the
    identical fixed two-term sum, (rrf DESC, doc_id) top-k."""
    terms = ", ".join(f"'{t}'" for t in query_terms)

    def term(col: str) -> str:
        return (
            f"(CASE WHEN {col} IS NOT NULL THEN CAST(1.0 AS DOUBLE) "
            f"/ CAST({col} + {kc} AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) "
            f"END)"
        )

    return _with(
        [("bm", sql_bm25_retrieval(query_terms, k)),
         ("ra",
          "SELECT doc_id, ROW_NUMBER() OVER "
          "(ORDER BY score DESC, doc_id) AS ra FROM bm"),
         ("tfh",
          "SELECT doc_id, COUNT(*) AS n_hits FROM (SELECT doc_id, "
          "UNNEST(string_split(text, ' ')) AS t FROM documents) "
          f"WHERE t IN ({terms}) GROUP BY doc_id "
          f"ORDER BY n_hits DESC, doc_id LIMIT {k}"),
         ("rb",
          "SELECT doc_id, ROW_NUMBER() OVER "
          "(ORDER BY n_hits DESC, doc_id) AS rb FROM tfh"),
         ("j",
          "SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id, "
          f"{term('ra.ra')} + {term('rb.rb')} AS rrf "
          "FROM ra FULL OUTER JOIN rb ON rb.doc_id = ra.doc_id")],
        f"SELECT doc_id, rrf FROM j ORDER BY rrf DESC, doc_id LIMIT {k}",
    )


def sql_bm25_retrieval(query_terms: list[str], k: int = 20) -> str:
    """Mirror of tfidf.bm25_retrieval: identical BM25 rendering as
    SQL_TFIDF_TOPK's bm25 column (the LN/constant shapes are the ones
    the gate already proved identical), per-term 6dp round, exact
    DECIMAL(28,6) sum, one final double cast, (score DESC, doc_id)
    top-k."""
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return _with(
        [("tok",
          "SELECT doc_id, UNNEST(string_split(text, ' ')) AS term "
          "FROM documents"),
         ("dl",
          "SELECT doc_id, COUNT(*) AS dl FROM tok "
          "WHERE term <> '' GROUP BY 1"),
         ("n", "SELECT COUNT(*) AS n_docs FROM documents"),
         ("a", "SELECT AVG(dl) AS avg_dl FROM dl"),
         ("tf",
          f"SELECT doc_id, term, COUNT(*) AS tf FROM tok "
          f"WHERE term IN ({terms}) GROUP BY 1, 2"),
         ("dfq", "SELECT term, COUNT(*) AS df FROM tf GROUP BY 1"),
         ("sc",
          "SELECT t.doc_id, "
          "ROUND(LN(CAST(1.0 AS DOUBLE) "
          "         + (n.n_docs - d.df + CAST(0.5 AS DOUBLE)) "
          "           / (d.df + CAST(0.5 AS DOUBLE))) "
          "      * (t.tf * CAST(2.2 AS DOUBLE)) "
          "        / (t.tf + CAST(1.2 AS DOUBLE) "
          "           * (CAST(0.25 AS DOUBLE) "
          "              + CAST(0.75 AS DOUBLE) * l.dl / a.avg_dl)), "
          "      6)::DECIMAL(28,6) AS ts "
          "FROM tf t JOIN dfq d USING (term) JOIN dl l USING (doc_id) "
          "CROSS JOIN n CROSS JOIN a")],
        f"SELECT doc_id, COUNT(*) AS n_hit, "
        f"CAST(SUM(ts) AS DOUBLE) AS score "
        f"FROM sc GROUP BY 1 ORDER BY score DESC, doc_id LIMIT {k}",
    )


def sql_item_cooccurrence(gap_minutes: int = 30, max_items: int = 50,
                          min_count: int = 2) -> str:
    """Mirror of covisit.item_cooccurrence: same gaps-and-islands
    sessionization as sql_sessionize (half-open >= gap), same capped
    distinct incidence, same pair counts and single-division cosine."""
    return _with(
        [("it",
          "SELECT user_id, ts, event_id, "
          "CAST(json_extract_string(props, '$.k') AS BIGINT) AS item "
          "FROM events "
          "WHERE json_extract_string(props, '$.k') IS NOT NULL"),
         ("o",
          f"SELECT user_id, ts, event_id, item, CASE WHEN LAG(ts) OVER "
          f"(PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
          f"OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
          f">= INTERVAL {gap_minutes} MINUTE THEN 1 ELSE 0 END AS new_s "
          f"FROM it"),
         ("s",
          "SELECT user_id, item, SUM(new_s) OVER (PARTITION BY user_id "
          "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM o"),
         ("d", "SELECT DISTINCT user_id, sid, item FROM s"),
         ("keep",
          f"SELECT user_id, sid FROM d GROUP BY 1, 2 "
          f"HAVING COUNT(*) <= {max_items}"),
         ("dd",
          "SELECT d.user_id, d.sid, d.item FROM d "
          "JOIN keep USING (user_id, sid)"),
         ("ni", "SELECT item, COUNT(*) AS n FROM dd GROUP BY 1"),
         ("p",
          f"SELECT a.item AS item_a, b.item AS item_b, "
          f"COUNT(*) AS n_ab FROM dd a JOIN dd b "
          f"ON a.user_id = b.user_id AND a.sid = b.sid "
          f"AND a.item < b.item GROUP BY 1, 2 "
          f"HAVING COUNT(*) >= {min_count}")],
        "SELECT item_a, item_b, n_ab, na.n AS n_a, nb.n AS n_b, "
        "ROUND(CAST(n_ab AS DOUBLE) / SQRT(CAST(na.n * nb.n AS DOUBLE)), 6) "
        "AS cosine FROM p "
        "JOIN ni na ON na.item = p.item_a "
        "JOIN ni nb ON nb.item = p.item_b",
    )


def sql_ppr(iters: int = 5, damping: float = 0.85, seed_mod: int = 97, mod: int = UNI_MOD) -> str:
    """Unrolled personalized PageRank with teleport to {id % seed_mod = 0}."""
    d = f"CAST({damping!r} AS DOUBLE)"
    ctes = [
        ("uni", uni_frag(mod)),
        ("v", VERTS),
        ("od", "SELECT src AS id, COUNT(*) AS out_deg FROM uni GROUP BY src"),
        ("sd", f"SELECT id FROM v WHERE id % {seed_mod} = 0"),
        ("ns", "SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM sd"),
        ("tp",
         f"SELECT v.id, CASE WHEN sd.id IS NOT NULL THEN "
         f"(CAST(1.0 AS DOUBLE) - {d}) / ns.n ELSE CAST(0.0 AS DOUBLE) END AS tp "
         f"FROM v CROSS JOIN ns LEFT JOIN sd ON sd.id = v.id"),
        ("r0",
         f"SELECT id, tp / (CAST(1.0 AS DOUBLE) - {d}) AS pr FROM tp"),
    ]
    for t in range(1, iters + 1):
        prev = f"r{t-1}"
        ctes.append((
            f"r{t}",
            f"SELECT tp.id, tp.tp + {d} * COALESCE(s.mass, CAST(0.0 AS DOUBLE)) AS pr\n"
            f"FROM tp LEFT JOIN (\n"
            f"  SELECT uni.dst AS id, SUM({prev}.pr / od.out_deg) AS mass\n"
            f"  FROM uni JOIN {prev} ON {prev}.id = uni.src "
            f"JOIN od ON od.id = uni.src GROUP BY uni.dst\n"
            f") s ON s.id = tp.id",
        ))
    return _with(ctes, f"SELECT id, ROUND(pr, 6) AS ppr FROM r{iters}")


def sql_ppr_sweep(iters: int = 5, seed_mod: int = 97, cap: int | None = None,
                  mod: int = UNI_MOD) -> str:
    """Mirror of sweep.ppr_sweep_cut over sql_ppr's scores: identical
    (ppr/deg desc, id) order, identical cap, exact BIGINT vol/cut
    prefix sums, ONE double division for phi (NULL on a whole-graph
    prefix). The PPR chain nests as a materialized CTE subquery."""
    if cap is None:
        from .operators.sweep import SWEEP_CAP
        cap = SWEEP_CAP
    return _with(
        [("pprq", sql_ppr(iters, seed_mod=seed_mod, mod=mod)),
         ("uni", uni_frag(mod)),
         ("und", UND),
         ("dg",
          "SELECT id, COUNT(*) AS deg FROM (SELECT a AS id FROM und "
          "UNION ALL SELECT b FROM und) GROUP BY 1"),
         ("va", "SELECT CAST(SUM(deg) AS BIGINT) AS vol_all FROM dg"),
         ("cand",
          f"SELECT p.id, p.ppr, d.deg, p.ppr / d.deg AS key "
          f"FROM pprq p JOIN dg d USING (id) "
          f"ORDER BY key DESC, p.id LIMIT {cap}"),
         ("ranked",
          "SELECT id, ppr, deg, "
          "ROW_NUMBER() OVER (ORDER BY key DESC, id) AS k FROM cand"),
         ("internal",
          "SELECT GREATEST(ra.k, rb.k) AS kmax, COUNT(*) AS ic "
          "FROM und JOIN ranked ra ON ra.id = und.a "
          "JOIN ranked rb ON rb.id = und.b GROUP BY 1"),
         ("curve",
          "SELECT r.k, r.id, r.ppr, r.deg, COALESCE(i.ic, 0) AS ic "
          "FROM ranked r LEFT JOIN internal i ON i.kmax = r.k"),
         ("cuts",
          "SELECT k, id, ppr, "
          "SUM(deg) OVER (ORDER BY k) AS vol, "
          "SUM(deg) OVER (ORDER BY k) - 2 * SUM(ic) OVER (ORDER BY k) "
          "AS cut FROM curve")],
        "SELECT k, id, ppr, CAST(vol AS BIGINT) AS vol, "
        "CAST(cut AS BIGINT) AS cut, "
        "CASE WHEN LEAST(vol, va.vol_all - vol) > 0 THEN "
        "CAST(cut AS DOUBLE) / CAST(LEAST(vol, va.vol_all - vol) AS DOUBLE) "
        "END AS phi FROM cuts CROSS JOIN va",
    )


def sql_pagerank_dangling(iters: int = 5, damping: float = 0.85,
                          mod: int = UNI_MOD) -> str:
    """Mirror of pagerank.pagerank_dangling: the dangling mass D_t as
    a per-iteration scalar CTE, redistributed uniformly — identical
    expression shape (teleport + d*(mass + D/n))."""
    d = f"CAST({damping!r} AS DOUBLE)"
    ctes = [
        ("uni", uni_frag(mod)),
        ("v", VERTS),
        ("od", "SELECT src AS id, COUNT(*) AS out_deg FROM uni GROUP BY src"),
        ("nn", "SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v"),
        ("x0", "SELECT v.id, CAST(1.0 AS DOUBLE) / nn.n AS pr FROM v, nn"),
    ]
    for t in range(1, iters + 1):
        ctes.append((
            f"dm{t}",
            f"SELECT COALESCE(SUM(x.pr), CAST(0.0 AS DOUBLE)) AS dm "
            f"FROM x{t-1} x LEFT JOIN od ON od.id = x.id "
            f"WHERE od.id IS NULL",
        ))
        ctes.append((
            f"x{t}",
            f"SELECT v.id, (CAST(1.0 AS DOUBLE) - {d}) / nn.n "
            f"+ {d} * (COALESCE(s.mass, CAST(0.0 AS DOUBLE)) "
            f"+ dm{t}.dm / nn.n) AS pr\n"
            f"FROM v CROSS JOIN nn CROSS JOIN dm{t} LEFT JOIN (\n"
            f"  SELECT uni.dst AS id, SUM(x{t-1}.pr / od.out_deg) AS mass\n"
            f"  FROM uni JOIN x{t-1} ON x{t-1}.id = uni.src "
            f"JOIN od ON od.id = uni.src GROUP BY uni.dst\n"
            f") s ON s.id = v.id",
        ))
    return _with(
        ctes, f"SELECT id, ROUND(pr, 6) AS pagerank FROM x{iters}")


def sql_hitting_time(t: int | None = None, k: int = 64,
                     mod: int = UNI_MOD) -> str:
    """Mirror of trustrank.hitting_time: identical top-k in-degree
    seed rule, identical integer micro-step recursion (seed 0,
    dangling pinned at t, FLOOR(Σ/od) mean), one raw double division
    for hops."""
    if t is None:
        from .operators.trustrank import HIT_T
        t = HIT_T
    cap = t * 1_000_000
    ctes = [
        ("uni", uni_frag(mod)),
        ("v", VERTS),
        ("od", "SELECT src AS id, COUNT(*) AS od FROM uni GROUP BY src"),
        ("sd",
         f"SELECT dst AS id FROM (SELECT dst, COUNT(*) AS ind FROM uni "
         f"GROUP BY dst ORDER BY ind DESC, dst LIMIT {k})"),
        ("b",
         "SELECT v.id, sd.id IS NOT NULL AS is_seed, od.od FROM v "
         "LEFT JOIN sd ON sd.id = v.id LEFT JOIN od ON od.id = v.id"),
        ("h0",
         f"SELECT id, CASE WHEN is_seed THEN CAST(0 AS BIGINT) "
         f"ELSE CAST({cap} AS BIGINT) END AS hm FROM b"),
    ]
    for i in range(1, t + 1):
        prev = f"h{i - 1}"
        ctes.append((
            f"h{i}",
            f"SELECT b.id, CASE WHEN b.is_seed THEN CAST(0 AS BIGINT) "
            f"WHEN g.s IS NULL THEN CAST({cap} AS BIGINT) "
            f"ELSE LEAST(CAST({cap} AS BIGINT), 1000000 + "
            f"CAST(FLOOR(CAST(g.s AS DOUBLE) / b.od) AS BIGINT)) END AS hm "
            f"FROM b LEFT JOIN (SELECT uni.src AS id, SUM({prev}.hm) AS s "
            f"FROM uni JOIN {prev} ON {prev}.id = uni.dst "
            f"GROUP BY uni.src) g ON g.id = b.id",
        ))
    return _with(
        ctes,
        f"SELECT id, hm AS h_micro, "
        f"CAST(hm AS DOUBLE) / CAST(1000000.0 AS DOUBLE) AS hops "
        f"FROM h{t}",
    )


def sql_spam_mass(iters: int = 5, damping: float = 0.85, k: int = 64,
                  mod: int = UNI_MOD) -> str:
    """Mirror of trustrank.spam_mass: the PageRank chain (a*) and the
    trusted-seed PPR chain (b*) unrolled side by side, seeds = top-k
    in-degree (id tie-break), spam mass as the exact DECIMAL(18,6)
    difference of the two 6-dp-rounded ranks, and the relative-mass
    verdict as the exact comparison 2*(pr-tr) > pr (never a rounded
    ratio — a ratio of 6-dp decimals can land exactly on a .5e-6 tie)."""
    d = f"CAST({damping!r} AS DOUBLE)"
    ctes = [
        ("uni", uni_frag(mod)),
        ("v", VERTS),
        ("od", "SELECT src AS id, COUNT(*) AS out_deg FROM uni GROUP BY src"),
        ("nn", "SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v"),
        ("sd",
         f"SELECT dst AS id FROM (SELECT dst, COUNT(*) AS ind FROM uni "
         f"GROUP BY dst ORDER BY ind DESC, dst LIMIT {k})"),
        ("ns", "SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM sd"),
        ("tp",
         f"SELECT v.id, CASE WHEN sd.id IS NOT NULL THEN "
         f"(CAST(1.0 AS DOUBLE) - {d}) / ns.n ELSE CAST(0.0 AS DOUBLE) END "
         f"AS tp FROM v CROSS JOIN ns LEFT JOIN sd ON sd.id = v.id"),
        ("a0", "SELECT v.id, CAST(1.0 AS DOUBLE) / nn.n AS pr FROM v, nn"),
        ("b0",
         f"SELECT id, tp / (CAST(1.0 AS DOUBLE) - {d}) AS pr FROM tp"),
    ]
    for t in range(1, iters + 1):
        ctes.append((
            f"a{t}",
            f"SELECT v.id, (CAST(1.0 AS DOUBLE) - {d}) / nn.n "
            f"+ {d} * COALESCE(s.mass, CAST(0.0 AS DOUBLE)) AS pr\n"
            f"FROM v CROSS JOIN nn LEFT JOIN (\n"
            f"  SELECT uni.dst AS id, SUM(a{t-1}.pr / od.out_deg) AS mass\n"
            f"  FROM uni JOIN a{t-1} ON a{t-1}.id = uni.src "
            f"JOIN od ON od.id = uni.src GROUP BY uni.dst\n"
            f") s ON s.id = v.id",
        ))
        ctes.append((
            f"b{t}",
            f"SELECT tp.id, tp.tp + {d} * COALESCE(s.mass, "
            f"CAST(0.0 AS DOUBLE)) AS pr\n"
            f"FROM tp LEFT JOIN (\n"
            f"  SELECT uni.dst AS id, SUM(b{t-1}.pr / od.out_deg) AS mass\n"
            f"  FROM uni JOIN b{t-1} ON b{t-1}.id = uni.src "
            f"JOIN od ON od.id = uni.src GROUP BY uni.dst\n"
            f") s ON s.id = tp.id",
        ))
    ctes.append((
        "fin",
        f"SELECT a.id, "
        f"CAST(ROUND(a.pr, 6) AS DECIMAL(18,6)) AS prd, "
        f"CAST(ROUND(b.pr, 6) AS DECIMAL(18,6)) AS trd "
        f"FROM a{iters} a JOIN b{iters} b ON a.id = b.id",
    ))
    return _with(
        ctes,
        "SELECT id, CAST(prd AS DOUBLE) AS pagerank, "
        "CAST(trd AS DOUBLE) AS trustrank, "
        "CAST(prd - trd AS DOUBLE) AS spam_mass, "
        "2 * (prd - trd) > prd AS spammy FROM fin",
    )


def sql_gang_semi(iters: int = 5, weight: float = 0.008,
                  frac: float = 0.25, yelp_shape: bool = False) -> str:
    """GANG with semi-supervised clamped priors on the sampled seed set
    (eval_GANG pipeline shape; sampling pinned to Knuth-hash order).
    ``yelp_shape`` runs it on the YelpChi-shaped graph (201-product tiny
    side — the hub-skew/broadcast fixture)."""
    w2 = f"CAST({2 * weight!r} AS DOUBLE)"
    ctes = [
        ("bip", BIP_YELP if yelp_shape else BIP),
        ("bsym",
         "SELECT src, dst FROM bip UNION ALL SELECT dst AS src, src AS dst FROM bip"),
        ("v", BIP_VERTS),
        ("gt",
         "SELECT src AS id, MAX(CASE WHEN sign = 2 THEN 1 ELSE 0 END) AS label "
         "FROM bip GROUP BY src"),
        ("rk",
         f"SELECT id, label, ROW_NUMBER() OVER (PARTITION BY label "
         f"ORDER BY (id * {PRIOR_MULT}) % {PRIOR_MOD}, id) AS rn, "
         f"COUNT(*) OVER (PARTITION BY label) AS n FROM gt"),
        ("sd", f"SELECT id, label FROM rk WHERE rn <= CEIL(n * {frac}::DOUBLE)"),
        ("pri",
         f"SELECT v.id, CASE WHEN sd.label = 1 THEN 0.999::DOUBLE "
         f"WHEN sd.label = 0 THEN 0.001::DOUBLE "
         f"ELSE {prior_expr('v.id')} END - CAST(0.5 AS DOUBLE) AS p "
         f"FROM v LEFT JOIN sd ON sd.id = v.id"),
        ("b0", "SELECT id, p AS b FROM pri"),
    ]
    for t in range(1, iters + 1):
        prev = f"b{t-1}"
        ctes.append((
            f"b{t}",
            f"SELECT pri.id, pri.p + {w2} * COALESCE(s.m, CAST(0.0 AS DOUBLE)) AS b\n"
            f"FROM pri LEFT JOIN (\n"
            f"  SELECT bsym.dst AS id, SUM({prev}.b) AS m FROM bsym "
            f"JOIN {prev} ON {prev}.id = bsym.src GROUP BY bsym.dst\n"
            f") s ON s.id = pri.id",
        ))
    return _with(ctes, f"SELECT id, ROUND(b, 6) AS belief FROM b{iters}")


def sql_contamination(bench_mod: int = 31, threshold: float = 0.25) -> str:
    """Mirror of dedup.contamination: distinct benchmark shingle set vs
    each training doc's distinct shingles; the flag compares the
    un-rounded double ratio so both engines branch identically."""
    ratio = "CAST(COUNT(b.sh) AS DOUBLE) / COUNT(*)"
    return _with(
        [("sh", _SHINGLES),
         ("bench",
          f"SELECT DISTINCT sh FROM sh WHERE doc_id % {bench_mod} = 0"),
         ("train",
          f"SELECT DISTINCT doc_id, sh FROM sh "
          f"WHERE doc_id % {bench_mod} <> 0")],
        f"SELECT t.doc_id, COUNT(*) AS n_shingles, "
        f"COUNT(b.sh) AS n_hit, ROUND({ratio}, 6) AS overlap, "
        f"({ratio}) >= {_d(threshold)} AS contaminated "
        f"FROM train t LEFT JOIN bench b ON b.sh = t.sh GROUP BY t.doc_id",
    )


def sql_remove_boilerplate(w: int = 10, min_docs: int = 2) -> str:
    """Mirror of dedup.remove_boilerplate: fixed-width word spans,
    corpus doc-frequency threshold, anti-join, in-order reassembly.
    DuckDB's parallel UNNEST zips (pos, chunk); list slicing clamps at
    the array end exactly like Spark's ``slice``."""
    return _with(
        [("words",
          "SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents"),
         ("cl",
          f"SELECT doc_id, LIST_TRANSFORM("
          f"RANGE(CAST(CEIL(LEN(w) / {float(w)}) AS BIGINT)), "
          f"i -> ARRAY_TO_STRING(w[(i * {w} + 1):(i * {w} + {w})], ' ')"
          f") AS cl FROM words"),
         ("chunks",
          "SELECT doc_id, CAST(UNNEST(RANGE(LEN(cl))) AS INTEGER) AS pos, "
          "UNNEST(cl) AS chunk FROM cl"),
         ("boiler",
          f"SELECT chunk FROM chunks GROUP BY chunk "
          f"HAVING COUNT(DISTINCT doc_id) >= {min_docs}"),
         ("kept",
          "SELECT c.doc_id, c.pos, c.chunk FROM chunks c "
          "LEFT JOIN boiler b USING (chunk) WHERE b.chunk IS NULL"),
         ("agg",
          "SELECT doc_id, STRING_AGG(chunk, ' ' ORDER BY pos) "
          "AS clean_text, CAST(COUNT(*) AS BIGINT) AS n_kept "
          "FROM kept GROUP BY doc_id"),
         ("tot",
          "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans "
          "FROM chunks GROUP BY doc_id")],
        "SELECT t.doc_id, COALESCE(a.clean_text, '') AS clean_text, "
        "t.n_spans, CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept "
        "FROM tot t LEFT JOIN agg a USING (doc_id)",
    )


def _quality_rules(min_tokens: int = 15, avg_lo: float = 3.0,
                   avg_hi: float = 10.0, max_dupw: float = 0.68,
                   max_dupb: float = 0.08) -> list[tuple[str, str]]:
    """(name, pass-condition over the `q` metrics CTE) in the fixed
    declaration order quality.quality_filter uses."""
    return [
        ("min_tokens", f"n_tokens >= {min_tokens}"),
        ("stopwords", "stopr > 0.0"),
        ("avg_token_len",
         f"avg_tok >= {_d(avg_lo)} AND avg_tok <= {_d(avg_hi)}"),
        ("dup_words", f"dupw <= {_d(max_dupw)}"),
        ("dup_bigrams", f"dupb <= {_d(max_dupb)}"),
    ]


def _quality_metric_ctes() -> list[tuple[str, str]]:
    """[sp, q]: the per-document quality metrics CTE chain (every
    metric rounded to 6 dp BEFORE any threshold comparison, so verdicts
    can't flip on float low bits) — shared by sql_quality_filter and
    the quality-weighted rank oracles."""
    from .functions.text import (STOPWORDS, sql_token_count,
                                 sql_word_occurrences)

    stop = " + ".join(sql_word_occurrences("text", w) for w in STOPWORDS)
    return [
        ("sp",
         "SELECT doc_id, text, string_split(text, ' ') AS w "
         "FROM documents"),
        ("q",
         f"SELECT doc_id, {sql_token_count('text')} AS n_tokens, "
         f"ROUND((LENGTH(text) - ({sql_token_count('text')} - 1)) "
         f"/ CAST({sql_token_count('text')} AS DOUBLE), 6) AS avg_tok, "
         f"ROUND(({stop}) / CAST({sql_token_count('text')} AS DOUBLE), 6) "
         f"AS stopr, "
         f"ROUND(1 - LEN(list_distinct(w)) / CAST(LEN(w) AS DOUBLE), 6) "
         f"AS dupw, "
         f"CASE WHEN LEN(w) > 1 THEN "
         f"ROUND(1 - LEN(list_distinct(list_transform(range(1, LEN(w)), "
         f"i -> w[i] || ' ' || w[i + 1]))) / CAST(LEN(w) - 1 AS DOUBLE), 6) "
         f"ELSE CAST(0.0 AS DOUBLE) END AS dupb FROM sp"),
    ]


def sql_quality_filter(min_tokens: int = 15, avg_lo: float = 3.0,
                       avg_hi: float = 10.0, max_dupw: float = 0.68,
                       max_dupb: float = 0.08) -> str:
    """Mirror of quality.quality_filter: fail_rules via CONCAT_WS,
    which skips passing rules' NULLs identically on both engines."""
    rules = _quality_rules(min_tokens, avg_lo, avg_hi, max_dupw, max_dupb)
    n_failed = " + ".join(
        f"CASE WHEN {cond} THEN 0 ELSE 1 END" for _, cond in rules
    )
    fail_rules = ", ".join(
        f"CASE WHEN NOT ({cond}) THEN '{name}' END" for name, cond in rules
    )
    return _with(
        _quality_metric_ctes(),
        f"SELECT doc_id, n_tokens, CAST({n_failed} AS BIGINT) AS n_failed, "
        f"CONCAT_WS(',', {fail_rules}) AS fail_rules, "
        f"({n_failed}) = 0 AS keep FROM q",
    )


def sql_quality_pagerank(iters: int = 5, damping: float = 0.85,
                         mod: int = UNI_MOD,
                         alias: str = "quality_pagerank") -> str:
    """Mirror of registry.q_quality_pagerank: PageRank whose teleport
    distribution is proportional to each vertex's count of
    quality-filter-PASSING documents (doc_id % mod → vertex id).
    Vertices hosting no kept doc get zero teleport; weights for ids
    outside the graph's vertex set are dropped, exactly like the Spark
    side's left-semi join. r_0 = τ; each step is the standard
    recurrence with (1-d)·τ(v) in place of (1-d)/N."""
    keep_cond = " AND ".join(cond for _, cond in _quality_rules())
    ctes = [
        ("uni", uni_frag(mod)),
        ("v", VERTS),
        ("od", "SELECT src AS id, COUNT(*) AS out_deg FROM uni GROUP BY src"),
    ] + _quality_metric_ctes() + [
        ("keepd", f"SELECT doc_id FROM q WHERE {keep_cond}"),
        ("tw",
         f"SELECT v.id, COUNT(k.id) AS w FROM v LEFT JOIN "
         f"(SELECT doc_id % {mod} AS id FROM keepd) k ON k.id = v.id "
         f"GROUP BY v.id"),
        ("wt", "SELECT CAST(SUM(w) AS DOUBLE) AS tot FROM tw"),
        ("tw2",
         "SELECT tw.id, CAST(tw.w AS DOUBLE) / wt.tot AS wn FROM tw, wt"),
        ("r0", "SELECT id, wn AS pr FROM tw2"),
    ]
    d = f"CAST({damping!r} AS DOUBLE)"
    for t in range(1, iters + 1):
        prev = f"r{t-1}"
        ctes.append(
            (
                f"r{t}",
                f"SELECT tw2.id, (CAST(1.0 AS DOUBLE) - {d}) * tw2.wn "
                f"+ {d} * COALESCE(s.mass, CAST(0.0 AS DOUBLE)) AS pr\n"
                f"FROM tw2 LEFT JOIN (\n"
                f"  SELECT uni.dst AS id, SUM({prev}.pr / od.out_deg) AS mass\n"
                f"  FROM uni JOIN {prev} ON {prev}.id = uni.src "
                f"JOIN od ON od.id = uni.src GROUP BY uni.dst\n"
                f") s ON s.id = tw2.id",
            )
        )
    return _with(ctes, f"SELECT id, ROUND(pr, 6) AS {alias} FROM r{iters}")


def sql_pagerank_warm_start(old_iters: int = 5, warm_iters: int = 3,
                            damping: float = 0.85, mod: int = UNI_MOD,
                            drop_mod: int = 17) -> str:
    """Mirror of registry.q_pagerank_warm_start: rank yesterday's graph
    (edges with (src·31+dst) % drop_mod == 0 withheld) from a cold
    uniform start for ``old_iters`` rounds, then warm-start the FULL
    graph from that unrounded vector for ``warm_iters`` rounds —
    pages first seen today (absent from the old vertex set) start at
    1/N_new via the same COALESCE the Spark side's init left-join
    runs. Both recurrences are sql_pagerank's verbatim; the old rank
    crosses into the warm chain at full double precision (rounding
    happens once, at the end)."""
    d = f"CAST({damping!r} AS DOUBLE)"
    ctes = [
        ("uni", uni_frag(mod)),
        ("uni_old",
         f"SELECT src, dst FROM uni WHERE (src * 31 + dst) % {drop_mod} <> 0"),
        ("v_old", "SELECT src AS id FROM uni_old UNION SELECT dst FROM uni_old"),
        ("od_old",
         "SELECT src AS id, COUNT(*) AS out_deg FROM uni_old GROUP BY src"),
        ("nn_old", "SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v_old"),
        ("o0",
         "SELECT v_old.id, CAST(1.0 AS DOUBLE) / nn_old.n AS pr "
         "FROM v_old, nn_old"),
    ]
    for t in range(1, old_iters + 1):
        prev = f"o{t-1}"
        ctes.append((
            f"o{t}",
            f"SELECT v_old.id, (CAST(1.0 AS DOUBLE) - {d}) / nn_old.n "
            f"+ {d} * COALESCE(s.mass, CAST(0.0 AS DOUBLE)) AS pr\n"
            f"FROM v_old CROSS JOIN nn_old LEFT JOIN (\n"
            f"  SELECT uni_old.dst AS id, "
            f"SUM({prev}.pr / od_old.out_deg) AS mass\n"
            f"  FROM uni_old JOIN {prev} ON {prev}.id = uni_old.src "
            f"JOIN od_old ON od_old.id = uni_old.src GROUP BY uni_old.dst\n"
            f") s ON s.id = v_old.id",
        ))
    ctes += [
        ("v", VERTS),
        ("od", "SELECT src AS id, COUNT(*) AS out_deg FROM uni GROUP BY src"),
        ("nn", "SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v"),
        ("w0",
         f"SELECT v.id, COALESCE(o.pr, CAST(1.0 AS DOUBLE) / nn.n) AS pr "
         f"FROM v CROSS JOIN nn LEFT JOIN o{old_iters} o ON o.id = v.id"),
    ]
    for t in range(1, warm_iters + 1):
        prev = f"w{t-1}"
        ctes.append((
            f"w{t}",
            f"SELECT v.id, (CAST(1.0 AS DOUBLE) - {d}) / nn.n "
            f"+ {d} * COALESCE(s.mass, CAST(0.0 AS DOUBLE)) AS pr\n"
            f"FROM v CROSS JOIN nn LEFT JOIN (\n"
            f"  SELECT uni.dst AS id, SUM({prev}.pr / od.out_deg) AS mass\n"
            f"  FROM uni JOIN {prev} ON {prev}.id = uni.src "
            f"JOIN od ON od.id = uni.src GROUP BY uni.dst\n"
            f") s ON s.id = v.id",
        ))
    return _with(
        ctes,
        f"SELECT id, ROUND(pr, 6) AS pagerank_warm FROM w{warm_iters}")


def sql_inlink_hhi(mod: int = UNI_MOD, n_hosts: int | None = None) -> str:
    """Mirror of quotient.host_graph |> quotient.inlink_concentration:
    per-destination-host in-link source concentration (intra-host
    self-links excluded), shares and Herfindahl over exact BIGINT link
    counts in the Spark side's expression order."""
    if n_hosts is None:
        from .operators.quotient import N_HOSTS
        n_hosts = N_HOSTS
    return _with(
        [("uni", uni_frag(mod)),
         ("hg",
          f"SELECT (src % {n_hosts}) AS src_host, "
          f"(dst % {n_hosts}) AS dst_host, "
          f"CAST(COUNT(*) AS BIGINT) AS n_links FROM uni GROUP BY 1, 2"),
         ("g",
          "SELECT dst_host AS host, "
          "CAST(SUM(n_links) AS BIGINT) AS in_links, "
          "CAST(COUNT(*) AS BIGINT) AS n_src_hosts, "
          "CAST(MAX(n_links) AS BIGINT) AS top_l, "
          "CAST(SUM(n_links * n_links) AS BIGINT) AS sq "
          "FROM hg WHERE src_host <> dst_host GROUP BY 1")],
        "SELECT host, in_links, n_src_hosts, "
        "ROUND(CAST(top_l AS DOUBLE) / CAST(in_links AS DOUBLE), 6) "
        "AS top_share, "
        "ROUND(CAST(sq AS DOUBLE) / (CAST(in_links AS DOUBLE) "
        "* CAST(in_links AS DOUBLE)), 6) AS hhi FROM g",
    )


def sql_anchor_text_topk(mod: int = UNI_MOD, title_len: int = 3,
                         k: int = 5) -> str:
    """Mirror of crawl.anchor_text_topk: per-target-page top-k anchor
    terms over all in-links, title = first ``title_len`` tokens of the
    linking page's document, tie-break (n DESC, term ASC)."""
    return _with(
        [("uni", uni_frag(mod)),
         ("t",
          f"SELECT (doc_id % {mod}) AS src, "
          f"list_slice(string_split(text, ' '), 1, {title_len}) AS terms "
          f"FROM documents"),
         ("a",
          "SELECT uni.dst, unnest(t.terms) AS term "
          "FROM uni JOIN t ON t.src = uni.src"),
         ("c",
          "SELECT dst, term, CAST(COUNT(*) AS BIGINT) AS n "
          "FROM a GROUP BY 1, 2"),
         ("r",
          "SELECT dst, term, n, CAST(ROW_NUMBER() OVER "
          "(PARTITION BY dst ORDER BY n DESC, term ASC) AS INTEGER) AS rnk "
          "FROM c")],
        f"SELECT dst, rnk, term, n FROM r WHERE rnk <= {k}",
    )


def sql_phrase_match(query_doc: int = 0) -> str:
    """Mirror of tfidf.phrase_match via the equivalent array-expression
    count (the engine runs the positional-postings JOIN; value identity
    across the two formulations is exactly what the gate proves):
    n_matches = #{i : w[i] = q.w1 AND w[i+1] = q.w2}, 1-based DuckDB
    list indexing, docs with zero matches dropped."""
    return _with(
        [("d", "SELECT doc_id, string_split(text, ' ') AS w FROM documents"),
         ("q",
          f"SELECT w[1] AS w1, w[2] AS w2 FROM d WHERE doc_id = {query_doc}"),
         ("m",
          "SELECT d.doc_id, CAST(LEN(list_filter(range(1, LEN(d.w)), "
          "i -> d.w[i] = q.w1 AND d.w[i + 1] = q.w2)) AS BIGINT) "
          "AS n_matches FROM d, q")],
        "SELECT doc_id, n_matches FROM m WHERE n_matches > 0",
    )


def sql_param_mining(n_hosts: int = 20, n_paths: int = 7,
                     sess_mod: int = 5) -> str:
    """Mirror of crawl.param_mining_demo: the synthetic fetch log
    (md5(text) as the content checksum — both engines emit lowercase
    hex) and the strip-one-param group/rollup. The base_key lambda
    captures the unnested param exactly like the Spark side's
    F.filter closure."""
    path = (f"'http://h' || CAST(doc_id % {n_hosts} AS VARCHAR) "
            f"|| '.ex/p' || CAST(doc_id % {n_paths} AS VARCHAR)")
    return _with(
        [("fa",
          f"SELECT {path} || '?id=' || CAST(doc_id AS VARCHAR) "
          f"|| '&sess=' || CAST(doc_id % {sess_mod} AS VARCHAR) AS url, "
          f"md5(text) AS h FROM documents"),
         ("fb",
          f"SELECT {path} || '?id=' || CAST(doc_id AS VARCHAR) "
          f"|| '&sess=' || CAST((doc_id + 1) % {sess_mod} AS VARCHAR) "
          f"AS url, md5(text) AS h FROM documents WHERE doc_id % 2 = 0"),
         ("f",
          "SELECT url, h, string_split(url, '?')[1] AS path, "
          "string_split(string_split(url, '?')[2], '&') AS params "
          "FROM (SELECT * FROM fa UNION ALL SELECT * FROM fb)"),
         ("e", "SELECT h, path, params, unnest(params) AS p FROM f"),
         ("t",
          "SELECT split_part(p, '=', 1) AS param, "
          "path || '?' || array_to_string(list_sort(list_filter(params, "
          "q -> q <> p)), '&') AS base_key, h FROM e"),
         ("g",
          "SELECT param, base_key, COUNT(*) AS n_fetch, "
          "COUNT(DISTINCT h) AS n_hash FROM t GROUP BY 1, 2")],
        "SELECT param, CAST(COUNT(*) AS BIGINT) AS n_groups, "
        "CAST(SUM(CASE WHEN n_fetch > 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_multi, "
        "CAST(SUM(CASE WHEN n_fetch > 1 AND n_hash > 1 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_dirty, "
        "(SUM(CASE WHEN n_fetch > 1 THEN 1 ELSE 0 END) > 0 AND "
        "SUM(CASE WHEN n_fetch > 1 AND n_hash > 1 THEN 1 ELSE 0 END) = 0) "
        "AS neutral FROM g GROUP BY param",
    )


def sql_politeness_schedule(rate: int = 3, n_hosts: int = 37) -> str:
    """Mirror of crawl.politeness_schedule_demo: quality-scored docs,
    per-host (score DESC, doc_id ASC) ranking, integer-arithmetic round
    assignment (FLOOR on identical doubles — engine-independent)."""
    return _with(
        [("qs", sql_quality_score()),
         ("s",
          f"SELECT doc_id, doc_id % {n_hosts} AS host_id, "
          f"quality_score AS score FROM qs"),
         ("r",
          "SELECT doc_id, host_id, CAST(ROW_NUMBER() OVER "
          "(PARTITION BY host_id ORDER BY score DESC, doc_id ASC) "
          "AS INTEGER) AS rnk_in_host FROM s")],
        f"SELECT doc_id, host_id, rnk_in_host, "
        f"CAST(FLOOR((rnk_in_host + {rate - 1}) "
        f"/ CAST({rate} AS DOUBLE)) AS BIGINT) AS fetch_round FROM r",
    )


def sql_crawl_budget(total: int = 10000, mod: int = UNI_MOD,
                     n_hosts: int | None = None) -> str:
    """Mirror of crawl.crawl_budget_demo: host out-link weights from
    the quotient rollup, Hamilton largest-remainder apportionment.
    Weights are integer-valued doubles, so Σw is exact under ANY
    summation order — the one precondition that makes the
    cross-engine fractional-part ordering safe."""
    if n_hosts is None:
        from .operators.quotient import N_HOSTS
        n_hosts = N_HOSTS
    return _with(
        [("uni", uni_frag(mod)),
         ("hg",
          f"SELECT (src % {n_hosts}) AS src_host, "
          f"(dst % {n_hosts}) AS dst_host, "
          f"CAST(COUNT(*) AS BIGINT) AS n_links FROM uni GROUP BY 1, 2"),
         ("w",
          "SELECT src_host AS host, "
          "CAST(SUM(n_links) AS DOUBLE) AS w FROM hg GROUP BY 1"),
         ("s", "SELECT SUM(w) AS s FROM w"),
         ("q",
          f"SELECT host, w, CAST({total} AS DOUBLE) * w / s.s AS q "
          f"FROM w, s"),
         ("b",
          "SELECT host, w, q, CAST(FLOOR(q) AS BIGINT) AS base, "
          "q - FLOOR(q) AS frac FROM q"),
         ("r", f"SELECT {total} - SUM(base) AS r FROM b"),
         ("rk",
          "SELECT host, w, base, frac, ROW_NUMBER() OVER "
          "(ORDER BY frac DESC, host ASC) AS rnk FROM b")],
        "SELECT host, w, CAST(base + CASE WHEN rnk <= r.r THEN 1 ELSE 0 END "
        "AS BIGINT) AS alloc FROM rk, r",
    )


def sql_bloom_admission(m_bits: int = 64, k_hashes: int = 2,
                        mod: int = 9, seen_mod: int = 7) -> str:
    """Mirror of crawl.bloom_admission_demo: same url synthesis +
    canonicalization, same md5-low-32 bit positions, bloom_seen iff
    every distinct position of the url is occupied by the seen set."""
    pos = (f"list_distinct(list_transform(generate_series(0, "
           f"{k_hashes - 1}), j -> ('0x' || substr(md5(url_norm || '#' "
           f"|| CAST(j AS VARCHAR)), 1, 8))::BIGINT % {m_bits}))")
    ctes = _url_norm_ctes() + [
        ("seenp",
         f"SELECT DISTINCT url_norm FROM normed "
         f"WHERE doc_id % {mod} <> 0 AND doc_id % {seen_mod} = 0"),
        ("occ",
         f"SELECT DISTINCT unnest({pos}) AS pos FROM seenp"),
        ("arr",
         f"SELECT doc_id, url_norm, {pos} AS ps FROM normed "
         f"WHERE doc_id % {mod} = 0"),
        ("probe",
         "SELECT doc_id, url_norm, len(ps) AS n_pos, unnest(ps) AS pos "
         "FROM arr"),
        ("hitcnt",
         "SELECT doc_id, url_norm, COUNT(*) AS n_hit FROM probe "
         "WHERE pos IN (SELECT pos FROM occ) GROUP BY doc_id, url_norm"),
        ("flags",
         "SELECT a.doc_id, a.url_norm, "
         "CAST(CASE WHEN s.url_norm IS NULL THEN 0 ELSE 1 END AS BIGINT) "
         "AS exact_seen, "
         "CAST(CASE WHEN COALESCE(h.n_hit, 0) = len(a.ps) THEN 1 ELSE 0 "
         "END AS BIGINT) AS bloom_seen "
         "FROM arr a LEFT JOIN hitcnt h "
         "ON h.doc_id = a.doc_id AND h.url_norm = a.url_norm "
         "LEFT JOIN seenp s ON s.url_norm = a.url_norm"),
    ]
    return _with(
        ctes,
        "SELECT doc_id, url_norm, exact_seen, bloom_seen, "
        "CAST(CASE WHEN bloom_seen = 1 AND exact_seen = 0 THEN 1 ELSE 0 "
        "END AS BIGINT) AS false_pos FROM flags",
    )


def sql_hrw_sharding(n_nodes: int = 5, n_hosts: int = 200) -> str:
    """Mirror of crawl.hrw_sharding_demo: same 200-host universe and
    md5-low-32 weights, list_position-of-max winner (first index
    breaks ties exactly like Spark's array_position), last node
    removed for the after view."""
    def w(upto):
        return (f"list_transform(generate_series(0, {upto - 1}), "
                f"j -> ('0x' || substr(md5(host || '#' || "
                f"CAST(j AS VARCHAR)), 1, 8))::BIGINT)")

    ctes = [
        ("hosts",
         f"SELECT DISTINCT 'host' || CAST(doc_id % {n_hosts} AS VARCHAR) "
         f"|| '.example' AS host FROM documents"),
        ("assigned",
         f"SELECT host, "
         f"CAST(list_position(ws, list_aggregate(ws, 'max')) - 1 "
         f"AS BIGINT) AS node, "
         f"CAST(list_position(wa, list_aggregate(wa, 'max')) - 1 "
         f"AS BIGINT) AS node_after FROM ("
         f"SELECT host, {w(n_nodes)} AS ws, {w(n_nodes - 1)} AS wa "
         f"FROM hosts)"),
    ]
    return _with(
        ctes,
        "SELECT host, node, node_after, "
        "CAST(CASE WHEN node <> node_after THEN 1 ELSE 0 END AS BIGINT) "
        "AS moved FROM assigned",
    )


def _url_norm_ctes() -> list[tuple[str, str]]:
    """CTE chain ending in ``normed(doc_id, url, host, url_norm)``: the
    deterministic messy-url synthesis + the fixed-order
    canonicalization rules — shared by sql_url_normalize and the
    streaming frontier-admission oracle. Every regexp_replace carries
    the 'g' flag so DuckDB matches Spark's replace-ALL semantics;
    DuckDB's regexp_extract returns '' on no match exactly like
    Spark's."""
    url = (
        "(CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END) || '://' "
        "|| (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) "
        "|| 'Host' || CAST(doc_id % 5 AS VARCHAR) || '.Example.COM' "
        "|| (CASE WHEN doc_id % 4 = 0 THEN "
        "(CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END) "
        "ELSE '' END) "
        "|| '/cat' || CAST(doc_id % 3 AS VARCHAR) || '//item/./page' "
        "|| CAST(doc_id % 10 AS VARCHAR) "
        "|| (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '.html' END) "
        "|| (CASE WHEN doc_id % 5 = 0 THEN "
        "'?utm_source=feed&id=' || CAST(doc_id % 100 AS VARCHAR) "
        "|| '&utm_campaign=x&b=2&a=1' "
        "WHEN doc_id % 5 = 1 THEN '?utm_medium=rss' ELSE '' END) "
        "|| (CASE WHEN doc_id % 7 = 0 THEN "
        "'#sec' || CAST(doc_id % 5 AS VARCHAR) ELSE '' END)"
    )
    ctes = [
        ("u0", f"SELECT doc_id, {url} AS url FROM documents"),
        ("n1",
         "SELECT doc_id, url, "
         "regexp_replace(url, '#.*$', '', 'g') AS u1 FROM u0"),
        ("n2",
         "SELECT *, "
         "lower(regexp_extract(u1, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) "
         "AS scheme, "
         "regexp_replace(u1, '^[A-Za-z][A-Za-z0-9+.-]*://', '', 'g') "
         "AS rest FROM n1"),
        ("n3",
         "SELECT *, regexp_extract(rest, '^([^/?]*)', 1) AS hostport, "
         "regexp_replace(rest, '^[^/?]*', '', 'g') AS pathq FROM n2"),
        ("n4",
         "SELECT *, "
         "regexp_replace(lower(regexp_extract(hostport, '^([^:]*)', 1)), "
         "'^www\\.', '', 'g') AS host, "
         "regexp_extract(hostport, ':([0-9]+)$', 1) AS port FROM n3"),
        ("n5",
         "SELECT *, "
         "CASE WHEN port = '' OR (scheme = 'http' AND port = '80') "
         "OR (scheme = 'https' AND port = '443') THEN '' "
         "ELSE ':' || port END AS port_norm, "
         "regexp_replace(regexp_replace(regexp_replace("
         "regexp_extract(pathq, '^([^?]*)', 1), "
         "'//+', '/', 'g'), '/\\./', '/', 'g'), '/\\./', '/', 'g') AS p1, "
         "regexp_extract(pathq, '\\?(.*)$', 1) AS q0 FROM n4"),
        ("n6",
         "SELECT *, "
         "CASE WHEN p2 <> '/' THEN regexp_replace(p2, '/+$', '', 'g') "
         "ELSE p2 END AS path_norm, "
         # COALESCE: DuckDB's array_to_string([]) is NULL where
         # Spark's array_join([]) is '' — normalize to the Spark value
         "COALESCE(array_to_string(list_sort(list_filter("
         "string_split(q0, '&'), "
         "x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&'), '') "
         "AS qnorm "
         "FROM (SELECT *, CASE WHEN p1 = '' THEN '/' ELSE p1 END AS p2 "
         "FROM n5)"),
        ("normed",
         "SELECT doc_id, url, host, "
         "scheme || '://' || host || port_norm || path_norm || "
         "(CASE WHEN qnorm = '' THEN '' ELSE '?' || qnorm END) "
         "AS url_norm FROM n6"),
    ]
    return ctes


def sql_recrawl_rate(epoch_days: float = 7.0, min_interval: float = 1.0,
                     max_interval: float = 90.0,
                     n_hosts: int = 37) -> str:
    """Mirror of crawl.recrawl_rate_demo: churn from sql_host_churn,
    λ̂ 6-dp-rounded off the LN (house convention), interval computed
    FROM the rounded λ̂, degenerate p ∈ {0, 1} pinned to the caps
    (λ̂ NULL at p = 1)."""
    e = f"CAST({epoch_days!r} AS DOUBLE)"
    lo = f"CAST({min_interval!r} AS DOUBLE)"
    hi = f"CAST({max_interval!r} AS DOUBLE)"
    one = "CAST(1.0 AS DOUBLE)"
    return _with(
        [("hc", sql_host_churn(n_hosts)),
         ("lam",
          f"SELECT host_id, churn, CASE WHEN churn < {one} THEN "
          f"ROUND(-LN({one} - churn) / {e}, 6) END AS lambda_hat "
          f"FROM hc")],
        f"SELECT host_id, ROUND(churn, 6) AS churn, lambda_hat, "
        f"CASE WHEN churn >= {one} THEN {lo} "
        f"WHEN churn <= CAST(0.0 AS DOUBLE) THEN {hi} "
        f"ELSE ROUND(LEAST(GREATEST({one} / lambda_hat, {lo}), {hi}), 6) "
        f"END AS revisit_days FROM lam",
    )


def sql_lsh_recall(threshold: float = 0.2, h: int = 12, bands: int = 4,
                   rows: int = 3, max_bucket: int = 512) -> str:
    """Mirror of dedup.lsh_recall: LSH-verified pair count (the
    _ngram_jaccard_ctes pipeline + threshold) over the exact
    postings-join ground-truth count at the same threshold. Both
    jaccards are 6-dp-rounded before the >= compare, so the threshold
    cut is engine-independent."""
    t = f"CAST({threshold!r} AS DOUBLE)"
    ctes, final = _ngram_jaccard_ctes(h, bands, rows, max_bucket)
    ctes += [
        ("lj", final),
        ("nl",
         f"SELECT CAST(COUNT(*) AS BIGINT) AS n_lsh FROM lj "
         f"WHERE jaccard >= {t}"),
        ("tc",
         "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
         "FROM dsh a JOIN dsh b ON b.sh = a.sh AND a.doc_id < b.doc_id"),
        ("ti",
         "SELECT tc.doc_a, tc.doc_b, COUNT(*) AS i FROM tc "
         "JOIN dsh a ON a.doc_id = tc.doc_a "
         "JOIN dsh b ON b.doc_id = tc.doc_b AND b.sh = a.sh "
         "GROUP BY 1, 2"),
        ("tj",
         "SELECT tc.doc_a, tc.doc_b, ROUND(COALESCE(ti.i, 0) "
         "/ CAST(ca.n + cb.n - COALESCE(ti.i, 0) AS DOUBLE), 6) AS jaccard "
         "FROM tc LEFT JOIN ti ON ti.doc_a = tc.doc_a "
         "AND ti.doc_b = tc.doc_b "
         "JOIN cnt ca ON ca.doc_id = tc.doc_a "
         "JOIN cnt cb ON cb.doc_id = tc.doc_b"),
        ("nt",
         f"SELECT CAST(COUNT(*) AS BIGINT) AS n_true FROM tj "
         f"WHERE jaccard >= {t}"),
    ]
    return _with(
        ctes,
        "SELECT n_true, n_lsh, CASE WHEN n_true > 0 THEN "
        "ROUND(n_lsh / CAST(n_true AS DOUBLE), 6) "
        "ELSE CAST(1.0 AS DOUBLE) END AS recall FROM nt, nl",
    )


def sql_mojibake_scrub() -> str:
    """Mirror of quality.mojibake_scrub_demo: identical planting,
    the same MOJIBAKE_MAP literal replaces in the same order, exact
    length-delta occurrence counts, md5 byte-identity."""
    from .operators.quality import MOJIBAKE_MAP

    plant = (
        "text || (CASE WHEN doc_id % 8 = 0 THEN ' cafÃ©' ELSE '' END) "
        "|| (CASE WHEN doc_id % 14 = 0 THEN ' donâ€™t' ELSE '' END)"
    )
    fixed = "text"
    counts = []
    for broken, good in MOJIBAKE_MAP:
        counts.append(
            f"(LENGTH({fixed}) - LENGTH(REPLACE({fixed}, '{broken}', ''))) "
            f"/ {len(broken)}")
        fixed = f"REPLACE({fixed}, '{broken}', '{good}')"
    n_fixed = " + ".join(f"({c})" for c in counts)
    return _with(
        [("p", f"SELECT doc_id, {plant} AS text FROM documents")],
        f"SELECT doc_id, CAST({n_fixed} AS BIGINT) AS n_fixed, "
        f"md5({fixed}) AS fixed_md5 FROM p",
    )


def sql_pii_scrub() -> str:
    """Mirror of quality.pii_scrub_demo: plant the same deterministic
    emails/phones, count with regexp_extract_all (== Spark's
    regexp_count), redact with 'g'-flagged regexp_replace, md5 the
    scrubbed text. Patterns are RE2-safe so both engines run the
    IDENTICAL strings."""
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
    return _with(
        [("p",
          "SELECT doc_id, text || "
          "(CASE WHEN doc_id % 6 = 0 THEN ' contact user' "
          "|| CAST(doc_id AS VARCHAR) || '@mail' "
          "|| CAST(doc_id % 9 AS VARCHAR) || '.example' ELSE '' END) || "
          "(CASE WHEN doc_id % 10 = 0 THEN ' call +1-555-' "
          "|| CAST(1000 + doc_id % 9000 AS VARCHAR) ELSE '' END) AS text "
          "FROM documents")],
        f"SELECT doc_id, "
        f"CAST(LEN(regexp_extract_all(text, '{email_re}')) AS BIGINT) "
        f"AS n_emails, "
        f"CAST(LEN(regexp_extract_all(text, '{phone_re}')) AS BIGINT) "
        f"AS n_phones, "
        f"md5(regexp_replace(regexp_replace(text, '{email_re}', '<EMAIL>', "
        f"'g'), '{phone_re}', '<PHONE>', 'g')) AS scrubbed_md5 FROM p",
    )


def sql_repeated_spans(L: int | None = None,
                       min_count: int | None = None) -> str:
    """Mirror of dedup.repeated_spans: per-position L-gram md5s via
    unnest(generate_series) + list_slice, corpus-wide HAVING count
    filter, identical lag-window span fusion, and the same pure-list
    scrub re-joined and md5'd (byte-identity). DuckDB lambda indices
    are 1-based = the Spark side's pos convention."""
    from .operators.dedup import SPAN_L, SPAN_MIN_COUNT
    L = SPAN_L if L is None else L
    min_count = SPAN_MIN_COUNT if min_count is None else min_count
    lag = "LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)"
    return _with(
        [("t",
          "SELECT doc_id, string_split(text, ' ') AS toks FROM documents"),
         ("posn",
          f"SELECT doc_id, toks, unnest(generate_series(1, "
          f"GREATEST(len(toks) - {L - 1}, 0))) AS pos FROM t"),
         ("g",
          f"SELECT doc_id, pos, md5(array_to_string("
          f"list_slice(toks, pos, pos + {L - 1}), ' ')) AS h FROM posn"),
         ("duph",
          f"SELECT h FROM g GROUP BY h HAVING COUNT(*) >= {min_count}"),
         ("hits",
          "SELECT doc_id, pos FROM g WHERE h IN (SELECT h FROM duph)"),
         ("marked",
          f"SELECT doc_id, pos, CASE WHEN {lag} IS NULL "
          f"OR pos > {lag} + {L} THEN 1 ELSE 0 END AS is_new FROM hits"),
         ("per_doc",
          "SELECT doc_id, CAST(SUM(is_new) AS BIGINT) AS n_dup_spans, "
          "list(pos ORDER BY pos) AS starts FROM marked GROUP BY doc_id"),
         ("j",
          "SELECT t.doc_id, t.toks, "
          "COALESCE(p.n_dup_spans, 0) AS n_dup_spans, "
          "COALESCE(p.starts, CAST([] AS BIGINT[])) AS starts "
          "FROM t LEFT JOIN per_doc p ON p.doc_id = t.doc_id"),
         ("cov",
          f"SELECT doc_id, toks, n_dup_spans, list_distinct(flatten("
          f"list_transform(starts, s -> generate_series(s, s + {L - 1})"
          f"))) AS covered FROM j"),
         ("kept",
          "SELECT doc_id, toks, n_dup_spans, "
          "list_filter(toks, (x, i) -> NOT list_contains(covered, i)) "
          "AS keep FROM cov")],
        "SELECT doc_id, CAST(n_dup_spans AS BIGINT) AS n_dup_spans, "
        "CAST(len(toks) - len(keep) AS BIGINT) AS tokens_removed, "
        "md5(COALESCE(array_to_string(keep, ' '), '')) AS scrubbed_md5 "
        "FROM kept",
    )


def sql_url_normalize() -> str:
    """Mirror of crawl.url_normalize_demo: canonicalize the synthetic
    messy urls (_url_norm_ctes) and count DISTINCT raw spellings per
    canonical form."""
    ctes = _url_norm_ctes() + [
        ("aliases",
         "SELECT url_norm, COUNT(DISTINCT url) AS n_aliases FROM normed "
         "GROUP BY url_norm"),
    ]
    return _with(
        ctes,
        "SELECT doc_id, url, url_norm, host, "
        "CAST(n_aliases AS BIGINT) AS n_aliases "
        "FROM normed JOIN aliases USING (url_norm)",
    )


def sql_frontier_stream(mod: int = 9, seen_mod: int = 7) -> str:
    """Mirror of streaming.corpus.run_stream_frontier's BATCH
    equivalent: docs with doc_id % mod == 0 play the arriving
    discovery stream, the non-stream docs with doc_id % seen_mod == 0
    the already-crawled seen set; an arriving url is admitted iff its
    CANONICAL form matches no seen canonical form (anti join on
    url_norm). Per-row function of (row, static seen set) — exactly
    why the streamed union over any micro-batching equals this
    one-shot answer."""
    ctes = _url_norm_ctes() + [
        ("seen",
         f"SELECT DISTINCT url_norm FROM normed "
         f"WHERE doc_id % {mod} <> 0 AND doc_id % {seen_mod} = 0"),
        ("arriving", f"SELECT * FROM normed WHERE doc_id % {mod} = 0"),
    ]
    return _with(
        ctes,
        "SELECT a.doc_id, a.url, a.url_norm, a.host FROM arriving a "
        "WHERE NOT EXISTS (SELECT 1 FROM seen s "
        "WHERE s.url_norm = a.url_norm)",
    )


def sql_epoch_shuffle(seed: int = 1) -> str:
    """Mirror of shuffle.epoch_shuffle — deliberately the naive global
    ROW_NUMBER (single-node DuckDB doesn't care; value-identity proves
    the Spark side's range-bucketed two-phase ranking exact)."""
    from .operators.shuffle import seed_mult

    h = f"(doc_id * {seed_mult(seed)} + {seed}) % {PRIOR_MOD}"
    return (
        f"SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY {h}, doc_id) - 1 "
        f"AS BIGINT) AS shuffle_pos FROM documents"
    )


def sql_lm_doc_scores() -> str:
    """Mirror of lmscore.lm_doc_scores: add-one-smoothed bigram LM
    scored against the corpus's own counts; the per-doc mean uses the
    same rounded-then-DECIMAL-summed log terms as the engine."""
    return _with(
        [("sp",
          "SELECT doc_id, string_split(text, ' ') AS w FROM documents"),
         ("st",
          "SELECT doc_id, UNNEST(w[1:LEN(w) - 1]) AS w1, "
          "UNNEST(list_transform(range(1, LEN(w)), "
          "i -> w[i] || ' ' || w[i + 1])) AS bg FROM sp"),
         ("bgc", "SELECT bg, COUNT(*) AS c_bg FROM st GROUP BY bg"),
         ("w1c", "SELECT w1, COUNT(*) AS c_w1 FROM st GROUP BY w1"),
         ("v",
          "SELECT COUNT(DISTINCT tok) AS v FROM "
          "(SELECT UNNEST(w) AS tok FROM sp)"),
         ("sc",
          "SELECT doc_id, ROUND(LN(CAST(c_bg + 1 AS DOUBLE) "
          "/ CAST(c_w1 + v AS DOUBLE)), 6) AS lp "
          "FROM st JOIN bgc USING (bg) JOIN w1c USING (w1) CROSS JOIN v")],
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams, "
        "ROUND(CAST(SUM(CAST(lp AS DECIMAL(28,6))) AS DOUBLE) "
        "/ CAST(COUNT(*) AS DOUBLE), 6) AS avg_logprob "
        "FROM sc GROUP BY doc_id",
    )


def sql_collocations(min_count: int | None = None, k: int = 30) -> str:
    """Mirror of lmscore.collocations: identical bigram/unigram counts,
    identical left-associated double ratio inside ONE LN, 6-dp round,
    (pmi desc, w1, w2) top-k. min_count is imported from the engine so
    a retune can't desynchronize the gate."""
    if min_count is None:
        from .operators.lmscore import COLLOC_MIN_COUNT
        min_count = COLLOC_MIN_COUNT
    return _with(
        [("sp",
          "SELECT doc_id, string_split(text, ' ') AS w FROM documents"),
         ("st",
          "SELECT UNNEST(w[1:LEN(w) - 1]) AS w1, "
          "UNNEST(w[2:LEN(w)]) AS w2 FROM sp"),
         ("pc",
          f"SELECT w1, w2, COUNT(*) AS n_pair FROM st "
          f"GROUP BY 1, 2 HAVING COUNT(*) >= {min_count}"),
         ("nb", "SELECT COUNT(*) AS n_bg FROM st"),
         ("tok", "SELECT UNNEST(w) AS tok FROM sp"),
         ("uni", "SELECT tok, COUNT(*) AS c FROM tok GROUP BY 1"),
         ("nt", "SELECT COUNT(*) AS n_tok FROM tok")],
        "SELECT p.w1, p.w2, p.n_pair, "
        "ROUND(LN((CAST(p.n_pair AS DOUBLE) * n.n_tok * n.n_tok) "
        "/ (CAST(b.n_bg AS DOUBLE) * u1.c * u2.c)), 6) AS pmi "
        "FROM pc p JOIN uni u1 ON p.w1 = u1.tok "
        "JOIN uni u2 ON p.w2 = u2.tok CROSS JOIN nb b CROSS JOIN nt n "
        f"ORDER BY pmi DESC, p.w1, p.w2 LIMIT {k}",
    )


def sql_source_reputation() -> str:
    """Mirror of quality.source_reputation: the quality-filter and LM
    oracles nest as materialized CTE subqueries (each carries its own
    WITH), joined per doc and rolled up per source with the identical
    exact-count / DECIMAL-sum float discipline."""
    return _with(
        [("qf", sql_quality_filter()),
         ("lmq", sql_lm_doc_scores()),
         ("pd",
          "SELECT d.doc_id, d.source, q.keep, l.avg_logprob "
          "FROM documents d JOIN qf q USING (doc_id) "
          "LEFT JOIN lmq l USING (doc_id)")],
        "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep, "
        "ROUND(CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) "
        "/ CAST(COUNT(*) AS DOUBLE), 6) AS keep_rate, "
        "CAST(COUNT(avg_logprob) AS BIGINT) AS n_scored, "
        "CASE WHEN COUNT(avg_logprob) > 0 THEN "
        "ROUND(CAST(SUM(CAST(avg_logprob AS DECIMAL(28,6))) AS DOUBLE) "
        "/ CAST(COUNT(avg_logprob) AS DOUBLE), 6) END AS avg_lm "
        "FROM pd GROUP BY source",
    )


def sql_pack_sequences(budget: int = 256) -> str:
    """Mirror of packing.pack_sequences — deliberately the NAIVE
    single-window prefix sum (fine for DuckDB single-node; the Spark
    side's two-phase bucketed plan must be value-identical to it)."""
    from .functions.text import sql_token_count

    return _with(
        [("tc",
          f"SELECT doc_id, {sql_token_count('text')} AS n_tokens "
          f"FROM documents"),
         ("c",
          "SELECT doc_id, n_tokens, CAST(SUM(n_tokens) OVER ("
          "ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum "
          "FROM tc")],
        f"SELECT doc_id, n_tokens, "
        f"CAST(cum - n_tokens AS BIGINT) AS tok_offset, "
        f"CAST(FLOOR((cum - n_tokens) / {float(budget)}) AS BIGINT) "
        f"AS seq_id, "
        f"CAST(FLOOR((cum - 1) / {float(budget)}) "
        f"- FLOOR((cum - n_tokens) / {float(budget)}) + 1 AS BIGINT) "
        f"AS n_seqs FROM c",
    )


def _bpe_ctes(merges: int) -> list[tuple[str, str]]:
    """The unrolled BPE training chain: word freqs w, char-split s0,
    then per round pair counts p{k}, the arg-max t{k}, and the merged
    state s{k} (the identical boundary-safe single-pass REPLACE —
    probed: Spark replace and DuckDB REPLACE share scan semantics)."""
    ctes = [
        ("w",
         "SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM ("
         "SELECT UNNEST(string_split(text, ' ')) AS word FROM documents"
         ") GROUP BY word"),
        ("s0",
         "SELECT TRIM(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq, "
         "cnt FROM w"),
    ]
    for k in range(1, merges + 1):
        ctes.append((
            f"p{k}",
            f"SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n FROM ("
            f"SELECT UNNEST(list_transform(range(1, LEN(a)), "
            f"i -> a[i] || ' ' || a[i + 1])) AS pair, cnt FROM ("
            f"SELECT string_split(seq, ' ') AS a, cnt FROM s{k-1}"
            f")) GROUP BY pair",
        ))
        ctes.append((
            f"t{k}",
            f"SELECT pair, n FROM p{k} ORDER BY n DESC, pair LIMIT 1",
        ))
        ctes.append((
            f"s{k}",
            f"SELECT TRIM(REPLACE(' ' || seq || ' ', "
            f"' ' || t.pair || ' ', "
            f"' ' || REPLACE(t.pair, ' ', '') || ' ')) AS seq, cnt "
            f"FROM s{k-1}, t{k} t",
        ))
    return ctes


def sql_learn_bpe(merges: int = 8) -> str:
    """Mirror of bpe.learn_bpe: the whole training loop unrolled."""
    final = " UNION ALL ".join(
        f"SELECT {k} AS round, pair, REPLACE(pair, ' ', '') AS merged, n "
        f"FROM t{k}"
        for k in range(1, merges + 1)
    )
    return _with(_bpe_ctes(merges), final)


def sql_bpe_token_counts(merges: int = 8) -> str:
    """Mirror of bpe.token_counts: the final state s{K} as the
    (word, tokens-per-word) vocabulary, joined to the per-doc word
    explode; per-doc word and BPE-token totals."""
    ctes = _bpe_ctes(merges)
    ctes.append((
        "vocab",
        f"SELECT REPLACE(seq, ' ', '') AS word, "
        f"LEN(string_split(seq, ' ')) AS wtok FROM s{merges}",
    ))
    ctes.append((
        "dw",
        "SELECT doc_id, UNNEST(string_split(text, ' ')) AS word "
        "FROM documents",
    ))
    return _with(
        ctes,
        "SELECT dw.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words, "
        "CAST(SUM(v.wtok) AS BIGINT) AS n_tokens "
        "FROM dw JOIN vocab v USING (word) GROUP BY dw.doc_id",
    )


def sql_tokenizer_fertility(merges: int = 8) -> str:
    """Mirror of bpe.tokenizer_fertility: the token_counts chain, then
    the lang join + per-lang exact sums and ONE double division."""
    ctes = _bpe_ctes(merges)
    ctes.append((
        "vocab",
        f"SELECT REPLACE(seq, ' ', '') AS word, "
        f"LEN(string_split(seq, ' ')) AS wtok FROM s{merges}",
    ))
    ctes.append((
        "dw",
        "SELECT doc_id, UNNEST(string_split(text, ' ')) AS word "
        "FROM documents",
    ))
    ctes.append((
        "tc",
        "SELECT dw.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words, "
        "CAST(SUM(v.wtok) AS BIGINT) AS n_tokens "
        "FROM dw JOIN vocab v USING (word) GROUP BY dw.doc_id",
    ))
    return _with(
        ctes,
        "SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(tc.n_words) AS BIGINT) AS n_words, "
        "CAST(SUM(tc.n_tokens) AS BIGINT) AS n_tokens, "
        "CAST(SUM(tc.n_tokens) AS DOUBLE) / CAST(SUM(tc.n_words) AS DOUBLE) "
        "AS fertility "
        "FROM tc JOIN documents d USING (doc_id) GROUP BY d.lang",
    )


def sql_epoch_pack(seed: int = 1, budget: int = 256) -> str:
    """Mirror of packing.epoch_pack — the naive composition: shuffle
    rank via global ROW_NUMBER over the seeded hash, prefix sum via a
    single window over that rank."""
    from .functions.text import sql_token_count
    from .operators.shuffle import seed_mult

    h = f"(doc_id * {seed_mult(seed)} + {seed}) % {PRIOR_MOD}"
    return _with(
        [("tc",
          f"SELECT doc_id, {sql_token_count('text')} AS n_tokens, "
          f"ROW_NUMBER() OVER (ORDER BY {h}, doc_id) - 1 "
          f"AS sp FROM documents"),
         ("c",
          "SELECT doc_id, n_tokens, CAST(SUM(n_tokens) OVER ("
          "ORDER BY sp ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum "
          "FROM tc")],
        f"SELECT doc_id, n_tokens, "
        f"CAST(cum - n_tokens AS BIGINT) AS tok_offset, "
        f"CAST(FLOOR((cum - n_tokens) / {float(budget)}) AS BIGINT) "
        f"AS seq_id, "
        f"CAST(FLOOR((cum - 1) / {float(budget)}) "
        f"- FLOOR((cum - n_tokens) / {float(budget)}) + 1 AS BIGINT) "
        f"AS n_seqs FROM c",
    )


def _hyperball_ctes(t: int, mod: int, m: int) -> list[tuple[str, str]]:
    """The shared register-evolution CTE chain behind every HyperBall
    oracle: same md5-string register hash as the Spark side (bucket
    nibble + leading-zero-bit rho via TRIM(LEADING '0')) and ``t``
    unrolled rounds of neighbor groupBy-max, leaving register frames
    r0..r{t}."""
    regs = ", ".join(f"c{j}" for j in range(m))
    lz4 = ("CASE WHEN f = '1' THEN 3 WHEN f IN ('2','3') THEN 2 "
           "WHEN f IN ('4','5','6','7') THEN 1 ELSE 0 END")
    ctes = [
        ("uni", uni_frag(mod)), ("und", UND), ("sym", SYM),
        ("verts", "SELECT DISTINCT src AS id FROM sym"),
        ("hb",
         "SELECT id, STRPOS('0123456789abcdef', SUBSTRING(h, 1, 1)) - 1 "
         "AS bucket, CASE WHEN LENGTH(t) = 0 THEN 49 ELSE "
         f"(12 - LENGTH(t)) * 4 + {lz4} + 1 END AS rho FROM ("
         "SELECT id, h, TRIM(LEADING '0' FROM SUBSTRING(h, 2, 12)) AS t, "
         "SUBSTRING(TRIM(LEADING '0' FROM SUBSTRING(h, 2, 12)), 1, 1) AS f "
         "FROM (SELECT id, MD5(CAST(id AS VARCHAR)) AS h FROM verts))"),
        ("r0",
         "SELECT id, " + ", ".join(
             f"CASE WHEN bucket = {j} THEN rho ELSE 0 END AS c{j}"
             for j in range(m)) + " FROM hb"),
    ]
    for k in range(1, t + 1):
        maxes = ", ".join(f"MAX(c{j}) AS c{j}" for j in range(m))
        ctes.append((
            f"r{k}",
            f"SELECT id, {maxes} FROM ("
            f"SELECT s.dst AS id, {regs} FROM sym s "
            f"JOIN r{k-1} r ON r.id = s.src "
            f"UNION ALL SELECT id, {regs} FROM r{k-1}) GROUP BY id",
        ))
    return ctes


def _hb_est_sql(frame: str, m: int, alpha: float) -> str:
    """Per-vertex HLL estimate read off register frame ``frame`` — the
    identical estimator (alpha·m²/Z with the linear-counting branch)
    and float-term order as ``hyperball.ball_estimates``."""
    z = " + ".join(f"POWER(2.0::DOUBLE, -c{j})" for j in range(m))
    v = " + ".join(f"CASE WHEN c{j} = 0 THEN 1 ELSE 0 END"
                   for j in range(m))
    return (
        f"SELECT id, ROUND(CASE WHEN raw <= {_d(2.5 * m)} AND v > 0 "
        f"THEN {_d(float(m))} * LN({_d(float(m))} / CAST(v AS DOUBLE)) "
        f"ELSE raw END, 6) AS ball_est FROM ("
        f"SELECT id, {_d(alpha)} * {_d(float(m * m))} / ({z}) AS raw, "
        f"({v}) AS v FROM {frame})"
    )


def sql_hyperball(t: int = 3, mod: int = UNI_MOD, m: int = 16,
                  alpha: float = 0.673) -> str:
    """Mirror of hyperball + ball_estimates over the final round's
    register frame (see _hyperball_ctes / _hb_est_sql)."""
    return _with(_hyperball_ctes(t, mod, m), _hb_est_sql(f"r{t}", m, alpha))


def _hb_nf_ctes(t: int, mod: int, m: int,
                alpha: float) -> list[tuple[str, str]]:
    """Register chain + per-round NF points: nf(t, nf_est) with the
    Spark side's exact-DECIMAL summation of the 6-dp per-vertex
    estimates (order-independent on both engines)."""
    ctes = _hyperball_ctes(t, mod, m)
    for r in range(t + 1):
        ctes.append((
            f"nf{r}",
            f"SELECT {r} AS t, ROUND(CAST(SUM(CAST(ball_est AS "
            f"DECIMAL(28,6))) AS DOUBLE), 6) AS nf_est FROM ("
            + _hb_est_sql(f"r{r}", m, alpha) + ")",
        ))
    ctes.append((
        "nf",
        " UNION ALL ".join(f"SELECT t, nf_est FROM nf{r}"
                           for r in range(t + 1)),
    ))
    return ctes


def sql_hyperball_nf_curve(t: int = 3, mod: int = UNI_MOD, m: int = 16,
                           alpha: float = 0.673) -> str:
    """Mirror of hyperball.nf_curve: NF(r) for r = 0..t."""
    return _with(_hb_nf_ctes(t, mod, m, alpha),
                 "SELECT CAST(t AS INTEGER) AS t, nf_est FROM nf")


def sql_harmonic_centrality(t: int = 3, mod: int = UNI_MOD, m: int = 16,
                            alpha: float = 0.673) -> str:
    """Mirror of hyperball.harmonic_centrality: exact-decimal deltas
    scaled by integer lcm/r, summed exactly, ONE double division at
    the end — zero rounding sites (see the engine docstring for why
    any intermediate ROUND here lands exactly on .5e-6 ties)."""
    import math

    ctes = _hyperball_ctes(t, mod, m)
    for r in range(t + 1):
        ctes.append((f"est{r}", _hb_est_sql(f"r{r}", m, alpha)))
    joins = " ".join(f"JOIN est{r} e{r} USING (id)"
                     for r in range(1, t + 1))
    lcm = math.lcm(*range(1, t + 1))
    terms = " + ".join(
        f"(CAST(e{r}.ball_est AS DECIMAL(28,6)) "
        f"- CAST(e{r-1}.ball_est AS DECIMAL(28,6))) * {lcm // r}"
        for r in range(1, t + 1)
    )
    return _with(
        ctes,
        f"SELECT id, CAST({terms} AS DOUBLE) / {_d(float(lcm))} "
        f"AS harmonic FROM est0 e0 {joins}",
    )


def sql_closeness_lin(t: int = 3, mod: int = UNI_MOD, m: int = 16,
                      alpha: float = 0.673) -> str:
    """Mirror of hyperball.closeness_lin: exact-decimal deltas scaled
    by the integer radius, summed exactly (sum_dist has NO rounding
    site); closeness and lin as single IEEE divisions of the resulting
    deterministic doubles, deliberately not re-rounded."""
    ctes = _hyperball_ctes(t, mod, m)
    for r in range(t + 1):
        ctes.append((f"est{r}", _hb_est_sql(f"r{r}", m, alpha)))
    joins = " ".join(f"JOIN est{r} e{r} USING (id)"
                     for r in range(1, t + 1))
    terms = " + ".join(
        f"(CAST(e{r}.ball_est AS DECIMAL(28,6)) "
        f"- CAST(e{r-1}.ball_est AS DECIMAL(28,6))) * {r}"
        for r in range(1, t + 1)
    )
    ctes.append((
        "base",
        f"SELECT id, CAST({terms} AS DOUBLE) AS sd, "
        f"CAST(CAST(e{t}.ball_est AS DECIMAL(28,6)) - 1 AS DOUBLE) AS rc "
        f"FROM est0 e0 {joins}",
    ))
    return _with(
        ctes,
        "SELECT id, sd AS sum_dist, rc AS reachable, "
        "CASE WHEN sd = CAST(0.0 AS DOUBLE) THEN CAST(0.0 AS DOUBLE) "
        "ELSE CAST(1.0 AS DOUBLE) / sd END AS closeness, "
        "CASE WHEN sd = CAST(0.0 AS DOUBLE) THEN CAST(1.0 AS DOUBLE) "
        "ELSE rc * rc / sd END AS lin FROM base",
    )


def sql_effective_diameter(t: int = 3, mod: int = UNI_MOD, m: int = 16,
                           alpha: float = 0.673,
                           frac: float = 0.9) -> str:
    """Mirror of hyperball.effective_diameter over the NF curve: the
    smallest r with NF(r) ≥ frac·NF(t), linearly interpolated between
    the straddling points — identical comparison and single-division
    arithmetic as the Spark expressions."""
    ctes = _hb_nf_ctes(t, mod, m, alpha)
    ctes.append(("tgt",
                 f"SELECT nf_est * {_d(frac)} AS target FROM nf "
                 f"WHERE t = {t}"))
    ctes.append((
        "cand",
        "SELECT n.t, n.nf_est, p.nf_est AS prev, tgt.target FROM nf n "
        "LEFT JOIN nf p ON p.t = n.t - 1 CROSS JOIN tgt "
        "WHERE n.nf_est >= tgt.target ORDER BY n.t LIMIT 1",
    ))
    return _with(
        ctes,
        "SELECT ROUND(CASE WHEN t = 0 THEN CAST(0.0 AS DOUBLE) "
        "ELSE (t - 1) + (target - prev) / (nf_est - prev) END, 6) "
        "AS eff_diam FROM cand",
    )
