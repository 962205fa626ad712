"""Crawl-snapshot delta: classify every document across two crawl
epochs as added / removed / changed / unchanged — the incremental
ingestion primitive every recrawl pipeline runs before deciding what
to re-extract, re-embed, or re-index (the reference processes one
static snapshot; this is forward coverage for the continuous-crawl
story the north star's 10^12-doc corpus implies).

Semantics: snapshots are (doc_id, fp) frames where fp is a content
fingerprint (md5 of the extracted text here — any stable digest
works). A doc present only in the new snapshot is `added`, only in
the old one `removed`, in both with equal fingerprints `unchanged`,
else `changed`.

Scale shape: ONE full-outer hash join on doc_id — no windows, no
global sort, no driver funnel. Both sides shuffle once on the join
key (or fewer: at 10^12 docs both snapshots would be bucketed by
doc_id on disk and the join is co-located); AQE splits skewed
partitions. The fingerprint column keeps the join payload at 16
bytes/row regardless of document size — diffing never moves text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp): md5 content fingerprint of the UTF-8 text bytes.
    A narrow map over the scan — the digest is computed where the text
    lives, so the diff join moves 16-byte hashes, not documents."""
    return docs.select(
        "doc_id", F.md5(F.col(text_col).cast("binary")).alias("fp")
    )


def snapshot_delta(old: DataFrame, new: DataFrame) -> DataFrame:
    """(doc_id, status) for every doc_id in either snapshot.

    `old`/`new` are (doc_id, fp) frames (see `fingerprint`). Exactly
    one status per doc_id: added | removed | changed | unchanged."""
    o = old.select("doc_id", F.col("fp").alias("fp_old"))
    n = new.select("doc_id", F.col("fp").alias("fp_new"))
    j = o.join(n, "doc_id", "full_outer")
    status = (
        F.when(F.col("fp_old").isNull(), F.lit("added"))
        .when(F.col("fp_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old") == F.col("fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select("doc_id", status.alias("status"))


def crawl_delta_demo(docs: DataFrame) -> DataFrame:
    """The gate's deterministic two-epoch construction over the
    documents table (no external data, mirrored verbatim in SQL):

    - epoch OLD = docs with doc_id % 7 != 0  (last crawl's coverage),
    - epoch NEW = docs with doc_id % 11 != 3 (current crawl: some old
      pages gone, the % 7 == 0 ones newly discovered),
    - recrawled docs with doc_id % 5 == 0 changed content (fingerprint
      of text || '#v2' — a byte-level edit, the common recrawl case).
    """
    old = fingerprint(docs.where(F.col("doc_id") % 7 != 0))
    changed = F.col("doc_id") % 5 == 0
    new = docs.where(F.col("doc_id") % 11 != 3).select(
        "doc_id",
        F.md5(
            F.when(changed, F.concat(F.col("text"), F.lit("#v2")))
            .otherwise(F.col("text"))
            .cast("binary")
        ).alias("fp"),
    )
    return snapshot_delta(old, new)


def host_churn(delta: DataFrame, n_hosts: int = 37) -> DataFrame:
    """(host_id, n_added, n_removed, n_changed, n_unchanged, churn):
    per-host recrawl churn over a `snapshot_delta` frame — the signal
    crawl schedulers use to set per-host revisit rates (fast-churning
    hosts get recrawled sooner). Counts are exact conditional sums;
    churn = (added+removed+changed)/total is ONE double division.

    Scale shape: one map-side-combined groupBy on the host fold —
    |hosts| rows out regardless of |docs|."""
    is_ = lambda s: F.sum((F.col("status") == s).cast("bigint"))  # noqa: E731
    return (
        delta.groupBy((F.col("doc_id") % n_hosts).alias("host_id"))
        .agg(
            is_("added").alias("n_added"),
            is_("removed").alias("n_removed"),
            is_("changed").alias("n_changed"),
            is_("unchanged").alias("n_unchanged"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .select(
            "host_id", "n_added", "n_removed", "n_changed", "n_unchanged",
            ((F.col("n_added") + F.col("n_removed") + F.col("n_changed"))
             .cast("double") / F.col("n_total").cast("double"))
            .alias("churn"),
        )
    )


def redirect_edges_demo(docs: DataFrame) -> DataFrame:
    """(src, dst): the gate's deterministic synthetic redirect map —
    every 13th doc 301-redirects to (3·id+7) mod n (doc_ids are
    contiguous 0..n−1, so the map is closed over the id domain; a
    target can itself be a redirect, producing multi-hop chains)."""
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    return (
        docs.crossJoin(F.broadcast(n))
        .where(F.col("doc_id") % 13 == 0)
        .select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 3 + 7) % F.col("n")).alias("dst"),
        )
    )


def resolve_redirects(docs: DataFrame, redirects: DataFrame,
                      doublings: int = 3) -> DataFrame:
    """(id, final_id, resolved) for every redirect SOURCE: follow the
    redirect map to its fixed point by POINTER DOUBLING — after k
    rounds every chain of length ≤ 2^k is fully resolved, so 64-hop
    chains cost 6 self-joins, not 64 (the crawl canonicalization step:
    fetch the final URL, index under it). `resolved` is False when the
    final id still has an outgoing redirect (cycle, or a chain longer
    than 2^doublings — browsers cap at ~20 for the same reason).

    Scale shape: next() is totalized over the id domain (non-sources
    map to themselves), each doubling is ONE self equi-join of the
    |V|-row pointer frame on the id key, localCheckpoint'ed per round
    (the house iterative-kernel rule); no per-hop chain walking ever
    touches the driver."""
    nxt = redirects.select(F.col("src").alias("id"),
                           F.col("dst").alias("nxt"))
    f = (
        docs.select(F.col("doc_id").alias("id"))
        .join(nxt, "id", "left")
        .select("id", F.coalesce("nxt", "id").alias("nxt"))
        .localCheckpoint(eager=True)
    )
    for _ in range(doublings):
        f = (
            f.join(
                f.select(F.col("id").alias("nxt"),
                         F.col("nxt").alias("nxt2")),
                "nxt",
            )
            .select("id", F.col("nxt2").alias("nxt"))
            .localCheckpoint(eager=True)
        )
    return (
        redirects.select(F.col("src").alias("id"))
        .join(f, "id")
        .join(
            redirects.select(F.col("src").alias("nxt"),
                             F.lit(True).alias("still_src")),
            "nxt", "left",
        )
        .select(
            "id", F.col("nxt").alias("final_id"),
            F.col("still_src").isNull().alias("resolved"),
        )
    )


def redirect_resolution_demo(docs: DataFrame) -> DataFrame:
    return resolve_redirects(docs, redirect_edges_demo(docs))


VOCAB_DRIFT_MIN = 5


def vocab_drift(old_docs: DataFrame, new_docs: DataFrame,
                min_count: int = VOCAB_DRIFT_MIN) -> DataFrame:
    """(term, c_old, c_new, log_ratio): per-term frequency drift
    between two corpus snapshots — log((c_new·N_old)/(c_old·N_new)),
    the vocabulary-shift monitor that catches topic/source drift
    between crawl epochs before it reaches training (positive =
    term gained share in the new epoch).

    Float discipline (the collocations recipe): the ratio is exact
    BIGINT products evaluated in one identical left-associated double
    expression, ONE LN, rounded to 6 dp — no other float op. Products
    stay < 2^53 at sandbox scales; at 10¹² tokens lift to
    DECIMAL(38,0). ``min_count`` on BOTH sides keeps the ratio away
    from the unstable low-count tail AND makes the output a
    deterministic set (no k-cut); epoch-exclusive terms (c=0, log
    undefined) belong to a novelty listing, not a drift ratio.

    Scale shape: two token-count groupBys (map-side combined,
    vocabulary-sized outputs), one vocabulary-keyed join, scalars ride
    broadcast 1-row frames."""
    def counts(d: DataFrame, name: str):
        tok = d.select(F.explode(F.split(F.col("text"), " ")).alias("t")) \
               .where(F.col("t") != "")
        per = tok.groupBy("t").agg(F.count(F.lit(1)).alias(name))
        tot = tok.agg(F.count(F.lit(1)).alias(f"n_{name}"))
        return per, tot

    po, to = counts(old_docs, "c_old")
    pn, tn = counts(new_docs, "c_new")
    j = (
        po.where(F.col("c_old") >= min_count)
        .join(pn.where(F.col("c_new") >= min_count), po["t"] == pn["t"])
        .select(po["t"].alias("term"), "c_old", "c_new")
        .crossJoin(F.broadcast(to))
        .crossJoin(F.broadcast(tn))
    )
    lr = F.round(
        F.log(
            (F.col("c_new").cast("double") * F.col("n_c_old"))
            / (F.col("c_old").cast("double") * F.col("n_c_new"))
        ),
        6,
    )
    return j.select("term", "c_old", "c_new", lr.alias("log_ratio"))


def vocab_drift_demo(docs: DataFrame) -> DataFrame:
    """Gate construction: the crawl_delta epochs over RAW text (the
    drift question is which documents exist in each epoch, so the
    recrawl '#v2' byte edit is not applied here)."""
    return vocab_drift(
        docs.where(F.col("doc_id") % 7 != 0),
        docs.where(F.col("doc_id") % 11 != 3),
    )


def frontier_priority_demo(docs: DataFrame) -> DataFrame:
    """(doc_id, host_id, status, churn): the END-TO-END recrawl
    frontier — robots-ALLOWED documents of the new epoch whose content
    is new or changed, prioritized by their host's measured churn
    (fast-churning hosts first). Pure composition of the three
    certified stages (admission ⋈ delta ⋈ churn): two doc-keyed joins
    plus one broadcast of the |hosts|-row churn frame — the query a
    crawl scheduler actually runs each cycle."""
    from .robots import robots_admission_demo

    # feeds both the needs-fetch filter and the churn aggregate
    delta = crawl_delta_demo(docs).localCheckpoint(eager=True)
    need = delta.where(F.col("status").isin("added", "changed"))
    allowed = robots_admission_demo(docs).where(F.col("allowed")) \
        .select("doc_id")
    ch = host_churn(delta)
    return (
        need.join(allowed, "doc_id")
        .select("doc_id", (F.col("doc_id") % 37).alias("host_id"),
                "status")
        .join(F.broadcast(ch.select("host_id", "churn")), "host_id")
        .select("doc_id", "host_id", "status", "churn")
    )


def host_dup_stats(docs: DataFrame, n_hosts: int = 37) -> DataFrame:
    """(host_id, n_docs, n_dup, dup_rate): per-host exact-duplicate
    load — how much of each host's crawl is byte-identical content
    (mirror sites, session-id URL aliases). A doc is a duplicate when
    it is not its content group's canonical min-doc_id. One md5
    groupBy + one fingerprint-keyed join + one host-keyed groupBy;
    exact counts, ONE division."""
    fp = F.md5(F.col("text").cast("binary")).alias("fp")
    keep = docs.select(fp, "doc_id").groupBy("fp").agg(
        F.min("doc_id").alias("keep_id"))
    j = docs.select("doc_id", fp).join(keep, "fp")
    return (
        j.groupBy((F.col("doc_id") % n_hosts).alias("host_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("doc_id") != F.col("keep_id")).cast("bigint"))
            .alias("n_dup"),
        )
        .select(
            "host_id", "n_docs", "n_dup",
            (F.col("n_dup").cast("double") / F.col("n_docs").cast("double"))
            .alias("dup_rate"),
        )
    )


MIRROR_MAX_GROUP = 64
MIRROR_MIN_SHARED = 2


def mirror_pairs_from_postings(posting: DataFrame,
                               max_group: int = MIRROR_MAX_GROUP,
                               min_shared: int = MIRROR_MIN_SHARED
                               ) -> DataFrame:
    """(host_a, host_b, n_shared) from a (fp, host) DISTINCT posting
    frame: content groups with more than ``max_group`` distinct hosts
    are dropped BEFORE the self-join (a boilerplate page served by
    every host would go quadratic — and is exactly the content that
    does NOT indicate mirroring), then one equi-join on fp with
    a < b and a map-side-combined pair count; ``min_shared`` keeps
    the output a deterministic set of real mirror signals. The
    winnowing posting-list shape."""
    small = (
        posting.groupBy("fp").agg(F.count(F.lit(1)).alias("g"))
        .where(F.col("g") <= max_group)
        .select("fp")
    )
    kept = posting.join(small, "fp", "left_semi")
    l, r = kept.alias("l"), kept.alias("r")
    return (
        l.join(r, (F.col("l.fp") == F.col("r.fp"))
               & (F.col("l.host") < F.col("r.host")))
        .select(F.col("l.host").alias("host_a"),
                F.col("r.host").alias("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def host_mirror_pairs(docs: DataFrame, n_hosts: int = 37,
                      max_group: int = MIRROR_MAX_GROUP,
                      min_shared: int = MIRROR_MIN_SHARED) -> DataFrame:
    """Host pairs serving byte-identical content — the mirror/
    alias-site detector every crawler runs so it stops fetching the
    same corpus twice. Postings are one md5 groupBy-distinct away;
    the rest is `mirror_pairs_from_postings`."""
    posting = (
        docs.select(
            F.md5(F.col("text").cast("binary")).alias("fp"),
            (F.col("doc_id") % n_hosts).alias("host"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    return mirror_pairs_from_postings(posting, max_group, min_shared)


def host_mirror_pairs_demo(docs: DataFrame) -> DataFrame:
    """Gate construction: the corpus has no natural cross-host exact
    dups (dedup_exact shows one group per doc), so the demo PLANTS a
    deterministic mirror — every doc with doc_id % 9 == 0 is also
    served by host (doc_id % 37 + 5) % 37 — and runs the real
    detector over base ∪ mirror postings (mirrored verbatim in SQL)."""
    base = docs.select(
        F.md5(F.col("text").cast("binary")).alias("fp"),
        (F.col("doc_id") % 37).alias("host"), "doc_id")
    mirror = base.where(F.col("doc_id") % 9 == 0).select(
        "fp", ((F.col("doc_id") % 37 + 5) % 37).alias("host"), "doc_id")
    posting = (
        base.unionByName(mirror).select("fp", "host").distinct()
        .localCheckpoint(eager=True)
    )
    return mirror_pairs_from_postings(posting)


# ------------------------------------------------------- URL canonicalization

def synthetic_urls(docs: DataFrame) -> DataFrame:
    """(doc_id, url): a deterministic MESSY url per document — every
    canonicalization hazard a crawl frontier actually sees, derived
    from doc_id alone (no external data; mirrored verbatim in SQL):

    - scheme case-insensitive host with optional ``WWW.`` prefix
      (doc_id % 3 == 0) and mixed case (``Host{d%5}.Example.COM``),
    - explicit DEFAULT port (``:80`` http / ``:443`` https) when
      doc_id % 4 == 0,
    - path with a duplicate slash and a ``/./`` dot segment; docs with
      doc_id % 6 == 0 end in a trailing slash instead of ``.html``,
    - tracking params (``utm_*``) mixed with real ones, unsorted
      (doc_id % 5 == 0 carries a real ``id`` param; % 5 == 1 carries
      ONLY tracking params),
    - a fragment (doc_id % 7 == 0).

    Constructed so distinct raw urls COLLIDE after normalization
    (spacing-30 doc_id pairs share host/path buckets but differ in
    www/port/fragment/utm noise) — the alias structure
    ``url_normalize_demo`` counts."""
    d = F.col("doc_id")
    scheme = F.when(d % 2 == 0, F.lit("http")).otherwise(F.lit("https"))
    host = F.concat(
        F.when(d % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("Host"), (d % 5).cast("string"), F.lit(".Example.COM"))
    port = F.when(
        d % 4 == 0,
        F.when(d % 2 == 0, F.lit(":80")).otherwise(F.lit(":443")),
    ).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/cat"), (d % 3).cast("string"), F.lit("//item/./page"),
        (d % 10).cast("string"),
        F.when(d % 6 == 0, F.lit("/")).otherwise(F.lit(".html")))
    query = (
        F.when(d % 5 == 0,
               F.concat(F.lit("?utm_source=feed&id="),
                        (d % 100).cast("string"),
                        F.lit("&utm_campaign=x&b=2&a=1")))
        .when(d % 5 == 1, F.lit("?utm_medium=rss"))
        .otherwise(F.lit("")))
    frag = F.when(d % 7 == 0,
                  F.concat(F.lit("#sec"), (d % 5).cast("string"))
                  ).otherwise(F.lit(""))
    return docs.select(
        "doc_id",
        F.concat(scheme, F.lit("://"), host, port, path, query, frag)
        .alias("url"),
    )


def normalize_urls(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds ``url_norm`` + ``host``: the canonicalization pass a crawl
    pipeline runs before frontier dedup and before URL-keyed joins —
    entirely JVM column expressions (regex + array ops), zero shuffle,
    zero UDF; at 100 TB this runs at scan speed with column pruning.

    Rules (fixed order, each mirrored in the DuckDB oracle):
    1. drop the fragment,
    2. lowercase scheme and host, strip a leading ``www.``,
    3. strip explicit DEFAULT ports (``:80`` http, ``:443`` https);
       non-default ports survive,
    4. collapse duplicate slashes, remove ``/./`` dot segments (applied
       twice — non-overlapping regex replacement misses nested runs),
    5. drop ``utm_*`` tracking params, SORT the survivors (param order
       is not semantic), drop the ``?`` when none survive,
    6. strip a trailing slash (except the bare root path).
    """
    u1 = F.regexp_replace(F.col(url_col), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u1, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u1, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    host = F.regexp_replace(
        F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1)),
        r"^www\.", "")
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    is_default = (
        ((scheme == "http") & (port == F.lit("80")))
        | ((scheme == "https") & (port == F.lit("443"))))
    port_norm = F.when((port == "") | is_default, F.lit("")).otherwise(
        F.concat(F.lit(":"), port))
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"//+", "/")
    path = F.regexp_replace(F.regexp_replace(path, r"/\./", "/"),
                            r"/\./", "/")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(path != "/", F.regexp_replace(path, r"/+$", "")
                  ).otherwise(path)
    params = F.filter(
        F.split(F.regexp_extract(pathq, r"\?(.*)$", 1), "&"),
        lambda p: (p != "") & ~p.startswith("utm_"))
    qnorm = F.array_join(F.sort_array(params), "&")
    qpart = F.when(qnorm == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), qnorm))
    return urls.withColumn("host", host).withColumn(
        "url_norm",
        F.concat(scheme, F.lit("://"), host, port_norm, path, qpart))


def url_normalize_demo(docs: DataFrame) -> DataFrame:
    """(doc_id, url, url_norm, host, n_aliases): canonicalize the
    synthetic messy urls and count, per canonical form, how many
    DISTINCT raw spellings collapsed onto it — the frontier-dedup
    signal (n_aliases > 1 = the crawler would have fetched the same
    resource again under a different spelling). One groupBy(url_norm)
    with map-side combine + one broadcast-or-shuffle join back; at web
    scale both sides are bucketed by url_norm."""
    normed = normalize_urls(synthetic_urls(docs)).localCheckpoint(
        eager=True)
    aliases = normed.groupBy("url_norm").agg(
        F.countDistinct("url").alias("n_aliases"))
    return normed.join(aliases, "url_norm").select(
        "doc_id", "url", "url_norm", "host", "n_aliases")


# ------------------------------------------------------- anchor text rollup

def anchor_text_topk(edges_dir: DataFrame, docs: DataFrame, *,
                     mod: int, title_len: int = 3, k: int = 5) -> DataFrame:
    """(dst, rnk, term, n): each target page's top-``k`` anchor terms,
    aggregated over ALL pages linking to it — the web-index primitive
    (how search engines describe a page by what its in-links say, and
    how Common-Crawl-style anchor corpora are built). The anchor text
    for an edge (src, dst) stands in as the first ``title_len`` tokens
    of the src page's document (synthetic substrate: doc → vertex via
    ``doc_id % mod``; on a real crawl it's the <a> text — everything
    downstream of the title projection is identical).

    Scale shape: the |E|-row edges⋈titles hash join is the dominant
    cost and shuffles on ``src`` (title side is |docs| rows, typically
    broadcast); the per-(dst, term) count gets map-side partials; the
    top-k window partitions by DST — a page's distinct in-link
    vocabulary bounds the partition, never a global order. Tie-break
    (n DESC, term ASC) is total, so the k-cut is engine-independent."""
    titles = docs.select(
        (F.col("doc_id") % mod).alias("src"),
        F.slice(F.split(F.col("text"), " "), 1, title_len).alias("_terms"),
    )
    counts = (
        edges_dir.join(titles, "src")
        .select("dst", F.explode("_terms").alias("term"))
        .groupBy("dst", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("dst").orderBy(F.desc("n"), F.asc("term"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("dst", "rnk", "term", "n")
    )


# ------------------------------------------- learned tracking-param mining

def synthetic_fetches(docs: DataFrame, *, n_hosts: int = 20,
                      n_paths: int = 7, sess_mod: int = 5) -> DataFrame:
    """(url, h): a deterministic fetch log over the documents table —
    every doc fetched once, even docs re-fetched with a DIFFERENT
    session param but identical content (h = md5(text) stands in for
    the page checksum). Constructed so the mining below has positive
    AND negative evidence: ``sess`` varies under fixed content
    (content-neutral), while urls differing only in ``id`` carry
    different docs' content (content-bearing). Mirrored verbatim in
    the DuckDB oracle."""
    d = F.col("doc_id")
    path = F.concat(F.lit("http://h"), (d % n_hosts).cast("string"),
                    F.lit(".ex/p"), (d % n_paths).cast("string"))
    h = F.md5(F.col("text"))
    a = docs.select(
        F.concat(path, F.lit("?id="), d.cast("string"),
                 F.lit("&sess="), (d % sess_mod).cast("string")).alias("url"),
        h.alias("h"))
    b = docs.where(d % 2 == 0).select(
        F.concat(path, F.lit("?id="), d.cast("string"),
                 F.lit("&sess="),
                 ((d + 1) % sess_mod).cast("string")).alias("url"),
        h.alias("h"))
    return a.unionAll(b)


def mine_tracking_params(fetches: DataFrame) -> DataFrame:
    """(param, n_groups, n_multi, n_dirty, neutral): LEARN which URL
    query params are content-neutral from a fetch log — the data-driven
    generalization of ``normalize_urls``'s hardcoded ``utm_*`` rule
    (DustBuster-style "different URLs, same text" rule mining). For
    each fetch and each param p it carries, the fetch is keyed by the
    URL WITH p REMOVED (path + the other params, sorted). Fetches
    agreeing on that key differ only in p; a key-group with >1 fetch is
    EVIDENCE about p: all content hashes equal → p didn't matter
    (clean), any disagreement → p selects content (dirty). A param is
    ``neutral`` iff it has at least one multi-fetch group and zero
    dirty ones — "no evidence" is not "neutral", so unseen params
    never get stripped.

    Scale shape: one narrow projection explodes each fetch into its
    ≤|params| rows (bounded small per URL); the only shuffles are the
    groupBy on (param, base_key) — partial-aggregated, key cardinality
    ≤ the fetch count × params — and the tiny per-param rollup.
    ``base_key`` is built by an array filter CAPTURING the exploded
    param (no positional self-join), identical lambda semantics on
    both engines."""
    f = fetches.select(
        "url", "h",
        F.split(F.col("url"), r"\?").getItem(0).alias("path"),
        F.split(F.split(F.col("url"), r"\?").getItem(1), "&").alias("params"),
    )
    t = f.select(
        "h", "path", "params", F.explode("params").alias("p"),
    ).select(
        F.split(F.col("p"), "=").getItem(0).alias("param"),
        F.concat(
            F.col("path"), F.lit("?"),
            F.array_join(
                F.array_sort(F.filter(
                    F.col("params"), lambda q: q != F.col("p"))),
                "&"),
        ).alias("base_key"),
        "h",
    )
    groups = t.groupBy("param", "base_key").agg(
        F.count(F.lit(1)).alias("n_fetch"),
        F.countDistinct("h").alias("n_hash"),
    )
    return groups.groupBy("param").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("n_fetch") > 1).cast("bigint")).alias("n_multi"),
        F.sum(((F.col("n_fetch") > 1) & (F.col("n_hash") > 1))
              .cast("bigint")).alias("n_dirty"),
    ).select(
        "param", "n_groups", "n_multi", "n_dirty",
        ((F.col("n_multi") > 0) & (F.col("n_dirty") == 0)).alias("neutral"),
    )


def param_mining_demo(docs: DataFrame) -> DataFrame:
    """Gate composition: mine the synthetic fetch log — ``sess`` must
    come out neutral (re-fetches under fixed content), ``id`` dirty
    (same-path-same-sess url groups carry different docs)."""
    return mine_tracking_params(synthetic_fetches(docs))


# --------------------------------------------------- crawl scheduling ops

def politeness_schedule(scored: DataFrame, *, rate: int = 3) -> DataFrame:
    """(doc_id, host_id, rnk_in_host, fetch_round): turn a prioritized
    frontier into a POLITE schedule — every host serves at most
    ``rate`` fetches per round, highest-priority pages first, so the
    crawler never hammers one origin however big its backlog. Input is
    ``scored(doc_id, host_id, score)``; within a host the order is
    (score DESC, doc_id ASC) — a total order, so round assignment is
    engine-independent. ``fetch_round`` = ceil(rnk/rate) via integer
    arithmetic (no float ceil).

    Scale shape: ONE window partitioned by HOST — a host's backlog
    bounds the partition, never a global sort; everything else is
    narrow arithmetic. The round-robin interleaving across hosts is
    implicit (equal rounds run concurrently), so no global coordination
    state exists at all."""
    from pyspark.sql import Window

    w = Window.partitionBy("host_id").orderBy(
        F.desc("score"), F.asc("doc_id"))
    rnk = F.row_number().over(w)
    return scored.select(
        "doc_id", "host_id", rnk.alias("rnk_in_host"),
        ((rnk + rate - 1) / rate).cast("bigint").alias("fetch_round"),
    )


def politeness_schedule_demo(docs: DataFrame, *, rate: int = 3,
                             n_hosts: int = 37) -> DataFrame:
    """Gate composition: quality-scored docs, host = doc_id % n_hosts,
    scheduled at ``rate`` fetches per host per round."""
    from .quality import quality_score

    scored = quality_score(docs).select(
        "doc_id", (F.col("doc_id") % n_hosts).alias("host_id"),
        F.col("quality_score").alias("score"))
    return politeness_schedule(scored, rate=rate)


def crawl_budget(weights: DataFrame, *, total: int = 10000) -> DataFrame:
    """(host, w, alloc): apportion ``total`` fetch slots across hosts
    proportionally to a non-negative weight column by the
    LARGEST-REMAINDER (Hamilton) method — the deterministic budget
    split a crawl coordinator hands each fetcher fleet per cycle:
    alloc_i = floor(total·w_i/Σw) + 1 for the R = total − Σfloor hosts
    with the largest fractional parts (tie: host ASC). Σalloc == total
    exactly, by construction.

    Scale shape: the weight frame is host-cardinality (small by
    definition — it's the output of a quotient rollup), so the single
    full-frame window ordering fractional parts is bounded by |hosts|,
    and both scalar aggregates (Σw, Σfloor) ride broadcast 1-row
    crossJoins — no driver float re-enters the plan. The floor of
    identical doubles is engine-independent; fractional-part ordering
    compares identical doubles, so the R-cut is too."""
    from pyspark.sql import Window

    w = weights.select("host", F.col("w").cast("double").alias("w"))
    tot = w.agg(F.sum("w").alias("_s"))
    quota = (
        w.crossJoin(F.broadcast(tot))
        .withColumn("_q", F.lit(float(total)) * F.col("w") / F.col("_s"))
        .withColumn("_base", F.floor("_q").cast("bigint"))
        .withColumn("_frac", F.col("_q") - F.col("_base"))
    )
    rsum = quota.agg((F.lit(total) - F.sum("_base")).alias("_r"))
    win = Window.orderBy(F.desc("_frac"), F.asc("host"))
    return (
        quota.crossJoin(F.broadcast(rsum))
        .withColumn("_rnk", F.row_number().over(win))
        .select(
            "host", "w",
            (F.col("_base")
             + (F.col("_rnk") <= F.col("_r")).cast("bigint")).alias("alloc"),
        )
    )


def crawl_budget_demo(edges_dir: DataFrame, *, total: int = 10000) -> DataFrame:
    """Gate composition: weights = each host's outgoing link budget
    from the quotient rollup (quotient.host_stats.out_links)."""
    from .quotient import host_graph, host_stats

    w = host_stats(host_graph(edges_dir)).select(
        "host", F.col("out_links").cast("double").alias("w"))
    return crawl_budget(w, total=total)


def recrawl_rate(churn_frame: DataFrame, *, epoch_days: float = 7.0,
                 min_interval: float = 1.0,
                 max_interval: float = 90.0) -> DataFrame:
    """(host_id, churn, lambda_hat, revisit_days): per-host Poisson
    change-rate estimation and revisit-interval assignment — the
    Cho–Garcia-Molina refresh policy a crawl scheduler closes the loop
    with: observing fraction p of a host's pages changed over an epoch
    of ``epoch_days``, the MLE of the per-page Poisson change rate is
    λ̂ = −ln(1−p)/epoch_days, and the uniform-freshness revisit
    interval is 1/λ̂ clamped to [min_interval, max_interval] days.
    Degenerate ends: p = 0 → λ̂ = 0 → revisit at the max cap; p = 1 →
    λ̂ undefined (carried as NULL) → revisit at the min cap (every
    observation changed: revisit as fast as allowed).

    Float discipline: churn is an exact-integer ratio (identical
    doubles on both engines); λ̂ is ROUNDED to 6 dp straight off the
    log (the house LN convention — Spark's and DuckDB's LN can differ
    by 1 ulp), and the interval is computed FROM the rounded λ̂ so
    every downstream comparison sees identical doubles. One narrow
    projection over the |hosts|-row churn frame — no shuffle."""
    p = F.col("churn")
    lam = F.when(
        p < 1.0,
        F.round(-F.log(F.lit(1.0) - p) / F.lit(epoch_days), 6))
    revisit = (
        F.when(p >= 1.0, F.lit(min_interval))
        .when(p <= 0.0, F.lit(max_interval))
        .otherwise(F.round(
            F.least(F.greatest(F.lit(1.0) / lam, F.lit(min_interval)),
                    F.lit(max_interval)), 6))
    )
    return churn_frame.select(
        "host_id", F.round(p, 6).alias("churn"),
        lam.alias("lambda_hat"), revisit.alias("revisit_days"),
    )


def recrawl_rate_demo(docs: DataFrame) -> DataFrame:
    """Gate composition: crawl delta → per-host churn → refresh
    policy."""
    return recrawl_rate(host_churn(crawl_delta_demo(docs)))


# Bloom-filter frontier admission: at 10^12 frontier URLs the exact
# anti-join against full crawl history (run_stream_frontier) is a
# per-batch O(history) shuffle; the standard sidecar is a Bloom filter
# over the seen set — constant-size, mergeable, probed map-side. The
# demo sizes (m, k) so the graded corpora exercise BOTH error branches
# (real false positives alongside true hits); production sizes m for
# the target FP rate and shards the filter by url-hash range so each
# partition probes only its own slice.
# m=64 probed against 128/256 at the gate scales: 6 of the 11 truly
# new urls false-positive (the Bloom path would skip them) while 5
# admit cleanly — both branches of the one-sided error carry mass
BLOOM_M_BITS = 64
BLOOM_K_HASHES = 2


def bloom_admission_demo(docs: DataFrame, m_bits: int = BLOOM_M_BITS,
                         k_hashes: int = BLOOM_K_HASHES, mod: int = 9,
                         seen_mod: int = 7) -> DataFrame:
    """(doc_id, url_norm, exact_seen, bloom_seen, false_pos): the
    frontier_stream split (arriving = doc_id % mod == 0, seen = the
    rest with doc_id % seen_mod == 0, both canonicalized), admission
    answered BOTH ways — exactly (semi join on url_norm) and via a
    Bloom filter whose occupied-bit set is built from the seen side
    (bit j of url u = md5(u + '#' + j) low-32 % m). bloom_seen=1 iff
    every one of the url's distinct bit positions is occupied;
    false_pos marks the Bloom path's one-sided error (bloom says seen,
    exact says new — the admission a Bloom frontier would wrongly
    skip; the converse cannot occur, which the gate re-proves row by
    row).

    Scale shape: the filter IS the distinct position set — O(m) rows
    regardless of history size — and the probe is a position-keyed
    semi join, map-side after broadcast; nothing ever joins arriving
    against raw history."""
    from .features import _md5_int

    base = normalize_urls(synthetic_urls(docs))
    seen = (
        base.where((F.col("doc_id") % mod != 0)
                   & (F.col("doc_id") % seen_mod == 0))
        .select("url_norm").distinct()
    )
    arriving = (
        base.where(F.col("doc_id") % mod == 0)
        .select("doc_id", "url_norm")
    )

    def positions(u):
        return F.array_distinct(F.transform(
            F.sequence(F.lit(0), F.lit(k_hashes - 1)),
            lambda j: (_md5_int(
                F.concat(u, F.lit("#"), j.cast("string"))
            ) % F.lit(m_bits)),
        ))

    occupied = (
        seen.select(F.explode(positions(F.col("url_norm"))).alias("pos"))
        .distinct()
    )
    probe = arriving.select(
        "doc_id", "url_norm",
        F.size(positions(F.col("url_norm"))).alias("n_pos"),
        F.explode(positions(F.col("url_norm"))).alias("pos"),
    )
    hitcnt = (
        probe.join(F.broadcast(occupied), "pos", "left_semi")
        .groupBy("doc_id", "url_norm")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    exact = seen.select("url_norm", F.lit(1).alias("is_seen"))
    return (
        arriving
        .withColumn("n_pos", F.size(positions(F.col("url_norm"))))
        .join(hitcnt, ["doc_id", "url_norm"], "left")
        .join(exact, "url_norm", "left")
        .select(
            "doc_id", "url_norm",
            F.coalesce(F.col("is_seen"), F.lit(0)).cast("long")
            .alias("exact_seen"),
            F.when(F.coalesce(F.col("n_hit"), F.lit(0)) == F.col("n_pos"),
                   F.lit(1)).otherwise(F.lit(0)).cast("long")
            .alias("bloom_seen"),
        )
        .withColumn(
            "false_pos",
            ((F.col("bloom_seen") == 1) & (F.col("exact_seen") == 0))
            .cast("long"),
        )
    )


# rendezvous (highest-random-weight) hashing, Thaler-Ravishankar 1996:
# the stateless shard router crawl fleets use for host→fetcher
# assignment. Its defining guarantee — removing a node moves ONLY the
# hosts that lived on it — is what the demo proves row by row.
HRW_NODES = 5
HRW_HOSTS = 200  # url_normalize's 5 canonical hosts are too few to
# evidence balance/disruption; the demo hashes doc_ids into a 200-host
# universe instead (same derivation both engines)


def hrw_sharding_demo(docs: DataFrame, n_nodes: int = HRW_NODES,
                      n_hosts: int = HRW_HOSTS) -> DataFrame:
    """(host, node, node_after, moved): each host's rendezvous
    assignment under ``n_nodes`` fetcher nodes and under the same
    fleet with the LAST node removed. weight(host, j) =
    md5-low-32(host + '#' + j); the winner is the max weight with
    first-index tie-break, all computed as one narrow array expression
    per host — no shuffle, no routing table, no coordination state,
    which is exactly why a 10^9-host frontier can route map-side.
    moved=1 rows must be precisely the node == n_nodes-1 rows (HRW's
    minimal-disruption property; the paired test asserts it)."""
    from .features import _md5_int

    hosts = docs.select(
        F.concat(F.lit("host"), (F.col("doc_id") % n_hosts).cast("string"),
                 F.lit(".example")).alias("host")
    ).distinct()

    def weights(upto):
        return F.transform(
            F.sequence(F.lit(0), F.lit(upto - 1)),
            lambda j: _md5_int(
                F.concat(F.col("host"), F.lit("#"), j.cast("string"))),
        )

    ws = weights(n_nodes)
    ws_after = weights(n_nodes - 1)
    return hosts.select(
        "host",
        (F.array_position(ws, F.array_max(ws)) - 1).cast("long")
        .alias("node"),
        (F.array_position(ws_after, F.array_max(ws_after)) - 1)
        .cast("long").alias("node_after"),
    ).withColumn(
        "moved",
        (F.col("node") != F.col("node_after")).cast("long"),
    )
