"""Host-graph (quotient) collapse of the page-level link graph.

The canonical web-graph coarsening: map every page vertex to its host
and aggregate page-level links into a weighted host-level multigraph
(the "host graph" / "domain graph" published alongside every
Common-Crawl web-graph release). The host map here is the deterministic
stand-in matching the synthetic pages substrate (``sources/pages._url``
buckets pages into ``site{i % 100}.example``): ``host(v) = v % n_hosts``.
On a real crawl the map is ``F.parse_url(url, "HOST")`` — everything
downstream of the two projection expressions is identical.

Scale shape: the collapse is ONE groupBy on (src_host, dst_host) with a
map-side-combinable count — the shuffle carries at most |hosts|² rows
regardless of |E| (10^12 page edges → ~10^7-row host graph for 10^5
hosts). Host keys are exactly the hub-skewed keys AQE's skew-join
handling exists for; no salting is needed on the aggregate itself
because partial aggregation bounds any one reducer's input by the
number of map partitions, not by the host's page count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HOSTS = 100  # mirrors sources/pages._url: site{i % 100}


def host_graph(edges_dir: DataFrame, n_hosts: int = N_HOSTS) -> DataFrame:
    """Directed page edges(src, dst) → host quotient graph
    (src_host, dst_host, n_links) where n_links counts the page-level
    edges collapsed into the host pair (intra-host pairs kept — they
    are the self-loops whose mass the intra fraction reads off)."""
    return (
        edges_dir.select(
            (F.col("src") % n_hosts).alias("src_host"),
            (F.col("dst") % n_hosts).alias("dst_host"),
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def host_stats(host_edges: DataFrame) -> DataFrame:
    """Host quotient edges → per-source-host link budget:
    (host, out_links, intra_links, intra_frac). ``intra_frac`` — the
    fraction of a host's outgoing page links that stay on the host —
    is the standard crawl-frontier prioritisation signal."""
    flagged = host_edges.select(
        F.col("src_host").alias("host"),
        "n_links",
        F.when(F.col("src_host") == F.col("dst_host"), F.col("n_links"))
        .otherwise(F.lit(0))
        .alias("intra"),
    )
    return (
        flagged.groupBy("host")
        .agg(
            F.sum("n_links").alias("out_links"),
            F.sum("intra").alias("intra_links"),
        )
        .select(
            "host",
            "out_links",
            "intra_links",
            F.round(
                F.col("intra_links").cast("double")
                / F.col("out_links").cast("double"),
                6,
            ).alias("intra_frac"),
        )
    )


def host_top_pages(scores: DataFrame, score_col: str,
                   n_hosts: int = N_HOSTS, k: int = 3) -> DataFrame:
    """scores(id, <score_col>) → (host, rnk, id, score): each host's
    top-``k`` pages by score — the per-group top-k every crawl report
    ships ("best page per site"). The window partitions by HOST (a
    host's page count bounds the partition; never a global order);
    ranking on the 6-dp-rounded score with an id tiebreak is a total
    order, so the k-cut is engine-independent."""
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy(
        F.desc("score"), F.asc("id"))
    return (
        scores.select(
            (F.col("id") % n_hosts).alias("host"), "id",
            F.col(score_col).alias("score"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("host", "rnk", "id", "score")
    )


ENTROPY_LANGS = ("de", "en", "es", "fr", "zh")  # fixed summation order


def host_lang_entropy(docs: DataFrame, n_hosts: int = 37) -> DataFrame:
    """(host_id, n_docs, entropy): Shannon entropy of each host's
    language mix — the per-source diversity diagnostic a multilingual
    mixing pipeline reads next to tokenizer fertility (entropy 0 =
    monolingual host; ln(5) ≈ 1.609 = uniform over the five corpus
    languages).

    Float discipline: per-language counts are exact BIGINTs from ONE
    conditional-sum groupBy (no pivot shuffle); the entropy is a
    SINGLE fixed-order expression −Σ (c/t)·ln(c/t) over the literal
    ENTROPY_LANGS order, so the five-term double summation is the
    same left-associated IEEE sequence on both engines (a dynamic
    per-lang SUM would be partition-order-dependent), ROUNDED to 6 dp
    — measured: Spark's and DuckDB's LN disagree by 1 ulp on some
    rational inputs (3/14 at sf0.01), so LN-bearing outputs take the
    house PMI/collocations convention rather than gating raw.
    Languages outside the literal set would need a sixth term —
    asserted against at the gate by construction of the corpus."""
    counts = [
        F.sum((F.col("lang") == lang).cast("bigint")).alias(f"c_{lang}")
        for lang in ENTROPY_LANGS
    ]
    g = docs.groupBy((F.col("doc_id") % n_hosts).alias("host_id")).agg(
        F.count(F.lit(1)).alias("n_docs"), *counts)
    term = None
    for lang in ENTROPY_LANGS:
        r = F.col(f"c_{lang}").cast("double") / F.col("n_docs").cast("double")
        t = F.when(F.col(f"c_{lang}") > 0, r * F.log(r)).otherwise(F.lit(0.0))
        term = t if term is None else term + t
    return g.select("host_id", "n_docs",
                    F.round(-term, 6).alias("entropy"))


def inlink_concentration(host_edges: DataFrame) -> DataFrame:
    """Host quotient edges → per-DESTINATION-host in-link source
    concentration: (host, in_links, n_src_hosts, top_share, hhi).

    The nepotistic-link / link-farm signal (Fetterly et al.'s spam
    heuristics; the TrustRank paper's motivating structure): a host
    whose in-link mass comes overwhelmingly from one or two source
    hosts is propped up, not endorsed. ``hhi`` is the Herfindahl index
    Σ share_i² of the source-host shares (1 = single-source; → 0 =
    diversified), ``top_share`` the largest single source's share.
    Intra-host self-links are excluded — a host linking to itself is
    navigation, not endorsement, and would otherwise dominate both
    ratios for every large site.

    Scale shape: input is the already-collapsed host graph (≤ |hosts|²
    rows), so this is one map-side-combinable groupBy(dst_host) over a
    frame many orders smaller than |E|; shares and HHI are single
    fixed-order expressions over exact BIGINT link counts, rounded to
    6 dp for cross-engine gating."""
    inter = host_edges.where(F.col("src_host") != F.col("dst_host"))
    g = inter.groupBy(F.col("dst_host").alias("host")).agg(
        F.sum("n_links").alias("in_links"),
        F.count(F.lit(1)).alias("n_src_hosts"),
        F.max("n_links").alias("_top"),
        F.sum(F.col("n_links") * F.col("n_links")).alias("_sq"),
    )
    tot = F.col("in_links").cast("double")
    return g.select(
        "host", "in_links", "n_src_hosts",
        F.round(F.col("_top").cast("double") / tot, 6).alias("top_share"),
        F.round(F.col("_sq").cast("double") / (tot * tot), 6).alias("hhi"),
    )
