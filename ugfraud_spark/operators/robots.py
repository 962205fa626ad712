"""Robots-style crawl admission: per-host path-prefix allow/deny rules
with LONGEST-MATCH-WINS semantics (RFC 9309 §2.2.2) — the per-URL
admission decision every crawl frontier applies before fetching, and
the missing gatekeeper stage in front of the engine's recrawl / keep
pipelines (the reference assumes an already-admitted snapshot).

The rule table is tiny (hosts × a handful of prefixes) and BROADCAST;
matching is one broadcast hash join on host plus a `startswith`
filter, then one map-side-combinable `max_by` groupBy per URL picks
the longest matching rule. No windows, no global sort; the shuffled
frame is (matched candidate rules) ≈ rules-per-host × |urls| rows of
~30 bytes — at 10^12 URLs this is the same shape as any per-doc
aggregate. Default-allow is modeled as an explicit '/' rule so every
URL has ≥1 match and the groupBy never drops rows.

The demo rule set is a deterministic pure function of the host id
(mirrored verbatim in the DuckDB oracle — no external data), with
overlapping prefixes on purpose: '/' < '/src' < '/src1' < '/src12' <
'/src7/en' exercise the longest-match override chain both ways
(deny-overriding-allow and allow-overriding-deny).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HOSTS = 37  # demo host fold: host_id = doc_id % N_HOSTS


def doc_urls(docs: DataFrame) -> DataFrame:
    """(doc_id, host_id, path): the demo URL synthesis — host folded
    from doc_id, path '/<source>/<lang>/<doc_id>' (real pipelines
    parse these from the url column; the matching below is shape-
    identical either way)."""
    return docs.select(
        "doc_id",
        (F.col("doc_id") % N_HOSTS).alias("host_id"),
        F.concat(
            F.lit("/"), F.col("source"), F.lit("/"), F.col("lang"),
            F.lit("/"), F.col("doc_id").cast("string"),
        ).alias("path"),
    )


def demo_rules(urls: DataFrame) -> DataFrame:
    """(host_id, prefix, allow): the deterministic per-host rule set.
    Every host gets the default-allow '/' rule; hosts with
    host_id % 3 == 0 deny '/src1' but re-allow the longer '/src12';
    hosts with host_id % 4 == 1 deny '/src' but re-allow '/src7/en'.
    Prefix lengths are distinct per host (1/4/5/6/8), so longest-match
    is unambiguous."""
    hosts = urls.select("host_id").distinct()

    def rule(cond, prefix: str, allow: bool) -> DataFrame:
        h = hosts.where(cond) if cond is not None else hosts
        return h.select(
            "host_id", F.lit(prefix).alias("prefix"),
            F.lit(allow).alias("allow"))

    return (
        rule(None, "/", True)
        .unionByName(rule(F.col("host_id") % 3 == 0, "/src1", False))
        .unionByName(rule(F.col("host_id") % 3 == 0, "/src12", True))
        .unionByName(rule(F.col("host_id") % 4 == 1, "/src", False))
        .unionByName(rule(F.col("host_id") % 4 == 1, "/src7/en", True))
    )


def robots_admission(urls: DataFrame, rules: DataFrame) -> DataFrame:
    """(doc_id, host_id, allowed, rule_prefix): longest-match-wins
    admission per URL. `rules` must include a default rule matching
    every path (the demo's '/'), so the inner join is total."""
    m = (
        urls.join(F.broadcast(rules), "host_id")
        .where(F.col("path").startswith(F.col("prefix")))
    )
    plen = F.length("prefix")
    return m.groupBy("doc_id", "host_id").agg(
        F.max_by("allow", plen).alias("allowed"),
        F.max_by("prefix", plen).alias("rule_prefix"),
    )


def robots_admission_demo(docs: DataFrame) -> DataFrame:
    urls = doc_urls(docs)
    return robots_admission(urls, demo_rules(urls))
