"""Distributed tall-skinny SVD for the spectral detectors (fBox, SVD).

The reference calls ``scipy.sparse.linalg.svds`` on a single-node matrix
(``fBox.py:58``, ``SVD.py:54``). Spark-first equivalent for a matrix
whose *column* dimension (products) is the small side — true for
bipartite review graphs (YelpChi: 201 products × 38k users) and for
host-level web graphs:

1. assign dense column indices (sorted dst → 0..n_cols-1),
2. accumulate the Gram matrix AᵀA with **per-partition numpy outer
   products inside mapInPandas** (one (n_cols × n_cols) partial per
   partition, shipped as nonzero (j1, j2, v) triples, groupBy-sum) —
   never the O(Σdeg²) pairwise co-occurrence self-join, which explodes
   on hub users,
3. ``numpy.linalg.eigh`` of the (small) Gram on the driver →
   V, s = sqrt(eig); U·Σ row norms are then computed distributively:
   norm(A_i·V) per row via a broadcast V and one groupBy.

At 10^12 docs with a large column side this becomes randomized-sketch
SVD (Halko et al.): replace V by A·Ω for a k+p Gaussian test matrix —
same plumbing, the Gram shrinks to (k+p)². The exact-Gram path is kept
because the sandbox column side is small and parity needs exactness.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# below this distinct-column count the dense index is built on the
# driver (collect ids, sort, one Arrow createDataFrame — a bounded
# ≤8 MB transfer that Spark then auto-broadcasts into the consumer
# join); above it the distributed two-phase rank runs. Measured at
# sf0.1 (20k cols): 2.0s warm two-phase → 0.5s, same (dst, cidx) rows.
DENSE_IDX_COLLECT_MAX = 1_000_000


def dense_col_index(edges: DataFrame, n_parts: int = 32,
                    collect_max: int = DENSE_IDX_COLLECT_MAX) -> DataFrame:
    """(dst, cidx): deterministic dense 0-based index by sorted dst —
    the typed replacement for the reference's id↔idx dicts
    (``fBox.py:20-47``).

    Two-phase rank (scale-safe): range-partition the distinct ids, take
    local ranks inside each sorted partition in one Arrow pass, then add
    per-partition offsets (a tiny broadcast join). No global
    ``Window.orderBy`` — the old single-task funnel dies at a web-scale
    column side. A column side that fits the ``collect_max`` funnel
    skips the range shuffle entirely (same bounded-driver pattern as
    ``fraudar.PARITY_MAX_EDGES``)."""
    from typing import Iterator

    import pandas as pd

    d = edges.select("dst").distinct()
    # ONE distinct computation, not two: collect up to collect_max+1
    # rows — if fewer come back we already hold the whole id set (the
    # old count()-then-collect() ran the distinct aggregate twice,
    # measured ~2× the phase cost at sf0.1); the +1 row proves overflow
    # and routes to the distributed two-phase rank below.
    head = d.limit(collect_max + 1).collect()
    if len(head) <= collect_max:
        ids = sorted(r[0] for r in head)
        spark = edges.sparkSession
        return spark.createDataFrame(pd.DataFrame(
            {"dst": pd.Series(ids, dtype="int64"),
             "cidx": np.arange(len(ids), dtype="int32")}
        ))

    def local_rank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        for pdf in batches:
            if pdf.empty:
                continue
            yield pd.DataFrame({
                "dst": pdf["dst"],
                "_pid": pdf["_pid"],
                "_lrank": range(seen, seen + len(pdf)),
            })
            seen += len(pdf)

    ranked = (
        d
        .repartitionByRange(n_parts, "dst")
        .sortWithinPartitions("dst")
        .withColumn("_pid", F.spark_partition_id())
        .mapInPandas(local_rank, schema="dst long, _pid int, _lrank long")
        .localCheckpoint(eager=True)  # pin partitioning: both consumers below
    )
    counts = ranked.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    spark = edges.sparkSession
    rows = sorted((r["_pid"], r["_n"]) for r in counts.collect())
    offs, acc = [], 0
    for pid, n in rows:
        offs.append((pid, acc))
        acc += n
    off_df = spark.createDataFrame(offs or [(0, 0)], "_pid int, _off long")
    return (
        ranked.join(F.broadcast(off_df), "_pid")
        .select("dst", (F.col("_off") + F.col("_lrank")).cast("int").alias("cidx"))
    )


def gram_matrix(edges_idx: DataFrame, n_cols: int,
                weight_col: str | None = None) -> np.ndarray:
    """AᵀA for the matrix given as (src, cidx[, weight]) rows; binary
    entries when ``weight_col`` is None."""
    schema = T.StructType([
        T.StructField("j1", T.IntegerType()),
        T.StructField("j2", T.IntegerType()),
        T.StructField("v", T.DoubleType()),
    ])
    nc = n_cols
    wc = weight_col

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = np.zeros((nc, nc))
        # concat the partition's Arrow batches first: a src's row vector
        # must be outer-producted whole (cross terms are lost if one src
        # is split across batches); repartition("src") upstream already
        # guarantees a src never spans *partitions*
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        for _src, grp in pdf.groupby("src"):
            idx = grp["cidx"].to_numpy()
            w = grp[wc].to_numpy() if wc else np.ones(len(idx))
            g[np.ix_(idx, idx)] += np.outer(w, w)
        j1, j2 = np.nonzero(g)
        yield pd.DataFrame({"j1": j1.astype("int32"),
                            "j2": j2.astype("int32"),
                            "v": g[j1, j2]})

    parts = (
        edges_idx.repartition("src")
        .mapInPandas(partial, schema=schema)
        .groupBy("j1", "j2")
        .agg(F.sum("v").alias("v"))
        .toPandas()  # Arrow transfer — the Gram can be dense (n_cols² rows)
    )
    g = np.zeros((n_cols, n_cols))
    g[parts["j1"].to_numpy(), parts["j2"].to_numpy()] = parts["v"].to_numpy()
    return g


def topk_right_factors(gram: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(V[:, :k], s[:k]) with s descending, from the Gram eigensystem."""
    evals, evecs = np.linalg.eigh(gram)
    order = np.argsort(evals)[::-1][:k]
    s = np.sqrt(np.clip(evals[order], 0.0, None))
    return evecs[:, order], s


def row_projection_norms(edges_idx: DataFrame, v: np.ndarray) -> DataFrame:
    """(src, rec) where rec = ||A_i · V||₂ — the reconstructed out-degree
    of ``fBox.py:60``. V is broadcast; the sum of V-rows per src runs as
    k JVM-side sum aggregates (no Python in the agg)."""
    spark = edges_idx.sparkSession
    k = v.shape[1]
    vrows = spark.createDataFrame(
        [(int(j), [float(x) for x in v[j]]) for j in range(v.shape[0])],
        "cidx int, vrow array<double>",
    )
    j = edges_idx.join(F.broadcast(vrows), "cidx")
    sums = j.groupBy("src").agg(
        *[F.sum(F.col("vrow")[i]).alias(f"c{i}") for i in range(k)]
    )
    norm_expr = F.sqrt(sum(F.col(f"c{i}") * F.col(f"c{i}") for i in range(k)))
    return sums.select("src", norm_expr.alias("rec"))


def _segments(pdf: pd.DataFrame, wc: str | None):
    """Sort a partition's (src, cidx[, w]) rows by src and return the
    numpy views every sketch kernel needs."""
    pdf = pdf.sort_values("src", kind="mergesort")
    idx = pdf["cidx"].to_numpy()
    w = pdf[wc].to_numpy(dtype="float64") if wc else np.ones(len(idx))
    srcs = pdf["src"].to_numpy(dtype="int64")
    bounds = np.flatnonzero(np.r_[True, srcs[1:] != srcs[:-1]])
    return srcs, idx, w, bounds


# Cache-blocking target for the gather-multiply-reduceat kernels: the
# (edges × l) gathered temporary is materialized ~this many edge rows at
# a time (~4 MB at l=136/float32) so it stays L2/L3-resident instead of
# round-tripping DRAM three times per pass. Measured on the sandbox
# host (memory-bandwidth-starved, ~1 GB/s effective streaming): 9-13×
# on the sketch pass at sf0.1, bit-identical output (per-segment
# summation order is unchanged — blocks split at segment boundaries).
_CHUNK_EDGES = 8192


def _chunk_cuts(starts: np.ndarray, n_rows: int,
                target: int = _CHUNK_EDGES) -> np.ndarray:
    """Indices into ``starts`` splitting segments into blocks of ~target
    edges (always ≥1 segment per block; a single over-target segment
    gets its own block)."""
    cuts = [0]
    while cuts[-1] < len(starts):
        nxt = int(np.searchsorted(starts, starts[cuts[-1]] + target,
                                  side="left"))
        cuts.append(max(nxt, cuts[-1] + 1))
    return np.asarray(cuts)


def _segment_matmul(m: np.ndarray, idx: np.ndarray, w: np.ndarray | None,
                    bounds: np.ndarray) -> np.ndarray:
    """ys[i] = Σ_{e ∈ segment i} w[e]·m[idx[e]] — the A·M gather-reduce
    shared by every sketch/projection kernel, cache-blocked (see
    ``_CHUNK_EDGES``). Pass ``w`` pre-cast to ``m.dtype``."""
    n = len(idx)
    ys = np.empty((len(bounds), m.shape[1]), dtype=m.dtype)
    ends = np.r_[bounds[1:], n]
    cuts = _chunk_cuts(bounds, n)
    for ci in range(len(cuts) - 1):
        s0, s1 = cuts[ci], cuts[ci + 1]
        a, b = bounds[s0], ends[s1 - 1]
        tmp = m[idx[a:b]]  # fancy indexing copies — in-place below is safe
        if w is not None:
            tmp *= w[a:b, None]
        ys[s0:s1] = np.add.reduceat(tmp, bounds[s0:s1] - a, axis=0)
    return ys


def _scatter_segment_rows(acc_shape: tuple[int, int], idx: np.ndarray,
                          seg_rows: np.ndarray, bounds: np.ndarray,
                          w: np.ndarray, dtype=np.float64) -> np.ndarray:
    """acc[c] = Σ_{e: idx[e]=c} w[e]·seg_rows[segment(e)] — the AᵀY
    scatter: stable sort by column (np.add.at is unbuffered and ~10×
    slower), then the same cache-blocked gather-multiply-reduceat as
    ``_segment_matmul`` over the sorted order."""
    n = len(idx)
    counts = np.diff(np.r_[bounds, n])
    per_edge = np.repeat(np.arange(len(bounds)), counts)
    order = np.argsort(idx, kind="stable")
    idx_s = idx[order]
    pe_s = per_edge[order]
    w_s = w[order]
    b2 = np.flatnonzero(np.r_[True, idx_s[1:] != idx_s[:-1]])
    ends = np.r_[b2[1:], n]
    acc = np.zeros(acc_shape, dtype=dtype)
    cuts = _chunk_cuts(b2, n)
    for ci in range(len(cuts) - 1):
        s0, s1 = cuts[ci], cuts[ci + 1]
        a, b = b2[s0], ends[s1 - 1]
        tmp = seg_rows[pe_s[a:b]]
        tmp *= w_s[a:b, None]
        acc[idx_s[b2[s0:s1]]] = np.add.reduceat(tmp, b2[s0:s1] - a, axis=0)
    return acc


def sketch_partitions(n_edges: int, n_cols: int, l: int, n_conf: int,
                      traffic_cap: int = 96 * 1024 * 1024) -> int:
    """Partition count for the fused sketch passes, derived from the
    pass's OWN traffic balance instead of the session constant: every
    partition emits one dense (n_cols × l) float32 partial per pass, so
    per-pass driver traffic is ``n_parts × n_cols × l × 4`` bytes while
    the useful work is the O(E·l) edge scan. Sizing
    ``n_parts = clamp(max(traffic_cap, edge_bytes) / blob_bytes, 1,
    n_conf)`` keeps the partial collection bounded by ~max(96 MB, the
    edge payload itself) — at bench scale (600k edges × 20k cols × 136)
    this is 8 partitions and ~90 MB/pass instead of 32 partitions and
    ~350 MB/pass through the driver (measured sweep at sf0.1: the
    per-pass minimum is flat across 6-10 partitions at ~2.1 s vs
    ~4.5-6.5 s at 32 — the collect dominated the whole sketch); at
    cluster scale edge_bytes ≫ blob so the conf cap rules and nothing
    changes. Callers apply it ONLY on the sketch
    branch: the exact-Gram parity path keeps its session-default layout
    (its fixture-pinned float summation order must not move)."""
    blob = max(1, n_cols * l * 4)
    edge_bytes = n_edges * 20  # (src i64, cidx i32, w f64)
    by_traffic = max(traffic_cap, edge_bytes) // blob
    # second constraint, also measured: below ~64k edge rows per
    # partition the per-task fixed costs (batch concat, segment sort,
    # scheduling) outweigh extra parallelism — the fbox sweep (l=66,
    # blob 5.3 MB, traffic rule alone → 19 parts) still bottomed at
    # 6-10 partitions (1.72-1.98 s vs 2.1-3.1 s at 19)
    by_rows = -(-n_edges // 64_000)
    return max(1, min(n_conf, by_traffic, by_rows))


def randomized_right_factors(
    edges_idx: DataFrame,
    n_cols: int,
    k: int,
    weight_col: str | None = None,
    l_extra: int = 16,
    q: int = 2,
    seed: int = 42,
    pre_partitioned: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Randomized-sketch top-k right factors (V[:, :k], s[:k]) — the
    SCALE path promised in this module's docstring (Halko, Martinsson &
    Tropp 2011, Alg. 4.4 + 5.1). The exact-Gram path is O(n_cols²) per
    partition and O(n_cols³) driver eigh — fine at ≤4k columns, fatal at
    20k+. Here the whole sketch is q+1 FUSED passes over the (src-
    partitioned) edge set with NO joins and no per-edge vector shipping:
    because every src's rows live in one partition, Y = A·M rows are
    computed partition-locally and immediately consumed by the
    partition's AᵀY / YᵀY partials —

    1. pass i (i ≤ q): Z = Aᵀ(A·M) dense (n_cols × l) partials, driver
       sum + QR → next M  (power iteration),
    2. final pass: Y = A·M once more, emitting YᵀY (l × l) and AᵀY
       (n_cols × l) partials together,
    3. driver: R = chol(YᵀY), B = R⁻ᵀ·(YᵀA), SVD of B → V, s.

    M is shipped once per executor via ``sc.broadcast`` (closure capture
    would re-serialize the (n_cols × l) matrix per TASK — measured as
    the dominant cost of the old 5-pass/join formulation). Pass math and
    partial blobs run in FLOAT32 — the sketch subspace is an
    approximation whose consumers (percentile thresholds, capped-k
    aggregate norms) tolerate ~1e-5 relative wiggle, and halving every
    buffer halves both the memory-bandwidth-bound kernel time and the
    driver collect; all driver-side accumulation/decomposition stays
    float64. Per-pass driver traffic is n_parts × (n_cols·l·4 B); past
    the scale where that matters a tree-aggregate replaces the driver
    sum (documented, not needed at sandbox scale).

    Deterministic: Ω from a fixed PCG64 seed; partials are summed on the
    driver in partition order (reproducible-per-plan; downstream
    consumers tolerate the noise).
    """
    rng = np.random.default_rng(seed)
    l = min(k + l_extra, n_cols)
    omega = rng.standard_normal((n_cols, l))
    wc = weight_col
    nc = n_cols

    e = (edges_idx if pre_partitioned
         else edges_idx.repartition("src").localCheckpoint(eager=True))
    sc = e.sparkSession.sparkContext

    def _pass_ata(mat: np.ndarray) -> np.ndarray:
        """One fused pass: Aᵀ·(A·mat) partials, summed on the driver."""
        bc = sc.broadcast(np.ascontiguousarray(mat, dtype=np.float32))

        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            chunks = list(batches)
            if not chunks:
                return
            m = bc.value
            srcs, idx, w, bounds = _segments(
                pd.concat(chunks, ignore_index=True), wc)
            if len(srcs) == 0:
                return
            w32 = w.astype(np.float32)
            ys = _segment_matmul(m, idx, w32, bounds)
            acc = _scatter_segment_rows((nc, m.shape[1]), idx, ys, bounds,
                                        w32, dtype=np.float32)
            yield pd.DataFrame({"blob": [acc.tobytes()]})

        # Arrow transfer (toPandas), not row collect: the partials are
        # multi-MB binary cells and the py4j row path serializes them
        # ~5× slower than one Arrow batch stream
        parts = e.mapInPandas(fn, schema="blob binary").toPandas()
        bc.unpersist()
        z = np.zeros((nc, mat.shape[1]))
        for blob in parts["blob"]:
            z += np.frombuffer(blob, dtype=np.float32).reshape(z.shape)
        return z

    def _pass_final(mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """One fused pass: Y = A·mat, emitting (YᵀY, AᵀY) partials."""
        bc = sc.broadcast(np.ascontiguousarray(mat, dtype=np.float32))
        ll = mat.shape[1]

        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            chunks = list(batches)
            if not chunks:
                return
            m = bc.value
            srcs, idx, w, bounds = _segments(
                pd.concat(chunks, ignore_index=True), wc)
            if len(srcs) == 0:
                return
            w32 = w.astype(np.float32)
            ys = _segment_matmul(m, idx, w32, bounds)
            yta = _scatter_segment_rows((nc, ll), idx, ys, bounds, w32,
                                        dtype=np.float32)
            g = (ys.T @ ys).astype(np.float32)
            yield pd.DataFrame({"g": [g.tobytes()], "yta": [yta.tobytes()]})

        parts = e.mapInPandas(fn, schema="g binary, yta binary").toPandas()
        bc.unpersist()
        g = np.zeros((ll, ll))
        yta = np.zeros((nc, ll))
        for gb, yb in zip(parts["g"], parts["yta"]):
            g += np.frombuffer(gb, dtype=np.float32).reshape(ll, ll)
            yta += np.frombuffer(yb, dtype=np.float32).reshape(nc, ll)
        return g, yta

    cur = omega
    for _ in range(q):
        z = _pass_ata(cur)
        cur, _r = np.linalg.qr(z)  # (n_cols × l) driver QR — stability

    g, yta = _pass_final(cur)
    # ridge for rank-deficient sketches (all-zero rows etc.) — sized to
    # the FLOAT32 partial-summation noise floor (~1e-7·g.max per entry;
    # a 1e-12 ridge would sit below the noise and cholesky could still
    # see a negative eigenvalue)
    r = np.linalg.cholesky(g + 1e-6 * np.eye(l) * max(g.max(), 1.0))
    b = np.linalg.solve(r, yta.T)  # R⁻ᵀ·(YᵀA) = B (l × n_cols)
    _ub, s, vt = np.linalg.svd(b, full_matrices=False)
    kk = min(k, vt.shape[0])
    return vt[:kk].T, s[:kk]


def row_projection_norms_grouped(edges_idx: DataFrame, v: np.ndarray,
                                 weight_col: str | None = None,
                                 pre_partitioned: bool = False) -> DataFrame:
    """(src, rec = ||A_i·V||₂) via ONE per-partition vectorized kernel:
    repartition by src (so a row never spans partitions), then inside
    each Arrow batch set compute all edge contributions ``w·V[cidx]`` as
    a single (E_part × k) slice and segment-sum per src with
    ``np.add.reduceat``. Replaces the k-sum-aggregate plan of
    ``row_projection_norms`` when k is large (SVD detector: k≈0.9·n_cols)
    — O(E·k) flops, one pass, no per-group Python dispatch. V travels as
    a ``sc.broadcast`` (one copy per executor, not per task)."""
    wc = weight_col
    e = edges_idx if pre_partitioned else edges_idx.repartition("src")
    bc = edges_idx.sparkSession.sparkContext.broadcast(v)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)
        if not chunks:
            return
        srcs, idx, w, bounds = _segments(
            pd.concat(chunks, ignore_index=True), wc)
        if len(srcs) == 0:
            return
        comps = _segment_matmul(bc.value, idx, w, bounds)
        yield pd.DataFrame({
            "src": srcs[bounds],
            "rec": np.sqrt((comps * comps).sum(axis=1)),
        })

    return e.mapInPandas(fn, schema="src long, rec double")


def row_projection_norms_vvt(edges_idx: DataFrame, v: np.ndarray,
                             weight_col: str | None = None,
                             pre_partitioned: bool = False) -> DataFrame:
    """(src, rec = ||A_i·V||₂) via the PROJECTOR Gram G = V·Vᵀ:
    ||A_i·V||² = w_iᵀ · G[idx_i, idx_i] · w_i — O(Σ deg_i²) flops instead
    of ``row_projection_norms_grouped``'s O(E·k). The win when k ≫ avg
    degree (SVD detector: k ≈ 0.9·n_cols vs review degree ~5): measured
    38.5s → ~2s at sf0.01. Same algebraic value; float noise ~1e-12.
    G (n_cols², possibly tens of MB) is computed once on the driver and
    shipped per EXECUTOR via ``sc.broadcast`` — closure capture would
    re-serialize it per task."""
    wc = weight_col
    bc = edges_idx.sparkSession.sparkContext.broadcast(v @ v.T)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)
        if not chunks:
            return
        g = bc.value
        srcs, idx, w, bounds = _segments(
            pd.concat(chunks, ignore_index=True), wc)
        if len(srcs) == 0:
            return
        ends = np.r_[bounds[1:], len(srcs)]
        out = np.empty(len(bounds))
        for i, (s, e) in enumerate(zip(bounds, ends)):
            sub = idx[s:e]
            ww = w[s:e]
            out[i] = ww @ g[np.ix_(sub, sub)] @ ww
        yield pd.DataFrame({"src": srcs[bounds],
                            "rec": np.sqrt(np.maximum(out, 0.0))})

    e = edges_idx if pre_partitioned else edges_idx.repartition("src")
    return e.mapInPandas(fn, schema="src long, rec double")


def row_projection_components(edges_idx: DataFrame, v: np.ndarray,
                              weight_col: str | None = None,
                              scale: np.ndarray | None = None) -> DataFrame:
    """(src, comps array<double>): per-row projection A_i·V (optionally
    scaled per component — pass 1/s to get U rows). Same segment-reduce
    ``mapInPandas`` pattern as ``row_projection_norms_grouped``: one
    vectorized (E_part × k) slice + ``np.add.reduceat`` per partition —
    NOT one Python dispatch per src group (tens of thousands of
    single-row pandas groups would dominate at scale). V is shipped per
    executor via ``sc.broadcast``."""
    wc = weight_col
    scl = scale
    bc = edges_idx.sparkSession.sparkContext.broadcast(v)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)
        if not chunks:
            return
        srcs, idx, w, bounds = _segments(
            pd.concat(chunks, ignore_index=True), wc)
        if len(srcs) == 0:
            return
        comps = _segment_matmul(bc.value, idx, w, bounds)
        if scl is not None:
            comps = comps * scl[None, :]
        yield pd.DataFrame({"src": srcs[bounds],
                            "comps": [row.tolist() for row in comps]})

    return edges_idx.repartition("src").mapInPandas(
        fn, schema="src long, comps array<double>"
    )
