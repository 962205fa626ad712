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


def dense_col_index(edges: DataFrame, n_parts: int = 32) -> DataFrame:
    """(dst, cidx): deterministic dense 0-based index by sorted dst —
    the typed replacement for the reference's id↔idx dicts
    (``fBox.py:20-47``).

    Two-phase rank (scale-safe): range-partition the distinct ids, take
    local ranks inside each sorted partition in one Arrow pass, then add
    per-partition offsets (a tiny broadcast join). No global
    ``Window.orderBy`` — the old single-task funnel dies at a web-scale
    column side."""
    from typing import Iterator

    import pandas as pd

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
        edges.select("dst").distinct()
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


def randomized_right_factors(
    edges_idx: DataFrame,
    n_cols: int,
    k: int,
    weight_col: str | None = None,
    l_extra: int = 16,
    q: int = 2,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """Randomized-sketch top-k right factors (V[:, :k], s[:k]) — the
    SCALE path promised in this module's docstring (Halko, Martinsson &
    Tropp 2011, Alg. 4.4 + 5.1). The exact-Gram path is O(n_cols²) per
    partition and O(n_cols³) driver eigh — fine at ≤4k columns, fatal at
    20k+. Here every distributed pass is O(E·l) with l = k + l_extra and
    the driver never touches anything bigger than (n_cols × l):

    1. Y = A·Ω for a seeded Gaussian Ω (n_cols × l) — one join+kernel,
    2. q power iterations Y ← A·(Aᵀ·Y) with a driver-side QR of the
       (n_cols × l) intermediate for numerical stability,
    3. R = chol(YᵀY)  (l × l, from distributed partials), Q = Y·R⁻¹,
    4. B = Qᵀ·A = R⁻ᵀ·(YᵀA)  ((l × n_cols), distributed partials),
    5. SVD of B on the driver → V, s.

    Deterministic: Ω from a fixed PCG64 seed; partials are summed on the
    driver (order-independent float addition is NOT guaranteed, so
    results are reproducible-per-plan, and downstream consumers
    (percentile thresholds) tolerate 1e-9 wiggle).
    """
    rng = np.random.default_rng(seed)
    l = min(k + l_extra, n_cols)
    omega = rng.standard_normal((n_cols, l))
    wc = weight_col

    e = edges_idx.repartition("src").localCheckpoint(eager=True)

    def _project_rows(mat: np.ndarray) -> DataFrame:
        """(src, yvec = Σ_edges w·mat[cidx]) — one vectorized pass."""
        m = mat

        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            chunks = list(batches)
            if not chunks:
                return
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                "src", kind="mergesort")
            idx = pdf["cidx"].to_numpy()
            w = pdf[wc].to_numpy(dtype="float64") if wc else np.ones(len(idx))
            srcs = pdf["src"].to_numpy(dtype="int64")
            contrib = m[idx] * w[:, None]
            bounds = np.flatnonzero(np.r_[True, srcs[1:] != srcs[:-1]])
            ys = np.add.reduceat(contrib, bounds, axis=0)
            yield pd.DataFrame({"src": srcs[bounds],
                                "yvec": [row for row in ys]})

        return e.mapInPandas(fn, schema="src long, yvec array<double>")

    def _left_project(y_df: DataFrame) -> np.ndarray:
        """Aᵀ·Y as an (n_cols × l) numpy: per-partition dense partials
        shipped as bytes, summed on the driver (32 × ~n_cols·l·8 B)."""
        nc, ll = n_cols, l

        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            acc = np.zeros((nc, ll))
            got = False
            for pdf in batches:
                if pdf.empty:
                    continue
                got = True
                idx = pdf["cidx"].to_numpy()
                w = pdf[wc].to_numpy(dtype="float64") if wc else np.ones(len(idx))
                yv = np.asarray([np.asarray(v) for v in pdf["yvec"]])
                np.add.at(acc, idx, yv * w[:, None])
            if got:
                yield pd.DataFrame({"blob": [acc.tobytes()]})

        # each task ships a dense (n_cols × l) partial to the driver;
        # when that blob is large, fewer/bigger tasks win — when small,
        # keep full scan parallelism
        j = (
            e.join(y_df.withColumnRenamed("src", "_s"), e.src == F.col("_s"))
            .select("cidx", "yvec", *([wc] if wc else []))
        )
        if n_cols * l * 8 > 32 * 1024 * 1024:
            j = j.coalesce(8)
        parts = j.mapInPandas(fn, schema="blob binary").collect()
        z = np.zeros((nc, ll))
        for r in parts:
            z += np.frombuffer(r["blob"]).reshape(nc, ll)
        return z

    def _gram_small(y_df: DataFrame) -> np.ndarray:
        """YᵀY (l × l) from distributed partials."""
        ll = l

        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            acc = np.zeros((ll, ll))
            got = False
            for pdf in batches:
                if pdf.empty:
                    continue
                got = True
                yv = np.asarray([np.asarray(v) for v in pdf["yvec"]])
                acc += yv.T @ yv
            if got:
                yield pd.DataFrame({"blob": [acc.tobytes()]})

        parts = y_df.mapInPandas(fn, schema="blob binary").collect()
        g = np.zeros((ll, ll))
        for r in parts:
            g += np.frombuffer(r["blob"]).reshape(ll, ll)
        return g

    y = _project_rows(omega).localCheckpoint(eager=True)
    for _ in range(q):
        z = _left_project(y)
        z, _r = np.linalg.qr(z)  # (n_cols × l) driver QR — stability
        y = _project_rows(z).localCheckpoint(eager=True)

    g = _gram_small(y)
    # ridge for rank-deficient sketches (all-zero rows etc.)
    r = np.linalg.cholesky(g + 1e-12 * np.eye(l) * max(g.max(), 1.0))
    yta = _left_project(y)  # (n_cols × l) = AᵀY
    b = np.linalg.solve(r, yta.T)  # R⁻ᵀ·(YᵀA) = B (l × n_cols)
    _ub, s, vt = np.linalg.svd(b, full_matrices=False)
    kk = min(k, vt.shape[0])
    return vt[:kk].T, s[:kk]


def row_projection_norms_grouped(edges_idx: DataFrame, v: np.ndarray,
                                 weight_col: str | None = None) -> DataFrame:
    """(src, rec = ||A_i·V||₂) via ONE per-partition vectorized kernel:
    repartition by src (so a row never spans partitions), then inside
    each Arrow batch set compute all edge contributions ``w·V[cidx]`` as
    a single (E_part × k) slice and segment-sum per src with
    ``np.add.reduceat``. Replaces the k-sum-aggregate plan of
    ``row_projection_norms`` when k is large (SVD detector: k≈0.9·n_cols)
    — O(E·k) flops, one pass, no per-group Python dispatch."""
    wc = weight_col

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values("src",
                                                               kind="mergesort")
        idx = pdf["cidx"].to_numpy()
        w = pdf[wc].to_numpy(dtype="float64") if wc else np.ones(len(idx))
        srcs = pdf["src"].to_numpy(dtype="int64")
        contrib = v[idx] * w[:, None]
        bounds = np.flatnonzero(np.r_[True, srcs[1:] != srcs[:-1]])
        comps = np.add.reduceat(contrib, bounds, axis=0)
        yield pd.DataFrame({
            "src": srcs[bounds],
            "rec": np.sqrt((comps * comps).sum(axis=1)),
        })

    return edges_idx.repartition("src").mapInPandas(
        fn, schema="src long, rec double"
    )


def row_projection_norms_vvt(edges_idx: DataFrame, v: np.ndarray,
                             weight_col: str | None = None) -> DataFrame:
    """(src, rec = ||A_i·V||₂) via the PROJECTOR Gram G = V·Vᵀ:
    ||A_i·V||² = w_iᵀ · G[idx_i, idx_i] · w_i — O(Σ deg_i²) flops instead
    of ``row_projection_norms_grouped``'s O(E·k). The win when k ≫ avg
    degree (SVD detector: k ≈ 0.9·n_cols vs review degree ~5): measured
    38.5s → ~2s at sf0.01. Same algebraic value; float noise ~1e-12."""
    g = v @ v.T
    wc = weight_col

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values("src",
                                                               kind="mergesort")
        idx = pdf["cidx"].to_numpy()
        w = pdf[wc].to_numpy(dtype="float64") if wc else np.ones(len(idx))
        srcs = pdf["src"].to_numpy(dtype="int64")
        bounds = np.flatnonzero(np.r_[True, srcs[1:] != srcs[:-1]])
        ends = np.r_[bounds[1:], len(srcs)]
        out = np.empty(len(bounds))
        for i, (s, e) in enumerate(zip(bounds, ends)):
            sub = idx[s:e]
            ww = w[s:e]
            out[i] = ww @ g[np.ix_(sub, sub)] @ ww
        yield pd.DataFrame({"src": srcs[bounds],
                            "rec": np.sqrt(np.maximum(out, 0.0))})

    return edges_idx.repartition("src").mapInPandas(
        fn, schema="src long, rec double"
    )


def row_projection_components(edges_idx: DataFrame, v: np.ndarray,
                              weight_col: str | None = None,
                              scale: np.ndarray | None = None) -> DataFrame:
    """(src, comps array<double>): per-row projection A_i·V (optionally
    scaled per component — pass 1/s to get U rows). Same segment-reduce
    ``mapInPandas`` pattern as ``row_projection_norms_grouped``: one
    vectorized (E_part × k) slice + ``np.add.reduceat`` per partition —
    NOT one Python dispatch per src group (tens of thousands of
    single-row pandas groups would dominate at scale)."""
    wc = weight_col
    sc = scale

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values("src",
                                                               kind="mergesort")
        idx = pdf["cidx"].to_numpy()
        w = pdf[wc].to_numpy(dtype="float64") if wc else np.ones(len(idx))
        srcs = pdf["src"].to_numpy(dtype="int64")
        contrib = v[idx] * w[:, None]
        bounds = np.flatnonzero(np.r_[True, srcs[1:] != srcs[:-1]])
        comps = np.add.reduceat(contrib, bounds, axis=0)
        if sc is not None:
            comps = comps * sc[None, :]
        yield pd.DataFrame({"src": srcs[bounds],
                            "comps": [row.tolist() for row in comps]})

    return edges_idx.repartition("src").mapInPandas(
        fn, schema="src long, comps array<double>"
    )
