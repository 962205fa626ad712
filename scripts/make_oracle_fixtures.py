"""Generate oracle fixture parquets for the queries whose semantics are
not SQL-expressible (greedy peel, truncated SVD): run the ACTUAL
reference implementations (through tests/refshims) on the engine's
graph derivation and store their outputs, rounded exactly like the
engine's registry queries round theirs.

The driver then compares the Spark queries against
``read_parquet('/root/repo/fixtures/oracle/sf0.01/<name>.parquet')`` —
a true independent oracle (reference code path, scipy-equivalent shims)
instead of the old rows-only non-check. tests/test_reference_parity.py
independently asserts the same agreement live at sf0.001.

Outputs per sf in fixtures/oracle/sf{0.001,0.01}/:
- fraudar_scores.parquet   (id, score)          reference peel + eval norm
- fbox_suspicious.parquet  (id, side, deg)      reference fBox tau=20 k=50
- svd_user_norms.parquet   (id, norm)           reference svds ||U·Σ||
- svd_classify.parquet     (id, pred_label)     independent numpy pipeline
                           (NOT UGFraud — its SVC stage needs sklearn;
                           nearest-centroid spec mirrored in numpy)

Run: python scripts/make_oracle_fixtures.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from reference_loader import (  # noqa: E402
    PRIOR_MOD,
    PRIOR_MULT,
    build_reference_graph,
    engine_edges_sf,
    load_reference,
)

SFS = {"sf0.001": "/root/testdata/sf0.001", "sf0.01": "/root/testdata/sf0.01"}
OUT_BASE = os.path.join(os.path.dirname(__file__), "..", "fixtures", "oracle")

NORM_ROUND = 6  # keep aligned with registry _round6 on svd_user_norms


def fraudar_scores(ref, g, maps, helper, densities_out: list | None = None
                   ) -> pd.DataFrame:
    """detect_blocks verbatim + eval_Fraudar.py:66-113 normalization
    (wrapper mirrored — :108 hardcodes a YelpChi debug print).
    ``densities_out``, when given, receives the per-block densities —
    block 1's density is the exact-peel anchor for the bulk-peel
    Charikar-bound invariant oracle (fraudar_density fixture)."""
    Fm = ref["Fraudar"]
    u_ids = list(helper.node_attr_filter(g, "types", "user", "types").keys())
    u2i = {u: i for i, u in enumerate(u_ids)}
    p2i: dict = {}
    es, ed = [], []
    for u in u_ids:
        for p in g[u].keys():
            if p not in p2i:
                p2i[p] = len(p2i)
            es.append(u2i[u])
            ed.append(p2i[p])
    M = Fm.listToSparseMatrix(es, ed)
    res = Fm.detect_blocks(M, Fm.logWeightedAveDegree)
    if densities_out is not None:
        densities_out.extend(float(weight) for (_sets, weight) in res)
    detected: dict = {}
    for (rows, _cols), weight in res:
        for i in rows:
            detected.setdefault(u_ids[i], weight)
    max_den, min_den = res[0][1], res[-1][1]
    interval = max_den - min_den
    out = []
    for u in u_ids:
        s = (detected[u] - min_den) / interval if u in detected else 1e-6
        out.append((maps["u_inv"][u], round(s, 6)))
    return pd.DataFrame(out, columns=["id", "score"]).astype(
        {"id": "int64", "score": "float64"}
    )


def fbox_suspicious(ref, g, maps) -> pd.DataFrame:
    model = ref["fBox"].fBox(g)
    su, sp = model.run(20, 50)
    rows = []
    for deg, ids in su.items():
        for u in ids:
            rows.append((maps["u_inv"][u], "user", int(deg)))
    for deg, ids in sp.items():
        for p in ids:
            rows.append((maps["p_inv"][p], "prod", int(deg)))
    return pd.DataFrame(rows, columns=["id", "side", "deg"]).astype(
        {"id": "int64", "deg": "int64"}
    )


def _zero_init_matrix(ref, g):
    """SVD.py:25 uses np.empty (uninitialized!) — zero-init interpretation."""
    sv = ref["SVD"].SVD(g)
    m = np.zeros_like(sv.user_prod_matrix)
    for u_id in sv.user_index:
        for p_id in g[u_id].keys():
            m[sv.user_index[u_id], sv.prod_index[p_id]] = (
                g.edges.get((u_id, p_id))["rating"]
            )
    return sv, m


def svd_user_norms(ref, g, maps) -> pd.DataFrame:
    from scipy.sparse.linalg import svds  # the shim

    sv, m = _zero_init_matrix(ref, g)
    k = int(max(np.round(min(m.shape) * 0.9), 1))
    u, s, _vt = svds(m, k=k)
    norms = np.linalg.norm(u * s[None, :], axis=1)
    uid_by_idx = {i: uid for uid, i in sv.user_index.items()}
    out = [
        (maps["u_inv"][uid_by_idx[i]], round(float(norms[i]), NORM_ROUND))
        for i in range(len(norms))
    ]
    return pd.DataFrame(out, columns=["id", "norm"]).astype(
        {"id": "int64", "norm": "float64"}
    )


def svd_classify(edges) -> pd.DataFrame:
    """Independent numpy mirror of q_svd_classify with SVC SEMANTICS:
    svds embedding (percent=0.2, U = A·V/s), Knuth-hash stratified 50/50
    split, deterministic linear-SVC (L2 hinge, full-batch subgradient,
    w0=0, lr_t=2/(λ(t+100)), λ=0.01, 300 epochs — the published spec
    the engine and the sklearn shim implement independently), margin
    sign on the test half. Full-batch + zero init ⇒ the fit is exactly
    equivariant under the embedding's sign/rotation ambiguity."""
    users = sorted({e[0] for e in edges})
    prods = sorted({e[1] for e in edges})
    ui = {u: i for i, u in enumerate(users)}
    pi = {p: i for i, p in enumerate(prods)}
    a = np.zeros((len(users), len(prods)))
    for s_, d, sg in edges:
        a[ui[s_], pi[d]] = min(a[ui[s_], pi[d]], sg) if a[ui[s_], pi[d]] else sg
    k = int(max(round(min(a.shape) * 0.2), 1))
    uu, ss, _vt = np.linalg.svd(a, full_matrices=False)
    comps = uu[:, :k]  # == A·V·(1/s) for the top-k triplets

    labels = {}
    for s_, d, sg in edges:
        labels[s_] = max(labels.get(s_, 0), 1 if sg == 2 else 0)
    lab = np.array([labels[u] for u in users])
    key = np.array([(u * PRIOR_MULT) % PRIOR_MOD for u in users])
    is_train = np.zeros(len(users), dtype=bool)
    for lv in (0, 1):
        idx = np.where(lab == lv)[0]
        order = idx[np.lexsort((np.array(users)[idx], key[idx]))]
        n_train = len(idx) // 2
        is_train[order[:n_train]] = True

    xtr = comps[is_train]
    ytr = 2.0 * lab[is_train].astype(np.float64) - 1.0
    lam, n, d = 0.01, len(xtr), xtr.shape[1]
    w = np.zeros(d)
    b = 0.0
    for t in range(300):
        lr = 2.0 / (lam * (t + 100.0))
        active = ytr * (xtr @ w + b) < 1.0
        w = w - lr * (lam * w - xtr[active].T @ ytr[active] / n)
        b = b + lr * (ytr[active].sum() / n)
    out = []
    decisions = []
    for i in np.where(~is_train)[0]:
        dec = float(comps[i] @ w + b)
        decisions.append(abs(dec))
        out.append((users[i], 1 if dec > 0 else 0))
    # hash-exact gate safety (ADVICE r3): the driver compares INTEGER
    # predictions from three independently-coded optimizers (JVM fold
    # scoring, this numpy mirror, the sklearn-shim reference), safe only
    # while the minimum |decision| margin dwarfs cross-implementation
    # float drift (~1e-12). Assert it at generation time, at the gate's
    # own scale, so a margin collapse fails HERE and not as an opaque
    # driver hash mismatch. Measured min margin ≈ 0.95 at sf0.01.
    min_margin = min(decisions) if decisions else 1.0
    if min_margin < 1e-3:
        raise AssertionError(
            f"svd_classify margin collapsed: min |decision| = "
            f"{min_margin:.2e} < 1e-3 — integer-prediction hash parity "
            "across independent SVM implementations is no longer safe; "
            "revisit the fixture/gate design before shipping this fixture"
        )
    return pd.DataFrame(out, columns=["id", "pred_label"]).astype(
        {"id": "int64", "pred_label": "int32"}
    )


def main():
    ref = load_reference()
    helper = ref["helper"]
    for sf_name, sf_dir in SFS.items():
        out_dir = os.path.join(OUT_BASE, sf_name)
        os.makedirs(out_dir, exist_ok=True)
        edges = engine_edges_sf(sf_dir)
        g, maps = build_reference_graph(edges)
        densities: list = []

        def _fraudar_with_density():
            df = fraudar_scores(ref, g, maps, helper, densities_out=densities)
            pd.DataFrame(
                {"block": range(1, len(densities) + 1),
                 "density": densities}
            ).astype({"block": "int32", "density": "float64"}).to_parquet(
                os.path.join(out_dir, "fraudar_density.parquet"), index=False
            )
            return df

        for name, fn in [
            ("fraudar_scores", _fraudar_with_density),
            ("fbox_suspicious", lambda: fbox_suspicious(ref, g, maps)),
            ("svd_user_norms", lambda: svd_user_norms(ref, g, maps)),
            ("svd_classify", lambda: svd_classify(edges)),
        ]:
            t0 = time.time()
            df = fn()
            path = os.path.join(out_dir, f"{name}.parquet")
            df.to_parquet(path, index=False)
            print(f"{sf_name}/{name}: {len(df)} rows in "
                  f"{time.time() - t0:.1f}s -> {path}")


if __name__ == "__main__":
    main()
