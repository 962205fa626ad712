"""SpEagle demo-parameter parity mode: the reference's ASYNC schedule.

The distributed ``speagle`` operator runs synchronous Jacobi supersteps
and proves fixpoint parity at convergence (SURVEY §7/M4). The reference
demo, however, runs exactly TWO asynchronous Gauss–Seidel sweeps over a
BFS-from-degree-desc node schedule, alternating sweep direction per
iteration (``SpEagle.py:339-378`` schedule, ``SpEagle.py:424-463``
run_bp, driven by ``Demo/eval_SpEagle.py`` with max_iters=2, tol=1e-3)
— so a user reproducing the published YelpChi demo numbers at
``max_iter=2`` needs THIS schedule, not Jacobi (VERDICT r3 #6).

Why this mode is driver-side and size-capped instead of distributed
(the impossibility argument, also in COVERAGE.md): in an asynchronous
Gauss–Seidel sweep each node update reads messages produced by the
nodes processed EARLIER IN THE SAME SWEEP — the dependency chain is the
entire schedule, i.e. the computation is inherently sequential with
critical-path length = |V|. Any partition of the sweep across executors
changes which messages are "fresh" and therefore changes the 2-sweep
output; a bit-faithful distributed version would need a 1-node-at-a-
time barrier per update. (The fixpoint is schedule-independent, which
is why the scale path uses Jacobi and compares at convergence.) The
reference itself is a single-machine dict loop; this mode mirrors that
contract with an explicit cap, like Fraudar's exact-peel parity mode
(``fraudar.PARITY_MAX_EDGES``).

The implementation below is an independent flat-array re-expression of
the published semantics (reference anchors cited inline) — vectorized
per-node numpy, no Node objects, no reference code.
"""

from __future__ import annotations

import math

import numpy as np

# the async sweep is sequential by construction (see module docstring);
# past this size run the distributed Jacobi `speagle` to convergence
DEMO_MAX_EDGES = 200_000

_CLAMP_EPS = 1e-5  # Node.__init__ self._eps (SpEagle.py:46) — fixed,
# independent of the numerical_eps potential parameter


def _log_h(eps: float) -> np.ndarray:
    """Symmetric 2x2 potential [[1-e, e], [e, 1-e]] in log space."""
    return np.log(np.array([[1.0 - eps, eps], [eps, 1.0 - eps]]))


def _lse(a: np.ndarray) -> float:
    m = a.max()
    return m + math.log(np.exp(a - m).sum())


class _Cost:
    """Heap entry comparing on cost only — mirrors ``myTuple``
    (``SpEagle.py:15-21``) so heap tie order matches the reference's
    bit-for-bit (equal costs are incomparable both ways, leaving heapq's
    internal sift order, which is deterministic given push sequence)."""

    __slots__ = ("cost", "node")

    def __init__(self, cost: int, node: int):
        self.cost = cost
        self.node = node

    def __lt__(self, other: "_Cost") -> bool:
        return self.cost < other.cost


def speagle_demo(
    edge_list: list[tuple],
    user_priors: dict,
    prod_priors: dict,
    review_priors: dict,
    *,
    numerical_eps: float = 1e-5,
    eps: float = 0.1,
    max_iters: int = 2,
    tol: float = 1e-3,
    early_stop_at: float = 1.0,
    starting_nodes: list | None = None,
    num_hops: int = 2,
    max_edges: int = DEMO_MAX_EDGES,
) -> tuple[dict, dict, dict]:
    """Run the reference demo's exact BP schedule on an ORDERED edge
    list; returns ({user: belief}, {prod: belief}, {(user, prod):
    belief}) — posterior P(y=1) like ``SpEagle.classify``.

    ``edge_list`` order is part of the schedule's definition (the
    reference's node insertion order comes from its graph's adjacency
    order): users enter at first appearance, products/reviews in
    per-user appearance order (``SpEagle.py:249-281``).

    ``starting_nodes`` switches to the reference's LOCAL schedule
    (``SpEagle.py:381-421`` — Dijkstra over uniform hop costs from the
    given seeds, nodes within ``num_hops`` in heap-pop order; the
    reference's incremental-update path). Keys are the same shape the
    outputs use: ``("u", user)``, ``("p", prod)`` or ``("r", user,
    prod)``; nodes outside the schedule keep their zero messages, so
    their beliefs read as normalized priors, exactly like the
    reference.
    """
    if len(edge_list) > max_edges:
        raise ValueError(
            f"speagle_demo is the sequential demo-parity mode, capped at "
            f"{max_edges} edges (got {len(edge_list)}); the async "
            "Gauss–Seidel sweep has critical-path length |V| and cannot "
            "be distributed bit-faithfully — use speagle() (Jacobi) and "
            "compare at convergence instead"
        )

    # ---- node table in reference insertion order (SpEagle.py:249-281):
    # users at first appearance; for each user, its products (new ones
    # only) then the review node, in per-user edge-appearance order
    U, P, R = 0, 1, 2
    types: list[int] = []
    keys: list = []
    nbrs: list[list[int]] = []
    lp: list[np.ndarray] = []
    index: dict = {}

    def _add(key, kind: int, prior: float) -> int:
        # exact-0/1 clamp only, like Node.__init__ (SpEagle.py:56-62)
        if prior == 1:
            prior = 1.0 - _CLAMP_EPS
        elif prior == 0:
            prior = _CLAMP_EPS
        index[key] = len(keys)
        keys.append(key)
        types.append(kind)
        nbrs.append([])
        lp.append(np.log(np.array([1.0 - prior, prior])))
        return index[key]

    seen_pairs = set()
    for u, p in edge_list:
        if (u, p) in seen_pairs:  # nx.Graph collapses multi-edges
            continue
        seen_pairs.add((u, p))
        ku, kp, kr = ("u", u), ("p", p), ("r", u, p)
        iu = index[ku] if ku in index else _add(ku, U, user_priors[u])
        ip = index[kp] if kp in index else _add(kp, P, prod_priors[p])
        ir = _add(kr, R, review_priors[(u, p)])
        # neighbor ORDER is load-bearing: review = [user, product];
        # user/product append reviews in visit order (SpEagle.py:268-273)
        nbrs[ir].append(iu)
        nbrs[ir].append(ip)
        nbrs[iu].append(ir)
        nbrs[ip].append(ir)

    n = len(keys)
    # out[i] = (deg_i, 2) outgoing messages aligned with nbrs[i], init 0
    out = [np.zeros((len(nb), 2)) for nb in nbrs]
    # back[i][t] = slot of i inside nbrs[nbrs[i][t]] (message lookup)
    slot = [{j: t for t, j in enumerate(nb)} for nb in nbrs]
    back = [np.array([slot[j][i] for j in nb], dtype=np.int64)
            for i, nb in enumerate(nbrs)]

    h_ur = _log_h(numerical_eps)
    h_rp = _log_h(eps)

    def _pot(ti: int, tj: int) -> np.ndarray:
        # user↔review edges use H(numerical_eps), review↔product H(eps)
        return h_ur if U in (ti, tj) else h_rp

    def _incoming(i: int) -> np.ndarray:
        nb = nbrs[i]
        return np.array([out[j][back[i][t]] for t, j in enumerate(nb)])

    def _recompute(i: int) -> float:
        """SpEagle.py:177-222: refresh ALL outgoing messages of node i
        from the freshest incoming; returns Σ|Δmessage|."""
        inc = _incoming(i)
        total = lp[i] + inc.sum(axis=0)
        diff = 0.0
        oi = out[i]
        for t, j in enumerate(nbrs[i]):
            lm = total - inc[t]
            a = _pot(types[i], types[j]) + lm[None, :]
            m0 = max(a[0, 0], a[0, 1])
            m1 = max(a[1, 0], a[1, 1])
            l0 = m0 + math.log(math.exp(a[0, 0] - m0) + math.exp(a[0, 1] - m0))
            l1 = m1 + math.log(math.exp(a[1, 0] - m1) + math.exp(a[1, 1] - m1))
            lz = _lse(np.array([l0, l1]))
            n0, n1 = l0 - lz, l1 - lz
            diff += abs(oi[t, 0] - n0) + abs(oi[t, 1] - n1)
            oi[t, 0] = n0
            oi[t, 1] = n1
        return diff

    if starting_nodes is not None:
        # ---- local (Dijkstra, uniform hop cost) schedule
        # (SpEagle.py:381-421): seeds at cost 0, heap-pop order, keep
        # nodes with cost <= num_hops; stdlib heapq + cost-only
        # comparison reproduce the reference's tie order exactly
        import heapq

        q = [_Cost(0, index[k]) for k in starting_nodes]
        min_costs = {t.node: 0 for t in q}
        heapq.heapify(q)
        seen: set[int] = set()
        sched = []
        while q:
            t = heapq.heappop(q)
            v, cost = t.node, t.cost
            if cost <= num_hops:
                sched.append(v)
            if v not in seen:
                seen.add(v)
                for j in nbrs[v]:
                    if j not in seen:
                        nxt = cost + 1
                        if min_costs.get(j) is None or nxt < min_costs[j]:
                            min_costs[j] = nxt
                            heapq.heappush(q, _Cost(nxt, j))
    else:
        # ---- BFS-from-degree-desc schedule (SpEagle.py:339-378): stable
        # degree-desc over insertion order seeds BFS; components drain
        # fully
        order = sorted(range(n), key=lambda i: -len(nbrs[i]))
        mark = [True] * n
        sched = []
        for i in order:
            if mark[i]:
                mark[i] = False
                sched.append(i)
                head = len(sched) - 1
                while head < len(sched):
                    for j in nbrs[sched[head]]:
                        if mark[j]:
                            mark[j] = False
                            sched.append(j)
                    head += 1

    # ---- run_bp (SpEagle.py:424-463): even iters sweep the schedule in
    # REVERSE, odd iters forward; mean |Δmessage| < tol breaks
    stop_at = int(len(sched) * early_stop_at)
    for it in range(max_iters if stop_at else 0):
        positions = (range(stop_at - 1, -1, -1) if it % 2 == 0
                     else range(stop_at))
        delta = 0.0
        total_updates = 0
        for pos in positions:
            total_updates += 1
            delta += _recompute(sched[pos])
            if total_updates > stop_at:
                break
        delta /= total_updates
        if abs(delta) < tol:
            break

    # ---- classify (SpEagle.py:466-510): belief = prior + Σ incoming,
    # posterior = normalized exp, report class-1 mass
    u_out: dict = {}
    p_out: dict = {}
    r_out: dict = {}
    for i in range(n):
        total = lp[i] + _incoming(i).sum(axis=0)
        # max-stabilized softmax: equal to exp(total)[1]/sum(exp(total))
        # in real arithmetic, but stays finite for hub nodes whose
        # log-belief magnitude exceeds ~709 (np.exp underflows both
        # entries to 0.0 and the reference's unstabilized readout
        # returns 0/0 = NaN there — SpEagle.py:466-510; parity on the
        # non-underflowing range is unchanged)
        e = np.exp(total - total.max())
        post = float(e[1] / e.sum())
        k = keys[i]
        if types[i] == U:
            u_out[k[1]] = post
        elif types[i] == P:
            p_out[k[1]] = post
        else:
            r_out[(k[1], k[2])] = post
    return u_out, p_out, r_out
