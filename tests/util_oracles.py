"""Hand oracles for graph algorithms (numpy / pure Python, no Spark)."""

from __future__ import annotations

import numpy as np


def pagerank_oracle(edges: list[tuple[int, int, float]], damping=0.85,
                    tol=1e-6, max_iter=200) -> dict[int, float]:
    """Dense power iteration with dangling redistribution, matching the
    engine's update rule and convergence criterion exactly."""
    ids = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    w = np.zeros((n, n))
    for u, v, wt in edges:
        w[idx[u], idx[v]] += wt
    out = w.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        dang = r[out == 0].sum()
        contrib = np.zeros(n)
        nz = out > 0
        contrib = (r[nz] / out[nz]) @ w[nz]
        new = (1 - damping) / n + damping * (contrib + dang / n)
        if np.max(np.abs(new - r)) < tol:
            r = new
            break
        r = new
    return {v: float(r[idx[v]]) for v in ids}


def cc_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find; component labeled by its minimum vertex id."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comps: dict[int, list[int]] = {}
    for x in list(parent):
        comps.setdefault(find(x), []).append(x)
    out = {}
    for members in comps.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def triangle_oracle(edges: list[tuple[int, int]]) -> int:
    """Brute-force triangle enumeration over the undirected simple graph."""
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    count = 0
    nodes = sorted(adj)
    for u in nodes:
        for v in adj[u]:
            if v <= u:
                continue
            for w in adj[u] & adj[v]:
                if w > v:
                    count += 1
    return count


def lpa_oracle(edges: list[tuple[int, int, float]], max_iter=10):
    """Synchronous weighted LPA, tie-break = min label among max-weight
    labels; mirrors operators/labelprop.py exactly."""
    nbrs: dict[int, dict[int, float]] = {}
    for u, v, w in edges:
        if u == v:
            continue
        nbrs.setdefault(u, {}).setdefault(v, 0.0)
        nbrs.setdefault(v, {}).setdefault(u, 0.0)
        nbrs[u][v] += w
        nbrs[v][u] += w
    labels = {v: v for v in nbrs}
    for _ in range(max_iter):
        new = {}
        for v in nbrs:
            votes: dict[int, float] = {}
            for nb, w in nbrs[v].items():
                votes[labels[nb]] = votes.get(labels[nb], 0.0) + w
            if votes:
                best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            else:
                best = labels[v]
            new[v] = best
        if new == labels:
            labels = new
            break
        labels = new
    return labels


def hits_oracle(edges: list[tuple[int, int, float]], tol=1e-6,
                max_iter=100) -> dict[int, tuple[float, float]]:
    """Weighted HITS with L2 normalization, mirroring the engine's
    dataflow exactly (hub pass consumes the UN-normalized a_raw).
    Returns {id: (hub, auth)}."""
    ids = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    w = np.zeros((n, n))
    for u, v, wt in edges:
        w[idx[u], idx[v]] += wt
    h = np.full(n, 1.0 / np.sqrt(n))
    a = np.zeros(n)
    for _ in range(max_iter):
        a_raw = h @ w
        na = np.linalg.norm(a_raw)
        t_raw = w @ a_raw
        nt = np.linalg.norm(t_raw)
        if na == 0 or nt == 0:
            return {v: (0.0, 0.0) for v in ids}
        a_new, h_new = a_raw / na, t_raw / nt
        d = max(np.abs(a_new - a).max(), np.abs(h_new - h).max())
        a, h = a_new, h_new
        if d < tol:
            break
    return {v: (float(h[idx[v]]), float(a[idx[v]])) for v in ids}


def coreness_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Exact coreness by sequential minimum-degree peel (the textbook
    algorithm — deliberately a DIFFERENT algorithm from the engine's
    h-index fixpoint, so agreement is meaningful)."""
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    deg = {v: len(ns) for v, ns in adj.items()}
    core: dict[int, int] = {}
    remaining = set(adj)
    k = 0
    while remaining:
        v = min(remaining, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        core[v] = k
        remaining.remove(v)
        for u in adj[v]:
            if u in remaining:
                deg[u] -= 1
    return core


def clustering_oracle(edges: list[tuple[int, int]]) -> dict[int, tuple[int, int, float]]:
    """Per-vertex (degree, triangles, coefficient) by brute force."""
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = {}
    for v, ns in adj.items():
        d = len(ns)
        t = sum(len(adj[x] & ns) for x in ns) // 2
        out[v] = (d, t, 2.0 * t / (d * (d - 1)) if d >= 2 else 0.0)
    return out


def ppr_oracle(edges: list[tuple[int, int, float]], sources: list[int],
               damping=0.85, tol=1e-6, max_iter=200) -> dict[int, float]:
    """Personalized PageRank: teleport AND dangling mass land uniformly
    on the source set; init uniform over sources."""
    ids = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    w = np.zeros((n, n))
    for u, v, wt in edges:
        w[idx[u], idx[v]] += wt
    out = w.sum(axis=1)
    s = np.zeros(n)
    members = [v for v in sources if v in idx]
    for v in members:
        s[idx[v]] = 1.0 / len(members)
    r = s.copy()
    for _ in range(max_iter):
        dang = r[out == 0].sum()
        nz = out > 0
        contrib = (r[nz] / out[nz]) @ w[nz]
        new = (1 - damping) * s + damping * (contrib + dang * s)
        if np.max(np.abs(new - r)) < tol:
            r = new
            break
        r = new
    return {v: float(r[idx[v]]) for v in ids}


def sssp_oracle(edges: list[tuple[int, int, float]],
                sources: list[int]) -> dict[int, float | None]:
    """Multi-source Dijkstra (deliberately a DIFFERENT algorithm from
    the engine's Bellman-Ford supersteps). None = unreachable."""
    import heapq

    ids = {u for u, _, _ in edges} | {v for _, v, _ in edges}
    adj: dict[int, list[tuple[int, float]]] = {}
    for u, v, w in edges:
        adj.setdefault(u, []).append((v, w))
    dist: dict[int, float] = {s: 0.0 for s in sources if s in ids}
    pq = [(0.0, s) for s in dist]
    heapq.heapify(pq)
    done = set()
    while pq:
        d, u = heapq.heappop(pq)
        if u in done:
            continue
        done.add(u)
        for v, w in adj.get(u, []):
            nd = d + w
            if v not in dist or nd < dist[v]:
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return {v: dist.get(v) for v in ids}


def adamic_adar_oracle(edges: list[tuple[int, int]],
                       max_degree=None) -> dict[tuple[int, int], tuple[int, float]]:
    """Brute-force AA: {(a, b): (common, score)} for non-adjacent a<b."""
    import math

    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out: dict[tuple[int, int], tuple[int, float]] = {}
    verts = sorted(adj)
    for i, a in enumerate(verts):
        for b in verts[i + 1:]:
            if b in adj[a]:
                continue
            common = [z for z in adj[a] & adj[b]
                      if max_degree is None or len(adj[z]) <= max_degree]
            if common:
                out[(a, b)] = (
                    len(common),
                    sum(1.0 / math.log(len(adj[z])) for z in common),
                )
    return out


def scc_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Iterative Tarjan (deliberately a DIFFERENT algorithm from the
    engine's distributed coloring). Returns {id: min id of its SCC}."""
    adj: dict[int, list[int]] = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, [])
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    onstk: set[int] = set()
    stk: list[int] = []
    out: dict[int, int] = {}
    counter = [0]
    for root in adj:
        if root in index:
            continue
        work = [(root, iter(adj[root]))]
        index[root] = low[root] = counter[0]
        counter[0] += 1
        stk.append(root)
        onstk.add(root)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    stk.append(w)
                    onstk.add(w)
                    work.append((w, iter(adj[w])))
                    advanced = True
                    break
                elif w in onstk:
                    low[v] = min(low[v], index[w])
            if not advanced:
                work.pop()
                if work:
                    low[work[-1][0]] = min(low[work[-1][0]], low[v])
                if low[v] == index[v]:
                    comp = []
                    while True:
                        w = stk.pop()
                        onstk.discard(w)
                        comp.append(w)
                        if w == v:
                            break
                    m = min(comp)
                    for w in comp:
                        out[w] = m
    return out


def walks_oracle(edges: list[tuple[int, int]], walk_length: int,
                 num_walks: int, seed: int) -> dict[tuple[int, int, int], int]:
    """Replays the md5 hash-family walk rule in pure python:
    rank = int(md5(f"{seed}:{step}:{cur}:{walk_no}:{start}")[:15], 16)
    % deg, neighbors ranked ascending by id (start in the key so
    same-walk_no walks meeting at a vertex don't share suffixes)."""
    import hashlib

    adj: dict[int, list[int]] = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
    for u in adj:
        adj[u] = sorted(set(adj[u]))
    out: dict[tuple[int, int, int], int] = {}
    for start in sorted(adj):
        for w in range(num_walks):
            cur = start
            out[(start, w, 0)] = cur
            for step in range(1, walk_length + 1):
                ns = adj.get(cur)
                if not ns:
                    break
                h = int(
                    hashlib.md5(
                        f"{seed}:{step}:{cur}:{w}:{start}".encode()
                    ).hexdigest()[:15],
                    16,
                )
                cur = ns[h % len(ns)]
                out[(start, w, step)] = cur
    return out


def biased_walks_oracle(
    edges: list[tuple[int, int]], walk_length: int, num_walks: int,
    seed: int, return_weight: int, common_weight: int, far_weight: int,
) -> dict[tuple[int, int, int], int]:
    """Pure-python replay of the node2vec-style biased walk rule
    (md5 hash family). Step 1 is the uniform rank rule (no prev);
    step >= 2 picks the candidate (sorted by id) whose INTEGER
    cumulative-weight interval contains
    int(md5(f"{seed}:{step}:{cur}:{prev}:{w}:{start}")[:15], 16) % tot,
    with weight return_weight if x == prev, common_weight if
    (prev, x) is an edge, else far_weight. tot == 0 ends the walk."""
    import hashlib

    adj: dict[int, list[int]] = {}
    for u, v in sorted(set(edges)):
        adj.setdefault(u, []).append(v)
    pairs = set(edges)
    out: dict[tuple[int, int, int], int] = {}
    for start in sorted(adj):
        for w in range(num_walks):
            cur, prev = start, None
            out[(start, w, 0)] = cur
            for step in range(1, walk_length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                if prev is None:
                    h = int(hashlib.md5(
                        f"{seed}:{step}:{cur}:{w}:{start}".encode()
                    ).hexdigest()[:15], 16)
                    nxt = nbrs[h % len(nbrs)]
                else:
                    wgts = [
                        return_weight if x == prev
                        else common_weight if (prev, x) in pairs
                        else far_weight
                        for x in nbrs
                    ]
                    tot = sum(wgts)
                    if tot == 0:
                        break
                    r = int(hashlib.md5(
                        f"{seed}:{step}:{cur}:{prev}:{w}:{start}".encode()
                    ).hexdigest()[:15], 16) % tot
                    cum = 0
                    for x, g in zip(nbrs, wgts):
                        cum += g
                        if r < cum:
                            nxt = x
                            break
                out[(start, w, step)] = nxt
                prev, cur = cur, nxt
    return out


def truss_oracle(edges: list[tuple[int, int]]) -> dict[tuple[int, int], int]:
    """Exact per-edge trussness via the sequential peel (a DIFFERENT
    algorithm from the engine's h-index fixpoint): for k = 2, 3, ...
    repeatedly delete edges whose in-subgraph support < k-1; edges
    deleted during round k have trussness k."""
    from collections import defaultdict

    adj = defaultdict(set)
    remaining = set()
    for u, v in edges:
        if u == v:
            continue
        a, b = min(u, v), max(u, v)
        remaining.add((a, b))
        adj[a].add(b)
        adj[b].add(a)
    truss = {}
    k = 2
    while remaining:
        changed = True
        while changed:
            changed = False
            for e in sorted(remaining):
                u, v = e
                if len(adj[u] & adj[v]) < k - 1:
                    truss[e] = k
                    remaining.discard(e)
                    adj[u].discard(v)
                    adj[v].discard(u)
                    changed = True
        k += 1
    return truss
