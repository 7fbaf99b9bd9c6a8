"""Independent pure-Python oracles for the graph algorithms.

Each oracle implements the reference semantics cited in SURVEY.md §2.5
directly (no Spark, no shared code with the engine), mirroring the
reference's golden-output test strategy (analytical_engine/test/
app_tests.sh:115-126; python/graphscope/tests/test_app.py:136-234).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict


def _adj(edges: list[tuple[int, int]], directed: bool) -> dict[int, list[int]]:
    out = defaultdict(list)
    for s, d in edges:
        out[s].append(d)
        if not directed:
            out[d].append(s)
    return out


def pagerank_oracle(
    edges: list[tuple[int, int]],
    vertices: list[int],
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float | None = 1e-6,
) -> dict[int, float]:
    """apps/pagerank/pagerank_networkx.h:54-163 (dangling pool, L1 tol)."""
    n = len(vertices)
    outdeg = Counter(s for s, _ in edges)
    r = {v: 1.0 / n for v in vertices}
    for _ in range(max_iter):
        dangling = sum(r[v] for v in vertices if outdeg[v] == 0)
        contrib = defaultdict(float)
        for s, d in edges:
            contrib[d] += r[s] / outdeg[s]
        base = (1.0 - alpha) / n + alpha * dangling / n
        new = {v: alpha * contrib[v] + base for v in vertices}
        err = sum(abs(new[v] - r[v]) for v in vertices)
        r = new
        if tol is not None and err <= tol * n:
            break
    return r


def wcc_oracle(edges: list[tuple[int, int]], vertices: list[int]) -> dict[int, int]:
    """Component id = min vertex id (wcc_projected.h:70-182)."""
    parent = {v: v for v in vertices}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return {v: find(v) for v in vertices}


def cdlp_oracle(
    edges: list[tuple[int, int]],
    vertices: list[int],
    max_round: int = 10,
    directed: bool = True,
) -> dict[int, int]:
    """LDBC CDLP: synchronous rounds, most-frequent label, min tie-break
    (analytical/app/lpa.py:27-55; performance_and_benchmark.md:14).
    Directed: neighbors along both directions with multiplicity."""
    nbrs = defaultdict(list)
    seen = set()
    for s, d in edges:
        if s == d:
            continue
        if directed:
            nbrs[d].append(s)
            nbrs[s].append(d)
        else:
            if (s, d) not in seen and (d, s) not in seen:
                seen.add((s, d))
                nbrs[d].append(s)
                nbrs[s].append(d)
    label = {v: v for v in vertices}
    for _ in range(max_round):
        new = {}
        for v in vertices:
            if not nbrs[v]:
                new[v] = label[v]
                continue
            cnt = Counter(label[u] for u in nbrs[v])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        label = new
    return label


def triangles_oracle(
    edges: list[tuple[int, int]], vertices: list[int]
) -> dict[int, int]:
    """Per-vertex triangle counts, undirected simple graph
    (apps/clustering/triangles.h:43-158)."""
    nbr = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbr[s].add(d)
            nbr[d].add(s)
    tri = {v: 0 for v in vertices}
    for v in vertices:
        for u in nbr[v]:
            if u > v:
                common = nbr[v] & nbr[u]
                for w in common:
                    if w > u:
                        tri[v] += 1
                        tri[u] += 1
                        tri[w] += 1
    return tri


def lcc_oracle(edges: list[tuple[int, int]], vertices: list[int]) -> dict[int, float]:
    tri = triangles_oracle(edges, vertices)
    nbr = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbr[s].add(d)
            nbr[d].add(s)
    out = {}
    for v in vertices:
        d = len(nbr[v])
        out[v] = 2.0 * tri[v] / (d * (d - 1)) if d >= 2 else 0.0
    return out


def bfs_oracle(
    edges: list[tuple[int, int]], vertices: list[int], source: int, directed: bool = True
) -> dict[int, int]:
    adj = _adj(edges, directed)
    depth = {v: -1 for v in vertices}
    depth[source] = 0
    frontier = [source]
    d = 0
    while frontier:
        nxt = []
        for v in frontier:
            for u in adj[v]:
                if depth[u] == -1:
                    depth[u] = d + 1
                    nxt.append(u)
        frontier = nxt
        d += 1
    return depth


def sssp_oracle(
    edges: list[tuple[int, int, float]],
    vertices: list[int],
    source: int,
    directed: bool = True,
) -> dict[int, float]:
    dist = {v: math.inf for v in vertices}
    dist[source] = 0.0
    es = list(edges) + ([] if directed else [(d, s, w) for s, d, w in edges])
    for _ in range(len(vertices)):
        changed = False
        for s, d, w in es:
            if dist[s] + w < dist[d]:
                dist[d] = dist[s] + w
                changed = True
        if not changed:
            break
    return dist


def hits_oracle(
    edges: list[tuple[int, int]], vertices: list[int], max_iter: int = 20
) -> dict[int, tuple[float, float]]:
    es = sorted({(s, d) for s, d in edges if s != d})
    n = len(vertices)
    hub = {v: 1.0 / n for v in vertices}
    auth = {v: 1.0 / n for v in vertices}
    for _ in range(max_iter):
        a = defaultdict(float)
        for s, d in es:
            a[d] += hub[s]
        norm = sum(a.values()) or 1.0
        auth = {v: a[v] / norm for v in vertices}
        h = defaultdict(float)
        for s, d in es:
            h[s] += auth[d]
        norm = sum(h.values()) or 1.0
        hub = {v: h[v] / norm for v in vertices}
    return {v: (hub[v], auth[v]) for v in vertices}


def eigenvector_oracle(
    edges: list[tuple[int, int]],
    vertices: list[int],
    max_iter: int = 100,
    tol: float | None = 1e-6,
) -> dict[int, float]:
    """NX power iteration: x' = (x + Aᵀx)/‖·‖₂, L1 stop at n·tol."""
    n = len(vertices)
    x = {v: 1.0 / n for v in vertices}
    for _ in range(max_iter):
        s = defaultdict(float)
        for a, b in edges:
            s[b] += x[a]
        raw = {v: x[v] + s[v] for v in vertices}
        norm = math.sqrt(sum(val * val for val in raw.values())) or 1.0
        new = {v: raw[v] / norm for v in vertices}
        err = sum(abs(new[v] - x[v]) for v in vertices)
        x = new
        if tol is not None and err <= tol * n:
            break
    return x


def katz_oracle(
    edges: list[tuple[int, int]],
    vertices: list[int],
    alpha: float = 0.1,
    beta: float = 1.0,
    max_iter: int = 100,
    tol: float | None = 1e-6,
) -> dict[int, float]:
    """NX Katz: x init 0; x' = α·Aᵀx + β; final L2 normalize."""
    n = len(vertices)
    x = {v: 0.0 for v in vertices}
    for _ in range(max_iter):
        s = defaultdict(float)
        for a, b in edges:
            s[b] += x[a]
        new = {v: alpha * s[v] + beta for v in vertices}
        err = sum(abs(new[v] - x[v]) for v in vertices)
        x = new
        if tol is not None and err <= tol * n:
            break
    norm = math.sqrt(sum(val * val for val in x.values())) or 1.0
    return {v: x[v] / norm for v in vertices}


def closeness_oracle(
    edges: list[tuple[int, int]], vertices: list[int]
) -> dict[int, float]:
    """WF-improved closeness, undirected BFS hops."""
    nbr = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbr[s].add(d)
            nbr[d].add(s)
    n = len(vertices)
    out = {}
    for v in vertices:
        dist = {v: 0}
        frontier = [v]
        d = 0
        while frontier:
            d += 1
            nxt = []
            for u in frontier:
                for w in nbr[u]:
                    if w not in dist:
                        dist[w] = d
                        nxt.append(w)
            frontier = nxt
        r = len(dist)
        sd = sum(dist.values())
        out[v] = ((r - 1) / max(n - 1, 1)) * ((r - 1) / sd) if sd > 0 and n > 1 else 0.0
    return out


def avg_clustering_oracle(edges: list[tuple[int, int]], vertices: list[int]) -> float:
    vals = lcc_oracle(edges, vertices)
    return sum(vals.values()) / len(vals) if vals else 0.0


def transitivity_oracle(edges: list[tuple[int, int]], vertices: list[int]) -> float:
    tri = triangles_oracle(edges, vertices)
    nbr = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbr[s].add(d)
            nbr[d].add(s)
    wedges = sum(len(nbr[v]) * (len(nbr[v]) - 1) / 2 for v in vertices)
    return sum(tri.values()) / wedges if wedges > 0 else 0.0


def degree_assortativity_oracle(
    edges: list[tuple[int, int]], vertices: list[int]
) -> float:
    nbr = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbr[s].add(d)
            nbr[d].add(s)
    pairs = [
        (len(nbr[u]), len(nbr[v])) for u in vertices for v in nbr[u]
    ]
    if not pairs:
        return 0.0
    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]
    mx = sum(xs) / len(xs)
    my = sum(ys) / len(ys)
    cov = sum((a - mx) * (b - my) for a, b in pairs)
    vx = math.sqrt(sum((a - mx) ** 2 for a in xs))
    vy = math.sqrt(sum((b - my) ** 2 for b in ys))
    return cov / (vx * vy) if vx > 0 and vy > 0 else 0.0


def average_degree_connectivity_oracle(
    edges: list[tuple[int, int]], vertices: list[int]
) -> dict[int, float]:
    nbr = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbr[s].add(d)
            nbr[d].add(s)
    by_deg = defaultdict(list)
    for v in vertices:
        k = len(nbr[v])
        if k > 0:
            by_deg[k].append(sum(len(nbr[u]) for u in nbr[v]) / k)
    return {k: sum(vals) / len(vals) for k, vals in by_deg.items()}


def core_number_oracle(
    edges: list[tuple[int, int]], vertices: list[int]
) -> dict[int, int]:
    """Classic peeling (exact core numbers)."""
    import heapq

    nbr = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbr[s].add(d)
            nbr[d].add(s)
    cur = {v: len(nbr[v]) for v in vertices}
    heap = [(d, v) for v, d in cur.items()]
    heapq.heapify(heap)
    removed: set[int] = set()
    core: dict[int, int] = {}
    k = 0
    while heap:
        dv, v = heapq.heappop(heap)
        if v in removed or dv != cur[v]:
            continue  # stale heap entry
        k = max(k, dv)
        core[v] = k
        removed.add(v)
        for u in nbr[v]:
            if u not in removed:
                cur[u] -= 1
                heapq.heappush(heap, (cur[u], u))
    return {v: core.get(v, 0) for v in vertices}


def attribute_assortativity_oracle(
    edges: list[tuple[int, int]], vertices: list[int], attr: dict[int, int]
) -> float:
    """NX attribute_assortativity_coefficient, categorical."""
    nbr = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbr[s].add(d)
            nbr[d].add(s)
    pairs = [(attr[u], attr[v]) for u in vertices for v in nbr[u]]
    m = len(pairs)
    if m == 0:
        return 0.0
    tr = sum(1 for a, b in pairs if a == b) / m
    rowsum = Counter(a for a, _ in pairs)
    colsum = Counter(b for _, b in pairs)
    sumsq = sum(
        (rowsum[k] / m) * (colsum[k] / m) for k in set(rowsum) | set(colsum)
    )
    return (tr - sumsq) / (1 - sumsq) if sumsq < 1 else 1.0


def bfs_parent_oracle(
    edges: list[tuple[int, int]],
    vertices: list[int],
    source: int,
    directed: bool = True,
) -> dict[int, tuple[int, int]]:
    """(depth, parent): parent = min-id predecessor at depth-1."""
    depth = bfs_oracle(edges, vertices, source, directed)
    adj = _adj(edges, directed)
    parent = {}
    for v in vertices:
        if v == source:
            parent[v] = source
        elif depth[v] == -1:
            parent[v] = -1
        else:
            cands = [
                u for u in vertices if depth[u] == depth[v] - 1 and v in adj[u]
            ]
            parent[v] = min(cands)
    return {v: (depth[v], parent[v]) for v in vertices}


def sssp_average_length_oracle(
    edges: list[tuple[int, int, float]],
    vertices: list[int],
    sources: list[int] | None = None,
    directed: bool = True,
) -> float:
    roots = sources or vertices
    per_root = []
    for r in roots:
        dist = sssp_oracle(edges, vertices, r, directed)
        reach = [d for v, d in dist.items() if v != r and d != math.inf]
        if reach:
            per_root.append(sum(reach) / len(reach))
    return sum(per_root) / len(per_root) if per_root else 0.0


def voterank_oracle(
    edges: list[tuple[int, int]], vertices: list[int], num_seeds: int = 10
) -> list[int]:
    """NX VoteRank with deterministic min-id tie-break.  Abilities are
    integers scaled by m (init m, decrement n, floor 0) — the float
    recurrence times the positive constant m, matching
    algorithms/voterank.py and its DuckDB oracle exactly."""
    nbr = defaultdict(set)
    seen = set()
    n_sym = 0
    for s, d in edges:
        if s != d and (s, d) not in seen and (d, s) not in seen:
            seen.add((s, d))
            nbr[s].add(d)
            nbr[d].add(s)
            n_sym += 2
    n = len(vertices)
    m = n_sym
    ability = {v: m for v in vertices}
    elected = []
    for _ in range(min(num_seeds, n)):
        score = {
            v: sum(ability[u] for u in nbr[v])
            for v in vertices
            if v not in elected
        }
        best = max(score.items(), key=lambda kv: (kv[1], -kv[0]), default=None)
        if best is None or best[1] <= 0:
            break
        w = best[0]
        elected.append(w)
        ability[w] = 0
        for u in nbr[w]:
            ability[u] = max(ability[u] - n, 0)
    return elected


def betweenness_oracle(
    edges: list[tuple[int, int]], vertices: list[int]
) -> dict[int, float]:
    """Brandes, undirected unweighted, unnormalized (pairs counted once)."""
    from collections import deque

    nbr = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbr[s].add(d)
            nbr[d].add(s)
    bc = {v: 0.0 for v in vertices}
    for s in vertices:
        stack = []
        pred = {v: [] for v in vertices}
        sigma = {v: 0.0 for v in vertices}
        dist = {v: -1 for v in vertices}
        sigma[s] = 1.0
        dist[s] = 0
        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for w in nbr[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    pred[w].append(v)
        delta = {v: 0.0 for v in vertices}
        while stack:
            w = stack.pop()
            for v in pred[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return {v: bc[v] / 2.0 for v in vertices}


def betweenness_endpoints_oracle(
    edges: list[tuple[int, int]], vertices: list[int]
) -> dict[int, float]:
    """Brandes with endpoint counting (NX endpoints=True): root gets
    |reached|−1, every other reached w gets delta[w]+1."""
    from collections import deque

    nbr = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbr[s].add(d)
            nbr[d].add(s)
    bc = {v: 0.0 for v in vertices}
    for s in vertices:
        stack = []
        pred = {v: [] for v in vertices}
        sigma = {v: 0.0 for v in vertices}
        dist = {v: -1 for v in vertices}
        sigma[s] = 1.0
        dist[s] = 0
        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for w in nbr[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    pred[w].append(v)
        bc[s] += len(stack) - 1
        delta = {v: 0.0 for v in vertices}
        while stack:
            w = stack.pop()
            for v in pred[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w] + 1
    return {v: bc[v] / 2.0 for v in vertices}


def louvain_oracle(
    edges: list[tuple[int, int]],
    vertices: list[int],
    max_rounds: int = 10,
    max_phases: int = 3,
) -> dict[int, int]:
    """Deterministic synchronous Louvain (exact-integer modularity
    scores) — the SAME semantics the Spark implementation defines:

    per round, every vertex synchronously evaluates
        S(C) = m2·k_{v,C} − k_v·Σtot_C          (C ≠ D, neighbor comms)
        S_stay = m2·k_{v,D∖v} − k_v·(Σtot_D − k_v)
    and moves to argmax_C S(C) (ties → min C) iff S > S_stay; rounds
    repeat until quiet or max_rounds; then communities contract to a
    weighted graph and the next phase runs.  Output labels = min
    original vid per final community.
    """
    # weighted undirected adjacency; self-loop weight kept separately
    w = defaultdict(int)  # unordered pair (min,max) -> weight
    self_w = defaultdict(int)  # node -> self-loop weight
    for s, d in edges:
        a, b = min(s, d), max(s, d)
        if a != b:
            w[(a, b)] += 1
    nodes = list(vertices)
    member = {v: {v} for v in vertices}  # supernode -> original vids
    final = {v: v for v in vertices}

    for _phase in range(max_phases):
        nbrw = defaultdict(dict)
        for (a, b), wt in w.items():
            nbrw[a][b] = nbrw[a].get(b, 0) + wt
            nbrw[b][a] = nbrw[b].get(a, 0) + wt
        k = {v: sum(nbrw[v].values()) + 2 * self_w[v] for v in nodes}
        m2 = sum(k.values())
        if m2 == 0:
            break
        comm = {v: v for v in nodes}
        for _ in range(max_rounds):
            tot = defaultdict(int)
            for v in nodes:
                tot[comm[v]] += k[v]
            moves = {}
            for v in nodes:
                d = comm[v]
                kvc = defaultdict(int)
                for u, wt in nbrw[v].items():
                    kvc[comm[u]] += wt
                s_stay = m2 * kvc.get(d, 0) - k[v] * (tot[d] - k[v])
                best_c, best_s = None, None
                for c in sorted(kvc):
                    if c == d:
                        continue
                    s = m2 * kvc[c] - k[v] * tot[c]
                    if best_s is None or s > best_s or (s == best_s and c < best_c):
                        best_c, best_s = c, s
                if best_c is not None and best_s > s_stay:
                    moves[v] = best_c
            if not moves:
                break
            for v, c in moves.items():
                comm[v] = c
        # contract
        groups = defaultdict(set)
        for v in nodes:
            groups[comm[v]].add(v)
        if len(groups) == len(nodes):
            break
        new_member = {}
        for c, vs in groups.items():
            s = set()
            for v in vs:
                s |= member[v]
            new_member[c] = s
        new_w = defaultdict(int)
        new_self = defaultdict(int)
        for c, vs in groups.items():
            for v in vs:
                new_self[c] += self_w[v]
        for (a, b), wt in w.items():
            ca, cb = comm[a], comm[b]
            if ca != cb:
                x, y = min(ca, cb), max(ca, cb)
                new_w[(x, y)] += wt
            else:
                new_self[ca] += wt
        w = new_w
        self_w = new_self
        nodes = list(groups)
        member = new_member

    for c, vs in member.items():
        lab = min(vs)
        for v in vs:
            final[v] = lab
    return final


def kcore_oracle(
    edges: list[tuple[int, int]], vertices: list[int], k: int
) -> dict[int, bool]:
    nbr = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbr[s].add(d)
            nbr[d].add(s)
    active = set(vertices)
    while True:
        drop = {v for v in active if len(nbr[v] & active) < k}
        if not drop:
            break
        active -= drop
    return {v: v in active for v in vertices}


def multi_source_bfs_oracle(
    edges: list[tuple[int, int]],
    roots: list[int],
    directed: bool = False,
) -> dict[tuple[int, int], int]:
    """(root, v) -> hop distance, reachable pairs only."""
    adj = _adj(edges, directed)
    out = {}
    for r in roots:
        dist = {r: 0}
        frontier = [r]
        while frontier:
            nxt = []
            for v in frontier:
                for w in adj[v]:
                    if w not in dist:
                        dist[w] = dist[v] + 1
                        nxt.append(w)
            frontier = nxt
        for v, d in dist.items():
            out[(r, v)] = d
    return out


def harmonic_oracle(
    edges: list[tuple[int, int]], roots: list[int]
) -> dict[int, float]:
    pairs = multi_source_bfs_oracle(edges, roots, directed=False)
    out = {r: 0.0 for r in roots}
    for (r, v), d in pairs.items():
        if v != r:
            out[r] += 1.0 / d
    return out


def eccentricity_oracle(
    edges: list[tuple[int, int]], roots: list[int]
) -> dict[int, int]:
    pairs = multi_source_bfs_oracle(edges, roots, directed=False)
    out = {r: 0 for r in roots}
    for (r, _), d in pairs.items():
        out[r] = max(out[r], d)
    return out


def scc_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Kosaraju (iterative); scc id = min member vid.  Vertex set =
    edge endpoints."""
    fwd = defaultdict(list)
    rev = defaultdict(list)
    vs: set[int] = set()
    for s, d in edges:
        if s == d:
            vs.add(s)
            continue
        fwd[s].append(d)
        rev[d].append(s)
        vs.add(s)
        vs.add(d)
    order: list[int] = []
    seen: set[int] = set()
    for v0 in sorted(vs):
        if v0 in seen:
            continue
        seen.add(v0)
        stack = [(v0, iter(fwd[v0]))]
        while stack:
            node, it = stack[-1]
            advanced = False
            for w in it:
                if w not in seen:
                    seen.add(w)
                    stack.append((w, iter(fwd[w])))
                    advanced = True
                    break
            if not advanced:
                order.append(node)
                stack.pop()
    comp: dict[int, int] = {}
    for v in reversed(order):
        if v in comp:
            continue
        members = [v]
        comp[v] = v
        stack2 = [v]
        while stack2:
            n = stack2.pop()
            for w in rev[n]:
                if w not in comp:
                    comp[w] = v
                    members.append(w)
                    stack2.append(w)
        m = min(members)
        for u in members:
            comp[u] = m
    return comp


def mis_oracle(
    edges: list[tuple[int, int]], vertices: list[int]
) -> dict[int, bool]:
    """Sequential greedy by increasing vid == the lexicographically
    first MIS (what parallel Luby-by-id computes)."""
    nbr = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbr[s].add(d)
            nbr[d].add(s)
    mis: set[int] = set()
    for v in sorted(vertices):
        if not (nbr[v] & mis):
            mis.add(v)
    return {v: v in mis for v in vertices}


def four_clique_oracle(
    edges: list[tuple[int, int]], vertices: list[int]
) -> int:
    nbr = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbr[s].add(d)
            nbr[d].add(s)
    count = 0
    for (a, b) in {(min(s, d), max(s, d)) for s, d in edges if s != d}:
        common = sorted(u for u in (nbr[a] & nbr[b]) if u > b)
        for i, c in enumerate(common):
            for dd in common[i + 1:]:
                if dd in nbr[c]:
                    count += 1
    return count


def ppr_oracle(
    edges: list[tuple[int, int]],
    vertices: list[int],
    sources: list[int],
    alpha: float = 0.85,
    rounds: int = 10,
) -> dict[int, float]:
    """Personalized PageRank, fixed rounds; teleport + dangling mass
    to the uniform distribution over ``sources``."""
    dedup = sorted({(s, d) for s, d in edges})
    out = defaultdict(list)
    for s, d in dedup:
        out[s].append(d)
    p = {v: (1.0 / len(sources) if v in set(sources) else 0.0) for v in vertices}
    r = dict(p)
    for _ in range(rounds):
        dang = sum(r[v] for v in vertices if not out[v])
        nxt = {v: ((1.0 - alpha) + alpha * dang) * p[v] for v in vertices}
        for s in vertices:
            if out[s]:
                share = alpha * r[s] / len(out[s])
                for d in out[s]:
                    nxt[d] += share
        r = nxt
    return r


def linkpred_oracle(
    edges: list[tuple[int, int]], mod: int | None = None
) -> dict[tuple[int, int], tuple[int, float, float, int]]:
    """(a, b) -> (cn, jaccard, adamic_adar, pref_attach) for
    non-adjacent pairs a < b with >= 1 common neighbor (a-side sampled
    by ``mod``)."""
    nbr = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbr[s].add(d)
            nbr[d].add(s)
    out = {}
    verts = sorted(nbr)
    for a in verts:
        if mod is not None and a % mod != 0:
            continue
        two_hop = set()
        for m in nbr[a]:
            two_hop |= nbr[m]
        for b in two_hop:
            if b <= a or b in nbr[a]:
                continue
            common = nbr[a] & nbr[b]
            if not common:
                continue
            cn = len(common)
            da, db = len(nbr[a]), len(nbr[b])
            out[(a, b)] = (
                cn,
                cn / (da + db - cn),
                sum(1.0 / math.log(len(nbr[m])) for m in common),
                da * db,
            )
    return out


def msf_oracle(
    edges: list[tuple[int, int, float]]
) -> set[tuple[int, int, float]]:
    """Kruskal under the (w, src, dst) total order (src < dst
    canonical) — the deterministic forest Borůvka with the same
    tie-break computes."""
    canon: dict[tuple[int, int], float] = {}
    for s, d, w in edges:
        if s == d:
            continue
        a, b = min(s, d), max(s, d)
        if (a, b) not in canon or w < canon[(a, b)]:
            canon[(a, b)] = w
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    out = set()
    for (a, b), w in sorted(canon.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            out.add((a, b, w))
    return out


def ktruss_oracle(
    edges: list[tuple[int, int]], k: int
) -> set[tuple[int, int]]:
    """Iterative support pruning: every edge must close >= k-2
    triangles inside the surviving subgraph."""
    cur = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    while True:
        nb = defaultdict(set)
        for a, b in cur:
            nb[a].add(b)
            nb[b].add(a)
        drop = {(a, b) for a, b in cur if len(nb[a] & nb[b]) < k - 2}
        if not drop:
            return cur
        cur -= drop


def clustering_directed_oracle(
    edges: list[tuple[int, int]], vertices: list[int]
) -> dict[int, float]:
    """NX/Fagiolo directed clustering: c = T / (dt(dt-1) - 2 drec),
    T = 1/2 [(A+A^T)^3]_vv."""
    de = {(s, d) for s, d in edges if s != d}
    b = defaultdict(int)
    for s, d in de:
        b[(s, d)] += 1
        b[(d, s)] += 1
    nbr = defaultdict(set)
    for (s, d) in b:
        nbr[s].add(d)
    out = {}
    din = Counter(d for _s, d in de)
    dout = Counter(s for s, _d in de)
    for v in vertices:
        t = 0
        for j in nbr[v]:
            for k in nbr[j]:
                if k != v and (k, v) in b:
                    t += b[(v, j)] * b[(j, k)] * b[(k, v)]
        tv = t / 2.0
        dt = din.get(v, 0) + dout.get(v, 0)
        dr = sum(1 for u in nbr[v] if b[(v, u)] == 2)
        denom = dt * (dt - 1) - 2 * dr
        out[v] = tv / denom if denom > 0 else 0.0
    return out


def _simple_undirected(
    edges: list[tuple[int, int]], vertices: list[int]
) -> tuple[dict[int, list[int]], set[tuple[int, int]]]:
    es = set()
    for s, d in edges:
        if s != d:
            es.add((min(s, d), max(s, d)))
    adj = {v: [] for v in vertices}
    for a, b in es:
        adj[a].append(b)
        adj[b].append(a)
    return adj, es


def biconnectivity_oracle(
    edges: list[tuple[int, int]], vertices: list[int]
) -> tuple[list[set[tuple[int, int]]], set[tuple[int, int]], set[int]]:
    """Iterative Tarjan (Hopcroft-Tarjan) biconnectivity: returns
    (bcc edge-partitions, bridges, articulation points) — canonical
    (min, max) edge tuples throughout."""
    adj, _es = _simple_undirected(edges, vertices)
    disc: dict[int, int] = {}
    low: dict[int, int] = {}
    parent: dict[int, int] = {}
    comps: list[set[tuple[int, int]]] = []
    bridges: set[tuple[int, int]] = set()
    arts: set[int] = set()
    timer = 0
    estack: list[tuple[int, int]] = []
    for root in sorted(vertices):
        if root in disc:
            continue
        disc[root] = low[root] = timer
        timer += 1
        if not adj[root]:
            continue
        stack = [(root, iter(sorted(adj[root])))]
        root_children = 0
        while stack:
            v, it = stack[-1]
            advanced = False
            for w in it:
                if w not in disc:
                    parent[w] = v
                    estack.append((min(v, w), max(v, w)))
                    disc[w] = low[w] = timer
                    timer += 1
                    stack.append((w, iter(sorted(adj[w]))))
                    if v == root:
                        root_children += 1
                    advanced = True
                    break
                elif w != parent.get(v) and disc[w] < disc[v]:
                    estack.append((min(v, w), max(v, w)))
                    low[v] = min(low[v], disc[w])
            if not advanced:
                stack.pop()
                if stack:
                    u = stack[-1][0]
                    low[u] = min(low[u], low[v])
                    if low[v] >= disc[u]:
                        comp: set[tuple[int, int]] = set()
                        mark = (min(u, v), max(u, v))
                        while estack:
                            e = estack.pop()
                            comp.add(e)
                            if e == mark:
                                break
                        comps.append(comp)
                        if u != root:
                            arts.add(u)
                    if low[v] > disc[u]:
                        bridges.add((min(u, v), max(u, v)))
        if root_children >= 2:
            arts.add(root)
    return comps, bridges, arts


def maximal_matching_oracle(
    edges: list[tuple[int, int]], vertices: list[int]
) -> dict[int, int]:
    """FLASH mm.h handshake simulation: propose to max-id unmatched
    neighbor; mutual proposals match.  Returns vid -> mate (-1 if none)."""
    adj, _ = _simple_undirected(edges, vertices)
    mate = {v: -1 for v in vertices}
    while True:
        prop = {}
        for v in vertices:
            if mate[v] != -1:
                continue
            cand = [u for u in adj[v] if mate[u] == -1]
            if cand:
                prop[v] = max(cand)
        newly = [(v, p) for v, p in prop.items() if prop.get(p) == v]
        if not newly:
            break
        for v, p in newly:
            mate[v] = p
    return mate


def min_vertex_cover_oracle(
    edges: list[tuple[int, int]], vertices: list[int]
) -> set[int]:
    """min-cover-greedy.h simulation: local max by (remaining-degree,
    id) among non-cover neighbors joins the cover."""
    adj, _ = _simple_undirected(edges, vertices)
    d = {v: len(adj[v]) for v in vertices}
    cover: set[int] = set()
    active = {v for v in vertices if d[v] > 0}
    while active:
        sel = set()
        for v in active:
            blocked = any(
                u not in cover and (d[u], u) > (d[v], v) for u in adj[v]
            )
            if not blocked:
                sel.add(v)
        cover |= sel
        dec = Counter()
        for v in sel:
            for u in adj[v]:
                if u not in cover:
                    dec[u] += 1
        for u, c in dec.items():
            d[u] -= c
        active = {v for v in active if v not in cover and d[v] > 0}
    return cover


def min_dominating_set_oracle(
    edges: list[tuple[int, int]], vertices: list[int]
) -> set[int]:
    """min-dominating-set.h simulation: 2-hop local max by
    (non-dominated-degree, id); first round uses full degree."""
    adj, _ = _simple_undirected(edges, vertices)
    cnt = {v: len(adj[v]) for v in vertices}
    dom = {v: False for v in vertices}
    chosen: set[int] = set()
    while not all(dom.values()):
        k1 = {}
        for v in vertices:
            if dom[v]:
                continue
            best = (cnt[v], v)
            for u in adj[v]:
                if not dom[u] and (cnt[u], u) > best:
                    best = (cnt[u], u)
            k1[v] = best
        k2 = {}
        for v in vertices:
            if dom[v]:
                continue
            best = k1[v]
            for u in adj[v]:
                if not dom[u] and k1[u] > best:
                    best = k1[u]
            k2[v] = best
        sel = {v for v in k2 if k2[v][1] == v}
        chosen |= sel
        for v in sel:
            dom[v] = True
            for u in adj[v]:
                dom[u] = True
        for v in vertices:
            if not dom[v]:
                cnt[v] = sum(1 for u in adj[v] if not dom[u])
    return chosen


def _codeg(adj: dict[int, list[int]]) -> dict[tuple[int, int], int]:
    """Common-neighbor counts for all unordered pairs with codeg > 0."""
    from collections import Counter
    from itertools import combinations

    c: Counter = Counter()
    for _, nbrs in adj.items():
        for a, b in combinations(sorted(nbrs), 2):
            c[(a, b)] += 1
    return dict(c)


def rectangle_oracle(edges: list[tuple[int, int]], vertices: list[int]) -> int:
    """4-cycles via the pair identity: C4 = 1/2 Σ_{u<v} C(codeg, 2)
    (independent of the implementation's rank-orientation wedge count)."""
    adj, _ = _simple_undirected(edges, vertices)
    total = sum(w * (w - 1) // 2 for w in _codeg(adj).values())
    assert total % 2 == 0
    return total // 2


def diamond_oracle(edges: list[tuple[int, int]], vertices: list[int]) -> int:
    """Σ over undirected edges of C(common, 2)."""
    adj, es = _simple_undirected(edges, vertices)
    cd = _codeg(adj)
    return sum(w * (w - 1) // 2 for (a, b), w in cd.items() if (a, b) in es)


def three_path_oracle(edges: list[tuple[int, int]], vertices: list[int]) -> int:
    """Honest enumeration: for each edge (u,v), pairs (a,b) with a~u,
    a != v, b~v, b != u, a != b."""
    adj, es = _simple_undirected(edges, vertices)
    total = 0
    for u, v in es:
        for a in adj[u]:
            if a == v:
                continue
            for b in adj[v]:
                if b == u or b == a:
                    continue
                total += 1
    return total


def tailed_triangle_oracle(edges: list[tuple[int, int]], vertices: list[int]) -> int:
    """Reference formula (tailed-triangle.h:59-69): per edge
    (deg(a)+deg(b)-4)*support — 2x the subgraph count (each tailed
    triangle hits the formula via two triangle edges)."""
    adj, es = _simple_undirected(edges, vertices)
    cd = _codeg(adj)
    return sum(
        (len(adj[a]) + len(adj[b]) - 4) * cd.get((a, b), 0) for a, b in es
    )


def densest_oracle(
    edges: list[tuple[int, int]], vertices: list[int]
) -> tuple[int, int, float]:
    """(nv, ne, density) of the max-core subgraph; ne counts both
    directions (densest-sub-2-approx.h:85-92)."""
    core = core_number_oracle(edges, vertices)
    adj, _ = _simple_undirected(edges, vertices)
    cmax = max(core.values())
    top = {v for v in vertices if core[v] == cmax}
    ne = sum(1 for v in top for u in adj[v] if u in top)
    return len(top), ne, ne / len(top)


def directed_census_oracle(edges: list[tuple[int, int]]) -> dict[str, int]:
    """FLASH directed-triangle census over distinct self-loop-free
    directed edges; cyclic uses vid order (count is order-invariant)."""
    es = {(s, d) for s, d in edges if s != d}
    out: dict[int, set[int]] = {}
    inn: dict[int, set[int]] = {}
    for s, d in es:
        out.setdefault(s, set()).add(d)
        inn.setdefault(d, set()).add(s)
    acyclic = sum(
        len(out.get(s, set()) & out.get(d, set())) for s, d in es
    )
    cyclic = 0
    for s, d in es:
        for x in inn.get(s, set()) & out.get(d, set()):
            if x > s and x > d:
                cyclic += 1
    recip = {(s, d) for s, d in es if (d, s) in es}
    in_tri = sum(
        len(out.get(s, set()) & out.get(d, set()))
        for s, d in recip
        if s < d
    )
    out_tri = sum(
        len(inn.get(s, set()) & inn.get(d, set()))
        for s, d in recip
        if s < d
    )
    cycle_plus = sum(
        len(inn.get(s, set()) & out.get(d, set())) for s, d in recip
    )
    return {
        "acyclic": acyclic,
        "cyclic": cyclic,
        "in": in_tri,
        "out": out_tri,
        "cycle_plus": cycle_plus,
    }


def articlerank_oracle(
    edges: list[tuple[int, int]],
    vertices: list[int],
    damping: float = 0.85,
    rounds: int = 10,
    directed: bool = True,
) -> dict[int, float]:
    """FLASH ArticleRank (articlerank.h:41-72): fixed rounds of
    val[d] = (1-damping) + damping * Σ_{s→d} val[s]/(deg[s]+avg)."""
    es = {(s, d) for s, d in edges if s != d}
    if not directed:
        es |= {(d, s) for s, d in es}
    deg = {v: 0 for v in vertices}
    for s, _ in es:
        deg[s] += 1
    n = len(vertices)
    avg = sum(deg.values()) / n
    val = {v: 0.0 for v in vertices}
    for _ in range(rounds):
        nxt = {v: 0.0 for v in vertices}
        for s, d in es:
            nxt[d] += damping * val[s] / (deg[s] + avg)
        val = {v: nxt[v] + (1 - damping) for v in vertices}
    return val


def degeneracy_ordering_oracle(
    edges: list[tuple[int, int]], vertices: list[int]
) -> dict[int, int]:
    """Synchronous degeneracy peel (degeneracy-ordering.h:90-105):
    round i ranks unranked vertices whose degree minus already-ranked
    neighbors is <= degeneracy."""
    adj, _ = _simple_undirected(edges, vertices)
    core = core_number_oracle(edges, vertices)
    dg = max(core.values()) if core else 0
    d = {v: len(adj[v]) for v in vertices}
    rank = {v: -1 for v in vertices}
    i = 0
    while any(r < 0 for r in rank.values()):
        newly = [v for v in vertices if rank[v] < 0 and d[v] <= dg]
        if not newly:
            break
        for v in newly:
            rank[v] = i
        for v in newly:
            for u in adj[v]:
                if rank[u] < 0:
                    d[u] -= 1
        i += 1
    return rank


def onion_layers_oracle(
    edges: list[tuple[int, int]], vertices: list[int]
) -> dict[int, int]:
    """Within-core synchronous peel (onion-layer-ordering.h:73-97):
    d0 = |{u in N(v): core(u) >= core(v)}|; round i ranks unranked
    with d <= core(v); only same-core ranked neighbors decrement."""
    adj, _ = _simple_undirected(edges, vertices)
    core = core_number_oracle(edges, vertices)
    d = {v: sum(1 for u in adj[v] if core[u] >= core[v]) for v in vertices}
    rank = {v: -1 for v in vertices}
    i = 0
    while any(r < 0 for r in rank.values()):
        newly = [v for v in vertices if rank[v] < 0 and d[v] <= core[v]]
        if not newly:
            break
        for v in newly:
            rank[v] = i
        for v in newly:
            for u in adj[v]:
                if rank[u] < 0 and core[u] == core[v]:
                    d[u] -= 1
        i += 1
    return rank


def coloring_oracle(
    edges: list[tuple[int, int]], vertices: list[int], max_rounds: int = 10000
) -> dict[int, int]:
    """FLASH speculative greedy coloring (clustering/color.h:48-82):
    synchronous rounds of c[v] = mex{c[u] : u ∈ N(v), pri(u) > pri(v)}
    with pri = (degree, id), until fixpoint."""
    adj, _ = _simple_undirected(edges, vertices)
    deg = {v: len(adj[v]) for v in vertices}
    pri = {v: (deg[v], v) for v in vertices}
    c = {v: 0 for v in vertices}
    for _ in range(max_rounds):
        nxt = {}
        for v in vertices:
            used = {c[u] for u in adj[v] if pri[u] > pri[v]}
            i = 0
            while i in used:
                i += 1
            nxt[v] = i
        if nxt == c:
            break
        c = nxt
    return c


def min_edge_cover_oracle(
    edges: list[tuple[int, int]], vertices: list[int], max_rounds: int = 10000
) -> tuple[int, int]:
    """Greedy min edge cover (matching/min-edge-cover.h:47-99): handshake
    matching where every unmatched vertex picks its min-(degree, id)
    unmatched neighbor, mutual picks match; cover size = matched/2 +
    |unmatched with deg>0|.  Returns (cover_size, rounds_used)."""
    adj, _ = _simple_undirected(edges, vertices)
    deg = {v: len(adj[v]) for v in vertices}
    mate = {v: -1 for v in vertices}
    pick: dict[int, int] = {v: -1 for v in vertices}
    need = set(v for v in vertices if adj[v])
    rounds = 0
    for r in range(max_rounds):
        # re-pick for vertices flagged as needing one
        for v in need:
            if mate[v] != -1:
                continue
            best = -1
            for u in adj[v]:
                if mate[u] == -1 and (
                    best == -1 or (deg[u], u) < (deg[best], best)
                ):
                    best = u
            pick[v] = best
        # mutual picks match
        newly = []
        for v in vertices:
            u = pick[v]
            if u != -1 and mate[v] == -1 and pick[u] == v and mate[u] == -1:
                newly.append(v)
        if not newly:
            rounds = r
            break
        for v in newly:
            mate[v] = pick[v]
        # unmatched whose pick got matched must re-pick
        need = {
            v
            for v in vertices
            if mate[v] == -1 and pick[v] != -1 and mate[pick[v]] != -1
        }
        rounds = r + 1
    n_match = sum(1 for v in vertices if mate[v] != -1) // 2
    n_single = sum(1 for v in vertices if mate[v] == -1 and deg[v] > 0)
    return n_match + n_single, rounds


def k_center_oracle(
    edges: list[tuple[int, int]], vertices: list[int], k: int
) -> tuple[dict[int, int], list[int]]:
    """Greedy k-center (measurement/k-center.h:48-74): first center is
    argmax (degree, id); each next center is argmax (current min hop
    distance, id); dis = min hop distance to any center (-1 unreachable).
    Returns (dis, centers)."""
    adj, _ = _simple_undirected(edges, vertices)
    INF = float("inf")
    dis = {v: INF for v in vertices}
    deg = {v: len(adj[v]) for v in vertices}
    centers = []
    for i in range(k):
        if i == 0:
            c = max(vertices, key=lambda v: (deg[v], v))
        else:
            c = max(vertices, key=lambda v: (dis[v], v))
        centers.append(c)
        # BFS relax from c
        dis[c] = 0
        frontier = [c]
        d = 0
        while frontier:
            d += 1
            nxt = []
            for v in frontier:
                for u in adj[v]:
                    if dis[u] > d:
                        dis[u] = d
                        nxt.append(u)
            frontier = nxt
    return {v: (-1 if dis[v] == INF else int(dis[v])) for v in dis}, centers


def fluid_community_oracle(
    edges: list[tuple[int, int]],
    vertices: list[int],
    seeds: list[int],
    rounds: int,
) -> dict[int, int]:
    """Synchronous fluid communities (clustering/fluid-community.h:73-106,
    Parés et al. 2017): density d_i = m_i / cnt_i with m_i = self+neighbor
    members of community i and cnt_i = community size at round start; a
    vertex switches to the smallest argmax community when its density
    strictly beats the current one.  Exact: one division per candidate."""
    adj, _ = _simple_undirected(edges, vertices)
    lab = {v: (seeds.index(v) if v in seeds else -1) for v in vertices}
    for _ in range(rounds):
        cnt: dict[int, int] = {}
        for v in vertices:
            if lab[v] >= 0:
                cnt[lab[v]] = cnt.get(lab[v], 0) + 1
        nxt = {}
        for v in vertices:
            m: dict[int, int] = {}
            if lab[v] >= 0:
                m[lab[v]] = 1
            for u in adj[v]:
                if lab[u] >= 0:
                    m[lab[u]] = m.get(lab[u], 0) + 1
            if not m:
                nxt[v] = lab[v]
                continue
            d = {i: mi / cnt[i] for i, mi in m.items()}
            md = max(d.values())
            blab = min(i for i in d if d[i] == md)
            if lab[v] < 0 or md > d.get(lab[v], 0.0):
                nxt[v] = blab
            else:
                nxt[v] = lab[v]
        lab = nxt
    return lab


def sampling_path_oracle(
    edges: list[tuple[int, int]], length: int, limit: int
) -> list[tuple[int, ...]]:
    """Lexicographically-smallest `limit` directed walks of `length`
    edges (sampling_path.h:43-135 with a deterministic cut)."""
    es = sorted(set(edges))
    out = {s: [] for s, _ in es}
    for s, d in es:
        out[s].append(d)
    paths = [(s, d) for s, d in es]
    for _ in range(length - 1):
        paths = [p + (d,) for p in paths for d in out.get(p[-1], [])]
    return sorted(paths)[:limit]


def all_simple_paths_oracle(
    edges: list[tuple[int, int]],
    vertices: list[int],
    source: int,
    target: int,
    cutoff: int,
) -> list[tuple[str, int]]:
    """All simple undirected paths source→target with ≤ cutoff edges."""
    adj, _ = _simple_undirected(edges, vertices)
    out = []

    def rec(path):
        v = path[-1]
        if v == target and len(path) > 1:
            out.append(("-".join(map(str, path)), len(path) - 1))
            return
        if len(path) - 1 >= cutoff:
            return
        for u in adj[v]:
            if u not in path:
                rec(path + [u])

    rec([source])
    return out


def dfs_preorder_oracle(
    edges: list[tuple[int, int]], vertices: list[int]
) -> dict[int, int]:
    """Per-WCC DFS preorder from min-vid root, neighbors ascending."""
    adj, _ = _simple_undirected(edges, vertices)
    rank = {}
    seen = set()
    for root in sorted(vertices):
        if root in seen:
            continue
        order = []
        seen.add(root)
        order.append(root)
        stack = [(root, iter(sorted(adj[root])))]
        while stack:
            v, it = stack[-1]
            advanced = False
            for u in it:
                if u not in seen:
                    seen.add(u)
                    order.append(u)
                    stack.append((u, iter(sorted(adj[u]))))
                    advanced = True
                    break
            if not advanced:
                stack.pop()
        for i, v in enumerate(order):
            rank[v] = i
    return rank


def k_clique_oracle(
    edges: list[tuple[int, int]], vertices: list[int], k: int
) -> int:
    """Brute-force k-clique count (pivot-free recursive extension over
    sorted adjacency)."""
    adj, _ = _simple_undirected(edges, vertices)
    nbr = {v: set(adj[v]) for v in vertices}
    count = 0

    def rec(clique: list[int], cand: list[int]):
        nonlocal count
        if len(clique) == k:
            count += 1
            return
        for i, v in enumerate(cand):
            rec(clique + [v], [u for u in cand[i + 1 :] if u in nbr[v]])

    rec([], sorted(vertices))
    return count


def lpa_u2i_oracle(
    users: dict[int, list[float]],
    edges: list[tuple[int, int, float]],
    max_round: int,
) -> dict[int, list[float]]:
    """Reference twin of apps/lpa/lpa_u2i.h:42-245 (see
    graphscope_spark/algorithms/lpa_u2i.py for the semantics map)."""
    prop_num = len(next(iter(users.values())))
    ideg: dict[int, int] = {}
    odeg: dict[int, int] = {}
    for u, i, _ in edges:
        ideg[i] = ideg.get(i, 0) + 1
        odeg[u] = odeg.get(u, 0) + 1
    onids = {u: 0 for u in users}
    for u, i, _ in edges:
        onids[u] += ideg[i]

    ulab = {u: list(p) for u, p in users.items()}
    ilab: dict[int, list[float]] = {}
    for step in range(2, max_round + 1):
        if step % 2 == 0:  # u2i
            ilab = {}
            for u, i, w in edges:
                acc = ilab.setdefault(i, [0.0] * prop_num)
                for p in range(prop_num):
                    acc[p] += w * ulab[u][p]
        else:  # i2u
            tmp = {u: [0.0] * prop_num for u in users}
            for u, i, w in edges:
                if i in ilab:
                    for p in range(prop_num):
                        tmp[u][p] += w * ilab[i][p]
            for u in users:
                od = odeg.get(u, 0)
                on = onids.get(u, 0)
                new = []
                for p in range(prop_num):
                    old = ulab[u][p]
                    if old == 0.0 or old == 1.0:
                        new.append(old)
                    elif on != od:
                        new.append((tmp[u][p] - od * old) / (on - od))
                    else:
                        new.append(old)
                ulab[u] = new
    return ulab


def lpa_by_color_oracle(
    edges: list[tuple[int, int]], vertices: list[int], max_sweeps: int = 50
) -> dict[int, int]:
    """FLASH lpa_by_color (flash/clustering/lpa-by-color.h:44-146) with
    the deterministic LDBC tie-break (max count, then min label): greedy
    (degree, id)-priority coloring, then sweeps processing color classes
    sequentially (class j sees classes 0..j-1's updates of the same
    sweep) until a full sweep changes nothing."""
    adj, _ = _simple_undirected(edges, vertices)
    colors = coloring_oracle(edges, vertices)
    n_colors = (max(colors.values()) + 1) if colors else 0
    lab = {v: v for v in vertices}
    for _ in range(max_sweeps):
        prev = dict(lab)
        for c in range(n_colors):
            upd = {}
            for v in vertices:
                if colors[v] != c or not adj[v]:
                    continue
                cnt: dict[int, int] = {}
                for u in adj[v]:
                    cnt[lab[u]] = cnt.get(lab[u], 0) + 1
                upd[v] = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            lab.update(upd)
        if lab == prev:
            break
    return lab


def betweenness_weighted_oracle(
    edges: list[tuple[int, int, float]],
    vertices: list[int],
    endpoints: bool = False,
) -> dict[int, float]:
    """Dijkstra Brandes, undirected weighted, unnormalized (pairs /2).
    Parallel edges keep the lightest weight (engine convention)."""
    import heapq
    from collections import defaultdict as dd

    wmin: dict[tuple[int, int], float] = {}
    for s, d, w in edges:
        if s == d:
            continue
        for a, b in ((s, d), (d, s)):
            key = (a, b)
            if key not in wmin or w < wmin[key]:
                wmin[key] = w
    nbr = dd(list)
    for (a, b), w in wmin.items():
        nbr[a].append((b, w))
    bc = {v: 0.0 for v in vertices}
    for s in vertices:
        dist = {v: float("inf") for v in vertices}
        sigma = {v: 0.0 for v in vertices}
        seen = []
        dist[s] = 0.0
        sigma[s] = 1.0
        pq = [(0.0, s)]
        done = set()
        while pq:
            dv, v = heapq.heappop(pq)
            if v in done:
                continue
            done.add(v)
            seen.append(v)
            for w, wt in nbr[v]:
                nd = dist[v] + wt
                if nd < dist[w]:
                    dist[w] = nd
                    heapq.heappush(pq, (nd, w))
        # sigma over the DAG in ascending-dist order
        for v in seen:
            if v == s:
                continue
            sigma[v] = 0.0
        for v in seen:
            for w, wt in nbr[v]:
                if dist[v] + wt == dist[w]:
                    sigma[w] += sigma[v]
        if endpoints:
            bc[s] += len(seen) - 1
        delta = {v: 0.0 for v in vertices}
        for w in reversed(seen):
            for v, wt in nbr[w]:
                if dist[v] + wt == dist[w]:
                    delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w] + (1.0 if endpoints else 0.0)
    return {v: bc[v] / 2.0 for v in vertices}
