"""Graph-analytics operators (ops/graph.py) vs single-process references
on a small adversarial graph: a triangle, a square with one diagonal, a
self-loop, parallel edges under different preds, a hub, and an isolated
pair."""

from itertools import combinations

import numpy as np
import pyarrow as pa
import ray.data as rd

from neo4j_tkapi_ray.ops.graph import (PR_BASE, PR_SCALE,
                                       clustering_coefficient,
                                       degree_distribution, pagerank,
                                       triangle_counts)

# (subj, pred, obj): triangle a-b-c; square c-d-e-f-c with diagonal d-f;
# self-loop g-g; parallel preds a->b twice; hub h -> a..e; isolated i-j
EDGES = [
    ("a", "R1", "b"), ("a", "R2", "b"), ("b", "R1", "c"), ("c", "R1", "a"),
    ("c", "R1", "d"), ("d", "R1", "e"), ("e", "R1", "f"), ("f", "R1", "c"),
    ("d", "R1", "f"),
    ("g", "R1", "g"),
    ("h", "R1", "a"), ("h", "R1", "b"), ("h", "R1", "c"), ("h", "R1", "d"),
    ("h", "R1", "e"),
    ("i", "R1", "j"),
]


def _edges_ds():
    t = pa.table({
        "subj": [e[0] for e in EDGES],
        "pred": [e[1] for e in EDGES],
        "obj": [e[2] for e in EDGES],
        "weight": pa.array([1] * len(EDGES), pa.int64()),
        "score": pa.array([1.0] * len(EDGES), pa.float64()),
    })
    # several small blocks so the exchanges actually move rows
    return rd.from_arrow(t).repartition(4)


def test_degree_distribution(ray_session):
    got = {r["degree"]: r["n_nodes"]
           for r in degree_distribution(_edges_ds()).take_all()}
    # per-node incident edge-row count; a self-loop counts ONCE — the
    # Cypher (n)-[r]-() semantics the operator emulates (ADVICE r3: g's
    # degree is 1, not 2)
    deg = {}
    for s, _, o in EDGES:
        deg[s] = deg.get(s, 0) + 1
        if o != s:
            deg[o] = deg.get(o, 0) + 1
    assert deg["g"] == 1  # the self-loop node pins the semantics
    want = {}
    for d in deg.values():
        want[d] = want.get(d, 0) + 1
    assert got == want


def _pagerank_ref(iters=5):
    pairs = sorted({(s, o) for s, _, o in EDGES})
    nodes = sorted({n for p in pairs for n in p})
    od = {}
    for s, _o in pairs:
        od[s] = od.get(s, 0) + 1
    r = {n: PR_SCALE for n in nodes}
    for _ in range(iters):
        inc = {n: 0 for n in nodes}
        for s, o in pairs:
            inc[o] += r[s] // od[s]
        r = {n: PR_BASE + (85 * inc[n]) // 100 for n in nodes}
    return r


def test_pagerank_integer_exact(ray_session):
    got = {r["node_id"]: r["rank_micro"]
           for r in pagerank(_edges_ds(), iters=5).take_all()}
    assert got == _pagerank_ref(5)
    # hub h has no in-edges: rank is exactly the base after any iteration
    assert got["h"] == PR_BASE


def _triangles_ref():
    und = {tuple(sorted((s, o))) for s, _, o in EDGES if s != o}
    nodes = sorted({n for p in und for n in p})
    count = {n: 0 for n in nodes}
    for a, b, c in combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= und:
            for n in (a, b, c):
                count[n] += 1
    return {n: c for n, c in count.items() if c}


def test_triangle_counts(ray_session):
    got = {r["node_id"]: r["n_triangles"]
           for r in triangle_counts(_edges_ds()).take_all()}
    want = _triangles_ref()
    assert got == want
    # sanity on the fixture: a-b-c triangle, c-d-f-? square diagonal makes
    # c-d-f and d-e-f triangles, hub h closes with every a..e edge pair
    assert want["d"] >= 2 and want["a"] >= 1


def test_clustering_coefficient(ray_session):
    got = {r["node_id"]: (r["degree"], r["n_triangles"], r["local_cc"])
           for r in clustering_coefficient(_edges_ds()).take_all()}
    und = {tuple(sorted((s, o))) for s, _, o in EDGES if s != o}
    deg = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    tri = _triangles_ref()
    assert set(got) == set(deg)
    for n, (d, t, cc) in got.items():
        assert d == deg[n]
        assert t == tri.get(n, 0)
        want = (2.0 * t) / (d * (d - 1)) if d >= 2 else 0.0
        want = np.floor(want * 1e5 + 0.5) / 1e5
        assert cc == want
    # the i-j isolated pair has degree 1, zero triangles, cc 0
    assert got["i"] == (1, 0, 0.0)


def test_connected_components(ray_session):
    """WCC over the adversarial graph: the hub ties the triangle+square
    block together; the self-loop node is its own component; the isolated
    pair is another. component_id = lexicographic min node id."""
    from neo4j_tkapi_ray.ops.graph import connected_components
    got = {r["node_id"]: r["component_id"]
           for r in connected_components(_edges_ds()).take_all()}
    # reference union-find
    parent = {}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for s, _, o in EDGES:
        parent.setdefault(s, s)
        parent.setdefault(o, o)
        ra, rb = find(s), find(o)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    want = {n: find(n) for n in parent}
    assert got == want
    assert got["g"] == "g" and got["i"] == got["j"] == "i"
    assert got["h"] == got["a"] == "a"


def test_pagerank_empty(ray_session):
    empty = rd.from_arrow(pa.schema(
        [("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
         ("weight", pa.int64()), ("score", pa.float64())]).empty_table())
    assert pagerank(empty, iters=2).count() == 0
    assert degree_distribution(empty).count() == 0
    assert triangle_counts(empty).count() == 0


def test_kcore(ray_session):
    """Fixed-round k-core peel vs a single-process fixpoint reference on the
    adversarial graph (hub keeps the triangle+square alive at k=3; isolated
    pair and self-loop peel away immediately)."""
    from neo4j_tkapi_ray.ops.graph import kcore

    def reference(edges, k):
        pairs = {tuple(sorted((s, o))) for s, _, o in edges if s != o}
        while True:
            deg = {}
            for u, v in pairs:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
            bad = {n for n, d in deg.items() if d < k}
            if not bad:
                return deg
            pairs = {(u, v) for u, v in pairs
                     if u not in bad and v not in bad}

    for k in (2, 3, 4):
        got = {r["node_id"]: r["degree"]
               for r in kcore(_edges_ds(), k=k).take_all()}
        assert got == reference(EDGES, k), k


def _undirected_adj():
    """Distinct self-loop-free undirected adjacency of EDGES."""
    pairs = {tuple(sorted((s, o))) for s, _, o in EDGES if s != o}
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return adj


def test_node_similarity_matches_bruteforce(ray_session):
    from neo4j_tkapi_ray.ops.graph import node_similarity

    adj = _undirected_adj()
    want = {}
    for a, b in combinations(sorted(adj), 2):
        shared = len(adj[a] & adj[b])
        if shared == 0:
            continue
        union = len(adj[a]) + len(adj[b]) - shared
        want[(a, b)] = (shared, len(adj[a]), len(adj[b]),
                        (1_000_000 * shared) // union)

    got = node_similarity(_edges_ds(), top_k=1000).to_pandas()
    got_map = {(r.node_a, r.node_b): (r.shared, r.deg_a, r.deg_b,
                                      r.jaccard_ppm)
               for r in got.itertuples()}
    assert got_map == want
    # output ordering: (jaccard_ppm desc, node_a, node_b)
    key = list(zip(-got["jaccard_ppm"], got["node_a"], got["node_b"]))
    assert key == sorted(key)
    # top_k cap + determinism of the cut
    top3 = node_similarity(_edges_ds(), top_k=3).to_pandas()
    assert len(top3) == 3
    assert list(map(tuple, top3.values)) == list(map(tuple, got.head(3).values))


def test_node_similarity_witness_degree_cutoff(ray_session):
    """max_witness_degree excludes super-hub witnesses from pair
    generation (the GDS degreeCutoff analog) — pairs witnessed ONLY by a
    node of degree > cap disappear, shared counts through it drop by 1."""
    from neo4j_tkapi_ray.ops.graph import node_similarity

    adj = _undirected_adj()
    cap = 4  # h has degree 5 -> excluded as a witness
    want = {}
    for a, b in combinations(sorted(adj), 2):
        shared_w = [w for w in adj[a] & adj[b] if len(adj[w]) <= cap]
        full_shared = len(adj[a] & adj[b])
        if not shared_w:
            continue
        union = len(adj[a]) + len(adj[b]) - full_shared
        # NOTE deg/union stay FULL — only witnessing is capped
        want[(a, b)] = len(shared_w)

    got = node_similarity(_edges_ds(), top_k=1000,
                          max_witness_degree=cap).to_pandas()
    got_sh = {(r.node_a, r.node_b): r.shared for r in got.itertuples()}
    assert got_sh == want


def test_bfs_depth_planted(ray_session):
    """Multi-source BFS on a hand-built graph: two seeds ('fr1', 'fr2'),
    a path frA-a-b-c (depths 1,2,3 via fr1... prefix match), a node tied
    to BOTH seeds takes the min, and a disconnected non-seed pair is
    absent from the output."""
    from neo4j_tkapi_ray.ops.graph import bfs_depth

    edges = [
        ("fr1", "P", "a"), ("a", "P", "b"), ("b", "P", "c"),
        ("fr2", "P", "m"), ("m", "P", "a"),   # a: min(1 via fr1, 2 via fr2)
        ("x", "P", "y"),                      # unreachable, absent
    ]
    t = pa.table({"subj": [e[0] for e in edges],
                  "pred": [e[1] for e in edges],
                  "obj": [e[2] for e in edges]})
    got = {r["node_id"]: r["depth"]
           for r in bfs_depth(rd.from_arrow(t).repartition(3),
                              seed_prefix="fr").take_all()}
    assert got == {"fr1": 0, "fr2": 0, "a": 1, "m": 1, "b": 2, "c": 3}


def test_pred_transitions_planted(ray_session):
    """2-hop pred-pair counts on a hand graph incl. the Cypher r1<>r2
    rule: a self-loop chains with OTHER edges through its node but never
    with itself."""
    from neo4j_tkapi_ray.ops.graph import pred_transitions

    edges = [
        ("a", "X", "b"), ("b", "Y", "c"), ("b", "Y", "d"),  # X->Y twice
        ("c", "Z", "c"),                                    # self-loop
    ]
    t = pa.table({"subj": [e[0] for e in edges],
                  "pred": [e[1] for e in edges],
                  "obj": [e[2] for e in edges]})
    got = {(r["pred_in"], r["pred_out"]): r["n_paths"]
           for r in pred_transitions(
               rd.from_arrow(t).repartition(3)).take_all()}
    # through b: X->Y (2 paths); through c: Y->Z (b-Y-c then c-Z-c) and
    # Z->Z would be the loop pairing with itself -> excluded; Z->... none
    # besides the loop; loop as first hop then nothing out of c but the
    # loop itself: c-Z-c then c-Z-c again is the SAME edge -> excluded
    assert got == {("X", "Y"): 2, ("Y", "Z"): 1}


def test_component_sizes_planted(ray_session):
    """Size histogram over a hand-built component table: two singletons,
    one pair, one triple."""
    from neo4j_tkapi_ray.ops.graph import component_sizes

    t = pa.table({"node_id": ["a", "b", "c", "d", "e", "f", "g"],
                  "component_id": ["a", "b", "c", "c", "e", "e", "e"]})
    got = {r["size"]: r["n_components"]
           for r in component_sizes(rd.from_arrow(t).repartition(3)).take_all()}
    assert got == {1: 2, 2: 1, 3: 1}


def test_adamic_adar_matches_bruteforce(ray_session):
    """AA in nano-units vs a brute-force reference over the adversarial
    graph; also pins the ordering, the top_k cut, and (via DuckDB) that
    floor(1e9/ln(deg)) lands on the same integer in numpy and DuckDB for
    every degree the graph exhibits (the docstring's weight-table claim)."""
    import duckdb

    from neo4j_tkapi_ray.ops.graph import AA_SCALE, adamic_adar

    adj = _undirected_adj()
    w = {n: int(AA_SCALE / np.log(len(adj[n])))
         for n in adj if len(adj[n]) >= 2}
    want = {}
    for a, b in combinations(sorted(adj), 2):
        shared = adj[a] & adj[b]
        if not shared:
            continue
        want[(a, b)] = (len(shared), sum(w[x] for x in shared))

    got = adamic_adar(_edges_ds(), top_k=1000).to_pandas()
    got_map = {(r.node_a, r.node_b): (r.shared, r.aa_nano)
               for r in got.itertuples()}
    assert got_map == want
    # output ordering: (aa_nano desc, node_a, node_b)
    key = list(zip(-got["aa_nano"], got["node_a"], got["node_b"]))
    assert key == sorted(key)
    # top_k cap + determinism of the cut
    top3 = adamic_adar(_edges_ds(), top_k=3).to_pandas()
    assert list(map(tuple, top3.values)) == list(map(tuple, got.head(3).values))
    # DuckDB's FLOOR(1e9/ln(d)) agrees with numpy's int(1e9/np.log(d))
    # for every witness degree in the graph (both IEEE double ln)
    degs = sorted({len(adj[n]) for n in adj if len(adj[n]) >= 2})
    duck = duckdb.sql(
        "SELECT CAST(FLOOR(1000000000.0 / ln(d)) AS BIGINT) FROM "
        f"(VALUES {','.join(f'({d})' for d in degs)}) t(d)").fetchall()
    assert [int(AA_SCALE / np.log(d)) for d in degs] == [r[0] for r in duck]


def test_adamic_adar_witness_degree_cutoff(ray_session):
    """max_witness_degree drops super-hub witnesses from both the shared
    count and the weight sum (the GDS degreeCutoff analog)."""
    from neo4j_tkapi_ray.ops.graph import AA_SCALE, adamic_adar

    adj = _undirected_adj()
    cap = 4  # h has degree 5 -> excluded as a witness
    want = {}
    for a, b in combinations(sorted(adj), 2):
        shared = [x for x in adj[a] & adj[b] if 2 <= len(adj[x]) <= cap]
        if not shared:
            continue
        want[(a, b)] = (len(shared),
                        sum(int(AA_SCALE / np.log(len(adj[x])))
                            for x in shared))

    got = adamic_adar(_edges_ds(), top_k=1000,
                      max_witness_degree=cap).to_pandas()
    got_map = {(r.node_a, r.node_b): (r.shared, r.aa_nano)
               for r in got.itertuples()}
    assert got_map == want


def test_label_propagation_matches_bruteforce(ray_session):
    """Synchronous LPA with min-tie-break vs a direct single-process
    simulation, at several round counts (including the converged tail)."""
    from neo4j_tkapi_ray.ops.graph import label_propagation

    adj = _undirected_adj()

    def simulate(rounds):
        lab = {n: n for n in adj}
        for _ in range(rounds):
            nxt = {}
            for n in adj:
                counts = {}
                for p in adj[n]:
                    counts[lab[p]] = counts.get(lab[p], 0) + 1
                best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
                nxt[n] = best[0][0]
            if nxt == lab:
                break
            lab = nxt
        return lab

    # one row per block: parallel preds (a-R1-b / a-R2-b) are guaranteed to
    # land in different batches, pinning the global (node, peer) dedup —
    # a per-batch-only dedup would double a-b's vote (the sf0.01 bug class)
    shredded = _edges_ds().repartition(len(EDGES))
    for rounds in (1, 2, 8):
        got = {r["node_id"]: r["label"]
               for r in label_propagation(shredded, rounds=rounds).take_all()}
        assert got == simulate(rounds), f"rounds={rounds}"
    # self-loop node g is isolated in the self-loop-free pair set: absent
    assert "g" not in {r["node_id"] for r in
                       label_propagation(_edges_ds(), rounds=2).take_all()}


def test_fastrp_embeddings_matches_bruteforce(ray_session):
    """Integer FastRP vs a direct simulation: hash-sign init, two neighbor-
    sum hops, additive combine. Also pins the md5 sign map and that
    isolated (self-loop-only) nodes are absent."""
    import hashlib

    from neo4j_tkapi_ray.ops.graph import fastrp_embeddings

    DIM, ROUNDS = 8, 2
    adj = _undirected_adj()

    def sign(n, d):
        h = int(hashlib.md5(f"{n}:{d}".encode()).hexdigest()[0], 16)
        return 1 if h <= 3 else (-1 if h <= 7 else 0)

    e = {n: [sign(n, d) for d in range(DIM)] for n in adj}
    acc = {n: [0] * DIM for n in adj}
    for _ in range(ROUNDS):
        nxt = {n: [sum(e[p][d] for p in adj[n]) for d in range(DIM)]
               for n in adj}
        e = nxt
        for n in adj:
            for d in range(DIM):
                acc[n][d] += e[n][d]

    got = fastrp_embeddings(_edges_ds().repartition(len(EDGES)),
                            dim=DIM, rounds=ROUNDS).to_pandas()
    got_map = {}
    for r in got.itertuples():
        got_map.setdefault(r.node_id, [0] * DIM)[r.dim] = r.val
    assert got_map == acc
    assert "g" not in got_map  # self-loop-only node: no undirected pairs


def test_weighted_pagerank_integer_exact(ray_session):
    """Weight-proportional contributions vs a single-process integer
    reference; uniform weights must reproduce plain pagerank; the parallel
    a->b edges (R1+R2, weight 1 each) give a->b weight 2."""
    from neo4j_tkapi_ray.ops.graph import weighted_pagerank

    # reference over per-(src,dst) summed weights
    pairs = {}
    for s, _, o in EDGES:
        pairs[(s, o)] = pairs.get((s, o), 0) + 1
    nodes = sorted({n for p in pairs for n in p})
    ow = {}
    for (s, _o), w in pairs.items():
        ow[s] = ow.get(s, 0) + w
    r = {n: PR_SCALE for n in nodes}
    for _ in range(5):
        inc = {n: 0 for n in nodes}
        for (s, o), w in pairs.items():
            inc[o] += (r[s] * w) // ow[s]
        r = {n: PR_BASE + (85 * inc[n]) // 100 for n in nodes}

    got = {row["node_id"]: row["rank_micro"]
           for row in weighted_pagerank(_edges_ds(), iters=5).take_all()}
    assert got == r
    assert got["h"] == PR_BASE  # no in-edges: base after any iteration

    # the adversarial fixture has no src with DIFFERENT per-dst weights, so
    # weighted == uniform there (w cancels against ow) — pin the actual
    # weight sensitivity on a skewed 2-dst fixture: x -> y (w=3), x -> z
    # (w=1): y gets 3/4 of x's rank, z gets 1/4
    t = pa.table({"subj": ["x", "x"], "pred": ["R", "R"],
                  "obj": ["y", "z"],
                  "weight": pa.array([3, 1], pa.int64()),
                  "score": pa.array([1.0, 1.0], pa.float64())})
    skew = {row["node_id"]: row["rank_micro"]
            for row in weighted_pagerank(
                rd.from_arrow(t).repartition(2), iters=1).take_all()}
    assert skew["y"] == PR_BASE + (85 * ((PR_SCALE * 3) // 4)) // 100
    assert skew["z"] == PR_BASE + (85 * ((PR_SCALE * 1) // 4)) // 100
    uni = {row["node_id"]: row["rank_micro"]
           for row in pagerank(rd.from_arrow(t).repartition(2),
                               iters=1).take_all()}
    assert skew["y"] != uni["y"]  # uniform splits 50/50


def test_random_walks_matches_simulation(ray_session):
    """Engine walks == a single-process simulation with the same hash
    argmin, on a graph with a hub, a dead end, a 2-cycle and a self-loop
    (the self-loop edge is dropped; the node still walks via its other
    out-edges)."""
    import hashlib

    from neo4j_tkapi_ray.ops.graph import random_walks

    edges = [
        ("h", "P", "a"), ("h", "P", "b"), ("h", "P", "c"), ("h", "Q", "a"),
        ("a", "P", "b"),                     # a -> b -> (dead end)
        ("c", "P", "h"),                     # 2-cycle with h
        ("s", "P", "s"), ("s", "P", "h"),    # self-loop dropped
    ]
    t = pa.table({"subj": [e[0] for e in edges],
                  "pred": [e[1] for e in edges],
                  "obj": [e[2] for e in edges]})
    W, L = 2, 3
    got = {(r["walk_id"], r["step"]): r["node"]
           for r in random_walks(rd.from_arrow(t).repartition(4),
                                 walks_per_node=W, steps=L).take_all()}

    adj = {}
    for s, _, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
    want = {}
    for start in sorted(adj):
        for w in range(W):
            wid = f"{start}#{w}"
            cur = start
            want[(wid, 0)] = cur
            for step in range(1, L + 1):
                outs = adj.get(cur)
                if not outs:
                    break
                cur = min(outs, key=lambda v: (
                    hashlib.md5(f"{wid}:{step}:{v}".encode()).hexdigest(),
                    v))
                want[(wid, step)] = cur
    assert got == want
    assert ("a#0", 1) in got and ("a#0", 2) not in got  # dead end at b


def test_harmonic_centrality_planted(ray_session):
    """Two seeds on a path: fr1 - a - fr2, plus a pendant b off a and an
    unreachable pair. Hand-checkable nano-unit sums."""
    from neo4j_tkapi_ray.ops.graph import harmonic_centrality

    edges = [
        ("fr1", "P", "a"), ("a", "P", "fr2"), ("a", "P", "b"),
        ("x", "P", "y"),
    ]
    t = pa.table({"subj": [e[0] for e in edges],
                  "pred": [e[1] for e in edges],
                  "obj": [e[2] for e in edges]})
    got = {r["node_id"]: (r["n_seeds_reached"], r["harmonic_nano"])
           for r in harmonic_centrality(
               rd.from_arrow(t).repartition(3), seed_prefix="fr",
               max_rounds=6).take_all()}
    B = 1_000_000_000
    assert got == {
        "a":   (2, B + B),            # d=1 to both seeds
        "b":   (2, B // 2 + B // 2),  # d=2 to both
        "fr1": (1, B // 2),           # d=2 to fr2 (self excluded)
        "fr2": (1, B // 2),
    }
    # x, y reach no seed -> absent


def test_ego_edges_planted(ray_session):
    """k=1 ego of seed fr1 over a path fr1-a-b: keeps only the fr1-a edge
    (b is at depth 2, so a-b has an out-of-ego endpoint); an unreachable
    pair is excluded entirely."""
    from neo4j_tkapi_ray.ops.graph import ego_edges

    edges = [
        ("fr1", "P", "a"), ("a", "P", "b"), ("x", "P", "y"),
    ]
    t = pa.table({"subj": [e[0] for e in edges],
                  "pred": [e[1] for e in edges],
                  "obj": [e[2] for e in edges]})
    got = {(r["subj"], r["pred"], r["obj"])
           for r in ego_edges(rd.from_arrow(t).repartition(3),
                              seed_prefix="fr", k=1).take_all()}
    assert got == {("fr1", "P", "a")}
    got2 = {(r["subj"], r["pred"], r["obj"])
            for r in ego_edges(rd.from_arrow(t).repartition(3),
                               seed_prefix="fr", k=2).take_all()}
    assert got2 == {("fr1", "P", "a"), ("a", "P", "b")}


def test_node_strength_planted(ray_session):
    """Weighted degree on a hand graph: parallel-pred edge rows stay
    distinct rows (degree 2) with their weights summed; a self-loop
    counts once."""
    from neo4j_tkapi_ray.ops.graph import node_strength

    t = pa.table({"subj": ["a", "a", "g"],
                  "pred": ["R1", "R2", "R1"],
                  "obj":  ["b", "b", "g"],
                  "weight": pa.array([3, 5, 7], pa.int64()),
                  "score": pa.array([1.0, 1.0, 1.0], pa.float64())})
    got = {r["node_id"]: (r["degree"], r["strength"])
           for r in node_strength(rd.from_arrow(t).repartition(3))
           .take_all()}
    assert got == {"a": (2, 8), "b": (2, 8), "g": (1, 7)}


def test_md5vec_matches_hashlib():
    """The vectorized lane-MD5 behind the random-walk tie-break must be
    bit-identical to hashlib.md5 hex ordering across the padding
    boundaries (55/56, 63/64, 119/120 bytes = 1 vs 2 vs 3 blocks) and on
    a deterministic fuzz corpus."""
    import hashlib
    import random

    from neo4j_tkapi_ray.ops.md5vec import md5_order_keys

    rng = random.Random(42)
    strs = ["", "a", "x" * 55, "x" * 56, "x" * 63, "x" * 64,
            "x" * 119, "x" * 120, "x" * 200]
    strs += ["".join(rng.choice("ab:#01é") for _ in range(rng.randint(0, 150)))
             for _ in range(500)]
    k1, k2 = md5_order_keys(pa.array(strs, pa.string()))
    for s, a, b in zip(strs, k1, k2):
        d = hashlib.md5(s.encode()).digest()
        assert int(a) == int.from_bytes(d[:8], "big"), s
        assert int(b) == int.from_bytes(d[8:], "big"), s
    # hex-ASCII order == (k1, k2) unsigned order
    hx = [hashlib.md5(s.encode()).hexdigest() for s in strs]
    by_hex = sorted(hx)
    by_key = [h for _, _, h in sorted(zip(map(int, k1), map(int, k2), hx))]
    assert by_hex == by_key


def test_harmonic_centrality_multiword_masks(ray_session):
    """More than 64 seeds forces the K=2 uint64 mask-word path of the
    bitset BFS — never exercised by the small planted graphs. 70 seeds
    all attach to one hub; brute-force-checkable distances."""
    from neo4j_tkapi_ray.ops.graph import harmonic_centrality

    seeds = [f"fr{i:02d}" for i in range(70)]
    edges = [(s, "P", "hub") for s in seeds] + [("hub", "P", "leaf")]
    t = pa.table({"subj": [e[0] for e in edges],
                  "pred": [e[1] for e in edges],
                  "obj": [e[2] for e in edges]})
    got = {r["node_id"]: (r["n_seeds_reached"], r["harmonic_nano"])
           for r in harmonic_centrality(
               rd.from_arrow(t).repartition(5), seed_prefix="fr",
               max_rounds=6).take_all()}
    B = 1_000_000_000
    assert got["hub"] == (70, 70 * B)            # d=1 to every seed
    assert got["leaf"] == (70, 70 * (B // 2))    # d=2 via hub
    # each seed: the other 69 at d=2 through the hub (self excluded)
    assert got["fr00"] == (69, 69 * (B // 2))
    assert got["fr69"] == (69, 69 * (B // 2))
    assert len(got) == 72


def test_wcc_long_chain_pointer_jumping(ray_session):
    """A 200-node path has diameter 199 — far past max_rounds=25 of plain
    one-hop min-label relaxation. The pointer-jumping fold makes label
    chains square per round, so the TRUE component (min id n000) is
    reached well inside the round budget."""
    from neo4j_tkapi_ray.ops.graph import connected_components

    n = 200
    names = [f"n{i:03d}" for i in range(n)]
    t = pa.table({"subj": names[:-1], "pred": ["P"] * (n - 1),
                  "obj": names[1:]})
    got = {r["node_id"]: r["component_id"]
           for r in connected_components(
               rd.from_arrow(t).repartition(7)).take_all()}
    assert len(got) == n
    assert set(got.values()) == {"n000"}
