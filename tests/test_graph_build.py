"""Unit tests for the reference-semantics build kernels (SURVEY.md §5
item 1): O1 reorder invariant, F1 split + laundering, F2 two-step int
cast, J2 join-drop semantics, A1 predicate aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgeng.graph.build import (
    ORDERED_CATEGORIES,
    int_coerce,
    node_class_lookup,
    predicate_class_pairs,
    reorder_categories,
    resolve_edge_classes,
    split_packed_array,
)


def test_reorder_head_is_highest_priority(spark):
    # category arrays deliberately unordered + duplicated
    rows = [
        (["biolink:NamedThing", "biolink:Disease", "biolink:Gene"],),
        (["biolink:ChemicalEntity", "biolink:SmallMolecule", "biolink:SmallMolecule"],),
        (["biolink:NamedThing"],),  # no priority class at all
        (["biolink:ZZZ", "biolink:AAA"],),  # unknown classes -> sorted
    ]
    df = spark.createDataFrame(rows, "category: array<string>")
    out = [r[0] for r in df.select(reorder_categories(F.col("category"))).collect()]
    assert out[0] == ["biolink:Gene", "biolink:Disease", "biolink:NamedThing"]
    assert out[1] == ["biolink:SmallMolecule", "biolink:ChemicalEntity"]  # deduped
    assert out[2] == ["biolink:NamedThing"]
    assert out[3] == ["biolink:AAA", "biolink:ZZZ"]
    # invariant: head is the highest-priority class present
    for inp, got in zip([r[0] for r in rows], out):
        present = [c for c in ORDERED_CATEGORIES if c in inp]
        if present:
            assert got[0] == present[0]
        assert sorted(got) == sorted(set(inp))


def test_split_packed_array_and_laundering(spark):
    df = spark.createDataFrame(
        [("a;b's;c",), ("",), (None,), ("solo",)], "cell: string"
    )
    out = [r[0] for r in df.select(split_packed_array(F.col("cell"))).collect()]
    assert out[0] == ["a", "b`s", "c"]  # quote laundered ' -> `
    assert out[1] == [] and out[2] == []
    assert out[3] == ["solo"]
    # float[] variant
    df2 = spark.createDataFrame([("0.001;0.05",), ("",)], "cell: string")
    out2 = [r[0] for r in df2.select(split_packed_array(F.col("cell"), launder=False, element_type="double")).collect()]
    assert out2[0] == [0.001, 0.05] and out2[1] == []


def test_int_coerce_two_step(spark):
    df = spark.createDataFrame([("3.0",), ("12",), ("",), (None,)], "cell: string")
    out = [r[0] for r in df.select(int_coerce(F.col("cell"))).collect()]
    assert out == [3, 12, None, None]


def test_resolve_edge_classes_drops_misses(spark):
    nodes = spark.createDataFrame(
        [
            ("N:1", ["biolink:Gene"]),
            ("N:2", ["biolink:Disease", "biolink:NamedThing"]),
        ],
        "id: string, category: array<string>",
    )
    edges = spark.createDataFrame(
        [
            ("N:1", "biolink:affects", "N:2"),
            ("N:1", "biolink:affects", "N:MISSING"),
            ("N:MISSING", "biolink:affects", "N:2"),
        ],
        "subject: string, predicate: string, object: string",
    )
    lookup = node_class_lookup(nodes)
    resolved, dropped = resolve_edge_classes(edges, lookup, broadcast_lookup=True)
    res = resolved.collect()
    assert len(res) == 1
    assert res[0]["subject_class"] == "biolink:Gene"
    assert res[0]["object_class"] == "biolink:Disease"
    assert dropped.count() == 2  # the miss side-channel


def test_predicate_class_pairs(spark):
    resolved = spark.createDataFrame(
        [
            ("biolink:affects", "biolink:Gene", "biolink:Disease"),
            ("biolink:affects", "biolink:Gene", "biolink:Disease"),
            ("biolink:affects", "biolink:Gene", "biolink:Cell"),
            ("biolink:treats", "biolink:SmallMolecule", "biolink:Disease"),
        ],
        "predicate: string, subject_class: string, object_class: string",
    )
    out = {r["predicate"]: r["class_pairs"] for r in predicate_class_pairs(resolved).collect()}
    affects = [(p["subject_class"], p["object_class"]) for p in out["biolink:affects"]]
    assert affects == [("biolink:Gene", "biolink:Cell"), ("biolink:Gene", "biolink:Disease")]
    assert len(out["biolink:treats"]) == 1


def test_typed_header_parser():
    from pyspark.sql import types as T

    from kgeng.schemas import parse_typed_header

    schema, tags = parse_typed_header(
        "id:ID\tname:string\tcategory:LABEL\tlipinski:int\tp_value:float[]\tok:boolean\tscore:float\n"
    )
    assert [f.name for f in schema.fields] == ["id", "name", "category", "lipinski", "p_value", "ok", "score"]
    assert schema["lipinski"].dataType == T.LongType()
    assert schema["score"].dataType == T.DoubleType()
    assert tags["category"] == "label" and tags["p_value"] == "float[]"
    # unknown tag -> fail fast (reference silently emits poison DDL)
    import pytest

    with pytest.raises(ValueError):
        parse_typed_header("x:decimal(10,2)")


def test_upsert_nodes_merge_semantics(spark):
    """SCD-1 MERGE truth table on crafted rows: delta-only inserts,
    matched rows take the delta payload, snapshot-only rows carry,
    NULL delta cells mean KEEP (and classify as noop, not update),
    and presence is tracked by markers so all-NULL payloads work."""
    from kgeng.graph.maintenance import upsert_nodes

    snap = spark.createDataFrame(
        [("1", "a"), ("2", "b"), ("3", None), ("6", "f")],
        "id string, name string",
    )
    delta = spark.createDataFrame(
        [("2", "B"), ("3", None), ("4", "d"), ("5", None), ("6", None)],
        "id string, name string",
    )
    got = {
        r["id"]: (r["name"], r["action"])
        for r in upsert_nodes(snap, delta).collect()
    }
    assert got == {
        "1": ("a", "carry"),
        "2": ("B", "update"),
        "3": (None, "noop"),      # NULL == NULL null-safely
        "4": ("d", "insert"),
        "5": (None, "insert"),    # all-NULL payload still inserts
        "6": ("f", "noop"),       # NULL delta cell keeps + noop
    }


def test_lpa_round_vote_and_tiebreak_semantics(spark):
    """One LPA round on a crafted star+chord graph: counts win, ties
    fall to the lexicographically smallest label, and chaining a
    second round consumes the first's labels (sync semantics)."""
    from pyspark.sql import functions as F

    from kgeng.queries.corpus import lpa_round

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c")],
        "u string, v string",
    )
    adj = edges.select(
        F.col("u").alias("nbr"), F.col("v").alias("id")
    ).unionByName(
        edges.select(F.col("v").alias("nbr"), F.col("u").alias("id"))
    )
    l0 = adj.select("id").distinct().withColumn("lbl", F.col("id"))
    l1 = lpa_round(adj, l0)
    assert {r["id"]: r["lbl"] for r in l1.collect()} == {
        "a": "b",  # 3-way tie b/c/d -> lexicographic min
        "b": "a",  # tie a/c -> a
        "c": "a",
        "d": "a",  # only neighbor
    }
    l2 = lpa_round(adj, l1)
    assert {r["id"]: r["lbl"] for r in l2.collect()} == {
        "a": "a",  # majority of b/c/d now carry 'a'
        "b": "a",
        "c": "a",
        "d": "b",  # its only neighbor a was relabeled 'b' in round 1
    }


def test_link_candidates_cap_drops_hub_centers(spark):
    """Crafted path+hub graph at cap=3: the degree-4 hub contributes
    NO wedges as a center (its C(4,2) fanout is the skew the cap
    kills), hub-incident pairs are existing edges and leave via the
    anti-join, and the surviving candidates count only capped-center
    evidence."""
    from kgeng.queries.corpus import link_candidates_from_edges

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 9), (2, 9), (3, 9), (4, 9)],
        "u long, v long",
    )
    got = {
        (r["part_a"], r["part_b"]): r["n_common"]
        for r in link_candidates_from_edges(edges, cap=3).collect()
    }
    # with the hub allowed as a center, (1,3) would count 2 and
    # (1,4)/(2,4) would gain hub-mediated evidence
    assert got == {(1, 3): 1, (2, 4): 1}


def test_bfs_expand_min_level_and_no_revisit(spark):
    """bfs_expand on a crafted diamond-with-back-edge: the frontier
    never re-admits visited nodes (the back edge to the seed is
    pruned), converging branches dedup to one row, and chaining
    expansions walks strict hop levels."""
    from kgeng.queries.corpus import bfs_expand

    # s -> a, s -> b, a -> c, b -> c (diamond), c -> s (back edge)
    e = spark.createDataFrame(
        [("s", "a"), ("s", "b"), ("a", "c"), ("b", "c"), ("c", "s")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("s",)], "id string")
    f1 = bfs_expand(e, seeds, seeds)
    assert sorted(r["id"] for r in f1.collect()) == ["a", "b"]
    visited = seeds.unionByName(f1)
    f2 = bfs_expand(e, f1, visited)
    assert [r["id"] for r in f2.collect()] == ["c"]  # deduped diamond
    visited = visited.unionByName(f2)
    f3 = bfs_expand(e, f2, visited)
    assert f3.collect() == []  # back edge c->s pruned by the anti-join


def test_kcore_peeling_cascade_removes_hub_keeps_clique(spark):
    """k-core round kernels (K=4) on a crafted 5-clique plus a fake
    hub: x touches e and three degree-1 pendants, so x SURVIVES round
    1 on raw degree 4 and dies in round 2 ONLY because round 1 peeled
    its pendants — the cascade that distinguishes true peeling from a
    one-shot degree filter (a regression that recomputes degrees off
    the ORIGINAL edge list keeps x forever). The clique survives every
    round."""
    from kgeng.queries.corpus import KCORE_K, kcore_keepers, kcore_restrict

    assert KCORE_K == 4  # crafted degrees below assume the engine's K
    clique = [
        (u, v)
        for u in ("a", "b", "c", "d", "e")
        for v in ("a", "b", "c", "d", "e")
        if u < v
    ]
    # x: deg 4 (e + three pendants); pendants: deg 1; e: deg 5
    edges = spark.createDataFrame(
        clique + [("e", "x"), ("x", "p1"), ("x", "p2"), ("x", "p3")],
        "u string, v string",
    )
    sym = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionByName(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))

    k1 = kcore_keepers(sym)
    assert sorted(r["id"] for r in k1.collect()) == ["a", "b", "c", "d", "e", "x"]
    sym1 = kcore_restrict(sym, k1)
    assert sym1.count() == (len(clique) + 1) * 2  # clique + e-x survive
    k2 = kcore_keepers(sym1)
    # cascade: x's surviving degree is 1 (only e), so it peels now
    assert sorted(r["id"] for r in k2.collect()) == ["a", "b", "c", "d", "e"]
    sym2 = kcore_restrict(sym1, k2)
    k3 = kcore_keepers(sym2)
    assert sorted(r["id"] for r in k3.collect()) == ["a", "b", "c", "d", "e"]


def test_bfs_and_kcore_match_pure_python_reference(spark):
    """Independent-implementation parity on a deterministic
    pseudo-random digraph (48 nodes, ~130 md5-selected edges): the
    Spark frontier/peeling kernels must reproduce a from-scratch
    pure-Python BFS (min hop levels, reversed edges, depth 3) and
    k-core peeling (K=4, 3 synchronous rounds) — the same golden-twin
    style as the extraction P/R tests, catching any semantics drift
    the crafted micro-graphs are too small to expose."""
    import hashlib

    from kgeng.queries.corpus import (
        BFS_MAX_DEPTH,
        KCORE_K,
        KCORE_ROUNDS,
        bfs_expand,
        kcore_keepers,
        kcore_restrict,
    )

    names = [f"n{i:02d}" for i in range(48)]
    edges = [
        (names[i], names[j])
        for i in range(48)
        for j in range(48)
        if i != j
        and int(hashlib.md5(f"{i}-{j}".encode()).hexdigest(), 16) % 17 == 0
    ]
    assert len(edges) > 80  # dense enough to be interesting

    # ---- pure-Python reference BFS (reversed edges, min level) ----
    rev = {}
    for s, d in edges:
        rev.setdefault(d, []).append(s)
    seeds = {names[0], names[1]}
    want_level = {n: 0 for n in seeds}
    frontier = set(seeds)
    for depth in range(1, BFS_MAX_DEPTH + 1):
        frontier = {
            nb for f in frontier for nb in rev.get(f, [])
        } - set(want_level)
        for n in frontier:
            want_level[n] = depth

    # ---- Spark: chained bfs_expand over the same reversal ----
    from pyspark.sql import functions as F  # noqa: F811 (explicit)

    e = spark.createDataFrame(edges, "subject string, object string").select(
        F.col("object").alias("src"), F.col("subject").alias("dst")
    )
    sf = spark.createDataFrame([(n,) for n in sorted(seeds)], "id string")
    visited = {r["id"]: 0 for r in sf.collect()}
    cur = sf
    for depth in range(1, BFS_MAX_DEPTH + 1):
        cur = bfs_expand(
            e, cur, spark.createDataFrame([(n,) for n in visited], "id string")
        )
        for r in cur.collect():
            visited[r["id"]] = depth
    assert visited == want_level

    # ---- pure-Python reference k-core peeling ----
    sym_py = {(a, b) for a, b in edges} | {(b, a) for a, b in edges}
    keep_py = set()
    cur_sym = sym_py
    for r in range(KCORE_ROUNDS):
        deg = {}
        for a, _b in cur_sym:
            deg[a] = deg.get(a, 0) + 1
        keep_py = {n for n, d in deg.items() if d >= KCORE_K}
        if r < KCORE_ROUNDS - 1:
            cur_sym = {
                (a, b) for a, b in cur_sym if a in keep_py and b in keep_py
            }

    # ---- Spark kernels over the same symmetric list ----
    sym_df = spark.createDataFrame(sorted(sym_py), "src string, dst string")
    keep_df = None
    for r in range(KCORE_ROUNDS):
        keep_df = kcore_keepers(sym_df)
        if r < KCORE_ROUNDS - 1:
            sym_df = kcore_restrict(sym_df, keep_df)
    assert sorted(x["id"] for x in keep_df.collect()) == sorted(keep_py)
