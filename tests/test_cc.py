"""Connected-components (large-star/small-star) vs a driver-side
union-find oracle."""

from __future__ import annotations

from kgeng.canon.cc import canonical_map, connected_components


def _uf_oracle(edges: list[tuple[str, str]]) -> dict[str, str]:
    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {x: find(x) for x in parent}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "u: string, v: string")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == _uf_oracle(edges)


def test_cc_chain(spark):
    _check(spark, [(f"n{i:03d}", f"n{i+1:03d}") for i in range(30)])


def test_cc_islands_and_clique(spark):
    edges = [("a", "b"), ("b", "c"), ("x", "y"), ("p", "q"), ("q", "r"), ("r", "p")]
    _check(spark, edges)


def test_cc_pseudorandom(spark):
    edges = [
        (f"v{(i * 17) % 97:02d}", f"v{(i * 31 + 5) % 97:02d}")
        for i in range(60)
        if (i * 17) % 97 != (i * 31 + 5) % 97
    ]
    _check(spark, edges)


def test_canonical_map_fixture(spark):
    from kgeng import fixtures

    dictionary = spark.createDataFrame(
        [
            (fixtures.entity_curie(k), fixtures.entity_name(k),
             fixtures.entity_aliases(k), fixtures.entity_equivalent_identifiers(k))
            for k in range(60)
        ],
        "curie: string, label: string, aliases: array<string>, equivalent_identifiers: array<string>",
    )
    got = {r["curie"]: r["canonical_curie"] for r in canonical_map(dictionary).collect()}
    for k in range(60):
        assert got[fixtures.entity_curie(k)] == fixtures.entity_curie(fixtures.canonical_of(k)), k


def test_minhash_name_blocking_merges_near_dup_labels(spark):
    """MinHash-LSH label blocking (kgeng.canon.lsh): planted near-dup
    labels merge, distinct labels don't, and the exact-id CC result is
    unchanged when blocking is off."""
    from kgeng.canon.cc import canonical_map
    from kgeng.canon.lsh import near_dup_label_pairs

    rows = [
        # same label with a one-character variant: must merge
        ("X:1", "acetaminophenol", ["eq:a"]),
        ("X:2", "acetaminophenoI", ["eq:b"]),
        # unrelated labels: must not merge
        ("X:3", "completely different thing", ["eq:c"]),
        ("X:4", "zzz qqq vvv", ["eq:d"]),
        # id-linked pair with unrelated labels: merges via ids only
        ("X:5", "alpha entity", ["eq:shared"]),
        ("X:6", "beta entity!!", ["eq:shared"]),
    ]
    d = spark.createDataFrame(rows, ["curie", "label", "equivalent_identifiers"])

    pairs = {
        (r["curie_a"], r["curie_b"]) for r in near_dup_label_pairs(d, 0.8).collect()
    }
    assert ("X:1", "X:2") in pairs
    assert all({a, b} <= {"X:1", "X:2"} for a, b in pairs), pairs

    with_names = {
        r["curie"]: r["canonical_curie"]
        for r in canonical_map(d, name_blocking=True).collect()
    }
    assert with_names["X:1"] == with_names["X:2"] == "X:1"
    assert with_names["X:5"] == with_names["X:6"] == "X:5"
    assert with_names["X:3"] == "X:3" and with_names["X:4"] == "X:4"

    without = {
        r["curie"]: r["canonical_curie"] for r in canonical_map(d).collect()
    }
    assert without["X:1"] == "X:1" and without["X:2"] == "X:2"  # no name merge
    assert without["X:5"] == without["X:6"] == "X:5"


def test_driver_cc_matches_distributed_path(spark, monkeypatch):
    """The r7 size-gated driver union-find must produce EXACTLY the
    assignment rows of the distributed star-round loop on the same
    random graph (the gate is plan routing, never semantics)."""
    import random

    from kgeng.canon import cc as cc_mod

    rng = random.Random(7)
    edges = [
        (rng.randint(0, 120), rng.randint(0, 120)) for _ in range(300)
    ] + [(i, i) for i in range(5)]  # self-loops must drop identically
    df = spark.createDataFrame(edges, "u long, v long")
    fast = sorted(map(tuple, cc_mod.connected_components(df).collect()))
    monkeypatch.setattr(cc_mod, "SMALL_CC_EDGES", 0)  # force star rounds
    slow = sorted(map(tuple, cc_mod.connected_components(df).collect()))
    assert fast == slow and len(fast) > 0
