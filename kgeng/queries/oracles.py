"""DuckDB oracle SQL for every query in :mod:`kgeng.queries.corpus`.

These are INDEPENDENT derivations: the KG view is re-declared here as
plain SQL CTEs, and the expected output of the O1 category-reorder
kernel is hand-computed per node source (the category arrays are
static per source, so their reordered forms are known in closed form —
head = highest-priority class present, tail sorted). A bug in either
the Spark operators or in this SQL shows up as a hash mismatch.

Tables ``region nation customer supplier part orders lineitem events
documents embeddings`` are pre-registered DuckDB views over the same
parquet files Spark reads.
"""

from __future__ import annotations

from kgeng.queries.corpus import (
    ANOMALY_MIN_TRAIL as _ANOMALY_MIN,
    ANOMALY_TRAIL_DAYS as _ANOMALY_TRAIL,
    BFS_MAX_DEPTH as _BFS_DEPTH,
    EVENT_TYPES as _EVENT_TYPES,
    KCORE_K as _KCORE_K,
    KCORE_ROUNDS as _KCORE_ROUNDS,
    PAGERANK_BASE as _PR_BASE,
    PAGERANK_ITERS as _PR_ITERS,
    PAGERANK_SCALE as _PR_SCALE,
    PAGERANK_TOPK as _PR_TOPK,
    LINKPRED_DEGREE_CAP as _LINKPRED_DEGREE_CAP,
    LINKPRED_TOPK as _LINKPRED_TOPK,
    LPA_ITERS as _LPA_ITERS,
    LPA_TOPK as _LPA_TOPK,
    RETENTION_HORIZON_DAYS as _RETENTION_DAYS,
    RFM_BINS as _RFM_BINS,
    RFM_M_GRID as _RFM_M_GRID,
    ROLLING_WINDOW_DAYS,
    TRIANGLE_EDGE_BUDGET as _TRIANGLE_EDGE_BUDGET,
    TRIANGLE_SEED as _TRIANGLE_SEED,
    TRIANGLE_TOPK as _TRIANGLE_TOPK,
)

# Shared KG derivation (mirrors kgeng.graph.kgview, with the reordered
# category computed independently).
KG_PRELUDE = """
WITH nodes AS (
    SELECT 'CUST:' || CAST(c_custkey AS VARCHAR) AS id,
           c_name AS name,
           CASE c_mktsegment
             WHEN 'BUILDING'   THEN ['biolink:NamedThing','biolink:Disease','biolink:PhenotypicFeature']
             WHEN 'AUTOMOBILE' THEN ['biolink:NamedThing','biolink:Gene','biolink:Gene']
             WHEN 'MACHINERY'  THEN ['biolink:Cell','biolink:NamedThing']
             WHEN 'HOUSEHOLD'  THEN ['biolink:NamedThing','biolink:OrganismTaxon']
             ELSE ['biolink:NamedThing'] END AS category,
           CASE c_mktsegment
             WHEN 'BUILDING'   THEN ['biolink:PhenotypicFeature','biolink:Disease','biolink:NamedThing']
             WHEN 'AUTOMOBILE' THEN ['biolink:Gene','biolink:NamedThing']
             WHEN 'MACHINERY'  THEN ['biolink:Cell','biolink:NamedThing']
             WHEN 'HOUSEHOLD'  THEN ['biolink:OrganismTaxon','biolink:NamedThing']
             ELSE ['biolink:NamedThing'] END AS category_reordered
    FROM customer
    UNION ALL
    SELECT 'SUPP:' || CAST(s_suppkey AS VARCHAR), s_name,
           ['biolink:NamedThing','biolink:Activity'],
           ['biolink:Activity','biolink:NamedThing']
    FROM supplier
    UNION ALL
    SELECT 'PART:' || CAST(p_partkey AS VARCHAR), p_name,
           ['biolink:ChemicalEntity','biolink:SmallMolecule','biolink:NamedThing'],
           ['biolink:SmallMolecule','biolink:ChemicalEntity','biolink:NamedThing']
    FROM part
    UNION ALL
    SELECT 'BRND:' || p_brand, p_brand,
           ['biolink:GeneFamily','biolink:NamedThing'],
           ['biolink:GeneFamily','biolink:NamedThing']
    FROM (SELECT DISTINCT p_brand FROM part)
    UNION ALL
    SELECT 'NATN:' || CAST(n_nationkey AS VARCHAR), n_name,
           ['biolink:AnatomicalEntity','biolink:NamedThing'],
           ['biolink:AnatomicalEntity','biolink:NamedThing']
    FROM nation
    UNION ALL
    SELECT 'REGN:' || CAST(r_regionkey AS VARCHAR), r_name,
           ['biolink:BiologicalEntity','biolink:NamedThing'],
           ['biolink:BiologicalEntity','biolink:NamedThing']
    FROM region
    UNION ALL
    SELECT 'ORDR:' || CAST(o_orderkey AS VARCHAR),
           'order-' || CAST(o_orderkey AS VARCHAR),
           ['biolink:InformationContentEntity','biolink:NamedThing'],
           ['biolink:InformationContentEntity','biolink:NamedThing']
    FROM orders
),
edges AS (
    SELECT 'CUST:' || CAST(o_custkey AS VARCHAR) AS subject,
           'biolink:placed' AS predicate,
           'ORDR:' || CAST(o_orderkey AS VARCHAR) AS object,
           'infores:orders' AS primary_knowledge_source
    FROM orders
    UNION ALL
    SELECT 'ORDR:' || CAST(l_orderkey AS VARCHAR), 'biolink:contains',
           'PART:' || CAST(l_partkey AS VARCHAR), 'infores:lineitem'
    FROM lineitem
    UNION ALL
    SELECT 'ORDR:' || CAST(l_orderkey AS VARCHAR), 'biolink:supplied_by',
           'SUPP:' || CAST(l_suppkey AS VARCHAR), 'infores:lineitem'
    FROM lineitem
    UNION ALL
    SELECT 'CUST:' || CAST(c_custkey AS VARCHAR), 'biolink:located_in',
           'NATN:' || CAST(c_nationkey AS VARCHAR), 'infores:customer'
    FROM customer
    UNION ALL
    SELECT 'SUPP:' || CAST(s_suppkey AS VARCHAR), 'biolink:located_in',
           'NATN:' || CAST(s_nationkey AS VARCHAR), 'infores:supplier'
    FROM supplier
    UNION ALL
    SELECT 'NATN:' || CAST(n_nationkey AS VARCHAR), 'biolink:part_of',
           'REGN:' || CAST(n_regionkey AS VARCHAR), 'infores:nation'
    FROM nation
    UNION ALL
    SELECT 'PART:' || CAST(p_partkey AS VARCHAR), 'biolink:subclass_of',
           'BRND:' || p_brand, 'infores:part'
    FROM part
)
"""

# Shared derived corpora for the dedup family (mirrors
# kgeng.textops.dedup.dup_text_corpus / dup_embedding_corpus).
DUP_TEXT_PRELUDE = """
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 10000, substr(text, instr(text, ' ') + 1) FROM documents
),
sh_all AS (
    SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, greatest(len(t) - 2, 0)),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]
               )) AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM corpus)
    )
),
-- hot-shingle df cap, mirroring kgeng.textops.dedup.capped_shingles
sh AS (
    SELECT * FROM sh_all
    WHERE sh NOT IN (SELECT sh FROM sh_all GROUP BY sh HAVING COUNT(*) > 500)
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
jac AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           floor(COUNT(*) * 1.0 / (ANY_VALUE(sa.sz) + ANY_VALUE(sb.sz) - COUNT(*)) * 10000) / 10000 AS jaccard
    FROM sh a
    JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
    JOIN sizes sa ON sa.doc_id = a.doc_id
    JOIN sizes sb ON sb.doc_id = b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
"""

_LANG_PRED_SQL = """
    CASE WHEN c_en = best THEN 'en'
         WHEN c_de = best THEN 'de'
         WHEN c_es = best THEN 'es'
         WHEN c_fr = best THEN 'fr'
         ELSE 'en' END
"""


def _hex_to_int_sql(expr: str, n_digits: int) -> str:
    """Generated DuckDB parse of an ``n_digits``-char lowercase-hex
    string expression into a BIGINT (polynomial over digit values)."""
    terms = [
        f"(strpos('0123456789abcdef', substr({expr}, {j + 1}, 1)) - 1) * {16 ** (n_digits - 1 - j)}"
        for j in range(n_digits)
    ]
    return "(" + " + ".join(terms) + ")"


# mirrored from kgeng.textops.dedup (MINHASH_A/B/P)
_MINHASH_P = 2_147_483_647
_MINHASH_A = [(2_654_435_761 * (s + 1)) % _MINHASH_P for s in range(16)]
_MINHASH_B = [(40_503 * (s + 17) + 1) % _MINHASH_P for s in range(16)]


def _bucket_sql(v: str, bits: int = 12) -> str:
    """DuckDB twin of kgeng.textops.similarity._lsh_bucket: bit h of
    the bucket is the sign of Σ_d v[d]·w(h,d), with w(h,d) the top bit
    of the 32-bit multiplicative hash (±1). DuckDB lists are
    1-indexed, Spark's sequence starts at 0, hence (d-1)."""
    terms = []
    for h in range(bits):
        w = (
            f"CAST(((({h} * 2654435761 + (d - 1) * 2246822519) % 4294967296) >> 31)"
            f" * 2 - 1 AS DOUBLE)"
        )
        proj = f"list_sum(list_transform(generate_series(1, len({v})), d -> {v}[d] * {w}))"
        terms.append(f"CASE WHEN {proj} > 0 THEN {1 << h} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def _simhash_sql() -> str:
    """DuckDB twin of kgeng.textops.dedup.simhash_table /
    dedup_simhash: bit i of a token hash = bit i%4 of hex digit i//4
    of md5(token); signatures as '0'/'1' strings; 4×16-char band
    blocking; Hamming = per-position char mismatch count."""
    digs = ", ".join(
        f"strpos('0123456789abcdef', substr(h, {j + 1}, 1)) - 1 AS d{j}" for j in range(16)
    )
    bit_sums = ", ".join(
        f"SUM(CASE WHEN (d{i // 4} >> {i % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(64)
    )
    sim_concat = " || ".join(
        f"CASE WHEN b{i} > 0 THEN '1' ELSE '0' END" for i in range(64)
    )
    hamming = " + ".join(
        f"CASE WHEN substr(sa, {k + 1}, 1) != substr(sb, {k + 1}, 1) THEN 1 ELSE 0 END"
        for k in range(64)
    )
    return f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000, substr(text, instr(text, ' ') + 1) FROM documents
    ),
    tok AS (
        SELECT doc_id, md5(t) AS h
        FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS t FROM corpus)
    ),
    dig AS (SELECT doc_id, {digs} FROM tok),
    bits AS (SELECT doc_id, {bit_sums} FROM dig GROUP BY doc_id),
    sim AS (SELECT doc_id, {sim_concat} AS sim_bits FROM bits),
    bands_all AS (
        SELECT doc_id, sim_bits, band, substr(sim_bits, band * 16 + 1, 16) AS key
        FROM sim, (SELECT unnest(generate_series(0, 3)) AS band)
    ),
    -- hot-bucket cap, mirroring kgeng.textops.dedup.MAX_SIMHASH_BUCKET
    hot AS (
        SELECT band, key FROM bands_all GROUP BY band, key HAVING COUNT(*) > 200
    ),
    bands AS (
        SELECT x.* FROM bands_all x ANTI JOIN hot h ON x.band = h.band AND x.key = h.key
    ),
    cands AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.sim_bits AS sa, b.sim_bits AS sb
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, hamming FROM (
        SELECT doc_a, doc_b, {hamming} AS hamming FROM cands
    ) WHERE hamming <= 6
    """

def _copurchase_edges_sql(budget: int) -> str:
    """Shared CTE prelude for the co-purchase graph family: the color
    shift ``s`` derived in SQL from ``COUNT(*)`` with the identical
    integer ladder as ``corpus.triangle_color_shift`` (smallest s with
    2·n ≤ budget·4^s, capped at 15), the sampled lineitem projection,
    and the distinct (u < v) edge set."""
    bucket = _hex_to_int_sql(
        f"substr(md5('{_TRIANGLE_SEED}|' || CAST(l_partkey AS VARCHAR)), 1, 7)",
        7,
    )
    return f"""
    WITH sh AS (
      SELECT COALESCE(MIN(s), 15) AS s FROM range(0, 16) t(s)
      WHERE 2 * (SELECT COUNT(*) FROM lineitem)
              <= {budget} * (CAST(1 AS BIGINT) << (2 * s))
    ),
    li AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      FROM lineitem, sh
      WHERE s = 0 OR ({bucket} % 10000) < (10000 >> s)
    ),
    e AS (
      SELECT DISTINCT a.pk AS u, b.pk AS v
      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
    )"""


def _kg_linkpred_sql(budget: int, cap: int) -> str:
    """Common-neighbor link-prediction twin: same capped-center wedge
    algebra as ``corpus.kg_link_prediction`` over the shared sampled
    co-purchase edge set; existing edges leave via NOT EXISTS."""
    return f"""{_copurchase_edges_sql(budget)},
    adj AS (
      SELECT u AS ctr, v AS nb FROM e
      UNION ALL SELECT v AS ctr, u AS nb FROM e
    ),
    deg AS (SELECT ctr, COUNT(*) AS dg FROM adj GROUP BY ctr),
    small AS (
      SELECT a.ctr, a.nb FROM adj a JOIN deg d ON d.ctr = a.ctr
      WHERE d.dg <= {cap}
    ),
    pairs AS (
      SELECT a.nb AS pa, b.nb AS pb, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM small a JOIN small b ON a.ctr = b.ctr AND a.nb < b.nb
      GROUP BY a.nb, b.nb
    )
    SELECT pa AS part_a, pb AS part_b, n_common
    FROM pairs p
    WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = p.pa AND e.v = p.pb)
    ORDER BY n_common DESC, pa ASC, pb ASC
    LIMIT {_LINKPRED_TOPK}
    """


def _kg_triangles_sql(budget: int) -> str:
    """Triangle census twin: the same colorful-sampling + degree-
    ordered-orientation algebra as ``corpus.kg_triangles``. The color
    shift s is derived in SQL from ``COUNT(*)`` with the identical
    integer ladder as ``corpus.triangle_color_shift`` (smallest s with
    2·n ≤ budget·4^s, capped at 15); parts survive iff their keyed-md5
    basis-point bucket < 10000 >> s; then pack (degree, id) into one
    bigint, orient every edge low→high, wedge-join on the source,
    close on the pair. Budget-parameterized so tests can force the
    sampled path on tiny corpora."""
    return f"""{_copurchase_edges_sql(budget)},
    deg AS (
      SELECT p, COUNT(*) AS d
      FROM (SELECT u AS p FROM e UNION ALL SELECT v AS p FROM e)
      GROUP BY p
    ),
    o AS (
      SELECT CASE WHEN ku < kv THEN u ELSE v END AS src,
             CASE WHEN ku < kv THEN v ELSE u END AS dst,
             GREATEST(ku, kv) AS kdst
      FROM (
        SELECT e.u, e.v,
               du.d * 10000000000 + e.u AS ku,
               dv.d * 10000000000 + e.v AS kv
        FROM e
        JOIN deg du ON du.p = e.u
        JOIN deg dv ON dv.p = e.v
      )
    ),
    tri AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM o e1
      JOIN o e2 ON e1.src = e2.src AND e1.kdst < e2.kdst
      JOIN o e3 ON e3.src = e1.dst AND e3.dst = e2.dst
    ),
    parts AS (
      SELECT a AS part FROM tri
      UNION ALL SELECT b AS part FROM tri
      UNION ALL SELECT c AS part FROM tri
    )
    SELECT part, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM parts GROUP BY part
    ORDER BY n_triangles DESC, part ASC
    LIMIT {_TRIANGLE_TOPK}
    """


def _rfm_score_sql(
    src: str, col: str, alias: str, descending: bool = False
) -> str:
    """One RFM dimension's (value → 1..bins score) map: histogram,
    cumulative-below window over the bounded value support, integer
    rank-quintile arithmetic — mirrors ``corpus._rfm_scores``
    (recency DESC: fewest days ⇒ highest score; NULLS LAST explicit
    on both engines)."""
    direction = "DESC NULLS LAST" if descending else "ASC NULLS LAST"
    return f"""(
      SELECT {col},
             CAST(1 + ({_RFM_BINS} * COALESCE(SUM(n_v) OVER (
                        ORDER BY {col} {direction}
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                      ), 0)) // (SUM(n_v) OVER ()) AS INT) AS {alias}
      FROM (SELECT {col}, COUNT(*) AS n_v FROM {src} GROUP BY {col})
    )"""


def _q_customer_rfm_sql() -> str:
    """RFM twin: decimal-exact spend sums, integer day/grid values,
    the same histogram rank-quintile arithmetic per dimension."""
    return f"""
    WITH o AS (
      SELECT o_custkey AS c, CAST(o_orderdate AS DATE) AS d,
             CAST(o_totalprice AS DECIMAL(18,2)) AS p
      FROM orders
    ),
    ref AS (SELECT MAX(d) AS refd FROM o),
    per AS (
      SELECT c,
             CAST((SELECT refd FROM ref) - MAX(d) AS BIGINT) AS rec,
             CAST(COUNT(*) AS BIGINT) AS fq,
             CAST(SUM(p) * 100 AS BIGINT) // {_RFM_M_GRID * 100} AS mg
      FROM o GROUP BY c
    ),
    rs AS {_rfm_score_sql("per", "rec", "r_score", descending=True)},
    fs AS {_rfm_score_sql("per", "fq", "f_score")},
    ms AS {_rfm_score_sql("per", "mg", "m_score")}
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM per
    JOIN rs USING (rec) JOIN fs USING (fq) JOIN ms USING (mg)
    GROUP BY r_score, f_score, m_score
    """


def _kg_lpa_sql() -> str:
    """Label-propagation twin: the KG_PRELUDE graph, LPA_ITERS
    unrolled synchronous rounds (vote = neighbor-label counts,
    winner = QUALIFY row 1 by count DESC / label ASC — the same
    deterministic tie order as the Spark side's min_by over
    struct(-count, label)), then community sizes top-K."""
    parts = [
        """
    , adj AS (
      SELECT subject AS nbr, object AS id FROM edges
      UNION ALL
      SELECT object AS nbr, subject AS id FROM edges
    ),
    l0 AS (SELECT DISTINCT id, id AS lbl FROM adj)"""
    ]
    for i in range(_LPA_ITERS):
        parts.append(f""",
    v{i + 1} AS (
      SELECT a.id, l.lbl, COUNT(*) AS cnt
      FROM adj a JOIN l{i} l ON a.nbr = l.id
      GROUP BY a.id, l.lbl
    ),
    l{i + 1} AS (
      SELECT id, lbl FROM v{i + 1}
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY id ORDER BY cnt DESC, lbl ASC
      ) = 1
    )""")
    parts.append(f"""
    SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM l{_LPA_ITERS} GROUP BY lbl
    ORDER BY n_nodes DESC, community ASC
    LIMIT {_LPA_TOPK}""")
    return KG_PRELUDE + "".join(parts)


def _kg_bfs_sql() -> str:
    """Multi-source BFS twin: a recursive walk over REVERSED edges
    from the region seeds, bounded at BFS_MAX_DEPTH hops, with the
    level being MIN(lvl) over all discovered paths — DuckDB's working
    table carries only the previous iteration's rows, so this is the
    same frontier expansion the Spark side runs, minus the visited-set
    pruning (the MIN collapse makes the extra paths harmless)."""
    return (
        KG_PRELUDE.replace("WITH nodes", "WITH RECURSIVE nodes", 1)
        + f""",
    walk AS (
      SELECT id, 0 AS lvl FROM nodes WHERE id LIKE 'REGN:%'
      UNION ALL
      SELECT e.subject AS id, w.lvl + 1 AS lvl
      FROM walk w JOIN edges e ON e.object = w.id
      WHERE w.lvl < {_BFS_DEPTH}
    ),
    lv AS (SELECT id, MIN(lvl) AS level FROM walk GROUP BY id)
    SELECT CAST(level AS INT) AS level,
           n.category_reordered[1] AS node_class,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM lv JOIN nodes n USING (id)
    GROUP BY 1, 2
    """
    )


def _kg_kcore_sql() -> str:
    """k-core peeling twin: KCORE_ROUNDS unrolled rounds as chained
    CTEs — symmetric deduped edge list, per-round degree HAVING
    filter, edges restricted to the keeper set on BOTH endpoints.
    Survivors are the FINAL round's keeper set (same semantics as the
    Spark side's last `keep`)."""
    parts = [
        """
    , sym0 AS (
      SELECT DISTINCT src, dst FROM (
        SELECT subject AS src, object AS dst FROM edges
        UNION ALL
        SELECT object AS src, subject AS dst FROM edges
      )
    )"""
    ]
    for i in range(_KCORE_ROUNDS):
        parts.append(f""",
    k{i + 1} AS (
      SELECT src AS id FROM sym{i}
      GROUP BY src HAVING COUNT(*) >= {_KCORE_K}
    )""")
        if i < _KCORE_ROUNDS - 1:
            parts.append(f""",
    sym{i + 1} AS (
      SELECT s.src, s.dst FROM sym{i} s
      JOIN k{i + 1} a ON s.src = a.id
      JOIN k{i + 1} b ON s.dst = b.id
    )""")
    parts.append(f"""
    SELECT n.category_reordered[1] AS node_class,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM k{_KCORE_ROUNDS} k JOIN nodes n ON k.id = n.id
    GROUP BY 1""")
    return KG_PRELUDE + "".join(parts)


ORACLES: dict[str, str] = {
    # -- training-data ops ------------------------------------------------
    "doc_bpe_tokens": """
    SELECT doc_id,
           len(regexp_split_to_array(text, '\\s+')) AS n_ws_tokens,
           len(regexp_extract_all(text, '''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+')) AS n_bpe_pieces
    FROM documents
    """,
    "doc_token_stats": """
    SELECT doc_id,
           len(regexp_split_to_array(text, '\\s+')) AS n_tokens,
           length(text) AS n_chars
    FROM documents
    """,
    "doc_quality": """
    -- regexp tokenization for BOTH counts: the Spark side splits on
    -- \\s+ everywhere, and string_split(' ') only agrees on corpora
    -- with exclusively single spaces (ADVICE r1)
    WITH t AS (
      SELECT doc_id,
             len(regexp_split_to_array(text, '\\s+')) AS n,
             len(list_filter(regexp_split_to_array(text, '\\s+'),
                             x -> x IN ('the', 'a'))) AS sw,
             length(text) AS chars
      FROM documents
    )
    SELECT doc_id, n AS n_tokens,
           floor((sw * 1.0 / n) * 10000) / 10000 AS stopword_ratio,
           floor(((chars - (n - 1)) * 1.0 / n) * 10000) / 10000 AS mean_token_len,
           floor((0.4 * (sw * 1.0 / n)
                 + 0.4 * least(n / 100.0, 1.0)
                 + 0.2 * least(((chars - (n - 1)) * 1.0 / n) / 8.0, 1.0)) * 10000) / 10000 AS quality_score
    FROM t
    """,
    "doc_lang_id": f"""
    WITH scored AS (
      SELECT lang,
             len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x IN ('the','a','of','and'))) AS c_en,
             len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x IN ('der','die','das','und'))) AS c_de,
             len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x IN ('el','los','las','que'))) AS c_es,
             len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x IN ('le','la','et','les'))) AS c_fr
      FROM documents
    ), with_best AS (
      SELECT lang, c_en, c_de, c_es, c_fr,
             greatest(c_en, c_de, c_es, c_fr) AS best
      FROM scored
    )
    SELECT lang, {_LANG_PRED_SQL} AS lang_pred, COUNT(*) AS n
    FROM with_best GROUP BY lang, lang_pred
    """,
    "doc_fingerprint": """
    SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT md5(lower(text))) AS n_distinct_fp
    FROM documents GROUP BY source
    """,
    # planted-PII scrub, mirroring kgeng.textops.analysis.doc_pii_scrub
    # (DuckDB regexp_replace needs the 'g' flag to replace every match,
    # which is Spark's default)
    "doc_pii_scrub": """
    WITH planted AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.com'
                  || ' or +1-555-' || CAST(doc_id % 900 + 100 AS VARCHAR)
                  || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) AS t
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]+')) AS n_emails,
           len(regexp_extract_all(t, '\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phones,
           md5(regexp_replace(
                 regexp_replace(t, '[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]+', '<EMAIL>', 'g'),
                 '\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS scrub_fp
    FROM planted
    """,
    "doc_domain_quota": """
    SELECT doc_id, source, rk FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    ) WHERE rk <= 10
    """,
    "doc_repetition": """
    WITH bg AS (
      SELECT doc_id,
             unnest(list_transform(
                 generate_series(1, greatest(len(t) - 1, 0)),
                 i -> t[i] || ' ' || t[i+1]
             )) AS bg
      FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM documents)
    ),
    per AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg)
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
           MAX(c) AS top_bigram_count,
           floor(MAX(c) * 1.0 / CAST(SUM(c) AS BIGINT) * 10000) / 10000
               AS repetition_ratio
    FROM per GROUP BY doc_id
    """,
    "doc_filter_chain": """
    -- C4-style keep/drop gate; every threshold is an integer
    -- cross-multiplication (no float boundary), reasons ordered
    -- first-failing exactly like the Spark CASE chain
    WITH t AS (
      SELECT doc_id, text, regexp_split_to_array(text, '\\s+') AS tk,
             length(text) AS n_chars
      FROM documents
    ),
    base AS (
      SELECT doc_id, len(tk) AS n_tok,
             list_sum(list_transform(tk, s -> length(s))) AS sum_len,
             n_chars - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g'))
                 AS n_sym,
             n_chars,
             len(list_filter(tk,
                 s -> s = 'the' OR s = 'a' OR s = 'of' OR s = 'and')) AS n_stop
      FROM t
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(tk) - 1, 0)),
                                   i -> tk[i] || ' ' || tk[i+1])) AS bg
      FROM t
    ),
    per AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg),
    rep AS (SELECT doc_id, SUM(c) AS n_bg, MAX(c) AS top_bg FROM per GROUP BY doc_id),
    decided AS (
      SELECT b.doc_id,
             CASE
               WHEN b.n_tok < 15 THEN 'too_short'
               WHEN b.sum_len < 3 * b.n_tok OR b.sum_len > 10 * b.n_tok
                 THEN 'token_len'
               WHEN b.n_sym * 10 >= b.n_chars THEN 'symbols'
               WHEN b.n_stop = 0 THEN 'no_stopwords'
               WHEN r.top_bg * 5 >= r.n_bg THEN 'repetition'
               ELSE 'kept'
             END AS reason
      FROM base b LEFT JOIN rep r ON b.doc_id = r.doc_id
    )
    SELECT doc_id, reason, reason = 'kept' AS keep FROM decided
    """,
    "doc_decontam": """
    -- word 13-gram eval-overlap scan; shingle family mirrors the
    -- Spark side exactly (\\s+ tokens, per-doc-distinct shingles,
    -- eval slice = doc_id < 20)
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS tk FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
                 generate_series(1, greatest(len(tk) - 12, 0)),
                 i -> array_to_string(tk[i:i+12], ' ')
             ))) AS sh
      FROM t
    ),
    ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 20)
    SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_eval_shingles
    FROM sh c JOIN ev USING (sh)
    WHERE c.doc_id >= 20
    GROUP BY c.doc_id
    """,
    "doc_shuffle_shard": """
    -- keyed-md5 deterministic shuffle: shard = first w hex nibbles,
    -- pos = rank by (key, doc_id) within the shard; seed mirrors
    -- analysis.SHUFFLE_SEED. w is DERIVED from the corpus count
    -- exactly as analysis.shard_nibbles_for does it — shards =
    -- ceil(n / 262144), w = hex-digit count of (shards - 1) — so
    -- both engines widen the shard key together as the corpus grows
    WITH nb AS (
      SELECT length(printf('%x',
               greatest(1, (COUNT(*) + 262143) // 262144) - 1)) AS w
      FROM documents
    )
    SELECT doc_id, shard, CAST(pos AS INT) AS pos FROM (
      SELECT doc_id, substr(k, 1, w) AS shard,
             ROW_NUMBER() OVER (PARTITION BY substr(k, 1, w)
                                ORDER BY k, doc_id) AS pos
      FROM (SELECT doc_id,
                   md5('kgeng-r4|' || CAST(doc_id AS VARCHAR)) AS k
            FROM documents), nb
    )
    """,
    "doc_chunk": """
    -- 64-token windows every 48 tokens; tk[s:s+63] is the inclusive
    -- 64-element slice (= Spark slice(toks, s, 64)); token family is
    -- the shared \\s+ rule
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS tk
      FROM documents
    ),
    s AS (
      SELECT doc_id, tk,
             unnest(generate_series(1, len(tk), 48)) AS s
      FROM t
    )
    SELECT doc_id,
           CAST((s - 1) // 48 AS INT) AS chunk_id,
           CAST(least(64, len(tk) - s + 1) AS INT) AS n_chunk_tokens,
           md5(array_to_string(tk[s:s+63], ' ')) AS chunk_md5
    FROM s
    """,
    "doc_mix_weights": """
    -- integer-exact mixture weights: basis points by integer division
    WITH per AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT)
                 AS n_tokens
      FROM documents GROUP BY source
    )
    SELECT source, n_docs, n_tokens,
           CAST((n_tokens * 10000) // (SELECT SUM(n_tokens) FROM per)
                AS BIGINT) AS weight_bp
    FROM per
    """,
    "doc_pack": f"""
    -- GPT-style sequence packing: concat the shuffled token stream
    -- per shard, cut every 2048 tokens. Shard width derived from
    -- COUNT(*) exactly as in doc_shuffle_shard; offset cast to BIGINT
    -- before div/mod (SUM over window widens to HUGEINT otherwise)
    WITH nb AS (
      SELECT length(printf('%x',
               greatest(1, (COUNT(*) + 262143) // 262144) - 1)) AS w
      FROM documents
    ),
    staged AS (
      SELECT doc_id,
             md5('kgeng-r4|' || CAST(doc_id AS VARCHAR)) AS k,
             substr(md5('kgeng-r4|' || CAST(doc_id AS VARCHAR)), 1, w)
                 AS shard,
             CAST(len(regexp_split_to_array(text, '\\s+')) AS INT)
                 AS n_tokens
      FROM documents, nb
    ),
    runs AS (
      SELECT doc_id, shard, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY shard
                                      ORDER BY k, doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS BIGINT)
                 - n_tokens AS off
      FROM staged
    )
    SELECT doc_id, shard, n_tokens,
           CAST(off // 2048 AS INT) AS pack_id,
           CAST(off % 2048 AS INT) AS pack_offset
    FROM runs
    """,
    "doc_top_ngrams": """
    -- per-language top-K bigrams (count desc, bigram asc ties), K =
    -- 2 + hex digits of COUNT(*) (top_ngrams_k_for); the Spark side's
    -- salt is plan-only (distributed top-k merge), so this oracle
    -- ranks per language directly
    WITH kk AS (
      SELECT 2 + length(printf('%x', greatest(COUNT(*), 1))) AS k
      FROM documents
    ),
    b AS (
      SELECT lang,
             unnest(list_transform(generate_series(1, len(tk) - 1),
                    i -> tk[i] || ' ' || tk[i + 1])) AS bg
      FROM (SELECT lang, regexp_split_to_array(text, '\\s+') AS tk
            FROM documents)
    ),
    c AS (SELECT lang, bg, COUNT(*) AS n FROM b GROUP BY lang, bg)
    SELECT lang, bg, n, CAST(rank AS INT) AS rank FROM (
      SELECT lang, bg, n,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n DESC, bg ASC) AS rank
      FROM c
    ) WHERE rank <= (SELECT k FROM kk)
    """,
    "doc_mix_sample": f"""
    -- weight-proportional Bernoulli keep: bucket = keyed-md5 basis
    -- points (shared polynomial hex parse), survives iff bucket <
    -- the domain's token-share weight_bp (doc_mix_weights rule)
    WITH per AS (
      SELECT source,
             CAST(SUM(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT)
                 AS n_tokens
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source,
             CAST((n_tokens * 10000) // (SELECT SUM(n_tokens) FROM per)
                  AS INT) AS weight_bp
      FROM per
    )
    SELECT doc_id, source, bucket, weight_bp FROM (
      SELECT d.doc_id, d.source, w.weight_bp,
             CAST({_hex_to_int_sql(
                 "substr(md5('kgeng-sample|' || CAST(doc_id AS VARCHAR)), 1, 7)", 7
             )} % 10000 AS INT) AS bucket
      FROM documents d JOIN w USING (source)
    )
    WHERE bucket < weight_bp
    """,
    "doc_oov_rate": """
    -- per-doc OOV against the corpus's own top-K vocabulary, K =
    -- 8 * hex digits of COUNT(*) (vocab_k_for); count desc, token asc
    -- tie-break; integer basis points
    WITH kk AS (
      SELECT 8 * length(printf('%x', greatest(COUNT(*), 1))) AS k
      FROM documents
    ),
    toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(text, '\\s+')) AS tok
      FROM documents
    ),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, COUNT(*) AS n,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok ASC) AS rk
        FROM toks GROUP BY tok
      ) WHERE rk <= (SELECT k FROM kk)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS INT) AS n_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS INT)
               AS n_oov,
           CAST((SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 10000)
                // COUNT(*) AS INT) AS oov_bp
    FROM toks t LEFT JOIN vocab v USING (tok)
    GROUP BY doc_id
    """,
    "doc_split": f"""
    -- keyed-md5 basis-point bucket -> train/valid/test; first 7 hex
    -- digits parsed via the shared polynomial (no engine hex cast)
    SELECT doc_id, bucket,
           CASE WHEN bucket < 9800 THEN 'train'
                WHEN bucket < 9900 THEN 'valid'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id,
             CAST({_hex_to_int_sql(
                 "substr(md5('kgeng-split|' || CAST(doc_id AS VARCHAR)), 1, 7)", 7
             )} % 10000 AS INT) AS bucket
      FROM documents
    )
    """,
    "doc_tfidf_top_terms": """
    -- per-doc top-K terms by tf * (N div df): integer idf ratio (no
    -- log/float boundary), ties (score desc, term asc), K = the
    -- top_ngrams_k_for rule
    WITH kk AS (
      SELECT 2 + length(printf('%x', greatest(COUNT(*), 1))) AS k,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id,
                   unnest(regexp_split_to_array(text, '\\s+')) AS tok
            FROM documents)
      GROUP BY doc_id, tok
    ),
    df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
    s AS (
      SELECT doc_id, t.tok, tf,
             CAST(tf * ((SELECT n FROM kk) // df) AS BIGINT) AS score
      FROM tf t JOIN df USING (tok)
    )
    SELECT doc_id, tok, tf, score, CAST(rk AS INT) AS rank FROM (
      SELECT doc_id, tok, tf, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, tok ASC) AS rk
      FROM s
    ) WHERE rk <= (SELECT k FROM kk)
    """,
    "doc_pack_stats": """
    -- packing-efficiency audit per derived-width shard: packs =
    -- ceil(tokens / 2048), waste + utilization in integer basis points
    WITH nb AS (
      SELECT length(printf('%x',
               greatest(1, (COUNT(*) + 262143) // 262144) - 1)) AS w
      FROM documents
    ),
    per AS (
      SELECT substr(md5('kgeng-r4|' || CAST(doc_id AS VARCHAR)), 1, w)
                 AS shard,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(regexp_split_to_array(text, '\\s+')))
                  AS BIGINT) AS total_tokens
      FROM documents, nb GROUP BY shard
    )
    SELECT shard, n_docs, total_tokens,
           CAST((total_tokens + 2047) // 2048 AS BIGINT) AS n_packs,
           CAST(((total_tokens + 2047) // 2048) * 2048 - total_tokens
                AS BIGINT) AS waste_tokens,
           CAST((total_tokens * 10000)
                // (((total_tokens + 2047) // 2048) * 2048) AS INT)
               AS util_bp
    FROM per
    """,
    "mm_resize": """
    SELECT doc_id, 64 AS n_bytes_out,
           CAST(list_sum(list_transform(generate_series(0, 63),
               i -> ascii(substr(text, 1 + (i * (length(text) - 1)) // 63, 1))
           )) AS BIGINT) AS checksum
    FROM documents WHERE length(text) > 0
    """,
    "mm_frame_stats": """
    SELECT doc_id,
           CAST((length(text) + 255) // 256 AS BIGINT) AS n_frames_total,
           CAST(((length(text) + 255) // 256 + 3) // 4 AS BIGINT) AS n_frames_sampled,
           md5(substr(text, 1, 256)) AS first_frame_md5
    FROM documents WHERE length(text) > 0
    """,
    "dedup_exact": """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT doc_id + 10000, text FROM documents
    )
    SELECT md5(text) AS fp, COUNT(*) AS n_copies, MIN(doc_id) AS keep_id
    FROM corpus GROUP BY md5(text) HAVING COUNT(*) > 1
    """,
    "dedup_ngram_jaccard": DUP_TEXT_PRELUDE
    + """
    SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.6
    """,
    # recursive-CTE min-label propagation = the CC oracle; DuckDB needs
    # RECURSIVE declared on the whole WITH list
    "dedup_cluster_assign": DUP_TEXT_PRELUDE.replace("WITH corpus", "WITH RECURSIVE corpus", 1)
    + """
    , pairs AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.6),
    und AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
      SELECT u AS doc, v AS r FROM und
      UNION
      SELECT rc.doc, und.v FROM reach rc JOIN und ON und.u = rc.r
    ),
    lbl AS (
      SELECT doc, LEAST(doc, MIN(r)) AS keep_id FROM reach GROUP BY doc
    )
    SELECT l.doc AS doc_id, l.keep_id,
           CAST(c.n AS BIGINT) AS cluster_size
    FROM lbl l
    JOIN (SELECT keep_id, COUNT(*) AS n FROM lbl GROUP BY keep_id) c
      ON l.keep_id = c.keep_id
    """,
    "dedup_minhash_lsh": DUP_TEXT_PRELUDE
    + f"""
    , based AS (
      SELECT doc_id, {_hex_to_int_sql("substr(md5(sh), 1, 7)", 7)} AS x FROM sh
    ),
    seeds AS (
      SELECT seed,
             CASE seed {" ".join(f"WHEN {s} THEN {a}" for s, a in enumerate(_MINHASH_A))} END AS a,
             CASE seed {" ".join(f"WHEN {s} THEN {b}" for s, b in enumerate(_MINHASH_B))} END AS b
      FROM (SELECT unnest(generate_series(0, 15)) AS seed)
    ),
    sig AS (
      SELECT doc_id, seed, MIN((a * x + b) % {_MINHASH_P}) AS mh
      FROM based, seeds
      GROUP BY doc_id, seed
    ),
    bands AS (
      SELECT doc_id, seed // 4 AS band,
             md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed)) AS band_key
      FROM sig GROUP BY doc_id, seed // 4
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b, j.jaccard
    FROM cands c JOIN jac j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
    WHERE j.jaccard >= 0.6
    """,
    "dedup_simhash": _simhash_sql(),
    "dedup_embedding_cosine": f"""
    WITH corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 10000, CAST(embedding AS DOUBLE[]) FROM embeddings
    ),
    en AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
             {_bucket_sql("v")} AS bucket
      FROM corpus
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           floor(list_dot_product(a.v, b.v) / (a.nrm * b.nrm) * 10000) / 10000 AS cosine
    FROM en a JOIN en b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE floor(list_dot_product(a.v, b.v) / (a.nrm * b.nrm) * 10000) / 10000 >= 0.999
    """,
    "ann_cosine_topk": """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             floor(list_dot_product(q.v, c.v) / (q.nrm * c.nrm) * 100000) / 100000 AS score
      FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id >= 10
    )
    SELECT query_id, neighbor_id, score, rank FROM (
      SELECT query_id, neighbor_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    "ann_lsh_topk": f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm,
             {_bucket_sql("CAST(embedding AS DOUBLE[])")} AS bucket
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             floor(list_dot_product(q.v, c.v) / (q.nrm * c.nrm) * 100000) / 100000 AS score
      FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id < 10 AND c.vec_id >= 10
    )
    SELECT query_id, neighbor_id, score, rank FROM (
      SELECT query_id, neighbor_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    "ann_ivf_topk": """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ),
    cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM e
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
    assigned AS (
      SELECT neighbor_id, v, nrm, cent_id FROM (
        SELECT c.vec_id AS neighbor_id, c.v, c.nrm, ct.cent_id,
               ROW_NUMBER() OVER (PARTITION BY c.vec_id
                                  ORDER BY list_dot_product(c.v, ct.cv) / (c.nrm * ct.cn) DESC,
                                           ct.cent_id) AS r
        FROM e c CROSS JOIN cents ct WHERE c.vec_id >= 10
      ) WHERE r = 1
    ),
    probes AS (
      SELECT query_id, qv, qn, cent_id FROM (
        SELECT q.vec_id AS query_id, q.v AS qv, q.nrm AS qn, ct.cent_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY list_dot_product(q.v, ct.cv) / (q.nrm * ct.cn) DESC,
                                           ct.cent_id) AS r
        FROM e q CROSS JOIN cents ct WHERE q.vec_id < 10
      ) WHERE r <= 3
    ),
    scored AS (
      SELECT p.query_id, a.neighbor_id,
             floor(list_dot_product(p.qv, a.v) / (p.qn * a.nrm) * 100000) / 100000 AS score
      FROM probes p JOIN assigned a USING (cent_id)
    )
    SELECT query_id, neighbor_id, score, rank FROM (
      SELECT query_id, neighbor_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    "ann_quantize_sq8": """
    -- scalar int8-range quantization; expression trees mirror the
    -- Spark side op-for-op so doubles are bit-identical, MSE is
    -- floor-truncated
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    b AS (
      SELECT vec_id, v, list_min(v) AS vmin,
             list_max(v) - list_min(v) AS rng
      FROM e
    )
    SELECT vec_id,
           array_to_string(list_transform(v, x ->
               CAST(CAST(CASE WHEN rng > 0
                    THEN floor((x - vmin) / rng * 255) ELSE 0 END AS INT)
                    AS VARCHAR)), ',') AS codes,
           floor(list_sum(list_transform(v, x ->
               (x - (vmin + (CAST(CASE WHEN rng > 0
                    THEN floor((x - vmin) / rng * 255) ELSE 0 END AS INT)
                    + 0.5) / 256 * rng))
               * (x - (vmin + (CAST(CASE WHEN rng > 0
                    THEN floor((x - vmin) / rng * 255) ELSE 0 END AS INT)
                    + 0.5) / 256 * rng))
           )) / len(v) * 10000) / 10000 AS mse_t4
    FROM b
    """,
    "mm_metadata": """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5,
           'image/' || source AS mime
    FROM documents
    """,
    # feature byte i (i=1..8) of the md5 digest = hex chars (2i-1, 2i);
    # mirrors the fixed-point serialization in kgeng.textops.multimodal
    "mm_features": """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           array_to_string(list_transform(generate_series(1, 8), j ->
               CAST((strpos('0123456789abcdef', substr(md5(text), 2*j-1, 1)) - 1) * 16
                    + strpos('0123456789abcdef', substr(md5(text), 2*j, 1)) - 1
                    AS VARCHAR)), ',') AS feature_q
    FROM documents
    """,
    "q_events_sessions": """
    WITH flagged AS (
      -- floor(epoch) matches Spark's cast(ts as long), which truncates
      -- to whole seconds; fractional epoch would diverge on gaps that
      -- straddle the 1800s threshold sub-second (ADVICE r1)
      SELECT user_id, ts, event_id,
             CASE WHEN floor(epoch(ts)) - lag(floor(epoch(ts))) OVER w IS NULL
                    OR floor(epoch(ts)) - lag(floor(epoch(ts))) OVER w > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    with_sid AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ),
    per_session AS (
      SELECT user_id, session_id, COUNT(*) AS n_events
      FROM with_sid GROUP BY user_id, session_id
    )
    SELECT user_id, COUNT(*) AS n_sessions,
           ROUND(AVG(n_events), 4) AS avg_session_events
    FROM per_session GROUP BY user_id
    """,
    "q_events_attrib": """
    -- interval-join twin: the plain per-user range join is
    -- oracle-only — the Spark side is the time-bucketed equi-join
    -- (purchases duplicated into two adjacent hour buckets), which
    -- produces the identical match set with bounded pair space
    WITH e AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS tsec
      FROM events
    )
    SELECT c.event_id AS click_id, c.user_id,
           CAST(COUNT(*) AS INT) AS n_purchases,
           MIN(p.event_id) AS first_purchase_id
    FROM e c JOIN e p
      ON p.user_id = c.user_id
     AND p.tsec > c.tsec AND p.tsec <= c.tsec + 3600
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    GROUP BY c.event_id, c.user_id
    """,
    "q_events_asof": """
    -- as-of join twin: whole-second arithmetic everywhere (Spark's
    -- cast(ts as long) == floor(epoch)); the quadratic probe×event
    -- join is oracle-only — the Spark side is the linear union +
    -- running-last window. Ties: max event_id within a second.
    WITH e AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
             event_id, value
      FROM events
    ),
    b AS (SELECT user_id, MIN(tsec) AS cmin, MAX(tsec) AS cmax FROM e GROUP BY user_id),
    p AS (
      SELECT user_id, i AS checkpoint,
             cmin + (i * (cmax - cmin)) // 4 AS cts
      FROM b, (SELECT unnest([1, 2, 3]) AS i)
    ),
    j AS (
      SELECT p.user_id, p.checkpoint, e.event_id, e.value,
             ROW_NUMBER() OVER (PARTITION BY p.user_id, p.checkpoint
                                ORDER BY e.tsec DESC, e.event_id DESC) AS r
      FROM p JOIN e ON e.user_id = p.user_id AND e.tsec <= p.cts
    )
    SELECT user_id, checkpoint, event_id AS asof_event_id, value AS asof_value
    FROM j WHERE r = 1
    """,
    "q_events_json": """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY 1
    """,
    # -- KG query corpus --------------------------------------------------
    "kg_point_lookup": KG_PRELUDE
    + """
    SELECT id, name, category_reordered[1] AS primary_class
    FROM nodes WHERE id = 'CUST:42'
    """,
    "kg_substring_filter": KG_PRELUDE
    + """
    SELECT id, name FROM nodes
    WHERE id LIKE '%PART%' AND name LIKE '%red%'
    ORDER BY id LIMIT 20
    """,
    "kg_counts": KG_PRELUDE
    + """
    SELECT (SELECT COUNT(*) FROM nodes) AS n_nodes,
           (SELECT COUNT(*) FROM edges) AS n_edges
    """,
    "kg_label_inventory": KG_PRELUDE
    + """
    SELECT label, COUNT(*) AS n_nodes
    FROM (SELECT unnest(category_reordered) AS label FROM nodes)
    GROUP BY label
    """,
    "kg_duplicate_names": KG_PRELUDE
    + """
    SELECT name, COUNT(*) AS cnt FROM nodes
    GROUP BY name HAVING COUNT(*) > 1
    """,
    "kg_one_hop": KG_PRELUDE
    + """
    , anchor AS (
      SELECT min(id) AS aid FROM nodes
      WHERE list_contains(category, 'biolink:Disease')
    ),
    named AS (
      SELECT id FROM nodes WHERE list_contains(category, 'biolink:NamedThing')
    )
    SELECT predicate, primary_knowledge_source, direction, COUNT(*) AS n
    FROM (
      SELECT e.predicate, e.primary_knowledge_source, 'out' AS direction
      FROM edges e, anchor
      WHERE e.subject = anchor.aid AND e.object IN (SELECT id FROM named)
      UNION ALL
      SELECT e.predicate, e.primary_knowledge_source, 'in' AS direction
      FROM edges e, anchor
      WHERE e.object = anchor.aid AND e.subject IN (SELECT id FROM named)
    )
    GROUP BY predicate, primary_knowledge_source, direction
    """,
    "kg_predicate_inventory": KG_PRELUDE
    + """
    SELECT predicate, COUNT(*) AS n_edges FROM edges GROUP BY predicate
    """,
    "kg_two_hop_closure": KG_PRELUDE
    + """
    , root AS (
      SELECT id AS member FROM nodes
      WHERE id = 'BRND:Brand#13'
        AND (list_contains(category, 'biolink:GeneFamily')
             OR list_contains(category, 'biolink:Phenomenon'))
    ),
    closure AS (
      SELECT member FROM root
      UNION
      SELECT DISTINCT e.subject FROM edges e JOIN root r ON e.object = r.member
      WHERE e.predicate = 'biolink:subclass_of'
    ),
    closure_named AS (
      SELECT member FROM closure
      WHERE member IN (SELECT id FROM nodes
                       WHERE list_contains(category, 'biolink:NamedThing'))
    )
    SELECT e.object AS part_id, COUNT(DISTINCT e.subject) AS n_orders
    FROM edges e JOIN closure_named c ON e.object = c.member
    WHERE e.predicate IN ('biolink:contains', 'biolink:supplied_by')
      AND e.subject IN (SELECT id FROM nodes
                        WHERE list_contains(category, 'biolink:InformationContentEntity'))
    GROUP BY e.object
    """,
    "kg_degree_distribution": KG_PRELUDE
    + """,
    deg AS (
      SELECT id, COUNT(*) AS degree FROM (
        SELECT subject AS id FROM edges
        UNION ALL SELECT object FROM edges
      ) GROUP BY id
    )
    SELECT n.category_reordered[1] AS node_class,
           CAST(length(printf('%x', degree)) AS INT) AS degree_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM deg d JOIN nodes n USING (id)
    GROUP BY 1, 2
    """,
    # iteration count / K / integer rank units come from the Spark
    # side's constants (config, not semantics — the arithmetic below is
    # still an independent derivation); a corpus.py retune can no
    # longer silently desync the twin
    "kg_pagerank": KG_PRELUDE
    + f""",
    e AS (SELECT subject AS s, object AS o FROM edges),
    outd AS (SELECT s, COUNT(*) AS d FROM e GROUP BY s),
    n AS (SELECT DISTINCT id FROM
          (SELECT s AS id FROM e UNION ALL SELECT o FROM e)),
    r0 AS (SELECT id, CAST({_PR_SCALE} AS BIGINT) AS r FROM n),
    """
    + ",\n    ".join(
        f"""r{i + 1} AS (
      SELECT n.id,
             CAST({_PR_BASE} + (85 * COALESCE(c.sm, 0)) // 100 AS BIGINT) AS r
      FROM n LEFT JOIN (
        SELECT e.o AS id, CAST(SUM(r.r // outd.d) AS BIGINT) AS sm
        FROM e JOIN r{i} r ON e.s = r.id JOIN outd ON e.s = outd.s
        GROUP BY e.o
      ) c ON n.id = c.id)"""
        for i in range(_PR_ITERS)
    )
    + f"""
    SELECT id, r AS rank_micro FROM r{_PR_ITERS}
    ORDER BY r DESC, id ASC LIMIT {_PR_TOPK}
    """,
    "kg_build_audit": KG_PRELUDE
    + """
    , lookup AS (
      -- class non-null filter mirrored from the Spark side: makes the
      -- key-nullness split (Spark) and class-nullness split (here)
      -- coincide by construction (ADVICE r3)
      SELECT id, category_reordered[1] AS node_class
      FROM nodes WHERE id NOT LIKE 'REGN:%' AND category_reordered[1] IS NOT NULL
    ),
    joined AS (
      SELECT e.predicate,
             s.node_class AS subject_class, o.node_class AS object_class
      FROM edges e
      LEFT JOIN lookup s ON e.subject = s.id
      LEFT JOIN lookup o ON e.object = o.id
    ),
    r AS (
      SELECT predicate, COUNT(*) AS n_resolved,
             array_to_string(
               list_sort(list_distinct(
                 array_agg(subject_class || '|' || object_class))), ';'
             ) AS class_pairs_str
      FROM joined
      WHERE subject_class IS NOT NULL AND object_class IS NOT NULL
      GROUP BY predicate
    ),
    d AS (
      SELECT predicate, COUNT(*) AS n_dropped FROM joined
      WHERE subject_class IS NULL OR object_class IS NULL
      GROUP BY predicate
    )
    SELECT COALESCE(r.predicate, d.predicate) AS predicate,
           CAST(COALESCE(r.n_resolved, 0) AS BIGINT) AS n_resolved,
           CAST(COALESCE(d.n_dropped, 0) AS BIGINT) AS n_dropped,
           COALESCE(r.class_pairs_str, '') AS class_pairs_str
    FROM r FULL OUTER JOIN d ON r.predicate = d.predicate
    """,
    "kg_degree0_audit": KG_PRELUDE
    + """
    SELECT node_class, COUNT(*) AS n
    FROM (
      SELECT category_reordered[1] AS node_class
      FROM nodes n
      WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.object = n.id)
    )
    GROUP BY node_class
    """,
    "kg_detach_delete_audit": KG_PRELUDE
    + """
    , victims AS (
      SELECT id FROM nodes n
      WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.object = n.id)
      ORDER BY id LIMIT 50
    )
    SELECT (SELECT COUNT(*) FROM nodes) AS n_nodes_before,
           (SELECT COUNT(*) FROM nodes
            WHERE id NOT IN (SELECT id FROM victims)) AS n_nodes_after,
           (SELECT COUNT(*) FROM edges
            WHERE subject NOT IN (SELECT id FROM victims)
              AND object NOT IN (SELECT id FROM victims)) AS n_edges_after,
           (SELECT COUNT(*) FROM victims) AS n_victims
    """,
    "kg_reorder_audit": KG_PRELUDE
    + """
    SELECT id, array_to_string(category_reordered, ';') AS category_reordered
    FROM nodes
    WHERE id LIKE 'CUST:%' AND CAST(split_part(id, ':', 2) AS BIGINT) % 100 = 0
    """,
    "q_pricing_summary": """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    "q_revenue_by_nation": """
    SELECT n_name AS nation,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    "q_top_parts_per_brand": """
    WITH per_part AS (
      SELECT p_brand, p_partkey, ROUND(SUM(l_quantity), 2) AS total_qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand, p_partkey
    )
    SELECT p_brand, p_partkey, total_qty, rank FROM (
      SELECT p_brand, p_partkey, total_qty,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY total_qty DESC, p_partkey) AS rank
      FROM per_part
    ) WHERE rank <= 3
    """,
    "q_events_daily": """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    "q_order_priority_counts": """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    )
    GROUP BY o_orderpriority
    """,
    "doc_line_dedup": """
    -- CCNet-style cross-doc block dedup: first (doc_id, pos)
    -- occurrence of each 16-token block hash survives; window
    -- rank here ≡ the engine's min(struct) keeper (keys are unique)
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS tk
      FROM documents
    ),
    p AS (
      SELECT doc_id, tk,
             unnest(generate_series(0, (len(tk) - 1) // 16)) AS pos
      FROM t
    ),
    inst AS (
      SELECT doc_id, pos,
             array_to_string(tk[pos * 16 + 1 : pos * 16 + 16], ' ')
                 AS block
      FROM p
    ),
    k AS (
      SELECT doc_id, pos, block,
             ROW_NUMBER() OVER (PARTITION BY md5(block)
                                ORDER BY doc_id, pos) AS rk
      FROM inst
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST((SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) * 10000)
                // COUNT(*) AS INT) AS kept_bp,
           COALESCE(string_agg(CASE WHEN rk = 1 THEN block END,
                               ' ' ORDER BY pos), '') AS text_dedup
    FROM k GROUP BY doc_id
    """,
    "doc_length_deciles": """
    -- exact integer decile boundaries over the token-count histogram:
    -- boundary(d) = min length with cum >= ceil(d*N/10); each
    -- histogram row emits the deciles it bounds in closed form
    WITH h AS (
      SELECT CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT)
                 AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY v
    ),
    cw AS (
      SELECT v, c,
             CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum,
             (SELECT SUM(c) FROM h) AS n
      FROM h
    ),
    e AS (
      SELECT v, cum,
             unnest(generate_series(
                 CAST(greatest((10 * (cum - c) + n) // n, 1) AS BIGINT),
                 CAST(least((10 * cum) // n, 10) AS BIGINT))) AS d
      FROM cw
    )
    SELECT CAST(d AS INT) AS decile,
           CAST(v AS BIGINT) AS n_tokens_boundary,
           CAST(cum AS BIGINT) AS cum_docs
    FROM e
    """,
    "q_events_funnel": """
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(ts) AS t_click
      FROM events e JOIN v USING (user_id)
      WHERE event_type = 'click' AND ts > t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(ts) AS t_purchase
      FROM events e JOIN c USING (user_id)
      WHERE event_type = 'purchase' AND ts > t_click
      GROUP BY e.user_id
    ),
    n AS (
      SELECT (SELECT COUNT(*) FROM v) AS n1,
             (SELECT COUNT(*) FROM c) AS n2,
             (SELECT COUNT(*) FROM p) AS n3
    )
    SELECT '1_view' AS stage, CAST(n1 AS BIGINT) AS n_users,
           CAST(10000 AS INT) AS conv_bp FROM n
    UNION ALL
    SELECT '2_click', CAST(n2 AS BIGINT),
           CAST(CASE WHEN n1 = 0 THEN 0
                     ELSE (n2 * 10000) // n1 END AS INT) FROM n
    UNION ALL
    SELECT '3_purchase', CAST(n3 AS BIGINT),
           CAST(CASE WHEN n2 = 0 THEN 0
                     ELSE (n3 * 10000) // n2 END AS INT) FROM n
    """,
    "q_copurchase_pairs": """
    WITH li AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    )
    SELECT a.pk AS part_a, b.pk AS part_b,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
    GROUP BY 1, 2
    ORDER BY n_orders DESC, part_a ASC, part_b ASC
    LIMIT 20
    """,
    "kg_upsert_audit": KG_PRELUDE
    + """
    , snap AS (SELECT id, name FROM nodes),
    upd AS (
      SELECT id, upper(name) AS name FROM snap
      WHERE substr(md5(id), 1, 1) = '0'
    ),
    ins AS (
      SELECT 'NEW:' || id AS id, 'new-' || name AS name FROM snap
      WHERE substr(md5(id), 1, 2) = '00'
    ),
    delta AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
    m AS (
      SELECT COALESCE(d.id, s.id) AS id,
             CASE WHEN s.id IS NULL THEN 'insert'
                  WHEN d.id IS NULL THEN 'carry'
                  WHEN d.name IS DISTINCT FROM s.name THEN 'update'
                  ELSE 'noop' END AS action
      FROM snap s FULL OUTER JOIN delta d ON s.id = d.id
    )
    SELECT action, CAST(COUNT(*) AS BIGINT) AS n_nodes,
           MIN(id) AS min_id, MAX(id) AS max_id
    FROM m GROUP BY action
    """,
    "q_user_retention": f"""
    WITH d AS (
      SELECT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    f AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id)
    SELECT cohort_day,
           CAST(day - cohort_day AS INT) AS day_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM d JOIN f USING (user_id)
    WHERE day - cohort_day <= {_RETENTION_DAYS}
    GROUP BY 1, 2
    """,
    "kg_triangles": _kg_triangles_sql(_TRIANGLE_EDGE_BUDGET),
    "kg_label_propagation": _kg_lpa_sql(),
    "q_customer_rfm": _q_customer_rfm_sql(),
    # FILTER columns generated from the SAME declared domain the Spark
    # pivot uses (corpus.EVENT_TYPES) — an edit there cannot silently
    # leave the oracle listing a stale type set
    "q_events_pivot": "SELECT CAST(ts AS DATE) AS day, "
    + ", ".join(
        f"CAST(COUNT(*) FILTER (event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in _EVENT_TYPES
    )
    + " FROM events GROUP BY 1",
    "q_revenue_rollup": """
    SELECT COALESCE(r_name, 'ALL') AS region,
           COALESCE(n_name, 'ALL') AS nation,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    "q_revenue_rolling": f"""
    WITH daily AS (
      SELECT day, day_revenue_cents, n_orders,
             CAST(day - DATE '1970-01-01' AS BIGINT) AS epoch_day
      FROM (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS day_revenue_cents,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
      )
    )
    SELECT day, day_revenue_cents, n_orders,
           CAST(SUM(day_revenue_cents) OVER (
             ORDER BY epoch_day
             RANGE BETWEEN {ROLLING_WINDOW_DAYS - 1} PRECEDING
                       AND CURRENT ROW
           ) AS BIGINT) AS trailing_revenue_cents
    FROM daily
    """,
    "kg_link_prediction": _kg_linkpred_sql(
        _TRIANGLE_EDGE_BUDGET, _LINKPRED_DEGREE_CAP
    ),
    "q_event_transitions": """
    WITH lagd AS (
      SELECT event_type AS next_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    ),
    pairs AS (
      SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
      FROM lagd WHERE prev_type IS NOT NULL
      GROUP BY prev_type, next_type
    ),
    tot AS (
      SELECT prev_type, SUM(n_transitions) AS prev_total
      FROM pairs GROUP BY prev_type
    )
    SELECT p.prev_type, p.next_type, p.n_transitions,
           CAST(p.n_transitions * 10000 // t.prev_total AS BIGINT) AS prob_bp
    FROM pairs p JOIN tot t USING (prev_type)
    """,
    "kg_bfs_levels": _kg_bfs_sql(),
    "kg_kcore": _kg_kcore_sql(),
    # the UNSPLIT plain frequency join: the Spark side's Zipf
    # head/tail routing is plan-level only (head ∪ tail = tf), so the
    # twin needs no mirror of the split
    "doc_unigram_lm": """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok
      FROM documents
    ),
    dtf AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok),
    tf AS (SELECT tok, SUM(c) AS freq FROM dtf GROUP BY tok)
    SELECT d.doc_id,
           CAST(SUM(d.c) AS BIGINT) AS n_tokens,
           CAST(SUM(d.c * t.freq) // SUM(d.c) AS BIGINT) AS mean_tok_freq
    FROM dtf d JOIN tf t USING (tok)
    GROUP BY d.doc_id
    """,
    "q_events_anomaly": f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    d2 AS (
      SELECT *, CAST(day - DATE '1970-01-01' AS BIGINT) AS epoch_day
      FROM daily
    ),
    win AS (
      SELECT day, event_type, n_events,
             CAST(COALESCE(SUM(n_events) OVER w, 0) AS BIGINT)
                 AS trail_events,
             CAST(COUNT(n_events) OVER w AS BIGINT) AS trail_days
      FROM d2
      WINDOW w AS (PARTITION BY event_type ORDER BY epoch_day
                   RANGE BETWEEN {_ANOMALY_TRAIL} PRECEDING
                             AND 1 PRECEDING)
    )
    SELECT day, event_type, n_events, trail_events, trail_days,
           CAST(trail_days >= {_ANOMALY_MIN} AND
                n_events * trail_days > 2 * trail_events AS INT) AS spike
    FROM win
    """,
}
