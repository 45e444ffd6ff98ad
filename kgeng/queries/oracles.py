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

ORACLES: dict[str, str] = {
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
    SELECT predicate, primary_knowledge_source, direction, COUNT(*) AS n
    FROM (
      SELECT predicate, primary_knowledge_source, 'out' AS direction
      FROM edges WHERE subject = 'CUST:1'
      UNION ALL
      SELECT predicate, primary_knowledge_source, 'in' AS direction
      FROM edges WHERE object = 'CUST:1'
    )
    GROUP BY predicate, primary_knowledge_source, direction
    """,
    "kg_predicate_inventory": KG_PRELUDE
    + """
    SELECT predicate, COUNT(*) AS n_edges FROM edges GROUP BY predicate
    """,
    "kg_two_hop_closure": KG_PRELUDE
    + """
    , closure AS (
      SELECT 'BRND:Brand#13' AS member
      UNION ALL
      SELECT DISTINCT subject FROM edges
      WHERE predicate = 'biolink:subclass_of' AND object = 'BRND:Brand#13'
    )
    SELECT e.object AS part_id, COUNT(DISTINCT e.subject) AS n_orders
    FROM edges e JOIN closure c ON e.object = c.member
    WHERE e.predicate = 'biolink:contains'
    GROUP BY e.object
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
    "kg_reorder_audit": KG_PRELUDE
    + """
    SELECT id, category_reordered
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
}
