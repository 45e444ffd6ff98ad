from kgeng.graph.build import (  # noqa: F401
    ORDERED_CATEGORIES,
    assign_edge_ids,
    int_coerce,
    launder_quotes,
    node_class_lookup,
    predicate_class_pairs,
    reorder_categories,
    resolve_edge_classes,
    split_packed_array,
)
