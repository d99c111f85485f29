"""Filter surface: reference Filter-AST -> Catalyst Column (P3-P10).

The reference has two filter frontends:

1. The simple ``Filter`` tree (src/types.rs:176-204): ``must`` (AND) /
   ``should`` (OR) / ``must_not`` (NOT) lists over conditions
   ``Equals{field,value} | Range{field,gte,lte} | Match{field,text}``,
   plus ``Nested{path,filter}``.
2. The advanced ``FilterExpression`` AST (src/filtering.rs:39-141):
   Comparison (Eq/Ne/Gt/Gte/Lt/Lte/Like/NotLike/In/NotIn/IsNull/IsNotNull),
   Logical (And/Or/Not), Nested-field ops (Exists/Equal/Contains/
   ArrayContains/ArrayLength/ObjectHasKey), TextSearch, Geospatial.
3. A SQL WHERE parser (src/filtering.rs:764-940) — in Spark that frontend
   is literally ``df.filter(sql_text)``; nothing to build.

We accept the same JSON shapes and translate to a single boolean Column.
The reference executes filters as id-set algebra over per-field inverted
indexes (intersection/union/complement, src/filtering.rs:439-488); in Spark
the same semantics compile to AND/OR/NOT predicates that Catalyst pushes
into the parquet scan — at 100 TB the filter runs inside the scan with
row-group min/max skipping, no index tables needed.

Notably the reference *stubs* most comparison executors (only Equal and Gt
actually return rows, src/filtering.rs:403-436) — we implement the declared
semantics, not the stubs, and note the divergence here.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F


def _field(name: str) -> Column:
    """Dot-paths address nested struct/map fields, as the reference's path
    flattening does for JSON payloads (src/filtering.rs:260-333)."""
    return F.col(name)


def condition_to_column(cond: dict[str, Any]) -> Column:
    """One reference ``Condition`` (src/types.rs:190-204) -> Column."""
    kind = cond.get("type")
    field = cond.get("field")
    if kind == "equals":
        return _field(field) == F.lit(cond["value"])
    if kind == "range":
        c = F.lit(True)
        if cond.get("gte") is not None:
            c = c & (_field(field) >= F.lit(cond["gte"]))
        if cond.get("lte") is not None:
            c = c & (_field(field) <= F.lit(cond["lte"]))
        return c
    if kind == "match":
        # Full-text match on a text field: EVERY token of the query text
        # (reference tokenizer contract — functions.text.tokens) must be
        # a token of the field. The reference declares Match{field,text}
        # (ref:src/types.rs:203) but never evaluates it; the public
        # payload-filter APIs this surface mirrors (Qdrant MatchText)
        # define it as tokenized AND-match, which is also the semantics
        # the doc_terms inverted index can serve (multi-token = AND of
        # posting probes). Zero kept tokens (stopwords-only text) is a
        # vacuous AND: True. Substring containment — the pre-r10 reading
        # of match — remains available as {"type": "contains"}.
        #
        # ``fuzzy`` (the reference's declared-but-stubbed
        # TextSearchOptions.fuzzy, ref:src/filtering.rs:65-69): truthy
        # relaxes each token to "SOME field token within Levenshtein
        # distance d" (True -> d=1, an int -> that distance) — the
        # higher-order `exists` over the token array, JVM-side; the
        # index route serves the same semantics as a vocabulary
        # expansion probe.
        from ..functions.text import tokens as _tokens
        from .sparse import tokenize_query_py

        if cond.get("case_sensitive"):
            # the reference declares TextSearchOptions.case_sensitive
            # beside fuzzy (ref:src/filtering.rs:65-69, both stubbed).
            # fuzzy is honored; case sensitivity CANNOT be — the
            # tokenizer contract (F8) lowercases, and the text index
            # stores lowercased terms, so a case-sensitive match would
            # silently diverge between the predicate and posting routes.
            # Reject loudly instead of ignoring the option.
            raise ValueError(
                "match is case-insensitive by the tokenizer contract "
                "(F8 lowercases; the text index stores lowercased "
                "terms); case_sensitive=True is not supported"
            )
        toks = sorted(tokenize_query_py(str(cond["text"])))
        if not toks:
            return F.lit(True)
        col_toks = _tokens(_field(field))
        fuzzy = cond.get("fuzzy")
        if fuzzy:
            dist = 1 if fuzzy is True else int(fuzzy)

            def _near(tok):
                # closure factory, NOT a default-arg lambda: PySpark
                # reads the lambda's arity to pick the 1- vs 2-arg
                # higher-order form, and a bound default would read as 2
                return lambda x: F.levenshtein(x, F.lit(tok)) <= F.lit(dist)

            c = None
            for t in toks:
                e = F.exists(col_toks, _near(t))
                c = e if c is None else c & e
            return c
        c = F.array_contains(col_toks, toks[0])
        for t in toks[1:]:
            c = c & F.array_contains(col_toks, t)
        return c
    if kind == "contains":  # case-insensitive substring containment
        return F.lower(_field(field)).contains(str(cond["text"]).lower())
    if kind == "in":
        return _field(field).isin(list(cond["values"]))
    if kind == "like":
        return _field(field).like(cond["pattern"])
    if kind == "is_null":
        return _field(field).isNull()
    if kind == "is_not_null":
        return _field(field).isNotNull()
    if kind == "array_contains":
        return F.array_contains(_field(field), F.lit(cond["value"]))
    if kind == "array_length":  # P6 ArrayLength (declared src/filtering.rs:113)
        return F.size(_field(field)) == F.lit(int(cond["length"]))
    if kind == "object_has_key":  # P6 ObjectHasKey over MAP columns
        return F.map_contains_key(_field(field), F.lit(cond["key"]))
    if kind == "json_path":  # P6 JsonPath over a JSON string column
        return F.get_json_object(_field(field), cond["path"]) == F.lit(
            str(cond["value"])
        )
    if kind == "token_match":  # P8 word-level inverted-index semantics:
        # exact token membership after reference tokenization (not substring)
        from ..functions.text import tokens

        return F.array_contains(tokens(_field(field)), str(cond["token"]).lower())
    if kind == "exists":
        return _field(field).isNotNull()
    if kind == "comparison":
        op = cond["op"]
        val = F.lit(cond["value"])
        col = _field(field)
        return {
            "eq": col == val, "ne": col != val,
            "gt": col > val, "gte": col >= val,
            "lt": col < val, "lte": col <= val,
        }[op]
    raise ValueError(f"unsupported condition: {cond!r}")


def filter_to_column(flt: dict[str, Any]) -> Column:
    """Reference ``Filter`` tree -> one boolean Column.

    Semantics (src/embedded.rs:539-582, src/filtering.rs:439-488):
    must = AND of children; should = OR of children; must_not = AND of
    negations; the three groups AND together.
    """
    parts: list[Column] = []
    for c in flt.get("must", []) or []:
        parts.append(_node(c))
    should = [_node(c) for c in (flt.get("should", []) or [])]
    if should:
        acc = should[0]
        for s in should[1:]:
            acc = acc | s
        parts.append(acc)
    for c in flt.get("must_not", []) or []:
        parts.append(~_node(c))
    if not parts:
        return F.lit(True)
    acc = parts[0]
    for p in parts[1:]:
        acc = acc & p
    return acc


def simple_equality(flt: dict[str, Any]) -> tuple[str, Any] | None:
    """(field, value) when the filter tree is EXACTLY one must-equality —
    the shape a partition-pruned storage layout can serve as a directory
    skip — else None. Structural inspection only (zero Spark work): any
    should/must_not group, nested tree, or second condition disqualifies."""
    if not isinstance(flt, dict):
        return None
    if flt.get("should") or flt.get("must_not"):
        return None
    must = flt.get("must") or []
    if len(must) != 1 or any(k not in ("must",) for k in flt if flt.get(k)):
        return None
    node = must[0]
    if not isinstance(node, dict) or node.get("type") != "equals":
        return None
    if any(k in node for k in ("must", "should", "must_not")):
        return None
    field, value = node.get("field"), node.get("value")
    if field is None or value is None:
        return None
    return str(field), value


def conjunctive_equalities(
    flt: dict[str, Any],
) -> list[tuple[str, Any]] | None:
    """The (field, value) pairs when the filter tree is a PURE AND of
    top-level must-equalities — else None. The must-only, equals-only
    special case of :func:`payload_probe_tree` (and a superset of
    :func:`simple_equality`, the len-1 case a partitioned STORAGE layout
    can additionally serve as a directory skip)."""
    tree = payload_probe_tree(flt)
    if tree is None or tree["should"] or tree["must_not"]:
        return None
    if any(kind != "equals" for _f, _v, kind in tree["must"]):
        return None
    return [(f, v) for f, v, _k in tree["must"]]


def payload_probe_tree(
    flt: dict[str, Any],
) -> dict[str, list[tuple[str, Any, str]]] | None:
    """Filter tree normalized to posting-probe groups —
    ``{"must": [(field, value, kind)...], "should": [...],
    "must_not": [...]}`` — when EVERY leaf is an ``equals``,
    ``array_contains``, ``range``, ``in``, ``exists``, or ``match``
    condition, else None. A range leaf carries ``value =
    {"gte":..., "lte":...}`` (at least one bound set); an in leaf the
    value tuple; an exists leaf True. Reference semantics
    (src/embedded.rs:539-582): must = AND, should = OR, must_not = AND
    of negations, groups AND together. The posting algebra: must
    intersects id lists, should unions them, and a must_not leaf is
    itself an id list (field present AND NOT(pred)) that intersects —
    which reproduces the predicate path's null handling exactly for
    SCALAR fields (NOT(col = v) is null-rejecting). must_not over ARRAY
    fields is NOT servable (an empty array passes NOT contains but posts
    nothing) — the caller must reject those against the index sidecar,
    same as whole-array equality. Range servability (numeric source
    type, value_num-backed index) is likewise the caller's sidecar
    check — this normalizer is purely structural.

    NESTED sub-trees recurse (the reference Filter type is recursive,
    ref:src/types.rs:176-204): a node that is itself a
    must/should/must_not dict normalizes to the probe triple
    ``("", <subtree groups>, "tree")`` in its parent group. The id-set
    algebra is CLOSED under composition — intersection/union/
    complement evaluate bottom-up — and negation of a sub-tree pushes
    to its leaves by De Morgan, which is exact in Kleene three-valued
    logic (NOT of a leaf is the leaf's null-rejecting complement, the
    same rule one-level must_not always used), so the recursive route
    returns exactly the predicate path's TRUE-set."""
    if not isinstance(flt, dict):
        return None
    groups: dict[str, list[tuple[str, Any, str]]] = {}
    for g in ("must", "should", "must_not"):
        out: list[tuple[str, Any, str]] = []
        for node in flt.get(g) or []:
            if not isinstance(node, dict):
                return None
            if any(k in node for k in ("must", "should", "must_not")):
                sub = payload_probe_tree(node)
                if sub is None:
                    return None
                out.append(("", sub, "tree"))
                continue
            kind = node.get("type")
            if kind not in (
                "equals", "array_contains", "range", "in", "exists",
                "match",
            ):
                return None
            field = node.get("field")
            if field is None:
                return None
            if kind == "match":
                # full-text leaf: value = the raw query text; the caller
                # validates servability (text index present, field is the
                # indexed text column, tokens non-empty; negation serves
                # as the id-column complement) and owns tokenization.
                # ``fuzzy`` (truthy) normalizes to the distinct
                # ``match_fuzzy`` kind carrying (text, distance) —
                # True -> 1
                text = node.get("text")
                if not isinstance(text, str) or not text:
                    return None
                if node.get("case_sensitive"):
                    # unservable AND unsupported: fall back so the
                    # predicate path raises its explicit error
                    return None
                fuzzy = node.get("fuzzy")
                if fuzzy:
                    dist = 1 if fuzzy is True else int(fuzzy)
                    out.append((str(field), (text, dist), "match_fuzzy"))
                    continue
                out.append((str(field), text, kind))
                continue
            if kind == "range":
                gte, lte = node.get("gte"), node.get("lte")
                if gte is None and lte is None:
                    return None
                out.append((str(field), {"gte": gte, "lte": lte}, kind))
                continue
            if kind == "in":
                values = node.get("values")
                if not values or any(v is None for v in values):
                    return None
                out.append((str(field), tuple(values), kind))
                continue
            if kind == "exists":
                # field-present: exactly "has a posting row" for scalar
                # fields; negation (absent) needs the corpus complement,
                # which postings cannot provide — caller rejects must_not
                out.append((str(field), True, kind))
                continue
            value = node.get("value")
            if value is None:
                return None
            out.append((str(field), value, kind))
        groups[g] = out
    if any(k not in ("must", "should", "must_not") for k in flt if flt.get(k)):
        return None
    if not (groups["must"] or groups["should"] or groups["must_not"]):
        return None
    return groups


def _node(node: dict[str, Any]) -> Column:
    """A node is either a nested Filter ({must/should/must_not}) or a
    Condition ({type: ...})."""
    if any(k in node for k in ("must", "should", "must_not")):
        return filter_to_column(node)
    if node.get("type") == "nested":
        # Nested{path, filter}: prefix child fields with the path.
        path = node["path"]
        inner = _prefix_fields(node["filter"], path)
        return filter_to_column(inner)
    return condition_to_column(node)


def _prefix_fields(flt: dict[str, Any], path: str) -> dict[str, Any]:
    def fix(n: dict[str, Any]) -> dict[str, Any]:
        n = dict(n)
        if "field" in n:
            n["field"] = f"{path}.{n['field']}"
        for key in ("must", "should", "must_not"):
            if n.get(key):
                n[key] = [fix(c) for c in n[key]]
        if n.get("type") == "nested":
            n["path"] = f"{path}.{n['path']}"
        return n

    return fix(flt)
