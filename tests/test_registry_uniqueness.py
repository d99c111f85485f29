"""Source-level registry integrity: no duplicate keys in queries() /
oracle_sql() literals, and every query has an oracle (or a documented
rows-only waiver).

Why AST and not runtime: Python dict literals silently keep the LAST
occurrence of a repeated key, so a collision shrinks the registry with
no error anywhere — exactly the round-6 `event_funnel` shadowing bug.
Parsing the source is the only place the duplicate is still visible.
"""

import ast
import os

ENTRY = os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")

# Queries intentionally registered without a DuckDB oracle (non-SQL-
# expressible semantics). Keep this list tiny and justified.
ROWS_ONLY_ALLOWED: set = set()


def _dict_keys_in_function(tree, func_name):
    """All string keys of every dict literal that appears inside
    `def func_name(...)` (returns or assignments feeding the return)."""
    keys = []
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == func_name:
            for sub in ast.walk(node):
                if isinstance(sub, ast.Dict):
                    for k in sub.keys:
                        if isinstance(k, ast.Constant) and isinstance(
                            k.value, str
                        ):
                            keys.append(k.value)
            return keys
    raise AssertionError(f"function {func_name} not found in entry module")


def _load_tree():
    with open(ENTRY, "r", encoding="utf-8") as fh:
        return ast.parse(fh.read())


def test_no_duplicate_registry_keys():
    tree = _load_tree()
    for func in ("queries", "oracle_sql"):
        keys = _dict_keys_in_function(tree, func)
        dupes = sorted({k for k in keys if keys.count(k) > 1})
        assert not dupes, (
            f"duplicate keys in {func}() dict literal silently drop "
            f"queries: {dupes}"
        )


def test_every_query_has_an_oracle():
    tree = _load_tree()
    q = set(_dict_keys_in_function(tree, "queries"))
    o = set(_dict_keys_in_function(tree, "oracle_sql"))
    missing = sorted(q - o - ROWS_ONLY_ALLOWED)
    assert not missing, f"queries lacking a DuckDB oracle: {missing}"
    orphans = sorted(o - q)
    assert not orphans, f"oracles for unregistered queries: {orphans}"


def test_runtime_registry_matches_source():
    """The executed dicts must hold exactly the keys the source lists —
    catches any future non-literal registration drift."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("_entry_uniq", ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    tree = _load_tree()
    src_q = set(_dict_keys_in_function(tree, "queries"))
    rt_q = set(mod.queries().keys())
    assert rt_q == src_q, (
        f"runtime queries() diverges from source literal: "
        f"only-runtime={sorted(rt_q - src_q)} "
        f"only-source={sorted(src_q - rt_q)}"
    )
    src_o = set(_dict_keys_in_function(tree, "oracle_sql"))
    rt_o = set(mod.oracle_sql().keys())
    assert rt_o == src_o


def test_parity_demos_are_registered_queries():
    """PARITY_DEMOS must name real registry entries — a typo would
    silently re-admit a demo to the bench headline (or exclude nothing)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("_entry_pd", ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    demos = set(mod.PARITY_DEMOS)
    assert demos, "expected at least the 16-bit image/audio miners"
    assert demos <= set(mod.queries()), demos - set(mod.queries())
