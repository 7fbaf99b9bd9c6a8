"""VERDICT r3 tasks 1-2: the driver correctness gate checks ~50
queries()/oracle_sql() entries per round, first-N in dict order, so the
ordering must put never-driver-checked keys first and be derived from
the committed evidence files (not hand-maintained, which re-buried 35
round-2 entries in round 3).

These tests pin the invariant against the CORRECTNESS_r*.json /
BENCH_r*.json files actually committed in the repo.
"""

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_ordering", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("spark_entry_ordering", mod)
    spec.loader.exec_module(mod)
    return mod


def test_ordering_layout():
    mod = _entry()
    keys = list(mod.queries())
    cov = mod._driver_coverage()
    failed = mod._driver_failed()
    new_round = set(mod._NEW_THIS_ROUND)
    changed = set(mod._PLANS_CHANGED_THIS_ROUND)

    red = [k for k in keys if k in failed]
    replan = [k for k in keys if k not in failed and k in changed]
    rest = [k for k in keys if k not in failed and k not in changed]
    backlog = [k for k in rest if k not in cov and k not in new_round]
    fresh = [k for k in rest if k not in cov and k in new_round]
    checked = [k for k in rest if k in cov]

    # exact layout: red | plans-changed | backlog | new-this-round | green
    assert keys == red + replan + backlog + fresh + checked

    # within the checked block, oldest driver round first
    rounds = [cov[k] for k in checked]
    assert rounds == sorted(rounds)

    # within the backlog, cheapest (latest bench secs) first
    costs = mod._bench_costs()
    c = [costs.get(k, float("inf")) for k in backlog]
    assert c == sorted(c)


def test_red_driver_rows_resort_to_front():
    """ADVICE r4 (medium): a key whose only/latest driver row failed
    must re-enter the driver window immediately — given the committed
    r01-r04 files, iceberg_roundtrip (red in r04: hash_match=False) has
    to be the very first queries() entry, and must NOT count as
    covered."""
    mod = _entry()
    cov = mod._driver_coverage()
    failed = mod._driver_failed()
    assert "iceberg_roundtrip" in failed
    assert "iceberg_roundtrip" not in cov
    assert list(mod.queries())[0] == "iceberg_roundtrip"


def test_plans_changed_keys_precede_green_backlog():
    """VERDICT r4 task 2: the eight packed-adjacency keys re-enter the
    driver window right after any red rows, ahead of already-green
    keys."""
    mod = _entry()
    keys = list(mod.queries())
    failed = mod._driver_failed()
    changed = set(mod._PLANS_CHANGED_THIS_ROUND)
    n_front = len(failed - changed) + len(changed)
    assert changed <= set(keys[:n_front])


def test_row_green_semantics():
    mod = _entry()
    assert mod._row_green(
        {"rows_match": True, "schema_match": True, "hash_match": True,
         "err": None}
    )
    assert not mod._row_green(
        {"rows_match": True, "schema_match": True, "hash_match": False,
         "err": None}
    )
    assert not mod._row_green(
        {"rows_match": True, "schema_match": True, "hash_match": True,
         "err": "boom"}
    )
    # rows-only driver checks (no hash key) still count when clean
    assert mod._row_green({"rows_match": True, "err": None})
    assert not mod._row_green(None)


def test_round3_backlog_fills_the_driver_window():
    """Given the committed r01-r03 files, the 35 keys the round-3
    VERDICT lists as never-driver-checked must occupy the first 35
    positions (the driver cap is 50, so all get rows in round 4)."""
    mod = _entry()
    cov = mod._driver_coverage()
    keys = list(mod.queries())
    backlog = {k for k in keys if k not in cov and k not in set(mod._NEW_THIS_ROUND)}
    verdict_35 = {
        "all_simple_paths", "apsp_sampled", "articlerank",
        "articulation_points", "bcc", "bridges", "clustering_directed",
        "degeneracy_ordering", "densest_density", "diameter_sampled",
        "doc_tokens_bpe", "edge_boundary", "embedding_neardup",
        "fluid_communities", "has_path", "iceberg_roundtrip",
        "is_simple_path", "k_center", "kcore_size", "lcc_directed",
        "link_prediction", "lpa_by_color", "maximal_matching",
        "min_dominating_set", "min_edge_cover", "min_vertex_cover",
        "node2vec", "node_boundary", "onion_layers", "random_multi_bfs",
        "random_walks", "sampling_path", "simhash_neardup", "sssp_delta",
        "sssp_path",
    }
    # every verdict-35 key still unchecked must be in the backlog prefix
    pending = verdict_35 & backlog
    prefix = set(keys[: len(backlog)])
    assert pending <= prefix
    # and nothing checked may precede an unchecked key
    first_checked = next((i for i, k in enumerate(keys) if k in cov), len(keys))
    assert all(k not in cov for k in keys[:first_checked])


def test_queries_and_oracles_cover_same_keys():
    mod = _entry()
    q = set(mod.queries())
    o = set(mod.oracle_sql())
    # every oracle has a query; queries without oracles are the
    # documented non-SQL-expressible set only
    assert o <= q
