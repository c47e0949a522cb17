"""Driver correctness-window invariants (round-3 item #4): the first 50
queries() entries must keep every rows-only entry immediately preceded
by its oracle-exact companion, defer the approximate-only ANN variants
past the window, and still sample every pipeline family."""

import __ray_entry__ as entry


def test_window_rows_only_entries_have_adjacent_companions():
    q = list(entry.queries())
    oracles = entry.oracle_sql()
    window = q[:50]
    no_oracle = [k for k in window if k not in oracles]
    assert len(no_oracle) <= 2, f"too many rows-only entries in window: {no_oracle}"
    for k in no_oracle:
        assert k in entry._WINDOW_COMPANIONS, f"{k} has no declared companion"
        i = window.index(k)
        assert i > 0 and window[i - 1] == entry._WINDOW_COMPANIONS[k]
        assert window[i - 1] in oracles


def test_deferred_entries_outside_window_but_present():
    q = list(entry.queries())
    for k in entry._WINDOW_DEFERRED:
        assert k in q
        assert q.index(k) >= 50


def test_registry_complete_and_oracle_keys_subset():
    q = entry.queries()
    oracles = entry.oracle_sql()
    assert len(q) >= 211
    missing = set(oracles) - set(q)
    assert not missing, f"oracle_sql keys without queries(): {missing}"


def test_window_samples_every_family():
    import importlib

    q = list(entry.queries())[:50]
    for mod_name in entry._PIPELINE_MODULES:
        mod = importlib.import_module(f"datapact_ray.pipelines.{mod_name}")
        fam = set(getattr(mod, "QUERIES", {}))
        if fam:
            assert fam & set(q), f"family {mod_name} absent from the 50-entry window"
