"""Registry/driver-contract invariants: cheap guards against the
mistakes that would silently waste driver correctness-check slots."""

import __spark_entry__ as entry
from distributed_deep_learning_with_apache_spark_spark.registry import (
    _DRIVER_PRIORITY,
    load_all,
)

REG = load_all()


def test_priority_names_all_exist():
    missing = [n for n in _DRIVER_PRIORITY if n not in REG]
    assert not missing, f"_DRIVER_PRIORITY references unknown queries: {missing}"


def test_priority_has_no_duplicates():
    assert len(_DRIVER_PRIORITY) == len(set(_DRIVER_PRIORITY))


def test_queries_order_starts_with_priority():
    names = list(REG)
    assert names[: len(_DRIVER_PRIORITY)] == [n for n in _DRIVER_PRIORITY if n in REG]


def test_oracle_sql_covers_exactly_the_oracle_bearing_queries():
    osql = entry.oracle_sql()
    expected = {n for n, q in REG.items() if q.oracle is not None}
    assert set(osql) == expected


def test_every_query_callable_has_doc():
    undocumented = [n for n, q in REG.items() if not (q.doc or "").strip()]
    assert not undocumented, undocumented


def test_every_scale_tagged_query_measured_in_scale_md():
    """SCALE.md claims every `scale`-tagged query carries a measured 10x
    ratio (or an explicit mechanism note). Pin it so a future scale-tagged
    operator cannot land without its measurement."""
    import os

    from distributed_deep_learning_with_apache_spark_spark.registry import load_all

    text = open(
        os.path.join(os.path.dirname(__file__), "..", "SCALE.md")
    ).read()
    missing = [
        n
        for n, e in load_all().items()
        if "scale" in getattr(e, "tags", ()) and n not in text
    ]
    assert missing == [], f"scale-tagged but unmeasured in SCALE.md: {missing}"
