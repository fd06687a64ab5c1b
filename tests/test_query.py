"""Query builder semantics: the keep/exclude truth table (reference
``primitives.py:186-215``), must_tags, empty-value-list wildcards, id
sets, tag projection, composition, and validators — SURVEY.md §7 phase 2
says encode the truth table as tests first."""

from __future__ import annotations

import pytest

from osmdatapy_spark.query import Query


@pytest.fixture(scope="module")
def elements(spark):
    rows = [
        # osmid, osmtype, tags
        (1, 0, {"amenity": "cafe"}),
        (2, 0, {"amenity": "bar", "name": "x"}),
        (3, 0, {"shop": "bakery"}),
        (4, 0, {}),
        (10, 1, {"highway": "primary"}),
        (11, 1, {"highway": "service", "access": "private"}),
        (12, 1, {"building": "yes"}),
        (20, 2, {"type": "multipolygon"}),
        (21, 2, {"type": "route"}),
    ]
    return spark.createDataFrame(rows, "osmid long, osmtype int, tags map<string,string>")


def ids(df):
    return sorted(r["osmid"] for r in df.collect())


def test_kind_selection(elements):
    assert ids(Query(nodes=True).apply(elements)) == [1, 2, 3, 4]
    assert ids(Query(ways=True, relations=True).apply(elements)) == [10, 11, 12, 20, 21]
    assert ids(Query().apply(elements)) == []  # no kind selected


def test_keep_value_list(elements):
    q = Query(nodes=True, keep={"amenity": ["cafe"]})
    assert ids(q.apply(elements)) == [1]


def test_keep_empty_list_means_any_value(elements):
    q = Query(nodes=True, keep={"amenity": []})
    assert ids(q.apply(elements)) == [1, 2]


def test_keep_first_true_excludes_win(elements):
    # keep highway=* but exclude access=private: keep ∧ ¬exclude
    q = Query(ways=True, keep={"highway": []}, exclude={"access": ["private"]})
    assert ids(q.apply(elements)) == [10]


def test_keep_first_false_keeps_win(elements):
    # exclude access=private unless highway=primary: ¬exclude ∨ keep
    q = Query(
        ways=True,
        keep={"highway": ["primary"]},
        exclude={"access": []},
        keep_first=False,
    )
    assert ids(q.apply(elements)) == [10, 12]


def test_must_tags(elements):
    q = Query(nodes=True, ways=True, must_tags=["amenity", "building"])
    assert ids(q.apply(elements)) == [1, 2, 12]


def test_no_tag_predicates_keeps_all(elements):
    # divergence from the reference's broken no_tagval path (SURVEY §2.12)
    assert ids(Query(nodes=True, ways=True, relations=True).apply(elements)) == [
        1, 2, 3, 4, 10, 11, 12, 20, 21,
    ]


def test_id_sets(elements):
    q = Query(nodes=True, ways=True, node_ids=[1, 3], way_ids=[11])
    assert ids(q.apply(elements)) == [1, 3, 11]


def test_relation_type(elements):
    q = Query(relations=True, relation_type=["route"])
    assert ids(q.apply(elements)) == [21]


def test_tag_projection_list(elements):
    q = Query(nodes=True, keep={"amenity": []}, tags=["name"])
    rows = {r["osmid"]: r["tags"] for r in q.apply(elements).collect()}
    assert rows[1] == {} and rows[2] == {"name": "x"}


def test_tag_projection_false(elements):
    q = Query(nodes=True, tags=False)
    assert all(r["tags"] == {} for r in q.apply(elements).collect())


def test_defaults_highways(elements, spark):
    q = Query("highways")
    assert q.ways and not q.nodes
    assert ids(q.apply(elements)) == [10, 11]
    # excluded values (reference HIGHWAYS vocabulary: highway=abandoned /
    # bus_stop, service=spur, area=yes, type=multipolygon) are dropped
    extra = spark.createDataFrame(
        [
            (13, 1, {"highway": "abandoned"}),
            (14, 1, {"highway": "primary", "area": "yes"}),
            (15, 1, {"highway": "bus_stop"}),
            (16, 1, {"highway": "primary", "service": "spur"}),
            (17, 1, {"highway": "primary", "type": "multipolygon"}),
            (18, 1, {"highway": "primary", "service": "driveway"}),  # kept
        ],
        "osmid long, osmtype int, tags map<string,string>",
    )
    assert ids(q.apply(elements.unionByName(extra))) == [10, 11, 18]


def test_append_and_copy():
    q = Query(ways=True, keep={"highway": ["primary"]}, tags=["name"])
    q2 = q.copy()
    q2.append_keep({"highway": ["secondary"], "railway": []})
    q2.append_tags(["ref"])
    q2.append_relation_type(["route"])
    assert q.keep == {"highway": ["primary"]}  # original untouched
    assert q2.keep == {"highway": ["primary", "secondary"], "railway": []}
    assert q2.tags == ["name", "ref"]
    assert q2.relation_type == ["route"]
    # empty list ('any value') wins on merge
    q2.append_keep({"highway": []})
    assert q2.keep["highway"] == []


def test_empty_filter_dict_is_noop(elements):
    # keep={} / exclude={} must behave like "no filter", not crash compile()
    q = Query(ways=True, keep={}, exclude={}, tags=False)
    got = {r.osmid for r in elements.filter(q.compile()).collect()}
    base = {r.osmid for r in elements.filter(Query(ways=True, tags=False).compile()).collect()}
    assert got == base


def test_validators():
    with pytest.raises(ValueError):
        Query(ways=True, exclude={"access": []})  # keep_first without keep
    with pytest.raises(ValueError):
        Query(ways=True, keep={"x": []}, keep_first=False)  # no exclude
    with pytest.raises(ValueError):
        Query(topology=True)  # topology requires ways+geometry
    with pytest.raises(ValueError):
        Query("no_such_default")


def test_parse_filter_osmium_syntax(spark):
    """Osmium tags-filter strings compile to the same Query semantics as
    the kwargs constructor."""
    from osmdatapy_spark.query import Query, parse_filter

    q = parse_filter("w/highway=primary,secondary nwr/amenity")
    assert (q.nodes, q.ways, q.relations) == (True, True, True)
    assert q.keep == {"highway": ["primary", "secondary"], "amenity": []}

    # kind-only terms, bare keys, repeated-key union, any-value absorption
    q2 = parse_filter("n w/building=yes w/building=no")
    assert (q2.nodes, q2.ways, q2.relations) == (True, True, False)
    assert q2.keep == {"building": ["yes", "no"]}
    q3 = parse_filter("w/highway w/highway=primary")
    assert q3.keep == {"highway": []}  # any-value absorbs the narrower term

    # kwargs pass through
    q4 = parse_filter("w/highway", geometry=True)
    assert q4.geometry and q4.ways and not q4.nodes

    import pytest

    for bad in ("", "x/highway", "w/=primary"):
        with pytest.raises(ValueError):
            parse_filter(bad)
    # trailing slash degrades to kind-only selection (lenient, like a
    # condition-less osmium term)
    assert parse_filter("w/").ways and parse_filter("w/").keep is None

    # end-to-end: string face == kwargs face on real rows
    from osmdatapy_spark.suite.osm import derived_way_elements

    els = derived_way_elements(spark, "/root/testdata/sf0.001")
    a = sorted(r["osmid"] for r in parse_filter("w/highway=primary").apply(els).collect())
    b = sorted(
        r["osmid"]
        for r in Query(ways=True, keep={"highway": ["primary"]}).apply(els).collect()
    )
    assert a == b and len(a) > 0
