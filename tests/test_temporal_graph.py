"""Unit tests for the temporal joins and graph analytics operators.

Golden cases are hand-computed; the as-of/range semantics additionally
carry a naive pure-Python oracle so boundary behavior (inclusive ends,
tie handling, bin-boundary crossings) is pinned, not assumed.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from ontograph_spark.functions.graph_algo import pagerank, predicate_degrees
from ontograph_spark.functions.temporal import asof_join, range_join

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _ts(seconds: float) -> datetime:
    return T0 + timedelta(seconds=seconds)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts(100.0)),   # latest right at/below 100 is 100 (tie)
            (2, 10, _ts(99.9)),    # latest is 50
            (3, 10, _ts(49.0)),    # no prior right -> nulls
            (4, 20, _ts(1000.0)),  # other key: only its own rights count
        ],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (10, _ts(50.0), 500),
            (10, _ts(100.0), 501),
            (10, _ts(100.5), 502),  # after left ts=100 -> never matches it
            (20, _ts(999.0), 503),
        ],
        "user_id long, ts timestamp_ntz, click_id long",
    )
    out = {
        r["event_id"]: (r["click_id_right"], r["ts_right"])
        for r in asof_join(
            left, right, on="user_id", ts_col="ts", value_cols=("click_id",)
        ).collect()
    }
    assert out[1] == (501, _ts(100.0))  # inclusive: right.ts == left.ts
    assert out[2] == (500, _ts(50.0))
    assert out[3] == (None, None)       # left-outer
    assert out[4] == (503, _ts(999.0))  # key isolation


def test_asof_join_preserves_left_rows(spark):
    left = spark.createDataFrame(
        [(i, 1, _ts(float(i))) for i in range(50)],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(1, _ts(10.0), 7)], "user_id long, ts timestamp_ntz, click_id long"
    )
    out = asof_join(
        left, right, on="user_id", ts_col="ts", value_cols=("click_id",)
    )
    assert out.count() == 50
    matched = out.where(F.col("click_id_right").isNotNull()).count()
    assert matched == 40  # ts >= 10 only


def test_range_join_boundaries_and_bins(spark):
    # window = 100 s; left at 250.0 must see rights in [150.0, 250.0]
    left = spark.createDataFrame(
        [(1, 5, _ts(250.0))], "event_id long, user_id long, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [
            (5, _ts(150.0)),        # exactly window before -> inclusive
            (5, _ts(149.999999)),   # 1 us too early -> excluded
            (5, _ts(199.0)),        # previous bin (bin=1 vs left bin=2)
            (5, _ts(250.0)),        # same instant -> inclusive
            (5, _ts(250.000001)),   # after left -> excluded
            (6, _ts(200.0)),        # other key -> excluded
        ],
        "user_id long, ts timestamp_ntz",
    )
    out = range_join(
        left, right, on="user_id", ts_col="ts", window_seconds=100
    )
    got = sorted(r["ts_right"] for r in out.collect())
    assert got == [_ts(150.0), _ts(199.0), _ts(250.0)]


def test_range_join_matches_naive(spark):
    # randomized-ish (deterministic seed pattern) cross-check vs a
    # naive python double loop, exercising many bin boundaries
    lrows = [(i, i % 3, _ts((i * 37) % 500 + (i % 7) / 10)) for i in range(60)]
    rrows = [(i % 3, _ts((i * 53) % 500 + (i % 5) / 10)) for i in range(80)]
    left = spark.createDataFrame(
        lrows, "event_id long, user_id long, ts timestamp_ntz"
    )
    right = spark.createDataFrame(rrows, "user_id long, ts timestamp_ntz")
    win = 40
    out = range_join(left, right, on="user_id", ts_col="ts", window_seconds=win)
    got = sorted((r["event_id"], r["ts_right"]) for r in out.collect())
    expect = sorted(
        (eid, rts)
        for (eid, k, lts) in lrows
        for (rk, rts) in rrows
        if rk == k and rts <= lts and rts >= lts - timedelta(seconds=win)
    )
    assert got == expect


_QUADS = [
    # a -> b -> c ; d -> b ; c terminal (dangling)
    ("<a>", "<p#link>", "<b>", "<g>"),
    ("<b>", "<p#link>", "<c>", "<g>"),
    ("<d>", "<p#link>", "<b>", "<g>"),
    ("<a>", "<p#label>", '"A"', "<g>"),
    ("<a>", "<p#label>", '"A2"', "<g>"),
]


def test_predicate_degrees(spark):
    quads = spark.createDataFrame(
        _QUADS, "subj string, pred string, obj string, graph string"
    )
    got = {r["pred"]: r for r in predicate_degrees(quads).collect()}
    assert got["<p#link>"]["n_triples"] == 3
    assert got["<p#link>"]["n_subjects"] == 3  # a, b, d
    assert got["<p#link>"]["n_objects"] == 2   # b, c
    assert got["<p#label>"]["n_triples"] == 2
    assert got["<p#label>"]["n_subjects"] == 1


def test_pagerank_integer_golden(spark):
    quads = spark.createDataFrame(
        _QUADS, "subj string, pred string, obj string, graph string"
    )
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank(
            quads, edge_preds=("<p#link>",), iterations=2
        ).collect()
    }

    # hand-rolled integer twin (same floor/damping arithmetic)
    edges = [("<a>", "<b>"), ("<b>", "<c>"), ("<d>", "<b>")]
    nodes = {n for e in edges for n in e}
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    ranks = {n: 1_000_000 for n in nodes}
    base = (1_000_000 * 3) // 20
    for _ in range(2):
        inflow = {n: 0 for n in nodes}
        for s, d in edges:
            inflow[d] += int(ranks[s] // outdeg[s])
        ranks = {n: base + (inflow[n] * 17) // 20 for n in nodes}

    assert got == ranks
    # dangling c received b's full mass; sources a,d sit at base
    assert got["<a>"] == base and got["<d>"] == base
    assert got["<b>"] > base and got["<c>"] > base


def test_k_hop_reachability(spark):
    from ontograph_spark.functions.graph_algo import k_hop_reachability

    quads = spark.createDataFrame(
        _QUADS, "subj string, pred string, obj string, graph string"
    )
    sources = spark.createDataFrame([("<a>",)], ["node"])
    got = {
        r["node"]: r["hops"]
        for r in k_hop_reachability(
            quads, sources, edge_preds=("<p#link>",), k=3
        ).collect()
    }
    # a -> b (1) -> c (2); d unreachable forward from a
    assert got == {"<a>": 0, "<b>": 1, "<c>": 2}

    rev = {
        r["node"]: r["hops"]
        for r in k_hop_reachability(
            quads,
            spark.createDataFrame([("<c>",)], ["node"]),
            edge_preds=("<p#link>",),
            k=3,
            reverse=True,
        ).collect()
    }
    # c <- b (1) <- a (2), b <- d so d at hop 2 as well
    assert rev == {"<c>": 0, "<b>": 1, "<a>": 2, "<d>": 2}


def test_k_hop_respects_k_and_min_hops(spark):
    from ontograph_spark.functions.graph_algo import k_hop_reachability

    # diamond with a shortcut: s->a->b->t and s->t ; min hops for t is 1
    rows = [
        ("<s>", "<p#e>", "<a>", "<g>"),
        ("<a>", "<p#e>", "<b>", "<g>"),
        ("<b>", "<p#e>", "<t>", "<g>"),
        ("<s>", "<p#e>", "<t>", "<g>"),
    ]
    quads = spark.createDataFrame(
        rows, "subj string, pred string, obj string, graph string"
    )
    src = spark.createDataFrame([("<s>",)], ["node"])
    got = {
        r["node"]: r["hops"]
        for r in k_hop_reachability(quads, src, edge_preds=("<p#e>",), k=1).collect()
    }
    assert got == {"<s>": 0, "<a>": 1, "<t>": 1}  # k=1 stops; t via shortcut
