"""Property-based pin for the property-path compiler.

For random small edge sets and random path expressions (link, inverse,
sequence, alternation, +, *, ?), the compiled DataFrame result must equal
a naive Python evaluator implementing SPARQL 1.1 §9.3 path semantics
(pairs as SETS — path results are distinct; zero-length paths match every
graph term with itself). Exercises both the general pair-relation
compilation and the seeded closure fast path (constant subject)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ontograph_spark.query.sparql import _Parser, _compile_group

NODES = ["<u:a>", "<u:b>", "<u:c>", "<u:d>"]
PREDS = ["<u:p>", "<u:q>"]

edges_st = st.lists(
    st.tuples(
        st.sampled_from(NODES), st.sampled_from(PREDS), st.sampled_from(NODES)
    ),
    min_size=0,
    max_size=10,
    unique=True,
)

# path expression AST for generation: mirrors the compiler's node kinds.
# "nps" is the negated property set !(fwd…|^rev…) — forward members
# negate the forward edge relation, inverse members the inverted one
# (SPARQL 1.1 §9.1); at least one member in total.
link_st = st.sampled_from(PREDS).map(lambda p: ("link", p))
nps_st = st.tuples(
    st.lists(st.sampled_from(PREDS), unique=True, max_size=2),
    st.lists(st.sampled_from(PREDS), unique=True, max_size=2),
).filter(lambda fr: fr[0] or fr[1]).map(lambda fr: ("nps", fr[0], fr[1]))
path_st = st.recursive(
    st.one_of(link_st, nps_st),
    lambda inner: st.one_of(
        inner.map(lambda n: ("inv", n)),
        st.tuples(inner, inner).map(lambda ab: ("seq", list(ab))),
        st.tuples(inner, inner).map(lambda ab: ("alt", list(ab))),
        inner.map(lambda n: ("plus", n)),
        inner.map(lambda n: ("star", n)),
        inner.map(lambda n: ("zeroone", n)),
    ),
    max_leaves=4,
)


def path_to_text(node) -> str:
    kind = node[0]
    if kind == "link":
        return node[1]
    if kind == "nps":
        members = list(node[1]) + [f"^{p}" for p in node[2]]
        return "!(" + "|".join(members) + ")"
    if kind == "inv":
        return f"^({path_to_text(node[1])})"
    if kind == "seq":
        return "(" + "/".join(path_to_text(c) for c in node[1]) + ")"
    if kind == "alt":
        return "(" + "|".join(path_to_text(c) for c in node[1]) + ")"
    return f"({path_to_text(node[1])}){ {'plus': '+', 'star': '*', 'zeroone': '?'}[kind] }"


def naive_pairs(triples, node) -> set[tuple[str, str]]:
    """SPARQL 1.1 §9.3 path evaluation over a triple set, as pair sets."""
    kind = node[0]
    if kind == "link":
        return {(s, o) for s, p, o in triples if p == node[1]}
    if kind == "nps":
        fwd, rev = set(node[1]), set(node[2])
        out = set()
        if node[1]:
            out |= {(s, o) for s, p, o in triples if p not in fwd}
        if node[2]:
            out |= {(o, s) for s, p, o in triples if p not in rev}
        return out
    if kind == "inv":
        return {(o, s) for s, o in naive_pairs(triples, node[1])}
    if kind == "seq":
        cur = naive_pairs(triples, node[1][0])
        for child in node[1][1:]:
            nxt = naive_pairs(triples, child)
            cur = {(a, d) for a, b in cur for c, d in nxt if b == c}
        return cur
    if kind == "alt":
        out: set = set()
        for child in node[1]:
            out |= naive_pairs(triples, child)
        return out
    if kind in ("plus", "star"):
        base = naive_pairs(triples, node[1])
        closure = set(base)
        while True:
            step = {
                (a, d) for a, b in closure for c, d in base if b == c
            } - closure
            if not step:
                break
            closure |= step
        if kind == "star":
            closure |= {(n, n) for n in graph_terms(triples)}
        return closure
    if kind == "zeroone":
        return naive_pairs(triples, node[1]) | {
            (n, n) for n in graph_terms(triples)
        }
    raise AssertionError(node)


def graph_terms(triples) -> set[str]:
    return {s for s, _, _ in triples} | {o for _, _, o in triples}


def _quads(spark, triples):
    rows = [(s, p, o, "u:g") for s, p, o in triples]
    quads = spark.createDataFrame(
        rows or [("<u:none>", "<u:none>", "<u:none>", "u:none")],
        "subj string, pred string, obj string, graph string",
    )
    if not rows:
        quads = quads.where("graph = 'u:g'")
    return quads


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(triples=edges_st, path=path_st)
def test_path_pairs_match_naive_evaluation(spark, triples, path):
    q = _Parser(
        f"SELECT * WHERE {{ ?x {path_to_text(path)} ?y }}"
    ).parse_query()
    df = _compile_group(_quads(spark, triples), q.group)
    got = {(r["x"], r["y"]) for r in df.collect()}
    assert got == naive_pairs(triples, path)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    triples=edges_st,
    pred=st.sampled_from(PREDS),
    src=st.sampled_from(NODES),
    mod=st.sampled_from(["+", "*"]),
)
def test_seeded_closure_matches_naive(spark, triples, pred, src, mod):
    """Constant-subject closure (the seeded BFS fast path) must agree
    with the full-closure semantics restricted to that subject."""
    q = _Parser(
        f"SELECT * WHERE {{ {src} {pred}{mod} ?y }}"
    ).parse_query()
    df = _compile_group(_quads(spark, triples), q.group)
    got = {r["y"] for r in df.collect()}
    node = ("plus" if mod == "+" else "star", ("link", pred))
    want = {o for s, o in naive_pairs(triples, node) if s == src}
    if mod == "*":
        # a constant subject matches itself on the zero-length path even
        # when absent from the graph (SPARQL §9.3 zero-length semantics)
        want |= {src}
    assert got == want
