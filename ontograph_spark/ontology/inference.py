"""RDFS/OWL forward-chaining entailment over the quad table.

The reference stores ontologies but leaves entailment to the endpoint
(Blazegraph ships RDFS+ inference; the Go client never materializes
closures itself — blazegraph_store.go only issues pattern queries). A
Spark deployment has no reasoner underneath, so this module IS the
reasoner: it materializes the RDFS closure (plus the cheap OWL property
rules the reference's own ontology surface exposes — inverseOf,
SymmetricProperty, TransitiveProperty, ontology/resources.py) as
distributed DataFrame algebra, the standard "forward chaining as
iterated hash joins" construction.

Rule set (ρdf fragment of RDFS + OWL property rules):

* ``rdfs5``  subPropertyOf transitivity      (schema closure)
* ``rdfs7``  property inheritance            (data × sp-closure join)
* ``owl inverseOf``  (a p b) ⇒ (b q a), both directions
* ``owl SymmetricProperty``  (a p b) ⇒ (b p a)
* ``owl TransitiveProperty`` per-predicate edge closure
* ``rdfs2/3`` domain/range typing            (data × schema join)
* ``rdfs11`` subClassOf transitivity         (schema closure)
* ``rdfs9``  type inheritance                (types × sc-closure join)

Deviations (documented, deterministic): the range rule types only
*resource* objects (typing a literal node is formally allowed by RDFS
but produces literal-subject triples no store here accepts — the
reference rejects them too, triple.go's term model); the rdf:type
predicate itself does not participate in subPropertyOf inheritance
(standard ρdf restriction); axiomatic triples (rdf:type rdf:Property
etc.) are not emitted.

Evaluation order is stratified: the edge-level rules (rdfs7, inverseOf,
symmetric, transitive step) run to a **joint fixpoint** first — one
loop whose round applies all four rules to the current edge set, so
their interactions (the flip of an inherited edge, the closure of a
flipped edge, …) are fully chased — then domain/range typing, then
class inheritance. Because domain/range emit only ``rdf:type`` triples
and rdf:type is excluded from property inheritance, the later strata
never feed stratum 1, so the stratified pass computes the exact
fixpoint.

100 TB shape: schema relations (subPropertyOf / subClassOf / domain /
range / inverseOf and the property-characteristic type triples) are
vocabulary-sized — thousands of rows against billions of data triples —
so every rule is one **broadcast** hash join against the data scan, no
shuffle of the big side; the two schema transitive closures iterate on
the tiny side only. The one data-sized iteration is the OWL transitive
property closure, the same frontier expansion as
functions/graph_algo.py:k_hop_reachability (hash equi-join + anti-join
per round, ``localCheckpoint`` truncating lineage, O(longest chain)
rounds over only the transitive predicates' edges). The final closure
is a union of per-rule plans deduplicated by one distinct — a single
shuffle at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ontograph_spark import vocab

_TYPE = f"<{vocab.RDF_TYPE}>"
_SUB_PROP = f"<{vocab.RDFS_SUB_PROPERTY_OF}>"
_SUB_CLASS = f"<{vocab.RDFS_SUB_CLASS_OF}>"
_DOMAIN = f"<{vocab.RDFS_DOMAIN}>"
_RANGE = f"<{vocab.RDFS_RANGE}>"
_INVERSE = f"<{vocab.OWL_INVERSE_OF}>"
_SYMMETRIC = f"<{vocab.OWL_SYMMETRIC_PROPERTY}>"
_TRANSITIVE = f"<{vocab.OWL_TRANSITIVE_PROPERTY}>"

_SCHEMA_PREDS = (_SUB_PROP, _SUB_CLASS, _DOMAIN, _RANGE, _INVERSE)


#: schema relations bigger than this fall back to the distributed loop
SCHEMA_DRIVER_LIMIT = 200_000


def transitive_closure(pairs: DataFrame, *, max_rounds: int = 20) -> DataFrame:
    """Irreflexive transitive closure of a ``(sub, sup)`` relation.

    Schema relations are vocabulary-sized, so the default path pulls
    them to the driver (bounded ``take``), closes them in Python and
    ships the result back — one job instead of one job *per round*,
    the same bounded-small-graph pattern as pipeline/canon.py. A
    relation larger than :data:`SCHEMA_DRIVER_LIMIT` (not actually a
    vocabulary) uses the distributed frontier loop instead: one hash
    join + anti-join per round, ``localCheckpoint`` truncating
    lineage."""
    base = pairs.select("sub", "sup").distinct()
    head = base.take(SCHEMA_DRIVER_LIMIT + 1)
    if len(head) <= SCHEMA_DRIVER_LIMIT:
        out: set[tuple[str, str]] = set()
        succ: dict[str, set[str]] = {}
        for r in head:
            succ.setdefault(r.sub, set()).add(r.sup)
        for src in succ:
            seen: set[str] = set()
            stack = list(succ[src])
            while stack:
                n = stack.pop()
                if n in seen:
                    continue
                seen.add(n)
                stack.extend(succ.get(n, ()))
            out.update((src, t) for t in seen if t != src)
        spark = pairs.sparkSession
        if not out:
            return spark.createDataFrame([], "sub string, sup string")
        return spark.createDataFrame(sorted(out), "sub string, sup string")
    known = base.localCheckpoint(eager=True)
    frontier = known
    step = known.select(
        F.col("sub").alias("_s"), F.col("sup").alias("_o")
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        nxt = (
            frontier.join(step, frontier["sup"] == step["_s"])
            .select("sub", F.col("_o").alias("sup"))
            .where(F.col("sub") != F.col("sup"))  # drop cycles' self-pairs
            .distinct()
            .join(known, ["sub", "sup"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if not nxt.take(1):
            return known
        known = known.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    # The loop exhausted max_rounds with a non-empty frontier: returning
    # `known` here would be a silently truncated closure — the worst
    # failure mode. Fail loudly instead; callers with genuinely deeper
    # chains raise max_rounds.
    raise RuntimeError(
        f"transitive_closure did not converge within max_rounds={max_rounds}"
        " (non-empty frontier at loop exit); raise max_rounds for chains"
        f" deeper than ~{max_rounds + 1} over relations larger than"
        f" SCHEMA_DRIVER_LIMIT={SCHEMA_DRIVER_LIMIT}"
    )


def _edge_rules_fixpoint(
    data: DataFrame,
    *,
    sp: DataFrame,
    inv_both: DataFrame,
    sym: DataFrame,
    trans_preds: DataFrame,
    max_rounds: int,
    seed_known: DataFrame | None = None,
) -> DataFrame:
    """Joint fixpoint of the edge-level rules over ``(subj, pred, obj)``,
    evaluated **semi-naively**: after the first round, each rule fires
    only on the previous round's *new* triples (the frontier), not the
    whole accumulated set — the linear rules (inverse flip, symmetric
    mirror, subPropertyOf inheritance via the already-transitive ``sp``
    closure) are complete on the frontier alone, and the bilinear
    transitive step runs frontier⋈known ∪ known⋈frontier. Frontiers
    shrink geometrically, so late rounds are near-free. All schema
    sides are broadcast; the transitive step is the only data-sized
    join, and it only touches the transitive predicates' edges."""

    def tr_of(df: DataFrame) -> DataFrame:
        return df.join(broadcast(trans_preds), df["pred"] == F.col("p")).select(
            "subj", "pred", "obj"
        )

    # The three LINEAR rules (inverse flip, symmetric mirror,
    # subPropertyOf inheritance) all have the shape "edge with pred p
    # derives an edge with pred q, optionally swapping subj/obj" —
    # fused into ONE vocabulary-sized broadcast relation (p, q, swap)
    # so each round runs one linear-rule join instead of three
    # (narrower plan, one scan of the frontier for all three families).
    lin_rules = (
        inv_both.select("p", "q", F.lit(True).alias("swap"))
        .unionByName(
            sym.select("p", F.col("p").alias("q"), F.lit(True).alias("swap"))
        )
        .unionByName(
            sp.select(
                F.col("sub").alias("p"),
                F.col("sup").alias("q"),
                F.lit(False).alias("swap"),
            )
        )
    )

    def derive(frontier: DataFrame, tr_known: DataFrame) -> DataFrame:
        linear = frontier.join(
            broadcast(lin_rules), frontier["pred"] == lin_rules["p"]
        ).select(
            F.when(F.col("swap"), F.col("obj"))
            .otherwise(F.col("subj"))
            .alias("subj"),
            F.col("q").alias("pred"),
            F.when(F.col("swap"), F.col("subj"))
            .otherwise(F.col("obj"))
            .alias("obj"),
        )
        tr_f = tr_of(frontier)
        known_step = tr_known.select(
            F.col("pred").alias("_p"),
            F.col("subj").alias("_s"),
            F.col("obj").alias("_o"),
        )
        fwd = (
            tr_f.join(
                known_step,
                (tr_f["pred"] == known_step["_p"])
                & (tr_f["obj"] == known_step["_s"]),
            )
            .select("subj", "pred", F.col("_o").alias("obj"))
        )
        f_step = tr_f.select(
            F.col("pred").alias("_p"),
            F.col("subj").alias("_s"),
            F.col("obj").alias("_o"),
        )
        bwd = (
            tr_known.join(
                f_step,
                (tr_known["pred"] == f_step["_p"])
                & (tr_known["obj"] == f_step["_s"]),
            )
            .select("subj", "pred", F.col("_o").alias("obj"))
        )
        chained = fwd.unionByName(bwd).where(F.col("subj") != F.col("obj"))
        return _dedup([linear, chained])

    if seed_known is not None:
        # incremental mode: the seed is already closed under the rules,
        # so the first round only fires on the delta (data)
        frontier = (
            data.distinct()
            .join(seed_known, ["subj", "pred", "obj"], "left_anti")
            .localCheckpoint(eager=True)
        )
        known = seed_known.unionByName(frontier).localCheckpoint(eager=True)
    else:
        known = data.distinct().localCheckpoint(eager=True)
        frontier = known
    for _ in range(max_rounds):
        new = (
            derive(frontier, tr_of(known))
            .join(known, ["subj", "pred", "obj"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if not new.take(1):
            break
        # plain union, NOT another checkpoint: both operands are already
        # materialized, so the union's lineage is one shallow node per
        # round — re-checkpointing it would rewrite the whole
        # accumulated set every round (O(total) extra I/O per round,
        # measured ~25% of closure wall at sf0.1)
        known = known.unionByName(new)
        frontier = new
    return known


def rdfs_closure(
    quads: DataFrame,
    *,
    owl_rules: bool = True,
    max_rounds: int = 20,
) -> DataFrame:
    """Materialize the RDFS(+OWL-property) closure of ``quads``.

    Returns ``(subj, pred, obj)`` distinct — the input triples plus
    everything the rule set above entails. Use :func:`rdfs_inferred`
    for the delta only. ``owl_rules=False`` restricts to pure RDFS
    (subPropertyOf/subClassOf/domain/range).

    The input is materialized once (``localCheckpoint``) before the
    rules run: every rule family scans it at least once, and for a
    *derived* quad DataFrame (the common case — the closure runs right
    after construction) re-deriving per scan would dominate the
    closure. For a parquet-backed input this trades one write for
    ~8 pushdown scans — still the right call at closure time."""
    t = quads.select("subj", "pred", "obj").localCheckpoint(eager=True)

    # --- schema relations (vocabulary-sized; broadcast everywhere) ----
    def rel(p: str) -> DataFrame:
        return t.where(F.col("pred") == p).select(
            F.col("subj").alias("sub"), F.col("obj").alias("sup")
        )

    sp = transitive_closure(rel(_SUB_PROP), max_rounds=max_rounds)
    sc = transitive_closure(rel(_SUB_CLASS), max_rounds=max_rounds)
    dom = rel(_DOMAIN)
    rng = rel(_RANGE)

    # --- stratum 1: edge rules to joint fixpoint ----------------------
    # rdf:type and the schema predicates themselves are excluded from
    # property inheritance (ρdf restriction — keeps strata independent).
    data = t.where(~F.col("pred").isin(_TYPE, *_SCHEMA_PREDS))

    empty_rel = data.sparkSession.createDataFrame([], "p string, q string")
    if owl_rules:
        inv = t.where(F.col("pred") == _INVERSE).select(
            F.col("subj").alias("p"), F.col("obj").alias("q")
        )
        inv_both = inv.unionByName(
            inv.select(F.col("q").alias("p"), F.col("p").alias("q"))
        ).distinct()
        sym = (
            t.where((F.col("pred") == _TYPE) & (F.col("obj") == _SYMMETRIC))
            .select(F.col("subj").alias("p"))
            .distinct()
        )
        trans_preds = (
            t.where((F.col("pred") == _TYPE) & (F.col("obj") == _TRANSITIVE))
            .select(F.col("subj").alias("p"))
            .distinct()
        )
    else:
        inv_both = empty_rel
        sym = empty_rel.select("p")
        trans_preds = empty_rel.select("p")

    data = _edge_rules_fixpoint(
        data,
        sp=sp,
        inv_both=inv_both,
        sym=sym,
        trans_preds=trans_preds,
        max_rounds=max_rounds,
    )

    # --- stratum 2: domain/range typing -------------------------------
    dom_types = data.join(broadcast(dom), data["pred"] == dom["sub"]).select(
        "subj", F.lit(_TYPE).alias("pred"), F.col("sup").alias("obj")
    )
    rng_types = (
        data.where(F.col("obj").startswith("<"))  # resource objects only
        .join(broadcast(rng), data["pred"] == rng["sub"])
        .select(
            F.col("obj").alias("subj"),
            F.lit(_TYPE).alias("pred"),
            F.col("sup").alias("obj"),
        )
    )
    types = _dedup(
        [t.where(F.col("pred") == _TYPE).select("subj", "pred", "obj"),
         dom_types, rng_types]
    )

    # --- stratum 3: class inheritance (rdfs9 over sc closure) ---------
    super_types = types.join(broadcast(sc), types["obj"] == sc["sub"]).select(
        "subj", "pred", F.col("sup").alias("obj")
    )

    sp_triples = sp.select(
        F.col("sub").alias("subj"),
        F.lit(_SUB_PROP).alias("pred"),
        F.col("sup").alias("obj"),
    )
    sc_triples = sc.select(
        F.col("sub").alias("subj"),
        F.lit(_SUB_CLASS).alias("pred"),
        F.col("sup").alias("obj"),
    )
    return _dedup(
        [t.select("subj", "pred", "obj"), data, types, super_types,
         sp_triples, sc_triples]
    )


def rdfs_inferred(
    quads: DataFrame, *, owl_rules: bool = True, max_rounds: int = 20
) -> DataFrame:
    """The entailed delta only: closure minus the asserted triples.
    The asserted set is materialized once and shared between the
    closure and the anti-join (a derived input would otherwise be
    re-derived for each side)."""
    base = quads.select("subj", "pred", "obj").localCheckpoint(eager=True)
    return rdfs_closure(
        base, owl_rules=owl_rules, max_rounds=max_rounds
    ).join(base.distinct(), ["subj", "pred", "obj"], "left_anti")


def rdfs_closure_delta(
    closure: DataFrame,
    added: DataFrame,
    *,
    owl_rules: bool = True,
    max_rounds: int = 20,
) -> DataFrame:
    """Incremental closure maintenance: the NEW triples entailed when
    ``added`` joins an already-materialized ``closure``
    (:func:`rdfs_closure` output). RDFS/OWL rules are monotone, so for
    pure additions the semi-naive fixpoint can start from the existing
    closure with the delta as the only frontier — cost scales with the
    delta (plus one anti-join against the closure), not the corpus.
    This is the read side of the parquet store's CDC ``diff``: feed the
    ``added`` rows in, union the returned delta into the materialized
    closure.

    Additions only: a delta that touches *schema* triples
    (subClassOf / subPropertyOf / domain / range / inverseOf, or
    property-characteristic ``rdf:type`` rows) invalidates previously
    derived inferences wholesale, and removals need delete-rederive —
    both raise ``ValueError`` pointing at the full recompute. The guard
    costs one ``limit(1)`` probe."""
    a = added.select("subj", "pred", "obj").localCheckpoint(eager=True)
    schema_probe = a.where(
        F.col("pred").isin(*_SCHEMA_PREDS)
        | (
            (F.col("pred") == _TYPE)
            & F.col("obj").isin(_SYMMETRIC, _TRANSITIVE)
        )
    ).take(1)
    if schema_probe:
        raise ValueError(
            "delta touches schema triples — incremental maintenance is "
            "additions-to-data only; run rdfs_closure over the full "
            "graph instead"
        )
    c = closure.select("subj", "pred", "obj").localCheckpoint(eager=True)

    def rel(p: str) -> DataFrame:
        return c.where(F.col("pred") == p).select(
            F.col("subj").alias("sub"), F.col("obj").alias("sup")
        )

    # the materialized closure already contains the transitive sp/sc
    # relations (rdfs_closure emits them) — no re-closing needed
    sp, sc, dom, rng = rel(_SUB_PROP), rel(_SUB_CLASS), rel(_DOMAIN), rel(_RANGE)
    empty_rel = c.sparkSession.createDataFrame([], "p string, q string")
    if owl_rules:
        inv = c.where(F.col("pred") == _INVERSE).select(
            F.col("subj").alias("p"), F.col("obj").alias("q")
        )
        inv_both = inv.unionByName(
            inv.select(F.col("q").alias("p"), F.col("p").alias("q"))
        ).distinct()
        sym = (
            c.where((F.col("pred") == _TYPE) & (F.col("obj") == _SYMMETRIC))
            .select(F.col("subj").alias("p"))
            .distinct()
        )
        trans_preds = (
            c.where((F.col("pred") == _TYPE) & (F.col("obj") == _TRANSITIVE))
            .select(F.col("subj").alias("p"))
            .distinct()
        )
    else:
        inv_both = empty_rel
        sym = empty_rel.select("p")
        trans_preds = empty_rel.select("p")

    old_data = c.where(~F.col("pred").isin(_TYPE, *_SCHEMA_PREDS))
    added_data = a.where(F.col("pred") != _TYPE)
    data = _edge_rules_fixpoint(
        added_data,
        sp=sp,
        inv_both=inv_both,
        sym=sym,
        trans_preds=trans_preds,
        max_rounds=max_rounds,
        seed_known=old_data.localCheckpoint(eager=True),
    )
    new_data = data.join(old_data, ["subj", "pred", "obj"], "left_anti")

    dom_types = new_data.join(
        broadcast(dom), new_data["pred"] == dom["sub"]
    ).select("subj", F.lit(_TYPE).alias("pred"), F.col("sup").alias("obj"))
    rng_types = (
        new_data.where(F.col("obj").startswith("<"))
        .join(broadcast(rng), new_data["pred"] == rng["sub"])
        .select(
            F.col("obj").alias("subj"),
            F.lit(_TYPE).alias("pred"),
            F.col("sup").alias("obj"),
        )
    )
    new_types = _dedup(
        [a.where(F.col("pred") == _TYPE), dom_types, rng_types]
    )
    super_types = new_types.join(
        broadcast(sc), new_types["obj"] == sc["sub"]
    ).select("subj", "pred", F.col("sup").alias("obj"))
    return _dedup([a, new_data, new_types, super_types]).join(
        c, ["subj", "pred", "obj"], "left_anti"
    )


def _dedup(parts: list[DataFrame]) -> DataFrame:
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def rdfs_closure_sql_cte(
    *,
    schema_values_sql: str,
    sp_depth: int = 4,
    sc_depth: int = 4,
    edge_rounds: int = 6,
) -> str:
    """DuckDB twin of :func:`rdfs_closure` (owl_rules=True) as a CTE
    chain ending in ``closure_final(subj, pred, obj)``. Assumes a
    ``quads`` CTE in scope; ``schema_values_sql`` is a relation of the
    schema triples (subj, pred, obj) to union in (the Spark side unions
    the same rows). The Spark side iterates to fixpoint; here the
    schema closures and the joint edge-rule round are unrolled to fixed
    depths — exact when the fixture converges within them (UNION
    deduplicates, so over-unrolling past convergence is a no-op)."""
    parts = [
        f"schema_rows AS ({schema_values_sql})",
        "t0 AS MATERIALIZED (SELECT subj, pred, obj FROM quads "
        "UNION SELECT subj, pred, obj FROM schema_rows)",
        f"sp0 AS MATERIALIZED (SELECT DISTINCT subj AS sub, obj AS sup FROM t0 "
        f"WHERE pred = '{_SUB_PROP}')",
        f"sc0 AS MATERIALIZED (SELECT DISTINCT subj AS sub, obj AS sup FROM t0 "
        f"WHERE pred = '{_SUB_CLASS}')",
    ]
    for name, depth in (("sp", sp_depth), ("sc", sc_depth)):
        prev = f"{name}0"
        for i in range(1, depth + 1):
            parts.append(
                f"{name}{i} AS MATERIALIZED (SELECT sub, sup FROM {prev} UNION "
                f"SELECT a.sub, b.sup FROM {prev} a JOIN {prev} b "
                f"ON a.sup = b.sub WHERE a.sub <> b.sup)"
            )
            prev = f"{name}{i}"
        parts.append(f"{name}cl AS MATERIALIZED (SELECT sub, sup FROM {prev})")
    parts += [
        f"invrel AS MATERIALIZED (SELECT subj AS p, obj AS q FROM t0 WHERE pred = '{_INVERSE}' "
        f"UNION SELECT obj AS p, subj AS q FROM t0 WHERE pred = '{_INVERSE}')",
        f"symp AS MATERIALIZED (SELECT DISTINCT subj AS p FROM t0 "
        f"WHERE pred = '{_TYPE}' AND obj = '{_SYMMETRIC}')",
        f"trp AS MATERIALIZED (SELECT DISTINCT subj AS p FROM t0 "
        f"WHERE pred = '{_TYPE}' AND obj = '{_TRANSITIVE}')",
        f"dom AS MATERIALIZED (SELECT subj AS sub, obj AS sup FROM t0 WHERE pred = '{_DOMAIN}')",
        f"rng AS MATERIALIZED (SELECT subj AS sub, obj AS sup FROM t0 WHERE pred = '{_RANGE}')",
        f"d0 AS MATERIALIZED (SELECT subj, pred, obj FROM t0 WHERE pred NOT IN "
        f"('{_TYPE}', '{_SUB_PROP}', '{_SUB_CLASS}', '{_DOMAIN}', "
        f"'{_RANGE}', '{_INVERSE}'))",
    ]
    prev = "d0"
    for i in range(1, edge_rounds + 1):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT subj, pred, obj FROM {prev} "
            f"UNION SELECT d.obj, i.q, d.subj FROM {prev} d "
            f"JOIN invrel i ON d.pred = i.p "
            f"UNION SELECT d.obj, d.pred, d.subj FROM {prev} d "
            f"JOIN symp s ON d.pred = s.p "
            f"UNION SELECT d.subj, s.sup, d.obj FROM {prev} d "
            f"JOIN spcl s ON d.pred = s.sub "
            f"UNION SELECT a.subj, a.pred, b.obj FROM {prev} a "
            f"JOIN trp ON a.pred = trp.p "
            f"JOIN {prev} b ON b.pred = a.pred AND a.obj = b.subj "
            f"WHERE a.subj <> b.obj)"
        )
        prev = f"d{i}"
    parts += [
        f"dfinal AS MATERIALIZED (SELECT subj, pred, obj FROM {prev})",
        f"types0 AS MATERIALIZED (SELECT subj, pred, obj FROM t0 WHERE pred = '{_TYPE}' "
        f"UNION SELECT d.subj, '{_TYPE}', m.sup FROM dfinal d JOIN dom m ON d.pred = m.sub "
        f"UNION SELECT d.obj, '{_TYPE}', r.sup FROM dfinal d JOIN rng r "
        f"ON d.pred = r.sub WHERE d.obj LIKE '<%')",
        f"types1 AS MATERIALIZED (SELECT subj, pred, obj FROM types0 "
        f"UNION SELECT y.subj, '{_TYPE}', c.sup FROM types0 y JOIN sccl c ON y.obj = c.sub)",
        f"closure_final AS MATERIALIZED (SELECT subj, pred, obj FROM t0 "
        f"UNION SELECT subj, pred, obj FROM dfinal "
        f"UNION SELECT subj, pred, obj FROM types1 "
        f"UNION SELECT sub, '{_SUB_PROP}', sup FROM spcl "
        f"UNION SELECT sub, '{_SUB_CLASS}', sup FROM sccl)",
    ]
    return ",\n".join(parts)
