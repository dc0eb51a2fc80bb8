"""SPARQL SELECT/ASK answering compiled to DataFrame algebra.

The reference can only *issue* SPARQL — every Blazegraph operator builds a
query string and POSTs it to an endpoint that does the actual matching
(blazegraph_store.go:40-53, 126-137, 396-411). This module is the missing
other half for a Spark deployment: it ANSWERS those queries directly over
the distributed quad table ``(subj, pred, obj, graph)``, so a reference
user's existing SPARQL keeps working with no triple store server at all.

Supported subset (a superset of every query string the reference ever
generates — pinned by tests/test_sparql_query.py which feeds
``SparqlQuadStore.select_sparql/ask_sparql/count_sparql`` output straight
into this engine):

* ``PREFIX`` declarations + prefixed names + ``a`` ≡ ``rdf:type``;
* ``SELECT [DISTINCT] ?v … | * | (COUNT([DISTINCT] *|?v) AS ?n)``, with
  ``GROUP BY ?v …`` for grouped counts (mixed ``?var``/``COUNT`` entries;
  one hash aggregate, ``ORDER BY``/``LIMIT`` after it give top-k groups);
* basic graph patterns with ``;`` / ``,`` predicate-object list sugar;
* ``GRAPH <uri> { … }`` / ``GRAPH ?g { … }`` scoping;
* ``FILTER`` with ``= != < <= > >= && || !``, ``BOUND(?v)``, the string
  tests ``REGEX(?v, "pat"[, "i"])`` / ``STRSTARTS`` / ``CONTAINS`` (over
  the literal's value), and the accessors ``LANG(?v)`` / ``DATATYPE(?v)``
  / ``STR(?v)`` in comparisons;
* ``OPTIONAL { … }`` and ``{ … } UNION { … }``;
* ``ORDER BY [ASC|DESC](?v)``, ``LIMIT``, ``OFFSET``;
* ``ASK { … }``;
* ``CONSTRUCT { template } WHERE { … }`` (the reference's Turtle-export
  form) via :func:`sparql_construct`.

Out of scope (documented, not silently wrong): property paths, subqueries,
``GROUP BY`` (only the reference's bare ``COUNT`` projection), blank nodes
(unsupported across the reference too — SURVEY.md §2.1), ``BIND``,
``MINUS``, and SPARQL's full operator-precedence value type system.
OPTIONAL/UNION compile relationally (left join / union on shared
variable columns): a variable that later joins must be BOUND wherever it
appears — SPARQL's unbound-is-compatible-with-anything rule for
solutions from nested OPTIONALs or partial UNION branches is not
implemented (those solutions drop at the join instead of matching
everything). Single-level OPTIONALs over BGPs — the negation idiom and
every common use — bind all their variables, where the compilation is
exact (property-pinned in tests/test_sparql_property.py).
Comparison semantics here: the constant operand picks the mode — numeric
constant ⇒ both sides as doubles via the literal's value (``try_cast``;
non-numeric bindings compare as null ⇒ row dropped, matching SPARQL's
type-error-⇒-false), plain string constant ⇒ the literal's value, IRI or
lang/datatype-tagged constant ⇒ the full encoded term, var-vs-var ⇒ full
encoded terms.

Scale shape (the point of answering on Spark): each triple pattern
compiles to a filter+project over the quad scan — constant positions
become Parquet-pushed predicates (graph/pred constants prune partitions
and row groups; ``PushedFilters`` pinned in tests/test_plans.py) and only
variable positions survive column pruning. The BGP joins on shared
variable columns, most-constrained pattern first, greedily extending
along shared variables so no intermediate is a cartesian unless the query
itself is; AQE then picks broadcast sides at runtime (selective patterns
produce tiny scans). No driver-side matching anywhere — ASK is a
``limit(1)`` probe, COUNT is one aggregate.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ontograph_spark import vocab
from ontograph_spark.terms import (
    term_datatype_col,
    term_language_col,
    term_value_col,
)


class SparqlSyntaxError(ValueError):
    """Raised on queries outside the supported subset."""


# --------------------------------------------------------------------------
# tokenizer
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
      (?P<WS>\s+|\#[^\n]*)
    | (?P<IRI><[^<>\s]*>)
    | (?P<STRING>"[^"]*"(?:@[A-Za-z][A-Za-z0-9-]*|\^\^(?:<[^<>\s]*>|[A-Za-z_][\w.-]*:[\w.-]+))?)
    | (?P<NUMBER>[+-]?\d+(?:\.\d+)?)
    | (?P<PNAME>[A-Za-z_][\w-]*:[\w.-]*|:[\w.-]+)
    | (?P<VAR>\?\w+)
    | (?P<NAME>[A-Za-z_]\w*)
    | (?P<OP><=|>=|!=|&&|\|\||[{}().;,=<>!*])
    """,
    re.X,
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise SparqlSyntaxError(f"cannot tokenize at: {text[pos:pos+30]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind != "WS":
            out.append((kind, m.group()))
    return out


# --------------------------------------------------------------------------
# AST
# --------------------------------------------------------------------------

#: a pattern slot: ("var", name) or ("term", canonical N-Triples encoding)
Slot = tuple[str, str]


@dataclass
class Pattern:
    s: Slot
    p: Slot
    o: Slot
    #: graph scope: None (any graph), ("term", uri) or ("var", name)
    g: Slot | None = None

    def n_const(self) -> int:
        return sum(
            1
            for slot in (self.s, self.p, self.o, self.g)
            if slot is not None and slot[0] == "term"
        )

    def var_names(self) -> set[str]:
        return {
            v
            for _, v in [
                slot
                for slot in (self.s, self.p, self.o, self.g)
                if slot is not None and slot[0] == "var"
            ]
        }


@dataclass
class Group:
    patterns: list[Pattern] = field(default_factory=list)
    filters: list = field(default_factory=list)  # expression ASTs
    optionals: list["Group"] = field(default_factory=list)
    unions: list[list["Group"]] = field(default_factory=list)


@dataclass
class Query:
    kind: str  # "select" | "ask" | "construct"
    group: Group
    projection: list[str] | None = None  # plain projected vars; None = *
    #: aggregate projections: (as_var, count_var | None for *, distinct)
    counts: list[tuple[str, str | None, bool]] = field(default_factory=list)
    #: output column order as written in the SELECT clause
    proj_order: list[str] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)
    distinct: bool = False
    order: list[tuple[str, bool]] = field(default_factory=list)  # (var, asc)
    limit: int | None = None
    offset: int | None = None
    template: list[Pattern] = field(default_factory=list)  # CONSTRUCT only


# --------------------------------------------------------------------------
# parser (recursive descent over the token list)
# --------------------------------------------------------------------------


class _Parser:
    def __init__(self, text: str) -> None:
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes = dict(vocab.BASE_PREFIXES)

    # -- token plumbing ----------------------------------------------------

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        if self.i >= len(self.toks):
            raise SparqlSyntaxError("unexpected end of query")
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_kw(self, *words: str) -> bool:
        t = self.peek()
        return t is not None and t[0] == "NAME" and t[1].upper() in words

    def expect_kw(self, word: str) -> None:
        if not self.at_kw(word):
            raise SparqlSyntaxError(f"expected {word} at {self.peek()}")
        self.next()

    def at_op(self, op: str) -> bool:
        t = self.peek()
        return t is not None and t[0] == "OP" and t[1] == op

    def expect_op(self, op: str) -> None:
        if not self.at_op(op):
            raise SparqlSyntaxError(f"expected {op!r} at {self.peek()}")
        self.next()

    # -- terms ---------------------------------------------------------------

    def expand_pname(self, pname: str) -> str:
        pfx, local = pname.split(":", 1)
        if pfx not in self.prefixes:
            raise SparqlSyntaxError(f"unknown prefix {pfx!r} in {pname!r}")
        return f"<{self.prefixes[pfx]}{local}>"

    def parse_slot(self) -> Slot:
        kind, text = self.next()
        if kind == "VAR":
            return ("var", text[1:])
        if kind == "IRI":
            return ("term", text)
        if kind == "PNAME":
            return ("term", self.expand_pname(text))
        if kind == "NAME" and text == "a":
            return ("term", f"<{vocab.RDF_TYPE}>")
        if kind == "STRING":
            return ("term", self._canon_literal(text))
        if kind == "NUMBER":
            dt = vocab.XSD_DECIMAL if "." in text else vocab.XSD_INTEGER
            return ("term", f'"{text}"^^<{dt}>')
        raise SparqlSyntaxError(f"expected term, got {text!r}")

    def _canon_literal(self, tok: str) -> str:
        # expand a prefixed datatype to the full IRI; everything else is
        # already the canonical N-Triples encoding (§1.2 — no escaping)
        m = re.fullmatch(r'("[^"]*")\^\^([A-Za-z_][\w-]*:[\w.-]+|:[\w.-]+)', tok)
        if m:
            return f"{m.group(1)}^^{self.expand_pname(m.group(2))}"
        return tok

    # -- query ---------------------------------------------------------------

    def parse_query(self) -> Query:
        while self.at_kw("PREFIX"):
            self.next()
            kind, pname = self.next()
            if kind != "PNAME" and not (kind == "OP" and pname == ":"):
                raise SparqlSyntaxError(f"bad PREFIX name {pname!r}")
            kind2, iri = self.next()
            if kind2 != "IRI":
                raise SparqlSyntaxError(f"bad PREFIX IRI {iri!r}")
            # PNAME here is "pfx:" (empty local) — tokenized as PNAME only
            # when a local part follows, so accept both "pfx:" and "pfx:x"
            self.prefixes[pname.split(":", 1)[0]] = iri[1:-1]
        if self.at_kw("ASK"):
            self.next()
            q = Query(kind="ask", group=self.parse_group())
            if self.peek() is not None:
                raise SparqlSyntaxError(f"trailing tokens at {self.peek()}")
            return q
        if self.at_kw("CONSTRUCT"):
            self.next()
            template = self.parse_group()
            if (
                template.filters
                or template.optionals
                or template.unions
                or any(p.g is not None for p in template.patterns)
            ):
                raise SparqlSyntaxError(
                    "CONSTRUCT template must be a plain triple block"
                )
            self.expect_kw("WHERE")
            q = Query(
                kind="construct", group=self.parse_group(), template=template.patterns
            )
            self._parse_modifiers(q)
            if self.peek() is not None:
                raise SparqlSyntaxError(f"trailing tokens at {self.peek()}")
            return q
        self.expect_kw("SELECT")
        q = Query(kind="select", group=Group())
        if self.at_kw("DISTINCT"):
            self.next()
            q.distinct = True
        if self.at_op("*"):
            self.next()
            q.projection = None
        else:
            proj: list[str] = []
            while True:
                t = self.peek()
                if t is not None and t[0] == "VAR":
                    name = self.next()[1][1:]
                    proj.append(name)
                    q.proj_order.append(name)
                elif t is not None and t[0] == "OP" and t[1] == "(":
                    entry = self._parse_count_entry()
                    q.counts.append(entry)
                    q.proj_order.append(entry[0])
                else:
                    break
            if not q.proj_order:
                raise SparqlSyntaxError("SELECT needs ?vars, * or (COUNT … AS ?v)")
            q.projection = proj
        if self.at_kw("WHERE"):
            self.next()
        q.group = self.parse_group()
        self._parse_modifiers(q)
        if self.peek() is not None:
            raise SparqlSyntaxError(f"trailing tokens at {self.peek()}")
        return q

    def _parse_count_entry(self) -> tuple[str, str | None, bool]:
        """``(COUNT([DISTINCT] *|?v) AS ?alias)`` — the aggregate form."""
        self.expect_op("(")
        self.expect_kw("COUNT")
        self.expect_op("(")
        cdistinct = False
        if self.at_kw("DISTINCT"):
            self.next()
            cdistinct = True
        cvar: str | None = None
        if self.at_op("*"):
            self.next()
        else:
            kind, text = self.next()
            if kind != "VAR":
                raise SparqlSyntaxError(f"COUNT of {text!r} unsupported")
            cvar = text[1:]
        self.expect_op(")")
        self.expect_kw("AS")
        kind, text = self.next()
        if kind != "VAR":
            raise SparqlSyntaxError("COUNT needs (… AS ?var)")
        self.expect_op(")")
        return (text[1:], cvar, cdistinct)

    def _parse_modifiers(self, q: Query) -> None:
        while True:
            if self.at_kw("ORDER"):
                self.next()
                self.expect_kw("BY")
                while True:
                    if self.at_kw("ASC", "DESC"):
                        asc = self.next()[1].upper() == "ASC"
                        self.expect_op("(")
                        kind, text = self.next()
                        if kind != "VAR":
                            raise SparqlSyntaxError("ORDER BY needs ?vars")
                        self.expect_op(")")
                        q.order.append((text[1:], asc))
                    elif self.peek() is not None and self.peek()[0] == "VAR":
                        q.order.append((self.next()[1][1:], True))
                    else:
                        break
                if not q.order:
                    raise SparqlSyntaxError("empty ORDER BY")
            elif self.at_kw("GROUP"):
                self.next()
                self.expect_kw("BY")
                while self.peek() is not None and self.peek()[0] == "VAR":
                    q.group_by.append(self.next()[1][1:])
                if not q.group_by:
                    raise SparqlSyntaxError("empty GROUP BY")
            elif self.at_kw("LIMIT"):
                self.next()
                q.limit = int(self.next()[1])
            elif self.at_kw("OFFSET"):
                self.next()
                q.offset = int(self.next()[1])
            else:
                return

    # -- group graph pattern ---------------------------------------------------

    def parse_group(self, graph: Slot | None = None) -> Group:
        self.expect_op("{")
        g = Group()
        while not self.at_op("}"):
            if self.at_kw("GRAPH"):
                self.next()
                gslot = self.parse_slot()
                if gslot[0] == "term":
                    # graph column stores the bare URI, not the <…> term
                    if not gslot[1].startswith("<"):
                        raise SparqlSyntaxError("GRAPH needs an IRI or ?var")
                    gslot = ("term", gslot[1][1:-1])
                inner = self.parse_group(graph=gslot)
                self._merge(g, inner)
            elif self.at_kw("FILTER"):
                self.next()
                g.filters.append(self._parse_expr())
            elif self.at_kw("OPTIONAL"):
                self.next()
                g.optionals.append(self.parse_group(graph=graph))
            elif self.at_op("{"):
                branches = [self.parse_group(graph=graph)]
                while self.at_kw("UNION"):
                    self.next()
                    branches.append(self.parse_group(graph=graph))
                if len(branches) == 1:
                    self._merge(g, branches[0])
                else:
                    g.unions.append(branches)
            else:
                self._parse_triples_block(g, graph)
            while self.at_op("."):
                self.next()
        self.expect_op("}")
        return g

    @staticmethod
    def _merge(g: Group, inner: Group) -> None:
        g.patterns.extend(inner.patterns)
        g.filters.extend(inner.filters)
        g.optionals.extend(inner.optionals)
        g.unions.extend(inner.unions)

    def _parse_triples_block(self, g: Group, graph: Slot | None) -> None:
        subj = self.parse_slot()
        while True:
            pred = self.parse_slot()
            while True:
                obj = self.parse_slot()
                g.patterns.append(Pattern(subj, pred, obj, graph))
                if self.at_op(","):
                    self.next()
                    continue
                break
            if self.at_op(";"):
                self.next()
                if self.at_op(".") or self.at_op("}"):  # dangling ';'
                    break
                continue
            break

    # -- FILTER expressions ------------------------------------------------

    def _parse_expr(self):
        return self._parse_or()

    def _parse_or(self):
        node = self._parse_and()
        while self.at_op("||"):
            self.next()
            node = ("or", node, self._parse_and())
        return node

    def _parse_and(self):
        node = self._parse_not()
        while self.at_op("&&"):
            self.next()
            node = ("and", node, self._parse_not())
        return node

    def _parse_not(self):
        if self.at_op("!"):
            self.next()
            return ("not", self._parse_not())
        return self._parse_cmp()

    def _parse_cmp(self):
        lhs = self._parse_primary()
        t = self.peek()
        if t is not None and t[0] == "OP" and t[1] in ("=", "!=", "<", "<=", ">", ">="):
            op = self.next()[1]
            return ("cmp", op, lhs, self._parse_primary())
        return lhs

    def _parse_primary(self):
        if self.at_op("("):
            self.next()
            node = self._parse_expr()
            self.expect_op(")")
            return node
        if self.at_kw("BOUND"):
            self.next()
            self.expect_op("(")
            kind, text = self.next()
            if kind != "VAR":
                raise SparqlSyntaxError("BOUND needs a ?var")
            self.expect_op(")")
            return ("bound", text[1:])
        if self.at_kw("REGEX", "STRSTARTS", "CONTAINS"):
            name = self.next()[1].upper()
            self.expect_op("(")
            args = [self._parse_primary()]
            while self.at_op(","):
                self.next()
                args.append(self._parse_primary())
            self.expect_op(")")
            want = (2, 3) if name == "REGEX" else (2, 2)
            if not (want[0] <= len(args) <= want[1]):
                raise SparqlSyntaxError(f"{name} takes {want[0]}-{want[1]} args")
            if not all(a[0] == "str" for a in args[1:]):
                raise SparqlSyntaxError(f"{name} needs constant string args")
            return ("sfunc", name, args)
        if self.at_kw("LANG", "DATATYPE", "STR"):
            name = self.next()[1].upper()
            self.expect_op("(")
            kind, text = self.next()
            if kind != "VAR":
                raise SparqlSyntaxError(f"{name} needs a ?var")
            self.expect_op(")")
            return ("acc", name, text[1:])
        kind, text = self.next()
        if kind == "VAR":
            return ("var", text[1:])
        if kind == "NUMBER":
            return ("num", float(text))
        if kind == "STRING":
            canon = self._canon_literal(text)
            if re.fullmatch(r'"[^"]*"', canon):
                return ("str", canon[1:-1])
            return ("term", canon)
        if kind == "IRI":
            return ("term", text)
        if kind == "PNAME":
            return ("term", self.expand_pname(text))
        raise SparqlSyntaxError(f"unexpected {text!r} in FILTER")


# --------------------------------------------------------------------------
# compiler
# --------------------------------------------------------------------------

_POS_COLS = (("s", "subj"), ("p", "pred"), ("o", "obj"))


def _scan(quads: DataFrame, pat: Pattern) -> DataFrame:
    """One triple pattern → filter + project on the quad table. Constant
    slots become pushable equality predicates; a variable repeated within
    the pattern becomes a position-equality filter; only variable slots
    survive projection (column pruning reaches the parquet scan)."""
    conds: list[Column] = []
    proj: list[Column] = []
    seen: dict[str, str] = {}
    slots = [(attr, col, getattr(pat, attr)) for attr, col in _POS_COLS]
    if pat.g is not None:
        slots.append(("g", "graph", pat.g))
    for _attr, col, (kind, val) in slots:
        if kind == "term":
            conds.append(F.col(col) == F.lit(val))
        elif val in seen:
            conds.append(F.col(col) == F.col(seen[val]))
        else:
            seen[val] = col
            proj.append(F.col(col).alias(val))
    df = quads
    for c in conds:
        df = df.where(c)
    if not proj:
        # all-constant pattern (an existence probe): keep a marker column
        # so joins/uniona still have a row shape
        return df.select(F.lit(True).alias("__exists__")).limit(1)
    return df.select(*proj)


def _join_shared(left: DataFrame, right: DataFrame, how: str = "inner") -> DataFrame:
    shared = [c for c in left.columns if c in set(right.columns)]
    shared = [c for c in shared if c != "__exists__"]
    if shared:
        return left.join(right, on=shared, how=how)
    if how == "inner":
        return left.crossJoin(right)
    return left.join(right, F.lit(True), "left")


def _order_patterns(patterns: list[Pattern]) -> list[Pattern]:
    """Most-constrained pattern first, then greedily extend along shared
    variables (avoids accidental cartesians; Catalyst/AQE finishes the
    job with runtime broadcast decisions)."""
    remaining = sorted(
        patterns, key=lambda p: (-p.n_const(), str((p.s, p.p, p.o, p.g)))
    )
    if not remaining:
        return []
    ordered = [remaining.pop(0)]
    bound = set(ordered[0].var_names())
    while remaining:
        nxt = next(
            (p for p in remaining if p.var_names() & bound), remaining[0]
        )
        remaining.remove(nxt)
        ordered.append(nxt)
        bound |= nxt.var_names()
    return ordered


def _compile_expr(node, columns: set[str]) -> Column:
    kind = node[0]
    if kind == "or":
        return _compile_expr(node[1], columns) | _compile_expr(node[2], columns)
    if kind == "and":
        return _compile_expr(node[1], columns) & _compile_expr(node[2], columns)
    if kind == "not":
        return ~_compile_expr(node[1], columns)
    if kind == "bound":
        if node[1] not in columns:
            return F.lit(False)
        return F.col(node[1]).isNotNull()
    if kind == "cmp":
        return _compile_cmp(node[1], node[2], node[3], columns)
    if kind == "sfunc":
        name, args = node[1], node[2]
        subject = _string_operand(args[0], columns)
        consts = [a[1] for a in args[1:]]
        if name == "REGEX":
            pattern = consts[0]
            if len(consts) == 2 and "i" in consts[1]:
                pattern = f"(?i){pattern}"
            return subject.rlike(pattern)
        if name == "STRSTARTS":
            return subject.startswith(consts[0])
        return subject.contains(consts[0])  # CONTAINS
    raise SparqlSyntaxError(f"expression {node!r} is not a boolean constraint")


_ACCESSORS = {
    "LANG": term_language_col,
    "DATATYPE": term_datatype_col,
    "STR": term_value_col,
}


def _string_operand(node, columns: set[str]) -> Column:
    """An expression operand as a plain string Column: vars via the
    literal's value, LANG/DATATYPE/STR accessors via the term codec."""
    kind = node[0]
    if kind == "var":
        if node[1] not in columns:
            raise SparqlSyntaxError(f"FILTER references unbound ?{node[1]}")
        return term_value_col(F.col(node[1]))
    if kind == "acc":
        if node[2] not in columns:
            raise SparqlSyntaxError(f"FILTER references unbound ?{node[2]}")
        return _ACCESSORS[node[1]](F.col(node[2]))
    raise SparqlSyntaxError(f"{node!r} is not a string-valued operand")


def _operand_mode(node) -> str:
    modes = {"num": "num", "str": "value", "term": "term", "var": "var", "acc": "acc"}
    if node[0] not in modes:
        raise SparqlSyntaxError(f"{node!r} cannot appear in a comparison")
    return modes[node[0]]


def _cmp_side(node, mode: str, columns: set[str]) -> Column:
    kind = node[0]
    if kind == "acc":
        return _string_operand(node, columns)
    if kind == "var":
        if node[1] not in columns:
            raise SparqlSyntaxError(f"FILTER references unbound ?{node[1]}")
        col = F.col(node[1])
        if mode == "num":
            return term_value_col(col).try_cast("double")
        if mode in ("value", "acc"):
            return term_value_col(col)
        return col
    if kind == "num":
        return F.lit(node[1])
    if kind == "str":
        return F.lit(node[1])
    if mode == "acc":
        # accessor results are bare strings (LANG tag, DATATYPE uri,
        # STR lexical form) — strip the IRI constant's angle brackets
        return F.lit(node[1][1:-1] if node[1].startswith("<") else node[1])
    return F.lit(node[1])  # full encoded term


def _compile_cmp(op: str, lhs, rhs, columns: set[str]) -> Column:
    modes = {_operand_mode(lhs), _operand_mode(rhs)}
    if modes == {"var"}:
        mode = "term"
    elif "acc" in modes:
        mode = "acc"
    elif "num" in modes:
        mode = "num"
    elif "value" in modes:
        mode = "value"
    else:
        mode = "term"
    lc = _cmp_side(lhs, mode, columns)
    rc = _cmp_side(rhs, mode, columns)
    return {
        "=": lc == rc,
        "!=": lc != rc,
        "<": lc < rc,
        "<=": lc <= rc,
        ">": lc > rc,
        ">=": lc >= rc,
    }[op]


def _compile_group(quads: DataFrame, g: Group) -> DataFrame:
    df: DataFrame | None = None
    for pat in _order_patterns(g.patterns):
        scan = _scan(quads, pat)
        df = scan if df is None else _join_shared(df, scan)
    for branches in g.unions:
        compiled = [_compile_group(quads, b) for b in branches]
        u = compiled[0]
        for b in compiled[1:]:
            u = u.unionByName(b, allowMissingColumns=True)
        df = u if df is None else _join_shared(df, u)
    if df is None:
        raise SparqlSyntaxError("empty group graph pattern")
    for opt in g.optionals:
        df = _join_shared(df, _compile_group(quads, opt), how="left")
    for expr in g.filters:
        df = df.where(_compile_expr(expr, set(df.columns)))
    if "__exists__" in df.columns and len(df.columns) > 1:
        df = df.drop("__exists__")
    return df


def sparql_select(quads: DataFrame, query: str) -> DataFrame:
    """Answer a SPARQL SELECT (subset above) over a quad DataFrame.
    Returns one string column per projected variable; OPTIONAL-unbound
    slots are null. All matching/joining/filtering is DataFrame algebra —
    nothing runs on the driver."""
    q = _Parser(query).parse_query()
    if q.kind != "select":
        raise SparqlSyntaxError("use sparql_ask for ASK queries")
    df = _compile_group(quads, q.group)
    if q.counts:
        aggs = []
        for as_var, cvar, cdistinct in q.counts:
            if cvar is None:
                agg = (
                    F.count_distinct(*[F.col(c) for c in df.columns])
                    if cdistinct
                    else F.count(F.lit(1))
                )
            else:
                if cvar not in df.columns:
                    raise SparqlSyntaxError(f"COUNT of unbound ?{cvar}")
                agg = F.count_distinct(cvar) if cdistinct else F.count(cvar)
            aggs.append(agg.alias(as_var))
        if q.group_by:
            missing = [v for v in q.group_by if v not in df.columns]
            if missing:
                raise SparqlSyntaxError(f"GROUP BY of unbound vars {missing}")
            stray = [v for v in (q.projection or []) if v not in q.group_by]
            if stray:
                raise SparqlSyntaxError(
                    f"projected vars {stray} must appear in GROUP BY"
                )
            df = df.groupBy(*q.group_by).agg(*aggs)
        else:
            if q.projection:
                raise SparqlSyntaxError(
                    f"plain ?vars {q.projection} next to COUNT need GROUP BY"
                )
            df = df.agg(*aggs)
        df = df.select(*q.proj_order)
    elif q.group_by:
        raise SparqlSyntaxError("GROUP BY needs an aggregate projection")
    elif q.projection is not None:
        missing = [v for v in q.projection if v not in df.columns]
        if missing:
            raise SparqlSyntaxError(f"projection of unbound vars {missing}")
        df = df.select(*q.projection)
    elif "__exists__" in df.columns:
        df = df.select(F.col("__exists__").cast("string").alias("__exists__"))
    if q.distinct:
        df = df.distinct()
    if q.order:
        df = df.orderBy(
            *[F.col(v).asc() if asc else F.col(v).desc() for v, asc in q.order]
        )
    if q.offset is not None:
        df = df.offset(q.offset)
    if q.limit is not None:
        df = df.limit(q.limit)
    return df


def sparql_construct(quads: DataFrame, query: str) -> DataFrame:
    """Answer a SPARQL CONSTRUCT (the reference's Turtle-export query
    form, blazegraph_store.go:327-393): solve the WHERE group, then
    instantiate each template pattern once per solution — a
    select-per-template + union, solutions with an unbound template
    variable dropped (SPARQL 1.1 §16.2), distinct because the result is
    a graph (set semantics). Returns ``(subj, pred, obj)`` rows."""
    q = _Parser(query).parse_query()
    if q.kind != "construct":
        raise SparqlSyntaxError("use sparql_select/sparql_ask for this query")
    df = _compile_group(quads, q.group)
    if q.order:
        df = df.orderBy(
            *[F.col(v).asc() if asc else F.col(v).desc() for v, asc in q.order]
        )
    if q.offset is not None:
        df = df.offset(q.offset)
    if q.limit is not None:
        df = df.limit(q.limit)
    cols = set(df.columns)
    out: DataFrame | None = None
    for pat in q.template:
        row = []
        for (kind, val), name in ((pat.s, "subj"), (pat.p, "pred"), (pat.o, "obj")):
            if kind == "term":
                row.append(F.lit(val).alias(name))
            elif val not in cols:
                raise SparqlSyntaxError(f"template references unbound ?{val}")
            else:
                row.append(F.col(val).alias(name))
        inst = df.select(*row).na.drop()
        out = inst if out is None else out.unionByName(inst)
    if out is None:
        raise SparqlSyntaxError("empty CONSTRUCT template")
    return out.distinct()


def parse_group_text(text: str) -> Group:
    """Parse a standalone ``{ … }`` group graph pattern (used by the
    in-process endpoint to decode the bodies of INSERT DATA / DELETE
    DATA / DELETE WHERE updates, which share the group grammar)."""
    p = _Parser(text)
    g = p.parse_group()
    if p.peek() is not None:
        raise SparqlSyntaxError(f"trailing tokens at {p.peek()}")
    return g


def sparql_ask(quads: DataFrame, query: str) -> bool:
    """Answer a SPARQL ASK: does the pattern have ≥1 solution? One
    ``limit(1)`` probe — the distributed twin of the reference's
    ASK-before-INSERT existence checks (blazegraph_store.go:126-137)."""
    q = _Parser(query).parse_query()
    if q.kind != "ask":
        raise SparqlSyntaxError("use sparql_select for SELECT queries")
    return len(_compile_group(quads, q.group).limit(1).take(1)) > 0
