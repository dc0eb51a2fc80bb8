"""Turtle (TTL) serialization and fixture parsing.

Mirrors the reference's serializer semantics (/root/reference/
memory_store.go:242-299): the plain mode writes one triple statement per
line (valid Turtle *and* N-Triples); the pretty mode builds a prefix map —
the empty prefix for the graph namespace, rdf/rdfs/owl/xsd, plus one prefix
per ``owl:imports`` target (abbreviated by the URI segment after the last
``/``) — rewrites URIs to CURIEs, inserts blank lines between statements
and prepends the ``@prefix``/``@base`` block.

Byte-exact parity with the reference's pretty mode is ill-defined, not
just unimplemented: the reference iterates a Go map for the ``@prefix``
block (memory_store.go:282 ``for abbr, prefix := range prefixMap``), and
Go randomizes map iteration order — two runs of the reference over the
same store emit differently-ordered prefix blocks (and rewrite URIs in a
different order, which can change which prefix wins when one namespace
is a textual prefix of another). This serializer makes the deterministic
choice instead: insertion order — empty prefix, rdf/rdfs/owl/xsd, then
imports in triple order.

The parser handles the subset the serializer emits plus common Turtle
conveniences (``@prefix``/``@base``, ``a``, ``;``/``,`` continuation) — it
exists for fixture loading only; bulk ingest at scale goes through the
distributed N-Triples source (ontograph_spark/sources/ntriples.py). Like
the reference, no quote escaping is performed (triple.go:21-30) and blank
nodes are unsupported (blazegraph_store.go:434-445).
"""

from __future__ import annotations

import re
from typing import TextIO

from ontograph_spark import vocab
from ontograph_spark.terms import mk_resource, term_value


def serialize_to_turtle(store, writer: TextIO, pretty: bool = False) -> None:
    """Driver-side formatter over the store's triples (suitable for graphs
    that fit the driver; use the N-Triples text sink for bulk export)."""
    triples = store.get_all_triples()
    if not pretty:
        for t in triples:
            writer.write(f"{t.subject} {t.predicate} {t.object} .\n")
        return

    uri = store.get_uri()
    # Base prefix map (memory_store.go:249-255)
    prefix_map: dict[str, str] = {"": uri + "#", **vocab.BASE_PREFIXES}
    # One prefix per owl:imports target (memory_store.go:257-270)
    for t in store.get_all_matches(
        mk_resource(uri), mk_resource(vocab.OWL_IMPORTS), ""
    ):
        import_uri = term_value(t.object)
        abbr = import_uri[import_uri.rfind("/") + 1 :]
        prefix_map[abbr] = import_uri + "#"

    content = "".join(
        f"{t.subject} {t.predicate} {t.object} ." for t in triples
    )
    header = ""
    for abbr, prefix in prefix_map.items():
        header += f"@prefix {abbr}: <{prefix}> .\n"
        content = re.sub(
            rf"\<{re.escape(prefix)}(.+?)\>", rf"{abbr}:\1", content
        )
    content = content.replace(" .", " .\n\n")
    writer.write(f"{header}@base <{uri}> .\n\n{content}")


_TOKEN_RE = re.compile(
    r"""
      (?P<iri><[^>]*>)
    | (?P<literal>"[^"]*"(?:@[A-Za-z0-9-]+)?(?:\^\^<[^>]*>|\^\^(?:[A-Za-z_][\w.-]*)?:[\w.-]+)?)
    | (?P<punct>[;,.])
    | (?P<a>\ba\b)
    | (?P<pname>[A-Za-z_][\w.-]*:[\w.-]*|:[\w.-]+)
    """,
    re.VERBOSE,
)


def parse_turtle(text: str) -> tuple[str, list[tuple[str, str, str]]]:
    """Parse TTL text into (base_uri, triples-as-encoded-terms).

    Base URI resolution mirrors ParseFromTurtle (memory_store.go:32-60):
    the subject of the ``?x rdf:type owl:Ontology`` triple wins, else the
    subject of the first triple; empty input is an error.
    """
    prefixes: dict[str, str] = {}
    triples: list[tuple[str, str, str]] = []

    def expand(tok: str) -> str:
        if tok.startswith("<"):
            return tok
        if tok.startswith('"'):
            # normalize prefixed datatype if present
            m = re.match(r'^("[^"]*"(?:@[A-Za-z0-9-]+)?)\^\^(.+)$', tok)
            if m and not m.group(2).startswith("<"):
                p, local = m.group(2).split(":", 1)
                return f"{m.group(1)}^^<{prefixes.get(p, '')}{local}>"
            return tok
        if tok == "a":
            return mk_resource(vocab.RDF_TYPE)
        p, local = tok.split(":", 1)
        return mk_resource(prefixes.get(p, "") + local)

    # statements are separated by '.' at top level; directives handled inline
    for raw_line in text.splitlines():
        line = raw_line.strip()
        if not line or line.startswith("#"):
            continue
        d = re.match(r"^@prefix\s+([\w.-]*):\s*<([^>]*)>\s*\.\s*$", line)
        if d:
            prefixes[d.group(1)] = d.group(2)
            continue
        if re.match(r"^@base\s+<[^>]*>\s*\.\s*$", line):
            continue
        tokens = [m.group(0) for m in _TOKEN_RE.finditer(line)]
        if not tokens:
            continue
        # statement: subj pred obj (',' obj)* (';' pred obj (',' obj)*)* '.'
        subj = None
        pred = None
        i = 0
        while i < len(tokens):
            tok = tokens[i]
            if tok == ".":
                subj, pred = None, None
                i += 1
                continue
            if tok == ";":
                pred = None
                i += 1
                continue
            if tok == ",":
                i += 1
                continue
            if subj is None:
                subj = expand(tok)
            elif pred is None:
                pred = expand(tok)
            else:
                triples.append((subj, pred, expand(tok)))
            i += 1

    if not triples:
        raise ValueError("No triple found in reader data")

    marker_obj = mk_resource(vocab.OWL_ONTOLOGY)
    marker_pred = mk_resource(vocab.RDF_TYPE)
    base = None
    for s, p, o in triples:
        if p == marker_pred and o == marker_obj:
            base = term_value(s)
            break
    if base is None:
        base = term_value(triples[0][0])
    return base, triples
