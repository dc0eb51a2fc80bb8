"""SPARQL 1.1 query-result wire formats.

The reference's client decodes exactly one wire shape — the SPARQL-JSON
``head/results/bindings`` document Blazegraph returns
(blazegraph_endpoint.go:265-284). This module is the *server* half a
Spark deployment needs: it serializes the in-process endpoint's result
dict (:meth:`LocalSparqlEndpoint.query`, already SPARQL-JSON shaped) to
the four standard formats, so any SPARQL client — the reference's, or
curl with an ``Accept`` header — can consume the engine's answers:

* ``application/sparql-results+json`` (SPARQL 1.1 Query Results JSON)
* ``application/sparql-results+xml``  (SPARQL Query Results XML)
* ``text/csv``  (SPARQL 1.1 Query Results CSV: plain lexical forms,
  RFC 4180 quoting — lossy by spec: term kind and datatype are dropped)
* ``text/tab-separated-values`` (TSV: full term syntax — IRIs in
  ``<>``, literals quoted with language/datatype tags — lossless)

Everything here is driver-side formatting of an already-collected
result (the endpoint's compatibility path); bulk exports go through the
distributed N-Triples/JSONL sinks instead.
"""

from __future__ import annotations

import json
from xml.sax.saxutils import escape, quoteattr

#: media type → serializer name, for content negotiation
MEDIA_TYPES = {
    "application/sparql-results+json": "json",
    "application/json": "json",
    "application/sparql-results+xml": "xml",
    "text/csv": "csv",
    "text/tab-separated-values": "tsv",
}


def serialize_results(result: dict, media_type: str) -> str:
    """Serialize an endpoint result dict per the requested media type
    (content negotiation). Unknown types raise ``ValueError`` — an HTTP
    wrapper would turn that into 406 Not Acceptable."""
    kind = MEDIA_TYPES.get(media_type.split(";")[0].strip().lower())
    if kind is None:
        raise ValueError(f"unsupported result media type: {media_type}")
    return {
        "json": results_json,
        "xml": results_xml,
        "csv": results_csv,
        "tsv": results_tsv,
    }[kind](result)


def results_json(result: dict) -> str:
    """SPARQL 1.1 Query Results JSON — the endpoint dict is already the
    right shape (head/vars + results/bindings, or boolean for ASK);
    this pins the canonical field order and UTF-8-friendly encoding."""
    if "boolean" in result:
        doc: dict = {"head": {}, "boolean": bool(result["boolean"])}
    else:
        doc = {
            "head": {"vars": list(result["head"]["vars"])},
            "results": {"bindings": result["results"]["bindings"]},
        }
    return json.dumps(doc, ensure_ascii=False)


def results_xml(result: dict) -> str:
    """SPARQL Query Results XML Format (Second Edition)."""
    out = ['<?xml version="1.0"?>']
    out.append('<sparql xmlns="http://www.w3.org/2005/sparql-results#">')
    if "boolean" in result:
        out.append("<head/>")
        out.append(f"<boolean>{'true' if result['boolean'] else 'false'}</boolean>")
        out.append("</sparql>")
        return "".join(out)
    vars_ = list(result["head"]["vars"])
    out.append("<head>")
    for v in vars_:
        out.append(f"<variable name={quoteattr(v)}/>")
    out.append("</head><results>")
    for b in result["results"]["bindings"]:
        out.append("<result>")
        for v in vars_:
            cell = b.get(v)
            if cell is None:
                continue
            out.append(f"<binding name={quoteattr(v)}>")
            val = escape(str(cell.get("value", "")))
            if cell.get("type") == "uri":
                out.append(f"<uri>{val}</uri>")
            elif "xml:lang" in cell:
                out.append(
                    f"<literal xml:lang={quoteattr(cell['xml:lang'])}>{val}</literal>"
                )
            elif "datatype" in cell:
                out.append(
                    f"<literal datatype={quoteattr(cell['datatype'])}>{val}</literal>"
                )
            else:
                out.append(f"<literal>{val}</literal>")
            out.append("</binding>")
        out.append("</result>")
    out.append("</results></sparql>")
    return "".join(out)


def _csv_cell(cell: dict | None) -> str:
    if cell is None:
        return ""
    v = str(cell.get("value", ""))
    if any(c in v for c in (",", '"', "\n", "\r")):
        return '"' + v.replace('"', '""') + '"'
    return v


def results_csv(result: dict) -> str:
    """SPARQL 1.1 Query Results CSV: header row of variable names, one
    row per solution, plain lexical forms (term kind dropped, by spec),
    RFC 4180 quoting, CRLF line ends."""
    if "boolean" in result:
        return f"boolean\r\n{'true' if result['boolean'] else 'false'}\r\n"
    vars_ = list(result["head"]["vars"])
    lines = [",".join(vars_)]
    for b in result["results"]["bindings"]:
        lines.append(",".join(_csv_cell(b.get(v)) for v in vars_))
    return "\r\n".join(lines) + "\r\n"


def _tsv_term(cell: dict | None) -> str:
    if cell is None:
        return ""
    v = str(cell.get("value", ""))
    if cell.get("type") == "uri":
        return f"<{v}>"
    # literal: escape per Turtle string rules, re-attach tags
    lex = (
        v.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )
    if "xml:lang" in cell:
        return f'"{lex}"@{cell["xml:lang"]}'
    if "datatype" in cell:
        return f'"{lex}"^^<{cell["datatype"]}>'
    return f'"{lex}"'


def results_tsv(result: dict) -> str:
    """SPARQL 1.1 Query Results TSV: ``?var`` header, full term syntax
    per cell — lossless (the round-trippable text format)."""
    if "boolean" in result:
        return f"?boolean\n{'true' if result['boolean'] else 'false'}\n"
    vars_ = list(result["head"]["vars"])
    lines = ["\t".join(f"?{v}" for v in vars_)]
    for b in result["results"]["bindings"]:
        lines.append("\t".join(_tsv_term(b.get(v)) for v in vars_))
    return "\n".join(lines) + "\n"
