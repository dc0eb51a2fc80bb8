"""Quad-table derivation from the TPC-H-ish testdata tables.

Used by the driver correctness gate (``__spark_entry__.py``): a quad table
``(subj, pred, obj, graph)`` is derived *deterministically* from the
region/nation/supplier/customer parquet tables, by the same entity rules
the KG pipeline uses (NamedIndividual marker + class triple + edges +
typed literals — §2.3 of SURVEY.md).

Two twins of one derivation spec:

* :func:`quads_df` — the Spark plan (Column expressions);
* :data:`QUADS_SQL_CTE` — the ANSI-SQL CTE DuckDB runs on the same
  parquet views.

Both must yield byte-identical rows — every oracle query in the driver
contract builds on this CTE, so any drift fails the hash comparison.
Literal encodings follow the reference: plain ``"label"`` literals for
names, ``%f``-formatted ``xsd:decimal`` for account balances
(ontology_literal.go:87-92 — 6 fixed decimals in both engines via
``format_string``/``printf``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ontograph_spark import vocab

G = "urn:tpch"

_RDF_TYPE = f"<{vocab.RDF_TYPE}>"
_NAMED = f"<{vocab.OWL_NAMED_INDIVIDUAL}>"
_LABEL = f"<{vocab.RDFS_LABEL}>"
_XSD_DECIMAL = vocab.XSD_DECIMAL


def _ent(kind: str, key) -> F.Column:
    return F.concat(F.lit(f"<{G}#{kind}-"), key.cast("string"), F.lit(">"))


def _plain_lit(c) -> F.Column:
    return F.concat(F.lit('"'), c, F.lit('"'))


def _decimal_lit(c) -> F.Column:
    return F.concat(
        F.lit('"'),
        F.format_string("%f", c.cast("double")),
        F.lit(f'"^^<{_XSD_DECIMAL}>'),
    )


def _explode_triples(df: DataFrame, triples) -> DataFrame:
    arr = F.array(
        *[
            F.struct(s.alias("subj"), F.lit(p).alias("pred"), o.alias("obj"))
            for s, p, o in triples
        ]
    )
    return df.select(F.explode(arr).alias("t")).select(
        "t.subj", "t.pred", "t.obj", F.lit(G).alias("graph")
    )


def quads_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")

    r = _explode_triples(
        region,
        [
            (_ent("region", F.col("r_regionkey")), _RDF_TYPE, F.lit(_NAMED)),
            (
                _ent("region", F.col("r_regionkey")),
                _RDF_TYPE,
                F.lit(f"<{G}#Region>"),
            ),
            (_ent("region", F.col("r_regionkey")), _LABEL, _plain_lit(F.col("r_name"))),
        ],
    )
    n = _explode_triples(
        nation,
        [
            (_ent("nation", F.col("n_nationkey")), _RDF_TYPE, F.lit(_NAMED)),
            (
                _ent("nation", F.col("n_nationkey")),
                _RDF_TYPE,
                F.lit(f"<{G}#Nation>"),
            ),
            (
                _ent("nation", F.col("n_nationkey")),
                f"<{G}#locatedIn>",
                _ent("region", F.col("n_regionkey")),
            ),
            (_ent("nation", F.col("n_nationkey")), _LABEL, _plain_lit(F.col("n_name"))),
        ],
    )
    s = _explode_triples(
        supplier,
        [
            (_ent("supplier", F.col("s_suppkey")), _RDF_TYPE, F.lit(_NAMED)),
            (
                _ent("supplier", F.col("s_suppkey")),
                _RDF_TYPE,
                F.lit(f"<{G}#Supplier>"),
            ),
            (
                _ent("supplier", F.col("s_suppkey")),
                f"<{G}#inNation>",
                _ent("nation", F.col("s_nationkey")),
            ),
            (_ent("supplier", F.col("s_suppkey")), _LABEL, _plain_lit(F.col("s_name"))),
            (
                _ent("supplier", F.col("s_suppkey")),
                f"<{G}#acctBal>",
                _decimal_lit(F.col("s_acctbal")),
            ),
        ],
    )
    c = _explode_triples(
        customer,
        [
            (_ent("customer", F.col("c_custkey")), _RDF_TYPE, F.lit(_NAMED)),
            (
                _ent("customer", F.col("c_custkey")),
                _RDF_TYPE,
                F.lit(f"<{G}#Customer>"),
            ),
            (
                _ent("customer", F.col("c_custkey")),
                f"<{G}#inNation>",
                _ent("nation", F.col("c_nationkey")),
            ),
            (_ent("customer", F.col("c_custkey")), _LABEL, _plain_lit(F.col("c_name"))),
            (
                _ent("customer", F.col("c_custkey")),
                f"<{G}#acctBal>",
                _decimal_lit(F.col("c_acctbal")),
            ),
            (
                _ent("customer", F.col("c_custkey")),
                f"<{G}#mktSegment>",
                _plain_lit(F.col("c_mktsegment")),
            ),
        ],
    )
    return r.unionByName(n).unionByName(s).unionByName(c)


#: DuckDB mirror of :func:`quads_df` — the driver pre-registers the parquet
#: tables as views named region/nation/supplier/customer.
QUADS_SQL_CTE = f"""
quads AS (
  SELECT '<{G}#region-' || CAST(r_regionkey AS VARCHAR) || '>' AS subj,
         '{_RDF_TYPE}' AS pred, '{_NAMED}' AS obj, '{G}' AS graph FROM region
  UNION ALL
  SELECT '<{G}#region-' || CAST(r_regionkey AS VARCHAR) || '>',
         '{_RDF_TYPE}', '<{G}#Region>', '{G}' FROM region
  UNION ALL
  SELECT '<{G}#region-' || CAST(r_regionkey AS VARCHAR) || '>',
         '{_LABEL}', '"' || r_name || '"', '{G}' FROM region
  UNION ALL
  SELECT '<{G}#nation-' || CAST(n_nationkey AS VARCHAR) || '>',
         '{_RDF_TYPE}', '{_NAMED}', '{G}' FROM nation
  UNION ALL
  SELECT '<{G}#nation-' || CAST(n_nationkey AS VARCHAR) || '>',
         '{_RDF_TYPE}', '<{G}#Nation>', '{G}' FROM nation
  UNION ALL
  SELECT '<{G}#nation-' || CAST(n_nationkey AS VARCHAR) || '>',
         '<{G}#locatedIn>',
         '<{G}#region-' || CAST(n_regionkey AS VARCHAR) || '>', '{G}' FROM nation
  UNION ALL
  SELECT '<{G}#nation-' || CAST(n_nationkey AS VARCHAR) || '>',
         '{_LABEL}', '"' || n_name || '"', '{G}' FROM nation
  UNION ALL
  SELECT '<{G}#supplier-' || CAST(s_suppkey AS VARCHAR) || '>',
         '{_RDF_TYPE}', '{_NAMED}', '{G}' FROM supplier
  UNION ALL
  SELECT '<{G}#supplier-' || CAST(s_suppkey AS VARCHAR) || '>',
         '{_RDF_TYPE}', '<{G}#Supplier>', '{G}' FROM supplier
  UNION ALL
  SELECT '<{G}#supplier-' || CAST(s_suppkey AS VARCHAR) || '>',
         '<{G}#inNation>',
         '<{G}#nation-' || CAST(s_nationkey AS VARCHAR) || '>', '{G}' FROM supplier
  UNION ALL
  SELECT '<{G}#supplier-' || CAST(s_suppkey AS VARCHAR) || '>',
         '{_LABEL}', '"' || s_name || '"', '{G}' FROM supplier
  UNION ALL
  SELECT '<{G}#supplier-' || CAST(s_suppkey AS VARCHAR) || '>',
         '<{G}#acctBal>',
         '"' || printf('%f', CAST(s_acctbal AS DOUBLE)) || '"^^<{_XSD_DECIMAL}>',
         '{G}' FROM supplier
  UNION ALL
  SELECT '<{G}#customer-' || CAST(c_custkey AS VARCHAR) || '>',
         '{_RDF_TYPE}', '{_NAMED}', '{G}' FROM customer
  UNION ALL
  SELECT '<{G}#customer-' || CAST(c_custkey AS VARCHAR) || '>',
         '{_RDF_TYPE}', '<{G}#Customer>', '{G}' FROM customer
  UNION ALL
  SELECT '<{G}#customer-' || CAST(c_custkey AS VARCHAR) || '>',
         '<{G}#inNation>',
         '<{G}#nation-' || CAST(c_nationkey AS VARCHAR) || '>', '{G}' FROM customer
  UNION ALL
  SELECT '<{G}#customer-' || CAST(c_custkey AS VARCHAR) || '>',
         '{_LABEL}', '"' || c_name || '"', '{G}' FROM customer
  UNION ALL
  SELECT '<{G}#customer-' || CAST(c_custkey AS VARCHAR) || '>',
         '<{G}#acctBal>',
         '"' || printf('%f', CAST(c_acctbal AS DOUBLE)) || '"^^<{_XSD_DECIMAL}>',
         '{G}' FROM customer
  UNION ALL
  SELECT '<{G}#customer-' || CAST(c_custkey AS VARCHAR) || '>',
         '<{G}#mktSegment>', '"' || c_mktsegment || '"', '{G}' FROM customer
)
"""
