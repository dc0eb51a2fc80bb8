"""Typed XSD literals.

Mirrors the reference literal layer (/root/reference/ontology_literal.go):
a ``GenericLiteral`` wraps an encoded literal term plus its datatype URI;
typed constructors format Python values exactly like the Go emitters so the
resulting term strings are byte-identical:

* integer — base-10 (``strconv.Itoa``, ontology_literal.go:79)
* decimal — fixed 6 decimals (``%f``, ontology_literal.go:90)
* boolean — ``true``/``false`` (ontology_literal.go:115)
* dateTime — RFC3339 with ``Z`` for UTC (ontology_literal.go:161)

Column-expression twins (``*_col``) produce the same encodings JVM-side for
bulk emission; they are golden-tested against the Python forms.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from ontograph_spark import terms, vocab
from ontograph_spark.errors import LiteralTypeMismatchError


@dataclass(frozen=True)
class GenericLiteral:
    """A literal term plus its (possibly empty) datatype URI."""

    term: str

    @property
    def datatype(self) -> str:
        return terms.term_datatype(self.term)

    @property
    def value(self) -> str:
        return terms.term_value(self.term)

    @property
    def language(self) -> str:
        return terms.term_language(self.term)

    def __str__(self) -> str:  # pragma: no cover - convenience
        return self.term

    # -- parse-back (ontology_literal.go:63-178) --------------------------

    def _require(self, datatype_uri: str) -> None:
        if self.datatype != datatype_uri:
            raise LiteralTypeMismatchError()

    def to_xsd_string(self) -> str:
        self._require(vocab.XSD_STRING)
        return self.value

    def to_xsd_integer(self) -> int:
        """Extension: the reference emits xsd:integer but ships no parser
        in v1 (README.md:127 vs ontology_literal.go:76-81)."""
        self._require(vocab.XSD_INTEGER)
        return int(self.value)

    def to_xsd_decimal(self) -> float:
        self._require(vocab.XSD_DECIMAL)
        return float(self.value)

    def to_xsd_boolean(self) -> bool:
        self._require(vocab.XSD_BOOLEAN)
        v = self.value
        # strconv.ParseBool's accepted forms
        if v in ("1", "t", "T", "TRUE", "true", "True"):
            return True
        if v in ("0", "f", "F", "FALSE", "false", "False"):
            return False
        raise ValueError(f"invalid boolean literal value {v!r}")

    def to_xsd_any_uri(self) -> str:
        self._require(vocab.XSD_ANY_URI)
        return self.value

    def to_xsd_datetime(self) -> _dt.datetime:
        self._require(vocab.XSD_DATETIME)
        v = self.value
        if v.endswith("Z"):
            v = v[:-1] + "+00:00"
        return _dt.datetime.fromisoformat(v)


def from_term(term: str) -> GenericLiteral:
    """Wrap an already-encoded literal term (NewGenericLiteral)."""
    return GenericLiteral(term)


# -- typed constructors (Python side) ------------------------------------


def xsd_string(value: str) -> GenericLiteral:
    return GenericLiteral(terms.mk_literal(value, "", vocab.XSD_STRING))


def xsd_integer(value: int) -> GenericLiteral:
    return GenericLiteral(terms.mk_literal(str(int(value)), "", vocab.XSD_INTEGER))


def format_decimal(value: float) -> str:
    """Fixed 6-decimal rendering, e.g. ``42.0 -> '42.000000'``."""
    return f"{float(value):f}"


def xsd_decimal(value: float) -> GenericLiteral:
    return GenericLiteral(
        terms.mk_literal(format_decimal(value), "", vocab.XSD_DECIMAL)
    )


def xsd_boolean(value: bool) -> GenericLiteral:
    return GenericLiteral(
        terms.mk_literal("true" if value else "false", "", vocab.XSD_BOOLEAN)
    )


def xsd_any_uri(value: str) -> GenericLiteral:
    return GenericLiteral(terms.mk_literal(value, "", vocab.XSD_ANY_URI))


def format_rfc3339(value: _dt.datetime) -> str:
    """RFC3339 at seconds precision; UTC renders as ``Z``."""
    s = value.isoformat(timespec="seconds")
    if s.endswith("+00:00"):
        s = s[:-6] + "Z"
    return s


def xsd_datetime(value: _dt.datetime) -> GenericLiteral:
    return GenericLiteral(
        terms.mk_literal(format_rfc3339(value), "", vocab.XSD_DATETIME)
    )


# -- Column-expression twins (bulk emission, JVM-side) --------------------


def xsd_string_col(c: Column) -> Column:
    return terms.literal_term(c, None, vocab.XSD_STRING)


def xsd_integer_col(c: Column) -> Column:
    return terms.literal_term(
        c.cast("long").cast("string"), None, vocab.XSD_INTEGER
    )


def xsd_decimal_col(c: Column) -> Column:
    return terms.literal_term(
        F.format_string("%f", c.cast("double")), None, vocab.XSD_DECIMAL
    )


def xsd_boolean_col(c: Column) -> Column:
    return terms.literal_term(
        F.when(c, "true").otherwise("false"), None, vocab.XSD_BOOLEAN
    )


def xsd_any_uri_col(c: Column) -> Column:
    return terms.literal_term(c, None, vocab.XSD_ANY_URI)


def xsd_datetime_col(c: Column) -> Column:
    return terms.literal_term(
        F.date_format(c, "yyyy-MM-dd'T'HH:mm:ssXXX"), None, vocab.XSD_DATETIME
    )
