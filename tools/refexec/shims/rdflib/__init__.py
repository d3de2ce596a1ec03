"""Minimal offline rdflib stand-in for executing the reference converter
(/root/reference/convert_starxml_to_bf.py) in this sandbox, where rdflib
is not installed. Implements ONLY the surface that converter + modules/
use (verified by grep): URIRef, Literal(lang=/datatype=), BNode, Graph
with add/set/remove/value/objects/subjects/triples/bind/serialize/
__contains__/__len__, and rdflib.namespace's Namespace/RDF/RDFS/SKOS/XSD.

Semantics follow public rdflib behavior:
- Graph is a set of (s, p, o) term triples (duplicate add() is a no-op).
- Graph.set((s, p, o)) removes every (s, p, *) first.
- Literal equality/identity includes language tag and datatype; a plain
  Literal compares equal to its lexical string, but no Literal ever
  equals a URIRef (and vice versa), even with the same lexical form.
- Literal datatype is inferred from the Python value type (int →
  xsd:integer, bool → xsd:boolean, float → xsd:double, date → xsd:date)
  when no explicit datatype is given, as rdflib does.
- serialize() writes a sortable TSV dump (subj, pred, obj, kind, lang,
  dtype) regardless of the requested format — the runner only needs the
  triple set, not real Turtle.
"""

from __future__ import annotations

import datetime as _dt
import itertools as _it
import threading as _threading

_XSD = "http://www.w3.org/2001/XMLSchema#"


class URIRef(str):
    __slots__ = ()

    def __eq__(self, other):
        if isinstance(other, Literal):
            return False
        if isinstance(other, str):
            return str.__eq__(self, other)
        return NotImplemented

    def __ne__(self, other):
        r = self.__eq__(other)
        return NotImplemented if r is NotImplemented else not r

    __hash__ = str.__hash__

    def __add__(self, other):
        return URIRef(str.__add__(self, other))

    def __repr__(self):
        return f"URIRef({str.__repr__(self)})"


_bnode_counter = _it.count()
_bnode_lock = _threading.Lock()


class BNode(str):
    __slots__ = ()

    def __new__(cls):
        with _bnode_lock:
            n = next(_bnode_counter)
        return str.__new__(cls, f"_:b{n}")

    def __repr__(self):
        return f"BNode({str.__repr__(self)})"


def _infer_datatype(value):
    if isinstance(value, bool):
        return URIRef(_XSD + "boolean")
    if isinstance(value, int):
        return URIRef(_XSD + "integer")
    if isinstance(value, float):
        return URIRef(_XSD + "double")
    if isinstance(value, _dt.datetime):
        return URIRef(_XSD + "dateTime")
    if isinstance(value, _dt.date):
        return URIRef(_XSD + "date")
    return None


def _lexical(value):
    if isinstance(value, bool):
        return "true" if value else "false"
    return str(value)


class Literal(str):
    __slots__ = ("language", "datatype")

    def __new__(cls, value, lang=None, datatype=None, normalize=None):
        self = str.__new__(cls, _lexical(value))
        if lang is not None and datatype is not None:
            raise TypeError("Literal can have a language or a datatype, not both")
        self.language = lang
        self.datatype = (
            URIRef(datatype)
            if datatype is not None
            else (None if lang is not None else _infer_datatype(value))
        )
        return self

    def __eq__(self, other):
        if isinstance(other, Literal):
            return (
                str.__eq__(self, other)
                and self.language == other.language
                and self.datatype == other.datatype
            )
        if isinstance(other, (URIRef, BNode)):
            return False
        if isinstance(other, str):
            return str.__eq__(self, other)
        return NotImplemented

    def __ne__(self, other):
        r = self.__eq__(other)
        return NotImplemented if r is NotImplemented else not r

    def __hash__(self):
        if self.language is None and self.datatype is None:
            return str.__hash__(self)
        return hash((str(self), self.language, self.datatype))

    def __repr__(self):
        return (
            f"Literal({str.__repr__(self)}, lang={self.language!r}, "
            f"datatype={self.datatype!r})"
        )


class Graph:
    def __init__(self, *args, **kwargs):
        self._triples: set = set()
        self._spo: dict = {}  # (s, p) -> list of o, insertion order
        self._lock = _threading.RLock()

    def __len__(self):
        return len(self._triples)

    def __iter__(self):
        return iter(list(self._triples))

    def __contains__(self, triple):
        s, p, o = triple
        if s is None or p is None or o is None:
            return any(True for _ in self.triples(triple))
        return (s, p, o) in self._triples

    def add(self, triple):
        s, p, o = triple
        with self._lock:
            if (s, p, o) not in self._triples:
                self._triples.add((s, p, o))
                self._spo.setdefault((s, p), []).append(o)
        return self

    def set(self, triple):
        s, p, o = triple
        with self._lock:
            for old in self._spo.pop((s, p), []):
                self._triples.discard((s, p, old))
            self.add(triple)
        return self

    def remove(self, triple):
        s, p, o = triple
        with self._lock:
            for t in [
                t
                for t in self._triples
                if (s is None or t[0] == s)
                and (p is None or t[1] == p)
                and (o is None or t[2] == o)
            ]:
                self._triples.discard(t)
                objs = self._spo.get((t[0], t[1]))
                if objs is not None:
                    objs[:] = [x for x in objs if not (x == t[2])]
        return self

    def triples(self, pattern):
        s, p, o = pattern
        with self._lock:
            if s is not None and p is not None:
                for obj in list(self._spo.get((s, p), [])):
                    if o is None or obj == o:
                        yield (s, p, obj)
                return
            for t in list(self._triples):
                if (
                    (s is None or t[0] == s)
                    and (p is None or t[1] == p)
                    and (o is None or t[2] == o)
                ):
                    yield t

    def objects(self, subject=None, predicate=None):
        for _, _, o in self.triples((subject, predicate, None)):
            yield o

    def subjects(self, predicate=None, object=None):
        for s, _, _ in self.triples((None, predicate, object)):
            yield s

    def value(self, subject=None, predicate=None, object=None, default=None, any=True):
        if subject is not None and predicate is not None:
            objs = self._spo.get((subject, predicate))
            return objs[0] if objs else default
        if subject is not None:  # find predicate... not used by the reference
            for _, p, o in self.triples((subject, None, object)):
                return p if object is not None else o
            return default
        if predicate is not None and object is not None:
            for s in self.subjects(predicate, object):
                return s
            return default
        return default

    def bind(self, *args, **kwargs):
        return self

    def parse(self, source, format="turtle", **kwargs):
        """Load a Turtle file (the reference parses ttl-data/kerndaten.ttl
        at import). Uses the engine's standalone Turtle reader purely as
        file I/O — term semantics stay in this shim."""
        import os as _os
        import sys as _sys

        repo = _os.path.dirname(  # …/tools/refexec/shims/rdflib → repo root
            _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
        )
        if repo not in _sys.path:
            _sys.path.append(repo)
        from psyndex2linkeddata_spark.sources.turtle import parse_turtle

        with open(source, encoding="utf-8") as f:
            text = f.read()
        def _node(term):
            return str.__new__(BNode, term) if term.startswith("_:") else URIRef(term)

        for s, p, o, is_iri, lang, dtype in parse_turtle(text):
            obj = _node(o) if is_iri else Literal(o, lang=lang, datatype=dtype)
            self.add((_node(s), URIRef(p), obj))
        return self

    def serialize(self, destination=None, format="turtle", **kwargs):
        """TSV dump of the triple set (the runner's capture format)."""
        lines = []
        for s, p, o in sorted(self._triples, key=lambda t: (str(t[0]), str(t[1]), str(t[2]))):
            if isinstance(o, Literal):
                kind = "lit"
                lang = o.language or ""
                dtype = o.datatype or ""
            elif isinstance(o, BNode):
                kind, lang, dtype = "bnode", "", ""
            else:
                kind, lang, dtype = "iri", "", ""
            row = [str(s), str(p), str(o), kind, lang, dtype]
            lines.append(
                "\t".join(
                    c.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n").replace("\r", "\\r")
                    for c in row
                )
            )
        text = "\n".join(lines) + "\n"
        if destination is None:
            return text
        with open(str(destination) + ".tsv" if not str(destination).endswith(".tsv") else str(destination), "w", encoding="utf-8") as f:
            f.write(text)
        return None


# re-exports matching `from rdflib import OWL, RDF, RDFS, SKOS, ...`
from .namespace import OWL, RDF, RDFS, SKOS, XSD, Namespace  # noqa: E402,F401
