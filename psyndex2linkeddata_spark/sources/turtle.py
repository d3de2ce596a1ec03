"""Turtle (TTL) source: parse RDF Turtle documents into triple rows.

Covers the Turtle subset that rdflib's `turtle` serializer emits (the
reference's output format, convert_starxml_to_bf.py:1555): @prefix
directives, IRIs, prefixed names, `a`, `;` / `,` predicate-object lists,
string literals with escapes / @lang / ^^datatype, numeric + boolean
literals, and anonymous blank nodes `[ ... ]`. Collections `( .. )` are
not emitted by rdflib for this data and raise.

Pure Python by design: TTL ingestion is a one-time authority/golden load
(S5 in the survey — the reference reads vocab skosmos dumps and its own
golden files), never the per-page hot path. `read_turtle` wraps the
parser in a Spark createDataFrame with the engine's triples schema.
"""

from __future__ import annotations

from psyndex2linkeddata_spark.schema import triples_schema

_WS = " \t\r\n"
_PN_END = " \t\r\n;,.)]"

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_ESCAPES = {
    't': '\t', 'b': '\b', 'n': '\n', 'r': '\r', 'f': '\f',
    '"': '"', "'": "'", '\\': '\\',
}


class TurtleParseError(ValueError):
    pass


class _Scanner:
    def __init__(self, text: str):
        self.s = text
        self.i = 0
        self.n = len(text)

    def skip_ws(self) -> None:
        while self.i < self.n:
            c = self.s[self.i]
            if c in _WS:
                self.i += 1
            elif c == "#":
                while self.i < self.n and self.s[self.i] != "\n":
                    self.i += 1
            else:
                return

    def peek(self) -> str:
        return self.s[self.i] if self.i < self.n else ""

    def expect(self, ch: str) -> None:
        if not self.s.startswith(ch, self.i):
            raise TurtleParseError(
                f"expected {ch!r} at {self.i}: ...{self.s[self.i:self.i+40]!r}"
            )
        self.i += len(ch)

    def read_iri(self) -> str:
        self.expect("<")
        j = self.s.index(">", self.i)
        iri = self.s[self.i : j]
        self.i = j + 1
        return iri

    def read_string(self) -> str:
        # long ("""...""") or short ("...") double/single-quoted
        for q in ('"""', "'''", '"', "'"):
            if self.s.startswith(q, self.i):
                self.i += len(q)
                out = []
                while True:
                    if self.i >= self.n:
                        raise TurtleParseError("unterminated string")
                    if self.s.startswith(q, self.i) and (
                        len(q) == 3 or self.s[self.i] == q
                    ):
                        if self.s.startswith(q, self.i):
                            self.i += len(q)
                            return "".join(out)
                    c = self.s[self.i]
                    if c == "\\":
                        e = self.s[self.i + 1]
                        if e in _ESCAPES:
                            out.append(_ESCAPES[e])
                            self.i += 2
                        elif e == "u":
                            out.append(chr(int(self.s[self.i + 2 : self.i + 6], 16)))
                            self.i += 6
                        elif e == "U":
                            out.append(chr(int(self.s[self.i + 2 : self.i + 10], 16)))
                            self.i += 10
                        else:
                            raise TurtleParseError(f"bad escape \\{e}")
                    else:
                        out.append(c)
                        self.i += 1
        raise TurtleParseError("not a string")

    def read_pname_or_keyword(self) -> str:
        # local parts may contain interior dots (licenses:CC_BY_4.0); a
        # trailing dot is the statement terminator, so scan over dots and
        # strip them from the end.
        j = self.i
        while j < self.n and (self.s[j] not in _PN_END or self.s[j] == "."):
            j += 1
        tok = self.s[self.i : j].rstrip(".")
        self.i = self.i + len(tok)
        return tok


class TurtleDoc:
    """Parsed Turtle document: .triples is a list of 6-tuples
    (subj, pred, obj, obj_is_iri, lang, dtype); blank nodes appear as
    '_:bN' subject/object strings (obj_is_iri=True)."""

    def __init__(self, text: str):
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.triples: list[tuple] = []
        self._bn = 0
        self._sc = _Scanner(text)
        self._parse_doc()

    # --- terms ------------------------------------------------------------
    def _new_bnode(self) -> str:
        self._bn += 1
        return f"_:b{self._bn}"

    def _expand(self, pname: str) -> str:
        if ":" not in pname:
            raise TurtleParseError(f"not a pname: {pname!r}")
        pfx, local = pname.split(":", 1)
        if pfx not in self.prefixes:
            raise TurtleParseError(f"unknown prefix {pfx!r}")
        # rdflib never emits %-escapes or \-escapes in locals for this data
        return self.prefixes[pfx] + local

    def _read_subject(self) -> str:
        sc = self._sc
        sc.skip_ws()
        c = sc.peek()
        if c == "<":
            return sc.read_iri()
        if c == "[":
            return self._read_bnode_props()
        tok = sc.read_pname_or_keyword()
        return self._expand(tok)

    def _read_bnode_props(self) -> str:
        sc = self._sc
        sc.expect("[")
        node = self._new_bnode()
        sc.skip_ws()
        if sc.peek() != "]":
            self._read_predicate_object_list(node)
            sc.skip_ws()
        sc.expect("]")
        return node

    def _read_object(self) -> tuple:
        """-> (obj, obj_is_iri, lang, dtype)"""
        sc = self._sc
        sc.skip_ws()
        c = sc.peek()
        if c == "<":
            return (sc.read_iri(), True, None, None)
        if c == "[":
            return (self._read_bnode_props(), True, None, None)
        if c == "(":
            raise TurtleParseError("collections not supported")
        if c in "\"'":
            val = sc.read_string()
            lang = dtype = None
            if sc.peek() == "@":
                sc.i += 1
                lang = self._read_langtag()
            elif self._sc.s.startswith("^^", sc.i):
                sc.i += 2
                if sc.peek() == "<":
                    dtype = sc.read_iri()
                else:
                    dtype = self._expand(sc.read_pname_or_keyword())
            return (val, False, lang, dtype)
        # numeric literal (bare token — '.' would confuse the pname reader)
        if c.isdigit() or c in "+-":
            import re

            # a decimal requires a digit AFTER the point — '5.' is the
            # integer 5 followed by the statement terminator — but the
            # DOUBLE production allows an empty fraction BEFORE an
            # exponent ('5.e3' is [0-9]+ '.' [0-9]* EXPONENT), so the
            # dot-with-exponent branch comes first
            m = re.match(
                r"[+-]?(?:\d+\.\d*[eE][+-]?\d+|\d+\.\d+(?:[eE][+-]?\d+)?"
                r"|\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+|\d+)",
                sc.s[sc.i :],
            )
            tok = m.group(0)
            sc.i += len(tok)
            if "e" in tok or "E" in tok:
                dt = "http://www.w3.org/2001/XMLSchema#double"
            elif "." in tok:
                dt = "http://www.w3.org/2001/XMLSchema#decimal"
            else:
                dt = "http://www.w3.org/2001/XMLSchema#integer"
            return (tok, False, None, dt)
        tok = sc.read_pname_or_keyword()
        if tok in ("true", "false"):
            return (tok, False, None,
                    "http://www.w3.org/2001/XMLSchema#boolean")
        return (self._expand(tok), True, None, None)

    def _read_langtag(self) -> str:
        sc = self._sc
        j = sc.i
        while j < sc.n and (sc.s[j].isalnum() or sc.s[j] == "-"):
            j += 1
        tag = sc.s[sc.i : j]
        sc.i = j
        return tag

    # --- grammar ----------------------------------------------------------
    def _read_predicate_object_list(self, subj: str) -> None:
        sc = self._sc
        while True:
            sc.skip_ws()
            c = sc.peek()
            if c == "<":
                pred = sc.read_iri()
            else:
                tok = sc.read_pname_or_keyword()
                pred = RDF_TYPE if tok == "a" else self._expand(tok)
            while True:
                obj, is_iri, lang, dtype = self._read_object()
                self.triples.append((subj, pred, obj, is_iri, lang, dtype))
                sc.skip_ws()
                if sc.peek() == ",":
                    sc.i += 1
                    continue
                break
            if sc.peek() == ";":
                sc.i += 1
                sc.skip_ws()
                # dangling ';' before '.' or ']'
                if sc.peek() in ".]":
                    return
                continue
            return

    def _parse_doc(self) -> None:
        sc = self._sc
        while True:
            sc.skip_ws()
            if sc.i >= sc.n:
                return
            if sc.s.startswith("@prefix", sc.i) or sc.s.startswith("PREFIX", sc.i):
                sc.i += 7 if sc.s.startswith("@prefix", sc.i) else 6
                sc.skip_ws()
                tok = sc.read_pname_or_keyword()
                if not tok.endswith(":"):
                    raise TurtleParseError(f"bad prefix decl {tok!r}")
                sc.skip_ws()
                iri = sc.read_iri()
                self.prefixes[tok[:-1]] = iri
                sc.skip_ws()
                if sc.peek() == ".":
                    sc.i += 1
                continue
            if sc.s.startswith("@base", sc.i) or sc.s.startswith("BASE", sc.i):
                sc.i += 5 if sc.s.startswith("@base", sc.i) else 4
                sc.skip_ws()
                self.base = sc.read_iri()
                sc.skip_ws()
                if sc.peek() == ".":
                    sc.i += 1
                continue
            subj = self._read_subject()
            sc.skip_ws()
            # '[ p o ] .' — a bnode subject whose whole statement was the
            # property list inside the brackets (rdflib emits this for
            # bnode subjects with no incoming references)
            if not (subj.startswith("_:") and sc.peek() == "."):
                self._read_predicate_object_list(subj)
                sc.skip_ws()
            sc.expect(".")


def parse_turtle(text: str) -> list[tuple]:
    """Turtle text → list of (subj, pred, obj, obj_is_iri, lang, dtype)."""
    return TurtleDoc(text).triples


def read_turtle(spark, path: str):
    """TTL file → triples DataFrame in the engine's schema (S5 source).

    Driver-side parse (authority/golden files are small); the DataFrame
    is the distributed handle downstream joins consume."""
    with open(path, encoding="utf-8") as f:
        rows = parse_turtle(f.read())
    return spark.createDataFrame(
        [tuple(r) for r in rows], schema=triples_schema()
    )
