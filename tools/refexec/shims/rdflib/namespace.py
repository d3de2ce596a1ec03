"""rdflib.namespace stand-in: Namespace + the four bound vocabularies the
reference imports (RDF, RDFS, SKOS, XSD)."""

from __future__ import annotations

from . import URIRef


class Namespace(str):
    __slots__ = ()

    def term(self, name):
        return URIRef(str(self) + name)

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return URIRef(str(self) + name)

    # str methods that collide with vocabulary terms. Real rdflib defines
    # `title` as a property for exactly this reason (rdflib/namespace/
    # __init__.py); the reference relies on it via ns.BF.title.
    @property
    def title(self):
        return URIRef(str(self) + "title")

    def __getitem__(self, name):
        if isinstance(name, (int, slice)):
            return str.__getitem__(self, name)
        return URIRef(str(self) + name)


RDF = Namespace("http://www.w3.org/1999/02/22-rdf-syntax-ns#")
RDFS = Namespace("http://www.w3.org/2000/01/rdf-schema#")
SKOS = Namespace("http://www.w3.org/2004/02/skos/core#")
XSD = Namespace("http://www.w3.org/2001/XMLSchema#")
OWL = Namespace("http://www.w3.org/2002/07/owl#")
DC = Namespace("http://purl.org/dc/elements/1.1/")
DCTERMS = Namespace("http://purl.org/dc/terms/")
FOAF = Namespace("http://xmlns.com/foaf/0.1/")
