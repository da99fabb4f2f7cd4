"""Minimal RDF/XML reader for embedded ``rdf:RDF`` subtrees.

The reference delegates to RDF::Trine::Parser::rdfxml
(lib/RDF/RDFa/Parser.pm:722-760); we implement the RDF/XML subset
that occurs embedded in web pages: node elements (rdf:Description and
typed nodes), rdf:about/rdf:ID/rdf:nodeID, property elements with
rdf:resource/rdf:nodeID/rdf:datatype, parseType Resource/Literal/
Collection, property attributes, rdf:li, xml:lang and xml:base
inheritance.  Bnode labels returned here are raw ``_:name``; the
caller remaps them through the document's allocator
(Parser.pm:722-728).
"""

from __future__ import annotations

from dataclasses import dataclass

from .c14n import element_to_xml
from .dom import Element
from .uri import resolve

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"
RDF_XMLLIT = RDF_NS + "XMLLiteral"

_SYNTAX_ATTRS = {"about", "ID", "nodeID", "resource", "datatype",
                 "parseType", "RDF", "li"}


@dataclass(frozen=True)
class RTriple:
    subj: str
    pred: str
    obj: str
    is_literal: bool = False
    datatype: str | None = None
    lang: str | None = None


class _RdfXml:
    def __init__(self, base: str, lang: str | None):
        self.base = base
        self.lang = lang
        self.out: list[RTriple] = []
        self.counter = 0
        self.li_counters: dict[int, int] = {}

    def bnode(self) -> str:
        self.counter += 1
        return f"_:rx{self.counter}"

    # -- helpers -------------------------------------------------------
    @staticmethod
    def _rdf_attr(el: Element, name: str) -> str | None:
        for raw, val in el.attrs.items():
            if ":" not in raw:
                continue
            pfx, local = raw.split(":", 1)
            if local == name and el.nsmap().get(pfx) == RDF_NS:
                return val
        return None

    @staticmethod
    def _qname_uri(el: Element) -> str | None:
        ns = el.namespace_uri
        if ns is None:
            return None
        return ns + el.localname

    def _ctx(self, el: Element, base: str, lang: str | None):
        xb = el.attrs.get("xml:base")
        if xb is not None:
            base = resolve(xb.split("#", 1)[0], base)
        xl = el.attrs.get("xml:lang")
        if xl is not None:
            lang = xl or None
        return base, lang

    # -- node elements ---------------------------------------------------
    def node_element(self, el: Element, base: str, lang: str | None) -> str:
        base, lang = self._ctx(el, base, lang)
        about = self._rdf_attr(el, "about")
        node_id = self._rdf_attr(el, "nodeID")
        rid = self._rdf_attr(el, "ID")
        if about is not None:
            subj = resolve(about, base)
        elif node_id is not None:
            subj = "_:" + node_id
        elif rid is not None:
            subj = resolve("#" + rid, base)
        else:
            subj = self.bnode()

        uri = self._qname_uri(el)
        if uri is not None and uri != RDF_NS + "Description":
            self.out.append(RTriple(subj, RDF_TYPE, uri))

        # property attributes
        for raw, val in el.attrs.items():
            if raw.startswith("xmlns") or raw.startswith("xml:"):
                continue
            if ":" in raw:
                pfx, local = raw.split(":", 1)
                ns = el.nsmap().get(pfx)
                if ns is None:
                    continue
                if ns == RDF_NS:
                    # rdf:type as a property attribute is a resource
                    # triple (RDF/XML §2.13), not a literal.
                    if local == "type":
                        self.out.append(
                            RTriple(subj, RDF_TYPE, resolve(val, base)))
                        continue
                    if local in _SYNTAX_ATTRS:
                        continue
                self.out.append(RTriple(subj, ns + local, val,
                                        is_literal=True, lang=lang))

        for child in el.child_elements():
            self.property_element(subj, child, base, lang)
        return subj

    # -- property elements -------------------------------------------------
    def property_element(self, subj: str, el: Element, base: str,
                         lang: str | None):
        base, lang = self._ctx(el, base, lang)
        pred = self._qname_uri(el)
        if pred is None:
            return
        if pred == RDF_NS + "li":
            n = self.li_counters.get(id(el.parent), 0) + 1
            self.li_counters[id(el.parent)] = n
            pred = f"{RDF_NS}_{n}"

        resource = self._rdf_attr(el, "resource")
        node_id = self._rdf_attr(el, "nodeID")
        datatype = self._rdf_attr(el, "datatype")
        parse_type = self._rdf_attr(el, "parseType")

        if resource is not None:
            self.out.append(RTriple(subj, pred, resolve(resource, base)))
            return
        if node_id is not None:
            self.out.append(RTriple(subj, pred, "_:" + node_id))
            return
        if parse_type == "Literal":
            self.out.append(RTriple(subj, pred, element_to_xml(el, None),
                                    is_literal=True, datatype=RDF_XMLLIT))
            return
        if parse_type == "Resource":
            bn = self.bnode()
            self.out.append(RTriple(subj, pred, bn))
            for child in el.child_elements():
                self.property_element(bn, child, base, lang)
            return
        if parse_type == "Collection":
            items = [self.node_element(c, base, lang)
                     for c in el.child_elements()]
            prev = None
            head = RDF_NS + "nil"
            cells = [self.bnode() for _ in items]
            if cells:
                head = cells[0]
            for i, cell in enumerate(cells):
                self.out.append(RTriple(cell, RDF_NS + "first", items[i]))
                nxt = cells[i + 1] if i + 1 < len(cells) else RDF_NS + "nil"
                self.out.append(RTriple(cell, RDF_NS + "rest", nxt))
                prev = cell
            self.out.append(RTriple(subj, pred, head))
            return

        kids = el.child_elements()
        if kids:
            obj = self.node_element(kids[0], base, lang)
            self.out.append(RTriple(subj, pred, obj))
            return
        value = el.text_content()
        if datatype is not None:
            self.out.append(RTriple(subj, pred, value, is_literal=True,
                                    datatype=datatype))
        else:
            self.out.append(RTriple(subj, pred, value, is_literal=True,
                                    lang=lang))


def parse_rdfxml_element(rdf_el: Element, base: str,
                         lang: str | None) -> list[RTriple]:
    """Parse an in-DOM ``rdf:RDF`` element into triples."""
    p = _RdfXml(base, lang)
    b, l = p._ctx(rdf_el, base, lang)
    for child in rdf_el.child_elements():
        p.node_element(child, b, l)
    return p.out
