"""Minimal AtomOWL overlay for Atom feeds (atom_parser extension).

The reference optionally layers XML::Atom::OWL over the RDFa parse
(lib/RDF/RDFa/Parser.pm:536-542, flag ``atom_parser``; optional even
there — t/08atom.t skips without it).  This is the subset of the
AtomOWL vocabulary (http://bblfish.net/work/atom-owl/2006-06-06/#)
that t/08atom.t exercises: Feed/Entry typing, ids as xsd:anyURI
literals, titles/subtitles/rights/content as literals, updated/
published as xsd:dateTime, authors/contributors as bnodes with
name/uri/email, links as IANA-relation triples.

Feed/entry subjects come from the *shared* bnode allocator (the
walker's element-memoized bnodes), so the RDFa layer and this overlay
agree on subjects — the reference shares its bnode generator the same
way (Parser.pm:539-541, _atom_magic Parser.pm:2455-2461).
"""

from __future__ import annotations

from .dom import Element
from .uri import resolve

ATOM_NS = "http://www.w3.org/2005/Atom"
AWOL = "http://bblfish.net/work/atom-owl/2006-06-06/#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
IANA = "http://www.iana.org/assignments/relation/"

_TEXT_PROPS = {
    "title": AWOL + "title",
    "subtitle": AWOL + "subtitle",
    "rights": AWOL + "rights",
    "summary": AWOL + "summary",
    "content": AWOL + "content",
}
_DATE_PROPS = {
    "updated": AWOL + "updated",
    "published": AWOL + "published",
}
_PERSON_PROPS = {
    "author": AWOL + "author",
    "contributor": AWOL + "contributor",
}


def consume_atom(walker, root: Element, base: str,
                 graph: str | None = None) -> int:
    """Emit AtomOWL triples for every atom:feed / atom:entry under
    (and including) ``root``.  Returns the triple count emitted."""
    n = 0
    elements = [root] if root.namespace_uri == ATOM_NS else []
    elements += [e for e in root.iter_elements()
                 if e.namespace_uri == ATOM_NS]
    for el in elements:
        if el.localname not in ("feed", "entry"):
            continue
        subj = walker.bnode(el, save_me=True)
        walker._emit(subj, RDF_NS + "type",
                     AWOL + ("Feed" if el.localname == "feed"
                             else "Entry"),
                     is_literal=False, graph=graph)
        n += 1
        for child in el.child_elements():
            if child.namespace_uri != ATOM_NS:
                continue
            name = child.localname
            if name == "id":
                walker._emit(subj, AWOL + "id",
                             child.text_content().strip(),
                             is_literal=True,
                             datatype=XSD + "anyURI", graph=graph)
                n += 1
            elif name in _TEXT_PROPS:
                walker._emit(subj, _TEXT_PROPS[name],
                             child.text_content(),
                             is_literal=True, graph=graph)
                n += 1
            elif name in _DATE_PROPS:
                walker._emit(subj, _DATE_PROPS[name],
                             child.text_content().strip(),
                             is_literal=True,
                             datatype=XSD + "dateTime", graph=graph)
                n += 1
            elif name in _PERSON_PROPS:
                person = walker.bnode(child, save_me=True)
                walker._emit(subj, _PERSON_PROPS[name], person,
                             is_literal=False, graph=graph)
                n += 1
                for pc in child.child_elements():
                    if pc.namespace_uri != ATOM_NS:
                        continue
                    if pc.localname == "name":
                        walker._emit(person, AWOL + "name",
                                     pc.text_content().strip(),
                                     is_literal=True, graph=graph)
                        n += 1
                    elif pc.localname == "uri":
                        walker._emit(person, AWOL + "uri",
                                     resolve(pc.text_content().strip(),
                                             base),
                                     is_literal=False, graph=graph)
                        n += 1
                    elif pc.localname == "email":
                        walker._emit(person, AWOL + "email",
                                     "mailto:"
                                     + pc.text_content().strip(),
                                     is_literal=False, graph=graph)
                        n += 1
            elif name == "link":
                rel = child.get("rel") or "alternate"
                href = child.get("href")
                if href is not None and ":" not in rel:
                    walker._emit(subj, IANA + rel,
                                 resolve(href, base),
                                 is_literal=False, graph=graph)
                    n += 1
    return n
