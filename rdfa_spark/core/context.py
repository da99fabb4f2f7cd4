"""Initial-context prefix/term dictionaries.

Re-creates the named context bundles of the reference
(lib/RDF/RDFa/Parser/InitialContext.pm:34-213); these are themselves
public W3C/IANA context documents.  Compiled once per config and
broadcast — they are static KB-sized dictionaries, never shuffled
(SURVEY.md §2.3 J1).
"""

from __future__ import annotations

from functools import lru_cache

XHV = "http://www.w3.org/1999/xhtml/vocab#"
IANA = "http://www.iana.org/assignments/relation/"

_RDFA_10_TERMS = """alternate appendix bookmark cite chapter contents
copyright first glossary help icon index last license meta next p3pv1
prev role section stylesheet subsection start top up""".split()

_STD_ROLES = """banner complementary contentinfo definition main
navigation note search""".split()

_ARIA_ROLES = """alert alertdialog application article button checkbox
columnheader combobox dialog directory document grid gridcell group
heading img link list listbox listitem log marquee math menu menubar
menuitem menuitemcheckbox menuitemradio option presentation progressbar
radio radiogroup region row rowheader separator slider spinbutton
status tab tablist tabpanel textbox timer toolbar tooltip tree treegrid
treeitem""".split()

_RDFA_11_PREFIXES = {
    "grddl": "http://www.w3.org/2003/g/data-view#",
    "ma": "http://www.w3.org/ns/ma-ont#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfa": "http://www.w3.org/ns/rdfa#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "rif": "http://www.w3.org/2007/rif#",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "skosxl": "http://www.w3.org/2008/05/skos-xl#",
    "wdr": "http://www.w3.org/2007/05/powder#",
    "void": "http://rdfs.org/ns/void#",
    "wdrs": "http://www.w3.org/2007/05/powder-s#",
    "xhv": XHV,
    "xml": "http://www.w3.org/XML/1998/namespace",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "cc": "http://creativecommons.org/ns#",
    "ctag": "http://commontag.org/ns#",
    "dc": "http://purl.org/dc/terms/",
    "dcterms": "http://purl.org/dc/terms/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "gr": "http://purl.org/goodrelations/v1#",
    "ical": "http://www.w3.org/2002/12/cal/icaltzd#",
    "og": "http://ogp.me/ns#",
    "rev": "http://purl.org/stuff/rev#",
    "sioc": "http://rdfs.org/sioc/ns#",
    "v": "http://rdf.data-vocabulary.org/#",
    "vcard": "http://www.w3.org/2006/vcard/ns#",
    "schema": "http://schema.org/",
}

_XHTML_11_TERMS = """alternate appendix cite bookmark contents chapter
copyright first glossary help icon index last license meta next prev
previous section start stylesheet subsection top up p3pv1""".split()

_IETF_RELS = """alternate appendix archives author bookmark canonical
chapter collection contents copyright current describedby disclosure
duplicate edit edit-media enclosure first glossary help hub icon index
item last latest-version license lrdd monitor monitor-group next
next-archive nofollow noreferrer payment predecessor-version prefetch
prev previous prev-archive related replies search section self service
start stylesheet subsection successor-version tag up version-history
via working-copy working-copy-of""".split()

_HTML32_RELS = """top contents index glossary copyright next previous
help search chapter made""".split()

_HTML4_RELS = [s.lower() for s in """Alternate Stylesheet Start Next
Prev Contents Index Glossary Copyright Chapter Section Subsection
Appendix Help Bookmark""".split()]

_HTML5_RELS = """alternate archives author bookmark external feed first
help icon index last license next nofollow noreferrer pingback prefetch
prev search stylesheet sidebar tag up ALTERNATE-STYLESHEET""".split()

_GRDDL_RELS = ("transformation profileTransformation "
               "namespaceTransformation").split()

_SEARCHMONKEY_PREFIXES = {
    "abmeta": "http://www.abmeta.org/ns#",
    "action": "http://search.yahoo.com/searchmonkey/action/",
    "assert": "http://search.yahoo.com/searchmonkey/assert/",
    "cc": "http://creativecommons.org/ns#",
    "commerce": "http://search.yahoo.com/searchmonkey/commerce/",
    "context": "http://search.yahoo.com/searchmonkey/context/",
    "country": "http://search.yahoo.com/searchmonkey-datatype/country/",
    "currency": "http://search.yahoo.com/searchmonkey-datatype/currency/",
    "dbpedia": "http://dbpedia.org/resource/",
    "dc": "http://purl.org/dc/terms/",
    "fb": "http://rdf.freebase.com/",
    "feed": "http://search.yahoo.com/searchmonkey/feed/",
    "finance": "http://search.yahoo.com/searchmonkey/finance/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "geo": "http://www.georss.org/georss#",
    "gr": "http://purl.org/goodrelations/v1#",
    "job": "http://search.yahoo.com/searchmonkey/job/",
    "media": "http://search.yahoo.com/searchmonkey/media/",
    "news": "http://search.yahoo.com/searchmonkey/news/",
    "owl": "http://www.w3.org/2002/07/owl#",
    "page": "http://search.yahoo.com/searchmonkey/page/",
    "product": "http://search.yahoo.com/searchmonkey/product/",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "reference": "http://search.yahoo.com/searchmonkey/reference/",
    "rel": "http://search.yahoo.com/searchmonkey-relation/",
    "resume": "http://search.yahoo.com/searchmonkey/resume/",
    "review": "http://purl.org/stuff/rev#",
    "sioc": "http://rdfs.org/sioc/ns#",
    "social": "http://search.yahoo.com/searchmonkey/social/",
    "stag": "http://semantictagging.org/ns#",
    "tagspace": "http://search.yahoo.com/searchmonkey/tagspace/",
    "umbel": "http://umbel.org/umbel/sc/",
    "use": "http://search.yahoo.com/searchmonkey-datatype/use/",
    "vcal": "http://www.w3.org/2002/12/cal/icaltzd#",
    "vcard": "http://www.w3.org/2006/vcard/ns#",
    "xfn": "http://gmpg.org/xfn/11#",
    "xhtml": XHV,
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}


def _rel_rev(terms, base):
    out = {}
    for t in terms:
        out[f"{t}@rel"] = base + t
        out[f"{t}@rev"] = base + t
    return out


# Each known context is a flat dict whose keys are either "pfx:"
# (prefix mapping) or "term[@attr]" (term mapping) — the same encoding
# as the reference's %Known (InitialContext.pm:34-213).
KNOWN_CONTEXTS: dict[str, dict[str, str]] = {
    "tag:buzzword.org.uk,2010:rdfa:profile:rdfa-1.0":
        _rel_rev(_RDFA_10_TERMS, XHV),
    "http://www.w3.org/2011/rdfa-context/rdfa-1.1": {
        **{f"{p}:": u for p, u in _RDFA_11_PREFIXES.items()},
        "describedby": "http://www.w3.org/2007/05/powder-s#describedby",
        "license": XHV + "license",
        "role": XHV + "role",
    },
    "http://www.w3.org/2011/rdfa-context/xhtml-rdfa-1.1":
        {t: XHV + t for t in _XHTML_11_TERMS},
    "http://www.w3.org/2011/rdfa-context/html-rdfa-1.1": {},
    "tag:buzzword.org.uk,2010:rdfa:profile:xhtml-role": {
        f"{t.lower()}@role": XHV + t
        for t in (_RDFA_10_TERMS + ["itsRules"] + _STD_ROLES + _ARIA_ROLES)
    },
    "tag:buzzword.org.uk,2010:rdfa:profile:aria-role": {
        f"{t}@role": XHV + t for t in (_STD_ROLES + _ARIA_ROLES)
    },
    "tag:buzzword.org.uk,2010:rdfa:profile:ietf":
        _rel_rev(_IETF_RELS, IANA),
    "http://search.yahoo.com/searchmonkey-profile":
        {f"{p}:": u for p, u in _SEARCHMONKEY_PREFIXES.items()},
    "tag:buzzword.org.uk,2010:rdfa:profile:html32":
        _rel_rev(_HTML32_RELS, XHV),
    "tag:buzzword.org.uk,2010:rdfa:profile:html4":
        _rel_rev(_HTML4_RELS, XHV),
    "tag:buzzword.org.uk,2010:rdfa:profile:html5":
        _rel_rev(_HTML5_RELS, XHV),
    "http://www.w3.org/2003/g/data-view":
        _rel_rev(_GRDDL_RELS, "http://www.w3.org/2003/g/data-view#"),
}


@lru_cache(maxsize=64)
def initial_context(context_spec: str):
    """Merge named contexts: earlier-listed contexts win
    (InitialContext.pm:215-231 applies them in reverse).

    Returns (uri_mappings, term_mappings):
      uri_mappings:  {lc_prefix: uri}                (case-insensitive)
      term_mappings: {attr: {lc_term: uri}}          (case-insensitive)
    """
    names = context_spec.split()
    merged: dict[str, str] = {}
    for ctx in reversed(names):
        merged.update(KNOWN_CONTEXTS.get(ctx, {}))

    uri_mappings: dict[str, str] = {}
    term_mappings: dict[str, dict[str, str]] = {}
    for k, v in merged.items():
        if k.endswith(":"):
            uri_mappings[k[:-1].lower()] = v
        else:
            term, _, attr = k.partition("@")
            attr = attr or "*"
            term_mappings.setdefault(attr, {})[term.lower()] = v
    return uri_mappings, term_mappings
