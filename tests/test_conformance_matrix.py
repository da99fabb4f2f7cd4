"""RDFa conformance matrix: a wide, table-driven slice of the RDFa
processing model across hosts (xhtml1, html5, xml) x versions
(1.0, 1.1).

The W3C rdfa.info test-suite fixtures are not redistributable inside
this repo (and the sandbox has no network), so the cases below are
reconstructed from the public specs the suite tests:

* RDFa Core 1.1 (W3C REC) processing-model steps 1-14,
* XHTML+RDFa 1.0 (W3C REC 2008) for the 1.0 column,
* HTML+RDFa 1.1 for the html5 host rules.

Each case pins one behavior with hand-derived golden triples; the
matrix is the breadth counterpart to the targeted edge-case modules
(test_core_*.py).  Case ids are local; where a case corresponds to a
well-known W3C suite number it is noted in the description.

The reference's documented wilful violations (Parser.pm BUGS section)
are replicated as explicit skips at the bottom so the divergence is
visible, not silent:
* 0140 (vocab-over-term shadowing) — wilful violation,
* 0198 (exact XML C14N form) — exercised separately in
  test_core_walk's xmlliteral tests with the reference's own C14N,
* 0212 (empty SafeCURIE in @about) — wilful violation: the reference
  keeps RDFa 1.0 suite behavior,
* 0303 (@property copy on @typeof with @href) — wilful violation.
"""

from __future__ import annotations

import pytest

from rdfa_spark.core import make_config, parse_rdfa

B = "http://example.com/doc"
EX = "http://example.org/"
DC = "http://purl.org/dc/elements/1.1/"
DCT = "http://purl.org/dc/terms/"
FOAF = "http://xmlns.com/foaf/0.1/"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
XHV = "http://www.w3.org/1999/xhtml/vocab#"
RDFA = "http://www.w3.org/ns/rdfa#"

XH = 'xmlns="http://www.w3.org/1999/xhtml"'


def xhtml(body: str, extra: str = "") -> str:
    return (f'<html {XH} xmlns:dc="{DC}" xmlns:foaf="{FOAF}" '
            f'xmlns:ex="{EX}" {extra}><head><title>t</title></head>'
            f'<body>{body}</body></html>')


def html5(body: str, extra: str = "") -> str:
    return (f'<html prefix="dc: {DC} foaf: {FOAF} ex: {EX}" {extra}>'
            f'<head><title>t</title></head><body>{body}</body></html>')


# A triple expectation: (subj, pred, obj, is_literal, datatype, lang).
# Strings beginning with '?' are variables that must bind consistently
# within a case (used for bnodes); None matches anything.
def T(s, p, o, lit=False, dt=None, lang=None):
    return (s, p, o, lit, dt, lang)


class Case:
    __slots__ = ("id", "desc", "host", "version", "markup", "expect",
                 "absent", "count", "opts")

    def __init__(self, id, desc, host, version, markup, expect=(),
                 absent=(), count=None, opts=None):
        self.id = id
        self.desc = desc
        self.host = host
        self.version = version
        self.markup = markup
        self.expect = expect
        self.absent = absent
        self.count = count
        self.opts = opts or {}


def _match(triple, spec, binding):
    got = (triple.subj, triple.pred, triple.obj, triple.is_literal,
           triple.datatype, triple.lang)
    for want, have in zip(spec, got):
        if want is None:
            continue
        if isinstance(want, str) and want.startswith("?"):
            if want in binding:
                if binding[want] != have:
                    return False
            else:
                if not isinstance(have, str) or not have.startswith("_:"):
                    return False
                binding[want] = have
            continue
        if want != have:
            return False
    return True


def run_case(case: Case):
    cfg = make_config(case.host, case.version, **case.opts)
    w = parse_rdfa(case.markup, B, cfg)
    triples = list(w.triples)
    binding: dict[str, str] = {}
    for spec in case.expect:
        hits = [t for t in triples if _match(t, spec, dict(binding))]
        assert hits, (case.id, case.desc, spec,
                      [(t.subj, t.pred, t.obj, t.is_literal,
                        t.datatype, t.lang) for t in triples])
        # commit variable bindings from the first hit
        _match(hits[0], spec, binding)
    for spec in case.absent:
        hits = [t for t in triples if _match(t, spec, dict(binding))]
        assert not hits, (case.id, case.desc, "unexpected", spec, hits)
    if case.count is not None:
        assert len(triples) == case.count, (
            case.id, len(triples),
            [(t.subj, t.pred, t.obj) for t in triples])


CASES: list[Case] = []


def case(*a, **kw):
    CASES.append(Case(*a, **kw))


# ---------------------------------------------------------------------------
# 1. Subject resolution: @about / @src / @href / @resource
# ---------------------------------------------------------------------------
for host, ver in [("xhtml", "1.0"), ("xhtml", "1.1"),
                  ("html5", "1.1")]:
    mk = xhtml if host == "xhtml" else html5
    sx = f"{host}+{ver}"
    case(f"subj-about-rel/{sx}", "relative @about resolves vs base",
         host, ver,
         mk('<p about="photo.jpg" property="dc:title">A</p>'),
         [T("http://example.com/photo.jpg", DC + "title", "A", True)])
    case(f"subj-about-abs/{sx}", "absolute @about (W3C 0001 shape)",
         host, ver,
         mk('<p about="http://x.org/a" property="dc:creator">M</p>'),
         [T("http://x.org/a", DC + "creator", "M", True)])
    case(f"subj-about-frag/{sx}", "fragment @about",
         host, ver,
         mk('<p about="#me" property="dc:title">A</p>'),
         [T(B + "#me", DC + "title", "A", True)])
    case(f"subj-about-empty/{sx}", "@about='' is the base",
         host, ver,
         mk('<p about="" property="dc:title">A</p>'),
         [T(B, DC + "title", "A", True)])
    case(f"obj-href/{sx}", "@href supplies the object of @rel",
         host, ver,
         mk('<a about="#s" rel="dc:source" href="o.html">x</a>'),
         [T(B + "#s", DC + "source", "http://example.com/o.html")])
    case(f"obj-resource/{sx}", "@resource beats @href",
         host, ver,
         mk('<a about="#s" rel="dc:source" resource="#r" '
            'href="h.html">x</a>'),
         [T(B + "#s", DC + "source", B + "#r")],
         absent=[T(None, DC + "source", "http://example.com/h.html")])
    case(f"subj-safecurie/{sx}", "SafeCURIE in @about",
         host, ver,
         mk('<p about="[ex:s]" property="dc:title">A</p>'),
         [T(EX + "s", DC + "title", "A", True)])

case("subj-src-10/xhtml+1.0", "@src sets SUBJECT in RDFa 1.0",
     "xhtml", "1.0",
     xhtml('<img src="i.png" property="dc:title" content="A"/>'),
     [T("http://example.com/i.png", DC + "title", "A", True)])
case("obj-src-11/xhtml+1.1", "@src sets OBJECT in RDFa 1.1",
     "xhtml", "1.1",
     xhtml('<img about="#s" rel="foaf:img" src="i.png"/>'),
     [T(B + "#s", FOAF + "img", "http://example.com/i.png")])

# ---------------------------------------------------------------------------
# 2. @rel / @rev, multiple tokens, incomplete triples
# ---------------------------------------------------------------------------
for host, ver in [("xhtml", "1.0"), ("xhtml", "1.1"), ("html5", "1.1")]:
    mk = xhtml if host == "xhtml" else html5
    sx = f"{host}+{ver}"
    case(f"rel-rev-same/{sx}", "rel+rev on one element (W3C 0006)",
         host, ver,
         mk('<a about="#photo" rel="dc:creator" rev="foaf:img" '
            'href="http://x.org/m">M</a>'),
         [T(B + "#photo", DC + "creator", "http://x.org/m"),
          T("http://x.org/m", FOAF + "img", B + "#photo")])
    case(f"rel-multi/{sx}", "multiple @rel tokens fan out",
         host, ver,
         mk('<a about="#s" rel="dc:source dc:relation" href="o">x</a>'),
         [T(B + "#s", DC + "source", "http://example.com/o"),
          T(B + "#s", DC + "relation", "http://example.com/o")])
    case(f"rel-incomplete/{sx}", "hanging @rel completed by child "
         "@about (spec step 10)",
         host, ver,
         mk('<div about="#s" rel="dc:source">'
            '<p about="#o">x</p></div>'),
         [T(B + "#s", DC + "source", B + "#o")])
    case(f"rev-incomplete/{sx}", "hanging @rev completed reversed",
         host, ver,
         mk('<div about="#s" rev="dc:source">'
            '<p about="#o">x</p></div>'),
         [T(B + "#o", DC + "source", B + "#s")])
    case(f"rel-incomplete-bnode/{sx}", "two children complete one "
         "hanging rel via the SAME bnode-free parent subject",
         host, ver,
         mk('<div about="#s" rel="dc:source">'
            '<p about="#o1">x</p><p about="#o2">y</p></div>'),
         [T(B + "#s", DC + "source", B + "#o1"),
          T(B + "#s", DC + "source", B + "#o2")])
    if ver == "1.0":
        # 1.0: @property is always a literal; @typeof types the
        # child's bnode subject (W3C 0017 shape)
        case(f"rel-typeof-bnode/{sx}", "@rel with @typeof child: "
             "bnode object, literal name",
             host, ver,
             mk('<div about="#s" rel="dc:creator">'
                '<p typeof="foaf:Person" property="foaf:name">M</p>'
                '</div>'),
             [T(B + "#s", DC + "creator", "?b"),
              T("?b", RDF + "type", FOAF + "Person"),
              T("?b", FOAF + "name", "M", True)])
    else:
        # 1.1: @property with @typeof and no @about points the
        # property at the typed resource (a fresh bnode) instead of
        # producing a literal (RDFa Core 1.1 §7.5 steps 5.2/11)
        case(f"rel-typeof-bnode/{sx}", "@rel with @typeof+@property "
             "child: property points at the typed bnode (1.1)",
             host, ver,
             mk('<div about="#s" rel="dc:creator">'
                '<p typeof="foaf:Person" property="foaf:name">M</p>'
                '</div>'),
             [T(B + "#s", DC + "creator", "?b0"),
              T("?b0", FOAF + "name", "?b1"),
              T("?b1", RDF + "type", FOAF + "Person")])

# ---------------------------------------------------------------------------
# 3. @property literals: plain / @content / @datatype / XMLLiteral
# ---------------------------------------------------------------------------
for host, ver in [("xhtml", "1.0"), ("xhtml", "1.1"), ("html5", "1.1")]:
    mk = xhtml if host == "xhtml" else html5
    sx = f"{host}+{ver}"
    case(f"lit-plain/{sx}", "plain literal from text content",
         host, ver,
         mk('<p about="#s" property="dc:title">Plain text</p>'),
         [T(B + "#s", DC + "title", "Plain text", True, None, None)])
    case(f"lit-content/{sx}", "@content overrides text",
         host, ver,
         mk('<p about="#s" property="dc:title" content="C">ignored</p>'),
         [T(B + "#s", DC + "title", "C", True)])
    case(f"lit-typed/{sx}", "@datatype typed literal (W3C 0014 shape)",
         host, ver,
         mk('<p about="#s" property="ex:n" datatype="xsd:int" '
            f'xmlns:xsd="{XSD}" content="3">three</p>'
            if host == "xhtml" else
            f'<p about="#s" property="ex:n" datatype="xsd:int" '
            'content="3">three</p>',
            extra=(f'prefix="xsd: {XSD} dc: {DC} foaf: {FOAF} '
                   f'ex: {EX}"') if host == "html5" else ""),
         [T(B + "#s", EX + "n", "3", True, XSD + "int")])
    case(f"lit-lang/{sx}", "language inherited onto plain literal",
         host, ver,
         mk('<div lang="en" xml:lang="en">'
            '<p about="#s" property="dc:title">A</p></div>'),
         [T(B + "#s", DC + "title", "A", True, None, "en")])
    case(f"lit-lang-override/{sx}", "inner xml:lang overrides",
         host, ver,
         mk('<div xml:lang="en" lang="en"><p about="#s" xml:lang="de" '
            'lang="de" property="dc:title">A</p></div>'),
         [T(B + "#s", DC + "title", "A", True, None, "de")])
    case(f"lit-datatype-empty/{sx}", "datatype='' forces PLAIN "
         "literal even with markup children",
         host, ver,
         mk('<p about="#s" property="dc:title" datatype="">A<b>B</b>'
            'C</p>'),
         [T(B + "#s", DC + "title", "ABC", True, None, None)])
    case(f"lit-dt-overrides-lang/{sx}", "typed literal carries no lang",
         host, ver,
         mk('<div xml:lang="en" lang="en"><p about="#s" '
            f'property="ex:n" datatype="xsd:int" xmlns:xsd="{XSD}" '
            'content="3"/></div>'
            if host == "xhtml" else
            '<div lang="en"><p about="#s" property="ex:n" '
            'datatype="xsd:int" content="3"></p></div>',
            extra=(f'prefix="xsd: {XSD} dc: {DC} ex: {EX}"')
            if host == "html5" else ""),
         [T(B + "#s", EX + "n", "3", True, XSD + "int", None)])

case("lit-xmllit-10/xhtml+1.0", "1.0: markup children default to "
     "rdf:XMLLiteral (W3C 0011 family)",
     "xhtml", "1.0",
     xhtml('<p about="#s" property="dc:title">A<b>B</b>C</p>'),
     [T(B + "#s", DC + "title", None, True, RDF + "XMLLiteral")])
case("lit-xmllit-11/xhtml+1.1", "1.1: markup children default to a "
     "PLAIN literal (spec change)",
     "xhtml", "1.1",
     xhtml('<p about="#s" property="dc:title">A<b>B</b>C</p>'),
     [T(B + "#s", DC + "title", "ABC", True, None)])
case("lit-xmllit-explicit-11/xhtml+1.1", "1.1: explicit "
     "rdf:XMLLiteral datatype still honored",
     "xhtml", "1.1",
     xhtml('<p about="#s" property="dc:title" '
           'datatype="rdf:XMLLiteral" '
           f'xmlns:rdf="{RDF}">A<b>B</b>C</p>'),
     # exclusive C14N declares the in-scope default namespace on <b>
     [T(B + "#s", DC + "title",
        'A<b xmlns="http://www.w3.org/1999/xhtml">B</b>C',
        True, RDF + "XMLLiteral")])

# ---------------------------------------------------------------------------
# 4. CURIEs, terms, prefixes
# ---------------------------------------------------------------------------
case("curie-default-prefix/xhtml+1.0", "bare token in @rel uses the "
     "default (xhtml) vocabulary for known link types",
     "xhtml", "1.0",
     xhtml('<a about="#s" rel="next" href="n.html">n</a>'),
     [T(B + "#s", XHV + "next", "http://example.com/n.html")])
case("curie-default-prefix/xhtml+1.1", "same via term mapping in 1.1",
     "xhtml", "1.1",
     xhtml('<a about="#s" rel="next" href="n.html">n</a>'),
     [T(B + "#s", XHV + "next", "http://example.com/n.html")])
case("term-case-insensitive/xhtml+1.1", "1.1 terms match "
     "case-insensitively (License vs license)",
     "xhtml", "1.1",
     xhtml('<a about="#s" rel="LICENSE" href="l.html">l</a>'),
     [T(B + "#s", XHV + "license", "http://example.com/l.html")])
case("term-unknown-dropped/xhtml+1.1", "unknown bare term in @rel "
     "yields no triple",
     "xhtml", "1.1",
     xhtml('<a about="#s" rel="notaterm" href="n.html">n</a>'),
     absent=[T(B + "#s", None, "http://example.com/n.html")])
case("curie-unknown-prefix-prop/xhtml+1.1", "undefined prefix in "
     "@property: 'undef:x' is a syntactically valid absolute IRI, so "
     "1.1 (full IRIs allowed) keeps it verbatim",
     "xhtml", "1.1",
     xhtml('<p about="#s" property="undef:x">A</p>'),
     [T(B + "#s", "undef:x", "A", True)])
case("curie-unknown-prefix-prop/xhtml+1.0", "1.0 @property is "
     "CURIE-only: undefined prefix yields no triple",
     "xhtml", "1.0",
     xhtml('<p about="#s" property="undef:x">A</p>'),
     absent=[T(B + "#s", None, "A", True)])
case("property-href-11/xhtml+1.1", "1.1 @property with @href and no "
     "rel/content: IRI object from the PLAIN-URI @href "
     "(Parser.pm:1860-1905; regression pin)",
     "xhtml", "1.1",
     xhtml('<div about="#s"><a property="dc:source" href="d.html">d'
           '</a></div>'),
     [T(B + "#s", DC + "source", "http://example.com/d.html")])
case("property-src-11/xhtml+1.1", "1.1 @property with @src: IRI "
     "object from the plain-URI @src",
     "xhtml", "1.1",
     xhtml('<div about="#s"><img property="foaf:img" src="i.png"/>'
           '</div>'),
     [T(B + "#s", FOAF + "img", "http://example.com/i.png")])
case("curie-bnode/xhtml+1.1", "_:name CURIE in @about",
     "xhtml", "1.1",
     xhtml('<p about="[_:frank]" property="foaf:name">F</p>'),
     [T("?f", FOAF + "name", "F", True)])
case("curie-bnode-shared/xhtml+1.1", "same _:name twice is the same "
     "bnode",
     "xhtml", "1.1",
     xhtml('<p about="[_:x]" property="foaf:name">F</p>'
           '<p about="[_:x]" property="foaf:age" content="7">.</p>'),
     [T("?x", FOAF + "name", "F", True),
      T("?x", FOAF + "age", "7", True)])
case("curie-prefix-attr/xhtml+1.1", "@prefix declares mappings (1.1)",
     "xhtml", "1.1",
     xhtml('<div prefix="po: http://purl.org/ontology/po/">'
           '<p about="#s" property="po:x">A</p></div>'),
     [T(B + "#s", "http://purl.org/ontology/po/x", "A", True)])
case("curie-prefix-nocase/xhtml+1.1", "1.1 prefixes match "
     "case-insensitively when declared via @prefix",
     "xhtml", "1.1",
     xhtml('<div prefix="PO: http://purl.org/ontology/po/">'
           '<p about="#s" property="po:x">A</p></div>'),
     [T(B + "#s", "http://purl.org/ontology/po/x", "A", True)])
case("curie-prefix-ignored-10/xhtml+1.0", "@prefix is a 1.1 feature: "
     "ignored in 1.0",
     "xhtml", "1.0",
     xhtml('<div prefix="po: http://purl.org/ontology/po/">'
           '<p about="#s" property="po:x">A</p></div>'),
     absent=[T(B + "#s", "http://purl.org/ontology/po/x", "A", True)])
case("curie-full-uri-11/xhtml+1.1", "absolute IRI allowed in "
     "@property in 1.1",
     "xhtml", "1.1",
     xhtml(f'<p about="#s" property="{DCT}title">A</p>'),
     [T(B + "#s", DCT + "title", "A", True)])
case("curie-full-uri-10/xhtml+1.0", "absolute IRI in @property "
     "NOT allowed in 1.0 (CURIE-only)",
     "xhtml", "1.0",
     xhtml(f'<p about="#s" property="{DCT}title">A</p>'),
     absent=[T(B + "#s", DCT + "title", "A", True)])
case("curie-xmlns-scoping/xhtml+1.1", "inner xmlns redeclaration "
     "scopes; outer restored after subtree",
     "xhtml", "1.1",
     xhtml('<div xmlns:p1="http://a.example/">'
           '<p about="#s" property="p1:x">A</p>'
           '<div xmlns:p1="http://b.example/">'
           '<p about="#s" property="p1:x">B</p></div>'
           '<p about="#s" property="p1:x">C</p></div>'),
     [T(B + "#s", "http://a.example/x", "A", True),
      T(B + "#s", "http://b.example/x", "B", True),
      T(B + "#s", "http://a.example/x", "C", True)])
case("safecurie-undefined/xhtml+1.1", "SafeCURIE with undefined "
     "prefix yields nothing (not a URI fallback)",
     "xhtml", "1.1",
     xhtml('<p about="[undef:x]" property="dc:title">A</p>'),
     absent=[T("undef:x", DC + "title", "A", True)])

# ---------------------------------------------------------------------------
# 5. @vocab
# ---------------------------------------------------------------------------
case("vocab-basic/xhtml+1.1", "@vocab expands bare @property",
     "xhtml", "1.1",
     xhtml(f'<div vocab="{FOAF}"><p about="#s" property="name">M</p>'
           '</div>'),
     [T(B + "#s", FOAF + "name", "M", True)])
case("vocab-triple/xhtml+1.1", "@vocab asserts rdfa:usesVocabulary "
     "on the base",
     "xhtml", "1.1",
     xhtml(f'<div vocab="{FOAF}"><p about="#s" property="name">M</p>'
           '</div>'),
     [T(B, RDFA + "usesVocabulary", FOAF)])
case("vocab-scoped/xhtml+1.1", "@vocab scoping: resets outside",
     "xhtml", "1.1",
     xhtml(f'<div vocab="{FOAF}"><p about="#s" property="name">M</p>'
           '</div><p about="#s" property="name">N</p>'),
     [T(B + "#s", FOAF + "name", "M", True)],
     absent=[T(B + "#s", FOAF + "name", "N", True)])
case("vocab-empty-reset/xhtml+1.1", "vocab='' resets to default",
     "xhtml", "1.1",
     xhtml(f'<div vocab="{FOAF}"><div vocab="">'
           '<p about="#s" property="name">M</p></div></div>'),
     absent=[T(B + "#s", FOAF + "name", "M", True)])
case("vocab-ignored-10/xhtml+1.0", "@vocab is 1.1-only",
     "xhtml", "1.0",
     xhtml(f'<div vocab="{FOAF}"><p about="#s" property="name">M</p>'
           '</div>'),
     absent=[T(B + "#s", FOAF + "name", "M", True)])
case("vocab-curie-wins/xhtml+1.1", "a declared prefix wins over "
     "@vocab for prefixed tokens",
     "xhtml", "1.1",
     xhtml(f'<div vocab="{EX}"><p about="#s" property="dc:title">A'
           '</p></div>'),
     [T(B + "#s", DC + "title", "A", True)])

# ---------------------------------------------------------------------------
# 6. @typeof
# ---------------------------------------------------------------------------
case("typeof-about/xhtml+1.1", "@typeof types the @about subject",
     "xhtml", "1.1",
     xhtml('<p about="#me" typeof="foaf:Person" '
           'property="foaf:name">M</p>'),
     [T(B + "#me", RDF + "type", FOAF + "Person"),
      T(B + "#me", FOAF + "name", "M", True)])
case("typeof-bnode/xhtml+1.1", "@typeof alone creates a typed bnode "
     "subject (W3C 0017 family)",
     "xhtml", "1.1",
     xhtml('<div typeof="foaf:Person"><p property="foaf:name">M</p>'
           '</div>'),
     [T("?b", RDF + "type", FOAF + "Person"),
      T("?b", FOAF + "name", "M", True)])
case("typeof-multi/xhtml+1.1", "multiple @typeof tokens",
     "xhtml", "1.1",
     xhtml('<p about="#me" typeof="foaf:Person foaf:Agent">x</p>'),
     [T(B + "#me", RDF + "type", FOAF + "Person"),
      T(B + "#me", RDF + "type", FOAF + "Agent")])
case("typeof-resource-11/xhtml+1.1", "1.1: @typeof with @href and no "
     "@about types the RESOURCE (typed_resource)",
     "xhtml", "1.1",
     xhtml('<a typeof="foaf:Document" href="d.html">d</a>'),
     [T("http://example.com/d.html", RDF + "type", FOAF + "Document")])
case("typeof-property-resource/xhtml+1.1", "1.1: @property+@typeof+"
     "@href — literal-free chain: property points at typed resource",
     "xhtml", "1.1",
     xhtml('<div about="#s"><a property="dc:source" '
           'typeof="foaf:Document" href="d.html">d</a></div>'),
     [T(B + "#s", DC + "source", "http://example.com/d.html"),
      T("http://example.com/d.html", RDF + "type", FOAF + "Document")])

# ---------------------------------------------------------------------------
# 7. @inlist (1.1)
# ---------------------------------------------------------------------------
case("inlist-two/xhtml+1.1", "two inlist properties build an ordered "
     "rdf:List (W3C 0280 family)",
     "xhtml", "1.1",
     xhtml('<div about="#s">'
           '<p property="ex:v" inlist="">one</p>'
           '<p property="ex:v" inlist="">two</p></div>'),
     [T(B + "#s", EX + "v", "?c1"),
      T("?c1", RDF + "first", "one", True),
      T("?c1", RDF + "rest", "?c2"),
      T("?c2", RDF + "first", "two", True),
      T("?c2", RDF + "rest", RDF + "nil")])
case("inlist-rel/xhtml+1.1", "@rel+@inlist collects resources",
     "xhtml", "1.1",
     xhtml('<div about="#s"><a rel="ex:v" inlist="" href="a">a</a>'
           '<a rel="ex:v" inlist="" href="b">b</a></div>'),
     [T(B + "#s", EX + "v", "?c1"),
      T("?c1", RDF + "first", "http://example.com/a"),
      T("?c2", RDF + "first", "http://example.com/b"),
      T("?c2", RDF + "rest", RDF + "nil")])
case("inlist-ignored-10/xhtml+1.0", "@inlist is 1.1-only: plain "
     "triples in 1.0",
     "xhtml", "1.0",
     xhtml('<div about="#s"><p property="dc:title" inlist="">A</p>'
           '</div>'),
     [T(B + "#s", DC + "title", "A", True)],
     absent=[T(None, RDF + "first", "A", True)])

# ---------------------------------------------------------------------------
# 8. Host-language rules: xhtml/html5 specials
# ---------------------------------------------------------------------------
case("head-subject/xhtml+1.1", "head/body default subject is base",
     "xhtml", "1.1",
     f'<html {XH} xmlns:dc="{DC}"><head profile="x">'
     '<title property="dc:title">T</title></head><body/></html>',
     [T(B, DC + "title", "T", True)])
case("base-href/xhtml+1.1", "<base href> overrides the base for "
     "subjects AND relative resolution",
     "xhtml", "1.1",
     f'<html {XH} xmlns:dc="{DC}"><head>'
     '<base href="http://other.example/dir/page"/></head>'
     '<body><p about="" property="dc:title">A</p>'
     '<a about="#s" rel="dc:source" href="r.html">r</a></body></html>',
     [T("http://other.example/dir/page", DC + "title", "A", True),
      T("http://other.example/dir/page#s", DC + "source",
        "http://other.example/dir/r.html")])
case("html5-time-date/html5+1.1", "html5 <time> sniffs xsd:date",
     "html5", "1.1",
     html5('<p about="#s"><time property="ex:d">2012-03-18</time>'
           '</p>'),
     [T(B + "#s", EX + "d", "2012-03-18", True, XSD + "date")])
case("html5-time-datetime/html5+1.1", "datetime attr sniffs "
     "xsd:dateTime",
     "html5", "1.1",
     html5('<p about="#s"><time property="ex:d" '
           'datetime="2012-03-18T00:00:00Z">x</time></p>'),
     [T(B + "#s", EX + "d", "2012-03-18T00:00:00Z", True,
        XSD + "dateTime")])
case("html5-time-duration/html5+1.1", "duration lexical form sniffs "
     "xsd:duration",
     "html5", "1.1",
     html5('<p about="#s"><time property="ex:d" datetime="P1D">x'
           '</time></p>'),
     [T(B + "#s", EX + "d", "P1D", True, XSD + "duration")])
case("html5-time-plain/html5+1.1", "non-matching time value stays "
     "plain",
     "html5", "1.1",
     html5('<p about="#s"><time property="ex:d">whenever</time></p>'),
     [T(B + "#s", EX + "d", "whenever", True, None)])
case("html5-value-attr/html5+1.1", "@value (data element) wins as "
     "literal",
     "html5", "1.1",
     html5('<p about="#s"><data property="ex:n" value="42">forty-two'
           '</data></p>'),
     [T(B + "#s", EX + "n", "42", True)])
case("html5-lang-attr/html5+1.1", "html @lang works without xml:lang",
     "html5", "1.1",
     html5('<div lang="fr"><p about="#s" property="dc:title">A</p>'
           '</div>'),
     [T(B + "#s", DC + "title", "A", True, None, "fr")])
case("html5-xmlns-nocase/html5+1.1", "xmlns:* prefixes match "
     "case-insensitively in html hosts",
     "html5", "1.1",
     f'<html xmlns:DC="{DC}"><body><p about="#s" '
     'property="dc:title">A</p></body></html>',
     [T(B + "#s", DC + "title", "A", True)])

# ---------------------------------------------------------------------------
# 9. Skip-element / inheritance / bnodes
# ---------------------------------------------------------------------------
case("skip-deep/xhtml+1.1", "RDFa-free elements are transparent",
     "xhtml", "1.1",
     xhtml('<div about="#s"><table><tr><td>'
           '<p property="dc:title">A</p></td></tr></table></div>'),
     [T(B + "#s", DC + "title", "A", True)])
case("object-becomes-subject/xhtml+1.1", "@resource object is the "
     "children's subject",
     "xhtml", "1.1",
     xhtml('<div about="#s" rel="dc:source" resource="#o">'
           '<p property="dc:title">A</p></div>'),
     [T(B + "#s", DC + "source", B + "#o"),
      T(B + "#o", DC + "title", "A", True)])
case("bnode-stable/xhtml+1.1", "bnode labels deterministic per "
     "document (same input, same labels)",
     "xhtml", "1.1",
     xhtml('<div typeof="foaf:Person"><p property="foaf:name">M</p>'
           '</div>'),
     [T("?b", FOAF + "name", "M", True)])

# ---------------------------------------------------------------------------
# 10. xml:base per host
# ---------------------------------------------------------------------------
case("xmlbase-ignored-xhtml/xhtml+1.1", "xml:base ignored in xhtml1",
     "xhtml", "1.1",
     xhtml('<div xml:base="http://other.example/">'
           '<p about="rel.html" property="dc:title">A</p></div>'),
     [T("http://example.com/rel.html", DC + "title", "A", True)],
     absent=[T("http://other.example/rel.html", DC + "title", "A",
               True)])
case("xmlbase-honored-xml/xml+1.1", "xml host honors xml:base",
     "xml", "1.1",
     f'<root xmlns:dc="{DC}" xml:base="http://other.example/dir/">'
     '<item about="rel" property="dc:title">A</item></root>',
     [T("http://other.example/dir/rel", DC + "title", "A", True)])

case("content-inherits-lang/xhtml+1.1", "@content literal carries "
     "the inherited language",
     "xhtml", "1.1",
     xhtml('<div xml:lang="en" lang="en"><p about="#s" '
           'property="dc:title" content="C">x</p></div>'),
     [T(B + "#s", DC + "title", "C", True, None, "en")])
case("rev-and-property/xhtml+1.1", "@rev+@property on one element: "
     "reversed IRI triple plus literal property",
     "xhtml", "1.1",
     xhtml('<a about="#s" rev="dc:source" property="dc:title" '
           'href="o.html">T</a>'),
     [T("http://example.com/o.html", DC + "source", B + "#s"),
      T(B + "#s", DC + "title", "T", True)])
case("xml-host-generic/xml+1.1", "generic XML host: RDFa attributes "
     "on arbitrary elements",
     "xml", "1.1",
     f'<data xmlns:dc="{DC}"><item about="#s" property="dc:title">A'
     '</item></data>',
     [T(B + "#s", DC + "title", "A", True)])
case("about-on-root/xhtml+1.1", "@about on <html> overrides the "
     "base subject for head descendants",
     "xhtml", "1.1",
     f'<html {XH} xmlns:dc="{DC}" about="http://x.org/r"><head>'
     '<title property="dc:title">T</title></head><body/></html>',
     [T("http://x.org/r", DC + "title", "T", True)])
case("rel-resource-plus-property/xhtml+1.1", "@rel+@resource+"
     "@property: IRI triple from rel AND literal from property",
     "xhtml", "1.1",
     xhtml('<p about="#s" rel="dc:relation" resource="#o" '
           'property="dc:title">T</p>'),
     [T(B + "#s", DC + "relation", B + "#o"),
      T(B + "#s", DC + "title", "T", True)])
case("meta-in-head/xhtml+1.1", "<meta property content> in head: "
     "subject is the base",
     "xhtml", "1.1",
     f'<html {XH} xmlns:dc="{DC}"><head>'
     '<meta property="dc:creator" content="M"/><title>t</title>'
     '</head><body/></html>',
     [T(B, DC + "creator", "M", True)])
case("empty-rel-resource/xhtml+1.1", "@rel with no valid tokens "
     "emits nothing but @resource still sets the children's subject",
     "xhtml", "1.1",
     xhtml('<div rel="" resource="#o"><p property="dc:title">A</p>'
           '</div>'),
     [T(B + "#o", DC + "title", "A", True)],
     absent=[T(B, None, B + "#o")])
case("typeof-content/xhtml+1.1", "@typeof+@property+@content: "
     "literal attaches to the typed bnode subject",
     "xhtml", "1.1",
     xhtml('<p typeof="foaf:Person" property="foaf:name" '
           'content="M">x</p>'),
     [T("?b", RDF + "type", FOAF + "Person"),
      T("?b", FOAF + "name", "M", True)])
case("rel-license-term/xhtml+1.1", "bare 'license' term on <a>",
     "xhtml", "1.1",
     xhtml('<a rel="license" href="l">l</a>'),
     [T(B, XHV + "license", "http://example.com/l")])
case("inlist-empty-nil/xhtml+1.1", "@rel+@inlist with no members "
     "asserts the empty list rdf:nil",
     "xhtml", "1.1",
     xhtml('<div about="#s" rel="dc:subject" inlist="">x</div>'),
     [T(B + "#s", DC + "subject", RDF + "nil")])

# ---------------------------------------------------------------------------
# 11. Other hosts: atom / svg / datarss / html32 + version guessing
# ---------------------------------------------------------------------------
ATOM_NS = "http://www.w3.org/2005/Atom"
IANA = "http://www.iana.org/assignments/relation/"

case("atom-entry-bnode/atom+1.1", "atom <entry> establishes a bnode "
     "subject for its RDFa descendants",
     "atom", "1.1",
     f'<feed xmlns="{ATOM_NS}" xmlns:dc="{DC}">'
     '<entry><title property="dc:title">T</title></entry></feed>',
     [T("?e", DC + "title", "T", True)])
case("atom-rel-iana/atom+1.1", "bare @rel tokens use the IANA "
     "link-relation vocabulary (atom host default vocab)",
     "atom", "1.1",
     f'<feed xmlns="{ATOM_NS}">'
     '<link rel="self" href="http://x.org/f.atom"/></feed>',
     [T(B, IANA + "self", "http://x.org/f.atom")])
case("svg-xmlbase/svg+1.1", "svg host honors xml:base (xml_base=2)",
     "svg", "1.1",
     f'<svg xmlns="http://www.w3.org/2000/svg" xmlns:dc="{DC}" '
     'xml:base="http://other.example/dir/">'
     '<desc about="rel" property="dc:title">A</desc></svg>',
     [T("http://other.example/dir/rel", DC + "title", "A", True)])
case("html32-xmllang-ignored/html32+1.1", "pre-HTML5 hosts ignore "
     "xml:lang; @lang wins (reference wilful position on 0256)",
     "html32", "1.1",
     f'<html xmlns:dc="{DC}"><body><p about="#s" xml:lang="de" '
     'lang="fr" property="dc:title">A</p></body></html>',
     [T(B + "#s", DC + "title", "A", True, None, "fr")])
case("version-guess-downgrade/xhtml+guess", "@version='XHTML+RDFa "
     "1.0' downgrades guess-mode to 1.0 rules (@prefix ignored)",
     "xhtml", "guess",
     '<html xmlns="http://www.w3.org/1999/xhtml" '
     f'version="XHTML+RDFa 1.0" xmlns:dc="{DC}"><body>'
     '<div prefix="po: http://po.example/">'
     '<p about="#s" property="po:x">A</p>'
     '<p about="#s" property="dc:title">B</p></div></body></html>',
     [T(B + "#s", DC + "title", "B", True)],
     absent=[T(B + "#s", "http://po.example/x", "A", True)])
case("version-guess-11/xhtml+guess", "no @version -> 1.1 rules "
     "(@prefix honored)",
     "xhtml", "guess",
     '<html xmlns="http://www.w3.org/1999/xhtml"><body>'
     '<div prefix="po: http://po.example/">'
     '<p about="#s" property="po:x">A</p></div></body></html>',
     [T(B + "#s", "http://po.example/x", "A", True)])

# ---------------------------------------------------------------------------
# 12. Named-graph extension (KjetilK, Parser.pm:929-957)
# ---------------------------------------------------------------------------
case("graph-id/xhtml+1.1", "@graph with graph_type=id: graph IRI is "
     "base#value, scoped to the subtree",
     "xhtml", "1.1",
     xhtml('<div graph="g1"><p about="#s" property="dc:title">A</p>'
           '</div><p about="#s" property="dc:title">B</p>'),
     opts=dict(graph=1, graph_type="id"),
     expect=[T(B + "#s", DC + "title", "A", True)])
case("graph-about/xhtml+1.1", "@graph with graph_type=about expands "
     "as CURIE/URI",
     "xhtml", "1.1",
     xhtml('<div graph="[ex:g]"><p about="#s" property="dc:title">A'
           '</p></div>'),
     opts=dict(graph=1, graph_type="about"),
     expect=[T(B + "#s", DC + "title", "A", True)])


def test_graph_values_land_in_graph_column():
    cfg = make_config("xhtml", "1.1", graph=1, graph_type="id")
    w = parse_rdfa(xhtml('<div graph="g1"><p about="#s" '
                         'property="dc:title">A</p></div>'), B, cfg)
    hits = [t for t in w.triples if t.pred == DC + "title"]
    assert hits and hits[0].graph == B + "#g1"


# ---------------------------------------------------------------------------
# 13. XML-literal recursion difference 1.0 vs 1.1
# ---------------------------------------------------------------------------
case("xmllit-norecurse-10/xhtml+1.0", "1.0: XMLLiteral content is "
     "NOT recursed into (inner @property produces no extra triple)",
     "xhtml", "1.0",
     xhtml('<p about="#s" property="dc:title">A'
           '<b property="dc:creator">M</b></p>'),
     [T(B + "#s", DC + "title", None, True, RDF + "XMLLiteral")],
     absent=[T(None, DC + "creator", "M", True)])
case("xmllit-recurse-11/xhtml+1.1", "1.1: explicit XMLLiteral still "
     "recurses into children",
     "xhtml", "1.1",
     xhtml('<p about="#s" property="dc:title" '
           f'datatype="rdf:XMLLiteral" xmlns:rdf="{RDF}">A'
           '<b property="dc:creator">M</b></p>'),
     [T(B + "#s", DC + "title", None, True, RDF + "XMLLiteral"),
      T(B + "#s", DC + "creator", "M", True)])

# ---------------------------------------------------------------------------
# run the matrix
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("c", CASES, ids=[c.id for c in CASES])
def test_conformance_case(c):
    run_case(c)


def test_matrix_breadth():
    """The matrix is the breadth gate: keep it wide."""
    assert len(CASES) >= 90, len(CASES)


# ---------------------------------------------------------------------------
# Reference wilful violations — documented skips (Parser.pm BUGS)
# ---------------------------------------------------------------------------

@pytest.mark.skip(reason="reference wilful violation: W3C 0140 "
                  "(term shadowing by @vocab) — parity with the "
                  "reference, which skips it pending spec proof")
def test_w3c_0140_vocab_term_shadowing():
    pass


@pytest.mark.skip(reason="W3C 0198 exact-C14N form: covered by "
                  "test_core_walk XML-literal C14N tests; the suite "
                  "case itself was expected to be dropped")
def test_w3c_0198_c14n():
    pass


@pytest.mark.skip(reason="reference wilful violation: W3C 0212 "
                  "(empty SafeCURIE) — reference keeps RDFa 1.0 "
                  "suite behavior; this repo matches the reference")
def test_w3c_0212_empty_safecurie():
    pass


@pytest.mark.skip(reason="reference wilful violation: W3C 0303 "
                  "(@property copy with @typeof/@href) — reference "
                  "author rejects the feature; repo matches")
def test_w3c_0303_property_copying():
    pass
