"""Core RDFa walker tests, ported from the reference's t/*.t
assertions (see each test's docstring for the source).  Pure Python —
no Spark session needed."""

from rdfa_spark.core import (
    RDFA_10, Triple, extract_text, make_config, parse_rdfa,
)

XHV = "http://www.w3.org/1999/xhtml/vocab#"
FOAF = "http://xmlns.com/foaf/0.1/"
DC11 = "http://purl.org/dc/elements/1.1/"
DCT = "http://purl.org/dc/terms/"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"


def count(walker, subj=None, pred=None, obj=None, is_literal=None,
          datatype=None, lang=None, graph=None):
    """count_statements analogue (t/01basic.t:53-72)."""
    n = 0
    for t in walker.triples:
        if subj is not None and t.subj != subj:
            continue
        if pred is not None and t.pred != pred:
            continue
        if obj is not None and t.obj != obj:
            continue
        if is_literal is not None and t.is_literal != is_literal:
            continue
        if datatype is not None and t.datatype != datatype:
            continue
        if lang is not None and t.lang != lang:
            continue
        if graph is not None and t.graph != graph:
            continue
        n += 1
    return n


BASIC = """<html
\txmlns:dc="http://purl.org/dc/terms/"
\txmlns:foaf="http://xmlns.com/foaf/0.1/"
\txml:lang="en">
\t<head>
\t\t<title property="dc:title">This is the title</title>
\t</head>
\t<body xmlns:dc="http://purl.org/dc/elements/1.1/">
\t\t<div rel="foaf:primaryTopic foam:topic" rev="foaf:page" xml:lang="de">
\t\t\t<h1 about="#topic" typeof="foaf:Person" property="foaf:name">Albert Einstein</h1>
\t\t</div>
\t\t<address rel="foaf:maker dc:creator" rev="foaf:made">
\t\t\t<a about="#maker" property="foaf:name" rel="foaf:homepage" href="joe">Joe Bloggs</a>
\t\t</address>
\t</body>
</html>"""

EINSTEIN = "http://example.com/einstein"


class TestBasic:
    """t/01basic.t"""

    def setup_method(self):
        self.w = parse_rdfa(BASIC, EINSTEIN)

    def test_resource_triple(self):
        # t/01basic.t:55-60
        assert count(self.w, EINSTEIN, DC11 + "creator",
                     EINSTEIN + "#maker") == 1

    def test_literal_with_lang(self):
        # t/01basic.t:62-67
        assert count(self.w, EINSTEIN + "#topic", FOAF + "name",
                     "Albert Einstein", is_literal=True, lang="de") == 1

    def test_title_inherits_doc_lang(self):
        assert count(self.w, EINSTEIN, DCT + "title",
                     "This is the title", is_literal=True, lang="en") == 1

    def test_rev_triples(self):
        assert count(self.w, EINSTEIN + "#topic", FOAF + "page",
                     EINSTEIN) == 1
        assert count(self.w, EINSTEIN + "#maker", FOAF + "made",
                     EINSTEIN) == 1

    def test_typeof(self):
        assert count(self.w, EINSTEIN + "#topic", RDF + "type",
                     FOAF + "Person") == 1

    def test_undefined_prefix_dropped(self):
        # foam:topic must not produce a triple...
        assert count(self.w, pred=FOAF + "topic") == 0
        # ...and primaryTopic still does
        assert count(self.w, EINSTEIN, FOAF + "primaryTopic",
                     EINSTEIN + "#topic") == 1

    def test_nested_rel_href(self):
        # <a ... rel="foaf:homepage" href="joe">
        assert count(self.w, EINSTEIN + "#maker", FOAF + "homepage",
                     "http://example.com/joe") == 1

    def test_ontoken_rewrite(self):
        # t/01basic.t:40-46,69-74: rewrite dict maps foam:topic
        w = parse_rdfa(BASIC, EINSTEIN, token_rewrites={
            "foam:topic": FOAF + "topic"})
        assert count(w, EINSTEIN, FOAF + "topic",
                     EINSTEIN + "#topic") == 1


CURIE_10 = """<html
\txmlns="http://www.w3.org/1999/xhtml"
\txmlns:ex="http://example.com/ns#"
\txmlns:http="http://example.com/http#"
\txml:lang="en">
\t<body>
\t\t<div about="[ex:r1/foo]" rel="ex:test" resource="[ex:test]" />
\t\t<div about="[ex:r2]" rel="ex:r2/foo" resource="[ex:test]" />
\t\t<div about="[ex:r3]" rel=":TEST" resource="[ex:test]" />
\t\t<div about="[ex:r4]" rel="ex:r4" href="[ex:r4]" />
\t\t<div about="[ex:r5]" rel="ex:r5" resource="[ex:r5]" />
\t\t<div about="[ex:r6]" rel="arkansas" resource="[ex:r6]" />
\t\t<div about="http://example.net/1" rel="ex:test" resource="[ex:test]" />
\t\t<div about="[http://example.net/2]" rel="ex:test" resource="[ex:test]" />
\t</body>
</html>"""

EX = "http://example.com/ns#"


class TestCurie10:
    """t/02curie.t (XHTML + RDFa 1.0 config)."""

    def setup_method(self):
        cfg = make_config("xhtml", RDFA_10)
        self.w = parse_rdfa(CURIE_10, "http://example.com/", cfg)

    def test_safecurie_non_qname(self):
        assert count(self.w, subj=EX + "r1/foo") >= 1

    def test_curie_non_qname(self):
        assert count(self.w, pred=EX + "r2/foo") >= 1

    def test_default_prefix(self):
        assert count(self.w, EX + "r3", XHV + "TEST") == 1

    def test_safecurie_not_in_href(self):
        assert count(self.w, EX + "r4", EX + "r4", EX + "r4") == 0

    def test_safecurie_in_resource(self):
        assert count(self.w, EX + "r5", EX + "r5", EX + "r5") == 1

    def test_nonsense_keyword_ignored(self):
        assert count(self.w, subj=EX + "r6", obj=EX + "r6") == 0

    def test_http_uri_recognised(self):
        assert count(self.w, subj="http://example.net/1") >= 1

    def test_http_looking_curie(self):
        assert count(
            self.w,
            subj="http://example.com/http#//example.net/2") >= 1


CURIE_FULL = """<html
\txmlns="http://www.w3.org/1999/xhtml"
\txmlns:ex="http://example.com/ns#"
\txmlns:http="http://example.com/http#"
\txml:lang="en">
\t<body>
\t\t<div about="[ex:r1]" rel="http://example.com/ https://example.com/" resource="[ex:r1]" />
\t</body>
</html>"""


class TestCurieFullUris:
    def test_undefined_curie_ignored_in_10(self):
        # t/02curie.t:118-126
        cfg = make_config("xhtml", RDFA_10)
        w = parse_rdfa(CURIE_FULL, "http://example.com/", cfg)
        assert count(w, subj=EX + "r1", obj=EX + "r1") == 1

    def test_full_uris_enabled(self):
        # t/02curie.t:128-147 (full_uris => 1)
        cfg = make_config("xhtml", RDFA_10, full_uris=True)
        w = parse_rdfa(CURIE_FULL, "http://example.com/", cfg)
        assert count(w, EX + "r1",
                     "http://example.com/http#//example.com/",
                     EX + "r1") == 1
        assert count(w, EX + "r1", "https://example.com/",
                     EX + "r1") == 1


LANG = """<html xmlns:ex="http://example.com/ns#"
\txmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
\txmlns="http://www.w3.org/1999/xhtml"
\txml:lang="en-gb">
\t<body>
\t\t<div about="[ex:r0]" property="ex:test" content="English" />
\t\t<div lang="de" about="[ex:r1]" property="ex:test" content="English" />
\t\t<div xml:lang="invalid-lang-tags" about="[ex:r2]" property="ex:test" content="English" />
\t\t<div xml:lang="" about="[ex:r3]" property="ex:test" content="Empty" />
\t</body>
</html>"""


class TestLang:
    """t/03lang.t"""

    def setup_method(self):
        cfg = make_config("xhtml", RDFA_10)
        self.w = parse_rdfa(LANG, "http://example.com/", cfg)

    def test_lang_picked_up(self):
        assert count(self.w, EX + "r0", EX + "test", "English",
                     lang="en-gb") == 1

    def test_non_xml_lang_ignored(self):
        assert count(self.w, EX + "r1", EX + "test", "English",
                     lang="en-gb") == 1

    def test_invalid_lang_ignored(self):
        assert count(self.w, EX + "r2", EX + "test", "English",
                     lang="en-gb") == 1

    def test_empty_lang_resets(self):
        assert count(self.w, EX + "r3", EX + "test", "Empty") == 1
        [t] = [t for t in self.w.triples if t.subj == EX + "r3"]
        assert t.lang is None

    def test_xhtml_lang_flag(self):
        cfg = make_config("xhtml", RDFA_10, xhtml_lang=True)
        w = parse_rdfa(LANG, "http://example.com/", cfg)
        assert count(w, EX + "r1", EX + "test", "English",
                     lang="de") == 1


XMLLIT = """<html xmlns:foaf="http://xmlns.com/foaf/0.1/" xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
\txmlns="http://www.w3.org/1999/xhtml" xml:lang="de">
\t<body xmlns:dc="http://purl.org/dc/elements/1.1/">
\t\t<div rel="foaf:primaryTopic" rev="foaf:page">
\t\t\t<h1 about="#topic" typeof="foaf:Person" property="foaf:name"
                datatype="rdf:XMLLiteral"><strong>Albert Einstein</strong></h1>
\t\t</div>
\t</body>
</html>"""


class TestXmlLiteral:
    """t/04xmlliteral.t"""

    def setup_method(self):
        self.w = parse_rdfa(XMLLIT, EINSTEIN)

    def test_datatype(self):
        hits = [t for t in self.w.triples
                if t.subj == EINSTEIN + "#topic"
                and t.pred == FOAF + "name"]
        assert len(hits) == 1
        assert hits[0].datatype == RDF + "XMLLiteral"

    def test_ec14n_value(self):
        # t/04xmlliteral.t:42 pins the exact EC14N serialization
        [t] = [t for t in self.w.triples
               if t.pred == FOAF + "name"]
        assert t.obj == ('<strong xmlns="http://www.w3.org/1999/xhtml"'
                         ' xml:lang="de">Albert Einstein</strong>')


INLIST = """<html xmlns="http://www.w3.org/1999/xhtml"
  xmlns:ex="http://example.com/ns#" xmlns:dc="http://purl.org/dc/terms/">
  <body about="http://example.com/list">
    <span property="ex:item" inlist="">one</span>
    <span property="ex:item" inlist="">two</span>
    <a rel="ex:link" inlist="" href="http://example.com/a">a</a>
    <a rel="ex:link" inlist="" href="http://example.com/b">b</a>
    <div about="http://example.com/empty" rel="ex:none" inlist=""></div>
  </body>
</html>"""


class TestInlist:
    """RDFa 1.1 @inlist -> rdf:List chains (Parser.pm:2114-2188)."""

    def setup_method(self):
        self.w = parse_rdfa(INLIST, "http://example.com/")

    def _chase(self, head):
        items = []
        seen = 0
        while head != RDF + "nil" and seen < 20:
            seen += 1
            first = [t.obj for t in self.w.triples
                     if t.subj == head and t.pred == RDF + "first"]
            rest = [t.obj for t in self.w.triples
                    if t.subj == head and t.pred == RDF + "rest"]
            assert len(first) == 1 and len(rest) == 1
            items.append(first[0])
            head = rest[0]
        return items

    def test_literal_list(self):
        heads = [t.obj for t in self.w.triples
                 if t.subj == "http://example.com/list"
                 and t.pred == EX + "item"]
        assert len(heads) == 1
        assert self._chase(heads[0]) == ["one", "two"]

    def test_resource_list(self):
        heads = [t.obj for t in self.w.triples
                 if t.subj == "http://example.com/list"
                 and t.pred == EX + "link"]
        assert len(heads) == 1
        assert self._chase(heads[0]) == ["http://example.com/a",
                                         "http://example.com/b"]

    def test_empty_list_nil(self):
        assert count(self.w, "http://example.com/empty", EX + "none",
                     RDF + "nil") == 1


DATETIME = """<html xmlns="http://www.w3.org/1999/xhtml"
  xmlns:ex="http://example.com/ns#">
 <body about="http://example.com/e">
  <time property="ex:when" datetime="2012-03-18T00:07:19Z">then</time>
  <time property="ex:day" datetime="2012-03-18">day</time>
  <time property="ex:year" datetime="2012">year</time>
  <span property="ex:dur" datetime="P1Y2M">dur</span>
  <time property="ex:plain">not-a-date</time>
  <input property="ex:val" value="42" />
 </body>
</html>"""


class TestDatetimeValue:
    """@datetime sniffing ladder (Parser.pm:1740-1759) + @value
    (html5+1.1 combination flags)."""

    def setup_method(self):
        cfg = make_config("html5", "1.1")
        self.w = parse_rdfa(DATETIME, "http://example.com/e", cfg)

    def _one(self, pred):
        [t] = [t for t in self.w.triples
               if t.pred == EX + pred]
        return t

    def test_datetime(self):
        t = self._one("when")
        assert t.obj == "2012-03-18T00:07:19Z"
        assert t.datatype == XSD + "dateTime"

    def test_date(self):
        assert self._one("day").datatype == XSD + "date"

    def test_gyear(self):
        assert self._one("year").datatype == XSD + "gYear"

    def test_duration(self):
        assert self._one("dur").datatype == XSD + "duration"

    def test_time_element_content(self):
        t = self._one("plain")
        assert t.obj == "not-a-date"
        assert t.datatype is None

    def test_value_attr(self):
        assert self._one("val").obj == "42"


VOCAB = """<html xmlns="http://www.w3.org/1999/xhtml">
 <body vocab="http://schema.org/" about="http://example.com/v">
  <span property="name">Thing</span>
  <div vocab="" about="http://example.com/v2">
    <span property="dc:title">reset</span>
  </div>
 </body>
</html>"""


class TestVocab:
    def setup_method(self):
        self.w = parse_rdfa(VOCAB, "http://example.com/")

    def test_vocab_term(self):
        assert count(self.w, "http://example.com/v",
                     "http://schema.org/name", "Thing") == 1

    def test_uses_vocabulary_triple(self):
        assert count(self.w, "http://example.com/",
                     "http://www.w3.org/ns/rdfa#usesVocabulary",
                     "http://schema.org/") == 1

    def test_initial_context_prefix_after_reset(self):
        assert count(self.w, "http://example.com/v2",
                     DCT + "title", "reset") == 1


class TestTextExtraction:
    """F1: byte-identical text concatenation (Parser.pm:2541-2559)."""

    def test_basic(self):
        assert extract_text("<x>a<y>b</y>c<!--no-->d</x>") == "abcd"

    def test_einstein(self):
        txt = extract_text(BASIC)
        assert "Albert Einstein" in txt and "Joe Bloggs" in txt
        assert "<" not in txt

    def test_whitespace_preserved(self):
        assert extract_text("<x> a\n\t<y> b </y></x>") == " a\n\t b "


class TestBnodeDeterminism:
    def test_same_doc_same_labels(self):
        w1 = parse_rdfa(BASIC, EINSTEIN)
        w2 = parse_rdfa(BASIC, EINSTEIN)
        assert w1.triples == w2.triples

    def test_different_url_different_labels(self):
        w1 = parse_rdfa(INLIST, "http://example.com/")
        w2 = parse_rdfa(INLIST, "http://example.org/other")
        b1 = {t.subj for t in w1.triples if t.subj.startswith("_:")}
        b2 = {t.subj for t in w2.triples if t.subj.startswith("_:")}
        assert b1 and b2 and not (b1 & b2)


class TestDedupInStore:
    """A4: the Trine memory store is a set; re-asserted triples count
    once."""

    def test_duplicate_triples_once(self):
        doc = """<html xmlns="http://www.w3.org/1999/xhtml"
          xmlns:ex="http://example.com/ns#">
         <body>
          <div about="[ex:a]" rel="ex:p" resource="[ex:b]"></div>
          <div about="[ex:a]" rel="ex:p" resource="[ex:b]"></div>
         </body></html>"""
        w = parse_rdfa(doc, "http://example.com/")
        assert count(w, EX + "a", EX + "p", EX + "b") == 1


def test_leaf_link_fast_path_disqualifiers():
    """The bare-leaf-link fast path must stand down exactly when the
    element is observable: completing a hanging @rel, hosting an
    element child whose subject it sets, or carrying any other RDFa
    attribute."""
    from rdfa_spark.core import make_config, parse_rdfa

    DC = "http://purl.org/dc/terms/"
    base = "http://example.com/doc"

    # 1. hanging @rel completed by the leaf link's new subject
    w = parse_rdfa(
        f'<html xmlns:dc="{DC}"><body>'
        f'<div about="#s" rel="dc:relation"><a href="/y">l</a></div>'
        f'</body></html>'.encode(),
        base, make_config("html5", "1.1"))
    assert (base + "#s", DC + "relation",
            "http://example.com/y") in [
        (t.subj, t.pred, t.obj) for t in w.triples]

    # 2. element child inherits the link's subject
    w = parse_rdfa(
        f'<html xmlns:dc="{DC}"><body>'
        f'<a href="/y"><span property="dc:title">T</span></a>'
        f'</body></html>'.encode(),
        base, make_config("html5", "1.1"))
    assert ("http://example.com/y", DC + "title", "T") in [
        (t.subj, t.pred, t.obj) for t in w.triples]

    # 3. a genuinely bare leaf link emits nothing
    w = parse_rdfa(
        f'<html xmlns:dc="{DC}"><body>'
        f'<a href="/y">l</a><img src="i.png"/>'
        f'<p about="#s" property="dc:title">T</p></body></html>'
        .encode(),
        base, make_config("html5", "1.1"))
    trips = [(t.subj, t.pred, t.obj) for t in w.triples]
    assert trips == [(base + "#s", DC + "title", "T")]


def test_leaf_link_fast_path_inlist_completion():
    """@inlist hanging rel: both leaf links must join the rdf:List
    in document order (the incomplete-triples gate disqualifies the
    fast path here)."""
    from rdfa_spark.core import make_config, parse_rdfa

    base = "http://example.com/doc"
    w = parse_rdfa(
        '<html prefix="ex: http://example.org/"><body>'
        '<div about="#s" rel="ex:part" inlist="">'
        '<a href="/y">l</a><a href="/z">m</a></div>'
        '</body></html>'.encode(),
        base, make_config("html5", "1.1"))
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    trips = [(t.subj, t.pred, t.obj) for t in w.triples]
    firsts = [o for s, p, o in trips if p == RDF + "first"]
    assert firsts == ["http://example.com/y", "http://example.com/z"]
    assert any(s == base + "#s" and p == "http://example.org/part"
               for s, p, o in trips)


def test_safe_curie_bnode_errors_per_occurrence():
    """A safe-CURIE bnode ('[_:x]') in @property logs a
    bnode-wrongplace ERROR for EVERY occurrence: the CURIE memo must
    not cache it (its expansion returns non-None despite logging),
    or repeats would silently collapse the processor-graph count."""
    from rdfa_spark.core import make_config, parse_rdfa

    base = "http://example.com/doc"
    w = parse_rdfa(
        '<html><body>'
        '<p about="#a" property="[_:x]">one</p>'
        '<p about="#b" property="[_:x]">two</p>'
        '<p about="#c" property="[_:x]">three</p>'
        '</body></html>'.encode(),
        base, make_config("html5", "1.1"))
    wrong = [e for e in w.errors if e.code == "bnode-wrongplace"]
    assert len(wrong) == 3, [e.code for e in w.errors]
