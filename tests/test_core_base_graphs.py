"""xml:base / <base href> modes (t/06xmlbase.t), named graphs
(t/05namedgraphs.t) and embedded RDF/XML (t/06, t/07 subset)."""

from rdfa_spark.core import RDFA_10, make_config, parse_rdfa
from tests.test_core_walk import count

EX = "http://example.com/ns#"
FOAF = "http://xmlns.com/foaf/0.1/"

XMLBASE = """<html
\txmlns="http://www.w3.org/1999/xhtml"
\txmlns:ex="http://example.com/ns#"
\txml:lang="en">
\t<head>
\t\t<base href="http://example.com/html" />
\t</head>
\t<body xml:base="http://example.com/xml">
\t\t<div about="#about" rel="ex:test" resource="#resource" />
\t\t<div src="#src" rel="ex:test" href="#href" />
\t</body>
</html>"""

PERL = "http://example.com/perl"


def _parse(**opts):
    cfg = make_config("xhtml", RDFA_10, **opts)
    return parse_rdfa(XMLBASE, PERL, cfg)


class TestXmlBaseModes:
    """t/06xmlbase.t:22-133 — base element × xml:base modes 0/1/2."""

    def test_default_respects_base_element(self):
        w = _parse()
        assert count(w, "http://example.com/html#about", EX + "test",
                     "http://example.com/html#resource") == 1
        assert count(w, "http://example.com/html#src", EX + "test",
                     "http://example.com/html#href") == 1

    def test_base_element_off(self):
        w = _parse(xhtml_base=0)
        assert count(w, PERL + "#about", EX + "test",
                     PERL + "#resource") == 1
        assert count(w, PERL + "#src", EX + "test", PERL + "#href") == 1

    def test_xml_base_mode1(self):
        w = _parse(xml_base=1)
        assert count(w, "http://example.com/xml#about", EX + "test",
                     "http://example.com/xml#resource") == 1
        # src/href don't use xml:base in mode 1
        assert count(w, "http://example.com/html#src", EX + "test",
                     "http://example.com/html#href") == 1

    def test_xml_base_mode2(self):
        w = _parse(xml_base=2)
        assert count(w, "http://example.com/xml#about", EX + "test",
                     "http://example.com/xml#resource") == 1
        assert count(w, "http://example.com/xml#src", EX + "test",
                     "http://example.com/xml#href") == 1

    def test_xml_base_on_base_off(self):
        w = _parse(xml_base=1, xhtml_base=0)
        assert count(w, "http://example.com/xml#about", EX + "test",
                     "http://example.com/xml#resource") == 1
        assert count(w, PERL + "#src", EX + "test", PERL + "#href") == 1

    def test_nested_xml_base(self):
        # t/06xmlbase.t:179-205
        doc = """<html xmlns="http://www.w3.org/1999/xhtml"
          xmlns:ex="http://example.com/ns#" xml:lang="en">
         <head><base href="http://example.com/html" /></head>
         <body xml:base="http://example.com/xml-rubbish">
          <div xml:base="http://example.com/xml">
           <div about="#about" rel="ex:test" resource="#resource" />
          </div>
         </body></html>"""
        cfg = make_config("xhtml", RDFA_10, xml_base=1)
        w = parse_rdfa(doc, PERL, cfg)
        assert count(w, "http://example.com/xml#about", EX + "test",
                     "http://example.com/xml#resource") == 1


RDFXML_DOC = """<html
\txmlns="http://www.w3.org/1999/xhtml"
\txmlns:ex="http://example.com/ns#"
\txmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
\txml:lang="en">
\t<head>
\t\t<base href="http://example.com/html" />
\t</head>
\t<body xml:base="http://example.com/xml">
\t\t<rdf:RDF>
\t\t\t<rdf:Description rdf:about="#rdfabout">
\t\t\t\t<ex:foo rdf:resource="#rdfresource" />
\t\t\t</rdf:Description>
\t\t</rdf:RDF>
\t</body>
</html>"""


class TestEmbeddedRdfXml:
    def test_rdfxml_respects_xml_base_always(self):
        # t/06xmlbase.t:140-146 (xml_base=0 still applies to RDF/XML)
        cfg = make_config("xhtml", RDFA_10, xml_base=0,
                          embedded_rdfxml=1)
        w = parse_rdfa(RDFXML_DOC, PERL, cfg)
        assert count(w, "http://example.com/xml#rdfabout", EX + "foo",
                     "http://example.com/xml#rdfresource") == 1

    def test_rdfxml_base_element_mode(self):
        # t/06xmlbase.t:166-177 (xhtml_base=2 -> RDF/XML uses BASE)
        doc = RDFXML_DOC.replace(' xml:base="http://example.com/xml"', "")
        cfg = make_config("xhtml", RDFA_10, xml_base=0, xhtml_base=2,
                          embedded_rdfxml=1)
        w = parse_rdfa(doc, PERL, cfg)
        assert count(w, "http://example.com/html#rdfabout", EX + "foo",
                     "http://example.com/html#rdfresource") == 1

    def test_rdfxml_skip_mode(self):
        # embedded_rdfxml=2 -> subtree skipped entirely (Parser.pm:700)
        cfg = make_config("xhtml", RDFA_10, embedded_rdfxml=2)
        w = parse_rdfa(RDFXML_DOC, PERL, cfg)
        assert count(w, pred=EX + "foo") == 0

    def test_rdfxml_typed_node_and_literal(self):
        doc = """<html xmlns="http://www.w3.org/1999/xhtml"
           xmlns:ex="http://example.com/ns#"
           xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
           xml:lang="de">
          <body><rdf:RDF>
            <ex:Widget rdf:about="http://example.com/w1">
              <ex:label>Hello</ex:label>
              <ex:size rdf:datatype="http://www.w3.org/2001/XMLSchema#int">5</ex:size>
            </ex:Widget>
          </rdf:RDF></body></html>"""
        cfg = make_config("xml", "1.1")
        w = parse_rdfa(doc, PERL, cfg)
        W1 = "http://example.com/w1"
        RDFNS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        assert count(w, W1, RDFNS + "type", EX + "Widget") == 1
        # xml:lang inherited from host document into RDF/XML
        assert count(w, W1, EX + "label", "Hello", lang="de") == 1
        assert count(w, W1, EX + "size", "5",
                     datatype="http://www.w3.org/2001/XMLSchema#int") == 1


NAMEDGRAPH = """<html xmlns:dc="http://purl.org/dc/terms/" xmlns:foaf="http://xmlns.com/foaf/0.1/" xml:lang="en"
xmlns="http://www.w3.org/1999/xhtml">
\t<head>
\t\t<title property="dc:title">This is the title</title>
\t</head>
\t<body xmlns:dc="http://purl.org/dc/elements/1.1/">
\t\t<div rel="foaf:primaryTopic" rev="foaf:page" xml:lang="de">
\t\t\t<h1 about="#topic" typeof="foaf:Person" property="foaf:name">Albert Einstein</h1>
\t\t</div>
\t\t<address rel="foaf:maker dc:creator" rev="foaf:made" xmlns:g="http://example.com/graphing">
\t\t\t<a g:graph="#JOE" about="#maker" property="foaf:name" rel="foaf:homepage" href="joe">Joe Bloggs</a>
\t\t</address>
\t</body>
</html>"""

EINSTEIN = "http://example.com/einstein"


class TestNamedGraphs:
    """t/05namedgraphs.t"""

    def setup_method(self):
        cfg = make_config("xhtml", "1.1", graph=1,
                          graph_attr="{http://example.com/graphing}graph",
                          graph_type="about")
        self.w = parse_rdfa(NAMEDGRAPH, EINSTEIN, cfg)

    def test_graph_uri_filter(self):
        assert count(self.w, EINSTEIN + "#maker", FOAF + "name",
                     "Joe Bloggs", lang="en",
                     graph=EINSTEIN + "#JOE") == 1

    def test_not_in_default_graph(self):
        hits = [t for t in self.w.triples
                if t.subj == EINSTEIN + "#maker"
                and t.pred == FOAF + "name" and t.graph is None]
        assert not hits

    def test_graphs_enumeration(self):
        assert EINSTEIN + "#JOE" in self.w.graphs

    def test_default_graph_triples(self):
        hits = [t for t in self.w.triples
                if t.pred == "http://purl.org/dc/terms/title"]
        assert hits and hits[0].graph is None


class TestSawBaseFastPath:
    """Document.saw_base gates the walker's whole-document <base>
    scan (round-6 fast path); these pin that every construction
    route still honors <base href> — including awkward placements —
    and that hand-built Documents (saw_base=None) keep scanning."""

    BASE = "http://example.com/page"

    def _triples(self, markup, parser="html"):
        cfg = make_config("html5" if parser == "html" else "xhtml",
                          "1.1")
        return parse_rdfa(markup, self.BASE, cfg).triples

    def test_soup_base_honored(self):
        ts = self._triples(
            '<html><head><base href="http://other.example/dir/">'
            '</head><body><p about="x" property="dc:title" '
            'xmlns:dc="http://purl.org/dc/elements/1.1/">T</p>'
            '</body></html>')
        assert any(t.subj == "http://other.example/dir/x"
                   for t in ts)

    def test_soup_base_fostered_out_of_table(self):
        # <base> opened inside a table gets foster-parented; the
        # builder must still mark saw_base so the scan runs
        ts = self._triples(
            '<html><body><table><base '
            'href="http://other.example/dir/"><tr><td>'
            '<p about="x" property="dc:title" '
            'xmlns:dc="http://purl.org/dc/elements/1.1/">T</p>'
            '</td></tr></table></body></html>')
        assert any(t.subj == "http://other.example/dir/x"
                   for t in ts)

    def test_soup_no_base_uses_document_uri(self):
        ts = self._triples(
            '<html><body><p about="x" property="dc:title" '
            'xmlns:dc="http://purl.org/dc/elements/1.1/">T</p>'
            '</body></html>')
        assert any(t.subj == "http://example.com/x" for t in ts)

    def test_xml_prefixed_base_tag(self):
        # expat keeps raw names; a prefixed xhtml:base still counts
        markup = ('<x:html xmlns:x="http://www.w3.org/1999/xhtml" '
                  'xmlns:dc="http://purl.org/dc/elements/1.1/">'
                  '<x:head><x:base href="http://other.example/d/"/>'
                  '</x:head><x:body>'
                  '<x:p about="y" property="dc:title">T</x:p>'
                  '</x:body></x:html>')
        cfg = make_config("xhtml", "1.1")
        ts = parse_rdfa(markup, self.BASE, cfg).triples
        assert any(t.subj == "http://other.example/d/y" for t in ts)

    def test_hand_built_document_still_scans(self):
        # Document(root) without builder provenance: saw_base is
        # None => the walker must fall back to the full scan
        from rdfa_spark.core.dom import Document, Element
        root = Element("html", {
            "xmlns": "http://www.w3.org/1999/xhtml",
            "xmlns:dc": "http://purl.org/dc/elements/1.1/"})
        head = Element("head", {}, root)
        root.children.append(head)
        base = Element("base",
                       {"href": "http://other.example/h/"}, head)
        head.children.append(base)
        body = Element("body", {}, root)
        root.children.append(body)
        p = Element("p", {"about": "z", "property": "dc:title"},
                    body)
        p.children.append("T")
        body.children.append(p)
        doc = Document(root)
        assert doc.saw_base is None
        from rdfa_spark.core.walk import Walker
        cfg = make_config("xhtml", "1.1")
        w = Walker(doc, self.BASE, cfg).consume()
        assert any(t.subj == "http://other.example/h/z"
                   for t in w.triples)

    def test_builder_flags(self):
        from rdfa_spark.core.dom import parse_html, parse_xml
        assert parse_html("<p>x</p>").saw_base is False
        assert parse_html("<base href='u'>").saw_base is True
        assert parse_xml(b"<r><base/></r>").saw_base is True
        assert parse_xml(b"<r><a/></r>").saw_base is False
