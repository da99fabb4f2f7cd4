"""Extension-flag parity: t/07rdfxml.t semantics, @role/@cite/
@longdesc (tagsoup profile), alt-stylesheet, prefix error codes,
processor-graph errors."""

from rdfa_spark.core import (RDFA_10, make_config, parse_rdfa,
                             tagsoup_config)
from tests.test_core_walk import count

EX = "http://example.com/ns#"
XHV = "http://www.w3.org/1999/xhtml/vocab#"

RDFXML_MIX = """<html xmlns:ex="http://example.com/ns#"
\txmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
\txmlns="http://www.w3.org/1999/xhtml"
\txml:lang="en-gb">
\t<body>
\t\t<div about="[ex:r1]" property="ex:test" datatype="rdf:XMLLiteral">
\t\t\t<rdf:RDF>
\t\t\t\t<rdf:Description rdf:about="http://example.com/ns#r2">
\t\t\t\t\t<ex:test rdf:resource="http://example.com/ns#test" />
\t\t\t\t</rdf:Description>
\t\t\t</rdf:RDF>
\t\t</div>
\t\t<rdf:RDF>
\t\t\t<rdf:Description rdf:about="http://example.com/ns#r3">
\t\t\t\t<ex:test rdf:resource="http://example.com/ns#test" />
\t\t\t\t<ex:literal>Foo</ex:literal>
\t\t\t</rdf:Description>
\t\t</rdf:RDF>
\t</body>
</html>"""


class TestRdfXmlMix:
    """t/07rdfxml.t"""

    def setup_method(self):
        cfg = make_config("xhtml", RDFA_10, embedded_rdfxml=1)
        self.w = parse_rdfa(RDFXML_MIX, "http://example.com/", cfg)

    def test_rdfxml_inside_xmlliteral_shielded(self):
        # t/07rdfxml.t:40-46
        assert count(self.w, EX + "r2", EX + "test", EX + "test") == 0

    def test_xmlliteral_contains_markup(self):
        [t] = [t for t in self.w.triples
               if t.subj == EX + "r1" and t.pred == EX + "test"]
        assert "rdf:RDF" in t.obj
        assert t.datatype and t.datatype.endswith("XMLLiteral")

    def test_embedded_rdfxml_parsed(self):
        assert count(self.w, EX + "r3", EX + "test", EX + "test") == 1

    def test_lang_inherited_into_rdfxml(self):
        assert count(self.w, EX + "r3", EX + "literal", "Foo",
                     lang="en-gb") == 1

    def test_skip_mode(self):
        cfg = make_config("xhtml", "1.1", embedded_rdfxml=2)
        w = parse_rdfa(RDFXML_MIX, "http://example.com/", cfg)
        assert count(w, EX + "r3", EX + "test", EX + "test") == 0

    def test_rdfxml_bnode_named_graph(self):
        # t/07rdfxml.t:75-100
        cfg = make_config("xhtml", "1.1", embedded_rdfxml=1, graph=1)
        w = parse_rdfa(RDFXML_MIX, "http://example.com/", cfg)
        hits = [t for t in w.triples
                if t.subj == EX + "r3" and t.pred == EX + "literal"]
        assert len(hits) == 1
        assert hits[0].graph and hits[0].graph.startswith("_:")


ROLE_CITE = """<html>
 <body>
  <div id="widget" role="navigation banner ex:custom"
       xmlns:ex="http://example.com/ns#">x</div>
  <blockquote cite="http://example.com/src">q</blockquote>
  <img longdesc="/desc.html" src="/i.png" />
 </body>
</html>"""


class TestTagsoupExtensions:
    """@role (Parser.pm:980-1027), @cite (1030-1056),
    @longdesc (1493-1514) under the everything-on tagsoup profile."""

    def setup_method(self):
        self.w = parse_rdfa(ROLE_CITE, "http://example.com/page",
                            tagsoup_config())

    def test_role_with_id_subject(self):
        assert count(self.w, "http://example.com/page#widget",
                     XHV + "role", XHV + "navigation") == 1
        assert count(self.w, "http://example.com/page#widget",
                     XHV + "role", XHV + "banner") == 1
        assert count(self.w, "http://example.com/page#widget",
                     XHV + "role", EX + "custom") == 1

    def test_cite_bnode_subject(self):
        hits = [t for t in self.w.triples if t.pred == XHV + "cite"]
        assert len(hits) == 1
        assert hits[0].obj == "http://example.com/src"
        assert hits[0].subj.startswith("_:")

    def test_longdesc(self):
        hits = [t for t in self.w.triples
                if t.pred == "http://www.w3.org/2007/05/powder-s#describedby"]
        assert len(hits) == 1
        assert hits[0].obj == "http://example.com/desc.html"


class TestAltStylesheet:
    def test_alternate_stylesheet_rel(self):
        doc = """<html><head>
          <link rel="alternate stylesheet" href="/alt.css" />
        </head><body></body></html>"""
        w = parse_rdfa(doc, "http://example.com/",
                       tagsoup_config(alt_stylesheet=True))
        assert count(w, "http://example.com/",
                     XHV + "ALTERNATE-STYLESHEET",
                     "http://example.com/alt.css") == 1


class TestPrefixErrors:
    def test_builtin_prefix_redefinition_rejected(self):
        doc = """<html xmlns="http://www.w3.org/1999/xhtml"
          xmlns:xml="http://bad.example/">
         <body about="http://e/x" property="xml:base" content="v"></body>
        </html>"""
        w = parse_rdfa(doc, "http://example.com/")
        assert any(e.code == "prefix-builtin" for e in w.errors)
        # xml: still resolves to the real XML namespace
        hits = [t for t in w.triples if t.pred ==
                "http://www.w3.org/XML/1998/namespace" + "base"]
        assert hits

    def test_undefined_safe_curie_warning(self):
        doc = """<html xmlns="http://www.w3.org/1999/xhtml">
          <body><div about="[nope:x]" property="dc:title"
                content="v"></div></body></html>"""
        w = parse_rdfa(doc, "http://example.com/")
        assert any(e.code == "curie-undefined" for e in w.errors)

    def test_invalid_lang_warning(self):
        doc = """<html xmlns="http://www.w3.org/1999/xhtml"
          xml:lang="not!!valid"><body></body></html>"""
        w = parse_rdfa(doc, "http://example.com/")
        assert any(e.code == "lang-invalid" for e in w.errors)


class TestAtomHost:
    def test_atom_feed_entry_bnodes_and_iana_rels(self):
        doc = """<feed xmlns="http://www.w3.org/2005/Atom">
          <entry>
            <link rel="license" href="http://example.com/lic" />
          </entry>
        </feed>"""
        cfg = make_config("atom", "1.1", atom_elements=True)
        w = parse_rdfa(doc, "http://example.com/feed", cfg)
        # vocab_default = IANA link relations
        hits = [t for t in w.triples if t.pred ==
                "http://www.iana.org/assignments/relation/license"]
        assert len(hits) == 1
        assert hits[0].subj.startswith("_:")  # entry bnode subject


ATOM_FEED = """<?xml version="1.0" encoding="utf-8"?>
<feed xmlns="http://www.w3.org/2005/Atom"
\txmlns:rel="http://example.com/rel#"
\txmlns:product="http://example.com/product#"
\txmlns:currency="http://example.com/currency#">
  <title type="text">dive into mark</title>
  <updated>2005-07-31T12:29:29Z</updated>
  <id>tag:example.org,2003:3</id>
  <link rel="self" type="application/atom+xml"
   href="http://example.org/feed.atom"/>
  <entry>
    <title>Atom draft-07 snapshot</title>
    <link rel="enclosure" type="audio/mpeg" length="1337"
     href="http://example.org/audio/ph34r_my_podcast.mp3"/>
    <id>tag:example.org,2003:3.2397</id>
    <updated>2005-07-31T12:29:29Z</updated>
    <author>
      <name>Mark Pilgrim</name>
      <uri>http://example.org/</uri>
    </author>
  </entry>
</feed>"""

AWOL = "http://bblfish.net/work/atom-owl/2006-06-06/#"
IANA = "http://www.iana.org/assignments/relation/"
XSDNS = "http://www.w3.org/2001/XMLSchema#"


class TestAtomOwlOverlay:
    """t/08atom.t (atom_parser=1): AtomOWL overlay + IANA rels +
    shared bnode subjects between the RDFa layer and the overlay."""

    def setup_method(self):
        cfg = make_config("atom", "1.0", atom_parser=True)
        self.w = parse_rdfa(ATOM_FEED, "http://example.com/", cfg)

    def test_feed_and_entry_ids(self):
        # t/08atom.t:85-103
        assert count(self.w, pred=AWOL + "id",
                     obj="tag:example.org,2003:3",
                     datatype=XSDNS + "anyURI") == 1
        assert count(self.w, pred=AWOL + "id",
                     obj="tag:example.org,2003:3.2397",
                     datatype=XSDNS + "anyURI") == 1

    def test_iana_enclosure_link(self):
        # t/08atom.t:105-112 (this comes from the RDFa layer)
        assert count(self.w, pred=IANA + "enclosure",
                     obj="http://example.org/audio/"
                         "ph34r_my_podcast.mp3") >= 1

    def test_author_uri(self):
        # t/08atom.t ASK: ?entry awol:author [ awol:uri <...> ]
        [a] = [t for t in self.w.triples
               if t.pred == AWOL + "author"]
        assert count(self.w, a.obj, AWOL + "uri",
                     "http://example.org/") == 1

    def test_shared_bnode_subjects(self):
        # the entry's awol:id subject must equal the RDFa layer's
        # entry bnode (shared allocator)
        [idt] = [t for t in self.w.triples
                 if t.pred == AWOL + "id"
                 and t.obj.endswith("3.2397")]
        enc = [t for t in self.w.triples
               if t.pred == IANA + "enclosure"]
        assert enc and enc[0].subj == idt.subj


class TestAutoConfig:
    """F7 auto_config from <meta> (Config.pm:405-459)."""

    def test_auto_config_enables_flags(self):
        doc = """<html xmlns="http://www.w3.org/1999/xhtml"
          xmlns:ex="http://example.com/ns#">
         <head><meta
          name="http://search.cpan.org/dist/RDF-RDFa-Parser/#auto_config"
          content="xhtml_lang=1&amp;vocab_default=http%3A%2F%2Fv.example%2F" /></head>
         <body about="http://example.com/s">
          <span lang="de" property="ex:p" content="x"></span>
          <span property="word" content="y"></span>
         </body></html>"""
        cfg = make_config("xhtml", "1.1", auto_config=True)
        w = parse_rdfa(doc, "http://example.com/", cfg)
        # xhtml_lang honoured via auto config
        [t] = [t for t in w.triples if t.pred == EX + "p"]
        assert t.lang == "de"
        # vocab_default applied
        assert count(w, "http://example.com/s", "http://v.example/word",
                     "y") == 1

    def test_auto_config_off_by_default(self):
        doc = """<html xmlns="http://www.w3.org/1999/xhtml">
         <head><meta
          name="http://search.cpan.org/dist/RDF-RDFa-Parser/#auto_config"
          content="vocab_default=http%3A%2F%2Fv.example%2F" /></head>
         <body about="http://example.com/s">
          <span property="word" content="y"></span>
         </body></html>"""
        w = parse_rdfa(doc, "http://example.com/")
        # without the flag the vocab option is not applied -> the
        # bare term doesn't expand, no triple
        assert count(w, pred="http://v.example/word") == 0
