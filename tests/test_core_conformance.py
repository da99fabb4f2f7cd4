"""Additional RDFa processing-model edge cases (W3C spec semantics
the reference implements; beyond the t/*.t ports)."""

from rdfa_spark.core import RDFA_10, make_config, parse_rdfa
from tests.test_core_walk import count

EX = "http://example.com/ns#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
DCT = "http://purl.org/dc/terms/"
B = "http://example.com/"


class TestRelPropertyCombinations:
    def test_rel_and_property_same_element(self):
        # rel triples + literal property triples from one element
        doc = """<html xmlns="http://www.w3.org/1999/xhtml"
          xmlns:ex="http://example.com/ns#">
         <body about="http://example.com/s">
          <a rel="ex:link" property="ex:label"
             href="http://example.com/o">text</a>
         </body></html>"""
        w = parse_rdfa(doc, B)
        assert count(w, "http://example.com/s", EX + "link",
                     "http://example.com/o") == 1
        assert count(w, "http://example.com/s", EX + "label",
                     "text") == 1

    def test_rev_only_incomplete_completion(self):
        doc = """<html xmlns="http://www.w3.org/1999/xhtml"
          xmlns:ex="http://example.com/ns#">
         <body about="http://example.com/s">
          <div rev="ex:parent">
            <span about="http://example.com/c">x</span>
          </div>
         </body></html>"""
        w = parse_rdfa(doc, B)
        assert count(w, "http://example.com/c", EX + "parent",
                     "http://example.com/s") == 1

    def test_nested_skip_element_inherits(self):
        # element with no RDFa attrs: children inherit parent_object
        doc = """<html xmlns="http://www.w3.org/1999/xhtml"
          xmlns:ex="http://example.com/ns#">
         <body about="http://example.com/s">
          <div><div><span property="ex:p">v</span></div></div>
         </body></html>"""
        w = parse_rdfa(doc, B)
        assert count(w, "http://example.com/s", EX + "p", "v") == 1


class TestPropertyResources11:
    """RDFa 1.1 property_resources: @property with @href/@resource
    becomes an IRI triple (Parser.pm:1860-1905)."""

    def test_property_with_resource(self):
        doc = """<html xmlns="http://www.w3.org/1999/xhtml"
          xmlns:ex="http://example.com/ns#">
         <body about="http://example.com/s">
          <link property="ex:rel" resource="http://example.com/o" />
         </body></html>"""
        w = parse_rdfa(doc, B)
        [t] = [t for t in w.triples if t.pred == EX + "rel"]
        assert not t.is_literal and t.obj == "http://example.com/o"

    def test_property_typeof_no_about_object(self):
        # @property + @typeof (no @about): object = typed bnode
        doc = """<html xmlns="http://www.w3.org/1999/xhtml"
          xmlns:ex="http://example.com/ns#">
         <body about="http://example.com/s">
          <div property="ex:item" typeof="ex:Thing">x</div>
         </body></html>"""
        w = parse_rdfa(doc, B)
        [t] = [t for t in w.triples if t.pred == EX + "item"]
        assert not t.is_literal and t.obj.startswith("_:")
        assert count(w, t.obj, RDF + "type", EX + "Thing") == 1

    def test_10_property_is_literal_even_with_resource(self):
        # RDFa 1.0: property never produces IRI objects
        doc = """<html xmlns="http://www.w3.org/1999/xhtml"
          xmlns:ex="http://example.com/ns#">
         <body about="http://example.com/s">
          <link property="ex:rel" resource="http://example.com/o" />
         </body></html>"""
        cfg = make_config("xhtml", RDFA_10)
        w = parse_rdfa(doc, B, cfg)
        [t] = [t for t in w.triples if t.pred == EX + "rel"]
        assert t.is_literal and t.obj == ""


class TestContentAndDatatype:
    def test_content_with_datatype(self):
        doc = """<html xmlns="http://www.w3.org/1999/xhtml"
          xmlns:ex="http://example.com/ns#"
          xmlns:xsd="http://www.w3.org/2001/XMLSchema#">
         <body about="http://example.com/s">
          <span property="ex:n" content="5" datatype="xsd:int">five</span>
         </body></html>"""
        w = parse_rdfa(doc, B)
        [t] = [t for t in w.triples if t.pred == EX + "n"]
        assert t.obj == "5"
        assert t.datatype == "http://www.w3.org/2001/XMLSchema#int"
        assert t.lang is None  # typed literals carry no language

    def test_empty_datatype_plain_literal(self):
        doc = """<html xmlns="http://www.w3.org/1999/xhtml"
          xmlns:ex="http://example.com/ns#" xml:lang="en">
         <body about="http://example.com/s">
          <span property="ex:p" datatype=""><b>rich</b> text</span>
         </body></html>"""
        w = parse_rdfa(doc, B)
        [t] = [t for t in w.triples if t.pred == EX + "p"]
        assert t.obj == "rich text"
        assert t.datatype is None and t.lang == "en"

    def test_xmllit_default_in_10(self):
        # RDFa 1.0: element children default to XMLLiteral
        doc = """<html xmlns="http://www.w3.org/1999/xhtml"
          xmlns:ex="http://example.com/ns#">
         <body about="http://example.com/s">
          <span property="ex:p"><b>x</b></span>
         </body></html>"""
        w = parse_rdfa(doc, B, make_config("xhtml", RDFA_10))
        [t] = [t for t in w.triples if t.pred == EX + "p"]
        assert t.datatype == RDF + "XMLLiteral"
        # RDFa 1.1: plain string literal instead
        w = parse_rdfa(doc, B)
        [t] = [t for t in w.triples if t.pred == EX + "p"]
        assert t.datatype is None and t.obj == "x"


class TestVocabAndPrefixScoping:
    def test_prefix_scoping_restored_after_subtree(self):
        doc = """<html xmlns="http://www.w3.org/1999/xhtml">
         <body about="http://example.com/s">
          <div prefix="ex: http://example.com/a#">
            <span property="ex:p" content="1"></span>
          </div>
          <div prefix="ex: http://example.com/b#">
            <span property="ex:p" content="2"></span>
          </div>
         </body></html>"""
        w = parse_rdfa(doc, B)
        assert count(w, "http://example.com/s",
                     "http://example.com/a#p", "1") == 1
        assert count(w, "http://example.com/s",
                     "http://example.com/b#p", "2") == 1

    def test_prefix_overrides_xmlns(self):
        doc = """<html xmlns="http://www.w3.org/1999/xhtml"
          xmlns:ex="http://example.com/xmlns#"
          prefix="ex: http://example.com/prefix#">
         <body about="http://example.com/s">
          <span property="ex:p" content="v"></span>
         </body></html>"""
        w = parse_rdfa(doc, B)
        assert count(w, "http://example.com/s",
                     "http://example.com/prefix#p", "v") == 1

    def test_vocab_scoping(self):
        doc = """<html xmlns="http://www.w3.org/1999/xhtml">
         <body about="http://example.com/s" vocab="http://v1.example/">
          <span property="a" content="1"></span>
          <div vocab="http://v2.example/">
            <span property="b" content="2"></span>
          </div>
          <span property="c" content="3"></span>
         </body></html>"""
        w = parse_rdfa(doc, B)
        assert count(w, pred="http://v1.example/a") == 1
        assert count(w, pred="http://v2.example/b") == 1
        assert count(w, pred="http://v1.example/c") == 1


class TestTagSoupRobustness:
    def test_unclosed_tags(self):
        doc = ("<html><body about=http://example.com/s>"
               "<p property=dc:title>Title"
               "<p property=dc:description>Desc")
        w = parse_rdfa(doc.encode(), B, make_config("html5", "1.1"))
        assert count(w, "http://example.com/s", DCT + "title",
                     "Title") == 1
        assert count(w, "http://example.com/s", DCT + "description",
                     "Desc") == 1

    def test_malformed_xml_falls_back_to_soup(self):
        doc = b"""<?xml version="1.0"?><html xmlns="http://www.w3.org/1999/xhtml">
          <body about="http://example.com/s">
          <span property="dc:title">T</span><b>unclosed
          </body></html>"""
        w = parse_rdfa(doc, B)  # xml parse fails -> tag-soup
        assert count(w, "http://example.com/s", DCT + "title",
                     "T") == 1


class TestSafeCurieEdgeCases:
    def test_empty_safe_curie_ignored(self):
        # about="[]" expands to nothing; subject falls through the
        # remaining chain (here: resource)
        doc = """<html xmlns="http://www.w3.org/1999/xhtml"
          xmlns:ex="http://example.com/ns#">
         <body>
          <div about="[]" resource="http://example.com/r"
               property="ex:p">v</div>
         </body></html>"""
        w = parse_rdfa(doc, B)
        # 1.1 property_resources: property + resource -> IRI object,
        # subject falls back through the chain
        hits = [t for t in w.triples if t.pred == EX + "p"]
        assert len(hits) == 1
        assert hits[0].obj == "http://example.com/r"

    def test_about_empty_string_is_base(self):
        doc = """<html xmlns="http://www.w3.org/1999/xhtml"
          xmlns:ex="http://example.com/ns#">
         <body><div about="" property="ex:p" content="v"></div>
         </body></html>"""
        w = parse_rdfa(doc, B + "page")
        assert count(w, B + "page", EX + "p", "v") == 1

    def test_typeof_on_root_types_base(self):
        doc = """<html xmlns="http://www.w3.org/1999/xhtml"
          typeof="schema:WebPage"><body></body></html>"""
        w = parse_rdfa(doc, B + "page")
        assert count(w, B + "page", RDF + "type",
                     "http://schema.org/WebPage") == 1

    def test_xml_base_on_root(self):
        doc = """<html xmlns="http://www.w3.org/1999/xhtml"
          xmlns:ex="http://example.com/ns#"
          xml:base="http://other.example/dir/">
         <body><div about="rel" property="ex:p" content="v"></div>
         </body></html>"""
        cfg = make_config("xml", "1.1")  # xml host: xml_base=2
        w = parse_rdfa(doc, B)
        # xhtml host has xml_base=0 -> resolve against base
        assert count(w, B + "rel", EX + "p", "v") == 1
        w2 = parse_rdfa(doc, B, cfg)
        assert count(w2, "http://other.example/dir/rel", EX + "p",
                     "v") == 1

    def test_datatype_overrides_lang(self):
        doc = """<html xmlns="http://www.w3.org/1999/xhtml"
          xmlns:ex="http://example.com/ns#"
          xmlns:xsd="http://www.w3.org/2001/XMLSchema#" xml:lang="en">
         <body about="http://example.com/s">
          <span property="ex:p" datatype="xsd:string">v</span>
         </body></html>"""
        w = parse_rdfa(doc, B)
        [t] = [t for t in w.triples if t.pred == EX + "p"]
        assert t.datatype == "http://www.w3.org/2001/XMLSchema#string"
        assert t.lang is None


class TestTagSoupImpliedEndTags:
    def test_li_closes_across_inline(self):
        doc = ("<html><body about='http://e/s'><ul>"
               "<li><span property='dc:title'>A"
               "<li><span property='dc:description'>B"
               "</ul></body></html>")
        w = parse_rdfa(doc.encode(), B, make_config("html5", "1.1"))
        # the second li must NOT be nested inside the first li's span
        assert count(w, "http://e/s", DCT + "title", "A") == 1
        assert count(w, "http://e/s", DCT + "description", "B") == 1

    def test_li_does_not_close_across_nested_list(self):
        from rdfa_spark.core.dom import parse_html
        doc = "<html><body><ul><li>a<ul><li>x<li>y</ul><li>b</ul></body></html>"
        d = parse_html(doc)
        body = d.root.child_elements()[0]
        [ul] = body.child_elements()
        outer_lis = [e for e in ul.child_elements() if e.tag == "li"]
        assert len(outer_lis) == 2  # 'a' (with nested ul) and 'b'
        inner_uls = [e for e in outer_lis[0].child_elements()
                     if e.tag == "ul"]
        assert len(inner_uls) == 1
        assert len(inner_uls[0].child_elements()) == 2  # x, y

    def test_table_rows_and_cells(self):
        from rdfa_spark.core.dom import parse_html
        doc = ("<html><body><table><tr><td>1<td>2<tr><td>3"
               "</table></body></html>")
        d = parse_html(doc)
        table = d.root.child_elements()[0].child_elements()[0]
        trs = [e for e in table.iter_elements() if e.tag == "tr"]
        assert len(trs) == 2
        assert [len([c for c in tr.child_elements() if c.tag == "td"])
                for tr in trs] == [2, 1]


class TestXmlPathEntities:
    """Full XHTML named-entity set on the XML path (libxml catalogue
    parity, Parser.pm:108-119): entity-bearing well-formed XHTML must
    NOT fall back to tag-soup, &nbsp; must be U+00A0, and the text
    invariant (F1) must hold byte-identically."""

    DOC = (b'<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML+RDFa 1.0//EN" '
           b'"http://www.w3.org/MarkUp/DTD/xhtml-rdfa-1.dtd">\n'
           b'<html xmlns="http://www.w3.org/1999/xhtml"'
           b' xmlns:ex="http://example.com/ns#">'
           b'<head><title>A&nbsp;B</title></head><body>'
           b'<p about="#s" property="ex:p">Tom&nbsp;&amp;&nbsp;Jerry'
           b' &copy; &ldquo;q&rdquo; &alpha;&beta; caf&eacute;</p>'
           b'<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-'
           b'syntax-ns#"></rdf:RDF>'
           b'</body></html>')

    def test_stays_on_xml_path_with_entities(self):
        # tag-soup would lowercase rdf:RDF; the XML path keeps case
        from rdfa_spark.core.dom import parse_markup
        d = parse_markup(self.DOC, "xml")
        assert "rdf:RDF" in [e.tag for e in d.iter_elements()]

    def test_entity_values_byte_identical(self):
        w = parse_rdfa(self.DOC, B)
        assert count(w, B + "#s", EX + "p",
                     "Tom & Jerry © “q” "
                     "αβ café") == 1

    def test_text_extraction_nbsp_is_u00a0(self):
        from rdfa_spark.core.walk import extract_text
        txt = extract_text(self.DOC)
        assert "A B" in txt
        assert "αβ" in txt  # full HTML4 set, not a subset

    def test_unknown_entity_warns_not_silent(self):
        doc = (b'<html xmlns="http://www.w3.org/1999/xhtml"'
               b' xmlns:ex="http://example.com/ns#"><body>'
               b'<p about="#s" property="ex:p">x &notanentity; y</p>'
               b'</body></html>')
        w = parse_rdfa(doc, B)
        # dropped like libxml recover, but logged in processor graph
        assert count(w, B + "#s", EX + "p", "x  y") == 1
        assert any(e.code == "entity-unknown" for e in w.errors)

    def test_cdata_and_comments_not_rewritten(self):
        from rdfa_spark.core.dom import parse_xml
        doc = (b'<root><a><![CDATA[&nbsp;]]></a>'
               b'<!-- &nbsp; --><b>&nbsp;</b></root>')
        d = parse_xml(doc)
        els = {e.tag: e for e in d.iter_elements()}
        assert els["a"].text_content() == "&nbsp;"  # CDATA literal
        assert els["b"].text_content() == " "

    def test_predefined_entities_untouched(self):
        from rdfa_spark.core.dom import parse_xml
        d = parse_xml(b'<r a="&lt;&amp;&gt;">&quot;&apos;</r>')
        assert d.root.attrs["a"] == "<&>"
        assert d.root.text_content() == "\"'"


class TestFastPathListMappingParity:
    """The plain-element fast path must not skip the list-mapping
    reset (Parser.pm:1517-1526): under rel+resource, a plain
    intermediary changes list ownership on the slow path."""

    def _both_paths(self, doc):
        from rdfa_spark.core import walk as W
        w = parse_rdfa(doc, B)
        fast = sorted((t.subj, t.pred, t.obj, t.is_literal)
                      for t in w.triples)
        orig = W.Walker._is_plain_element
        W.Walker._is_plain_element = lambda self, el: False
        try:
            w2 = parse_rdfa(doc, B)
        finally:
            W.Walker._is_plain_element = orig
        slow = sorted((t.subj, t.pred, t.obj, t.is_literal)
                      for t in w2.triples)
        return fast, slow

    def test_inlist_under_rel_resource_plain_intermediary(self):
        doc = """<html xmlns="http://www.w3.org/1999/xhtml"
          xmlns:ex="http://example.com/ns#"><body>
          <div rel="ex:knows" resource="#o"><div class="plain">
          <span about="#s" property="ex:tag" inlist="">v</span>
          </div></div></body></html>"""
        fast, slow = self._both_paths(doc)
        assert fast == slow

    def test_inlist_inherited_subject_plain_intermediary(self):
        doc = """<html xmlns="http://www.w3.org/1999/xhtml"
          xmlns:ex="http://example.com/ns#"><body>
          <div rel="ex:knows" resource="#o"><p><b>
          <span property="ex:tag" inlist="">x</span>
          <span property="ex:tag" inlist="">y</span>
          </b></p></div></body></html>"""
        fast, slow = self._both_paths(doc)
        assert fast == slow


class TestRdfXmlTypeAttribute:
    def test_rdf_type_property_attribute_is_resource(self):
        # rdf:type as a property attribute (RDF/XML 2.13) must be an
        # IRI triple, not a literal (ADVICE r1)
        doc = """<html xmlns="http://www.w3.org/1999/xhtml"><body>
          <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
            <rdf:Description rdf:about="http://example.com/e"
                             rdf:type="http://example.com/ns#Class"/>
          </rdf:RDF></body></html>"""
        cfg = make_config("xhtml", RDFA_10, embedded_rdfxml=1)
        w = parse_rdfa(doc, B, cfg)
        hits = [t for t in w.triples
                if t.pred == RDF + "type" and t.obj == EX + "Class"]
        assert len(hits) == 1
        assert hits[0].is_literal is False
