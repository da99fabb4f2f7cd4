"""OpenDocument ZIP source (S3) + bookmarked-range literals (F3).

Port of the reference's t/09opendocument.t: an ODT package whose
content.xml carries RDFa property attributes on OpenDocument
bookmark-start elements; the literal value of each is the text
between the start and the same-named bookmark-end, crossing element
boundaries (Parser.pm:1787-1797, 2473-2539).  The fixture is
synthesized in-test (same markup shapes as the reference's
09opendocument.odt, regenerated rather than copied).
"""

import io
import zipfile

from rdfa_spark.core import make_config, parse_rdfa

DC = "http://purl.org/dc/elements/1.1/"
BASE = "http://example.com/09opendocument.odt"

CONTENT_XML = """<?xml version="1.0" encoding="UTF-8"?>
<office:document-content
  xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
  xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"
  xmlns:xhtml="http://www.w3.org/1999/xhtml"
  xmlns:dc="http://purl.org/dc/elements/1.1/">
 <office:body><office:text><text:p>A<text:bookmark-start
   text:name="desc" xhtml:property="dc:example1"/>B<text:bookmark-end
   text:name="desc"/>C</text:p><text:p>D<text:bookmark-start
   text:name="desc2" xhtml:property="dc:example2"/>E<text:bookmark-start
   xhtml:property="dc:example3" text:name="desc3"/>F</text:p><text:p
   xhtml:property="dc:example4" xhtml:datatype="">G<text:bookmark-end
   text:name="desc2"/>H<text:bookmark-end
   text:name="desc3"/>I</text:p></office:text></office:body>
</office:document-content>"""

META_XML = """<?xml version="1.0" encoding="UTF-8"?>
<office:document-meta
  xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
  xmlns:xhtml="http://www.w3.org/1999/xhtml"
  xmlns:dc="http://purl.org/dc/elements/1.1/">
 <office:meta xhtml:property="dc:example5"
   xhtml:content="meta-value"/>
</office:document-meta>"""

MANIFEST_RDF = """<?xml version="1.0" encoding="UTF-8"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:pkg="http://docs.oasis-open.org/ns/office/1.2/meta/pkg#">
 <rdf:Description rdf:about="">
  <rdf:type rdf:resource="http://docs.oasis-open.org/ns/office/1.2/meta/pkg#Document"/>
 </rdf:Description>
</rdf:RDF>"""


def make_odt(members: dict[str, str] | None = None) -> bytes:
    files = {"mimetype": "application/vnd.oasis.opendocument.text",
             "content.xml": CONTENT_XML,
             "meta.xml": META_XML,
             "manifest.rdf": MANIFEST_RDF}
    if members is not None:
        files = members
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in files.items():
            zf.writestr(name, data)
    return buf.getvalue()


def _literals(w, pred):
    return [(t.subj, t.obj) for t in w.triples if t.pred == pred]


class TestOpenDocumentZip:
    def test_t09_bookmarked_ranges(self):
        """t/09opendocument.t ASK: one non-blank subject carries
        dc:example1 'B', dc:example2 'EFG', dc:example3 'FGH',
        dc:example4 'GHI'."""
        cfg = make_config("opendocument-zip", "1.1", graph=0)
        w = parse_rdfa(make_odt(), BASE, cfg)
        got = {}
        for i, want in [(1, "B"), (2, "EFG"), (3, "FGH"), (4, "GHI")]:
            lits = _literals(w, f"{DC}example{i}")
            assert len(lits) == 1, (i, lits)
            got[i] = lits[0]
            assert lits[0][1] == want, (i, lits)
        subjects = {s for s, _ in got.values()}
        assert len(subjects) == 1
        subj = subjects.pop()
        assert not subj.startswith("_:")        # FILTER(!isBlank(?u))
        assert subj == f"jar:{BASE}!/content.xml"

    def test_member_subjects_and_content_attr(self):
        """Each member gets its own jar: subject; meta.xml RDFa
        resolves against its wrapper's about/xml:base."""
        cfg = make_config("opendocument-zip", "1.1", graph=0)
        w = parse_rdfa(make_odt(), BASE, cfg)
        lits = _literals(w, DC + "example5")
        assert lits == [(f"jar:{BASE}!/meta.xml", "meta-value")]

    def test_named_graphs_per_member(self):
        """Default ZIP config (graph=3, od:graph attr, Clark-notation
        graph_attr): triples land in per-member jar: graphs."""
        cfg = make_config("opendocument-zip", "1.1")
        w = parse_rdfa(make_odt(), BASE, cfg)
        by_graph = {}
        for t in w.triples:
            by_graph.setdefault(t.graph, set()).add(t.pred)
        assert f"jar:{BASE}!/content.xml" in by_graph
        assert f"jar:{BASE}!/meta.xml" in by_graph
        assert DC + "example1" in by_graph[f"jar:{BASE}!/content.xml"]
        assert DC + "example5" in by_graph[f"jar:{BASE}!/meta.xml"]

    def test_manifest_rdf_meta_member(self):
        """manifest.rdf is wrapped as od:Meta and parsed as embedded
        RDF/XML (rdf:about='' resolves against the member base)."""
        cfg = make_config("opendocument-zip", "1.1", graph=0,
                          embedded_rdfxml=1)
        w = parse_rdfa(make_odt(), BASE, cfg)
        types = [(t.subj, t.obj) for t in w.triples
                 if t.pred.endswith("22-rdf-syntax-ns#type")
                 and t.obj.endswith("pkg#Document")]
        assert types == [(f"jar:{BASE}!/manifest.rdf",
                          "http://docs.oasis-open.org/ns/office/1.2/"
                          "meta/pkg#Document")]

    def test_missing_members_skipped(self):
        cfg = make_config("opendocument-zip", "1.1", graph=0)
        odt = make_odt({"content.xml": CONTENT_XML})
        w = parse_rdfa(odt, BASE, cfg)
        assert _literals(w, DC + "example1") == [
            (f"jar:{BASE}!/content.xml", "B")]

    def test_malformed_member_skipped(self):
        cfg = make_config("opendocument-zip", "1.1", graph=0)
        odt = make_odt({"content.xml": CONTENT_XML,
                        "styles.xml": "<not-xml <<<"})
        w = parse_rdfa(odt, BASE, cfg)
        assert len(_literals(w, DC + "example1")) == 1

    def test_media_type_dispatch(self):
        from rdfa_spark.core.config import (host_from_media_type,
                                            ODF_MEDIA_TYPES)
        for mt in ODF_MEDIA_TYPES:
            assert host_from_media_type(mt) == "opendocument-zip"
        assert host_from_media_type("application/zip") \
            == "opendocument-zip"

    def test_bookmark_end_without_name_match_runs_to_document_end(self):
        """A start bookmark with no matching end collects the rest of
        the document's text (reference loop exhausts _find_next_node)."""
        cfg = make_config("opendocument-zip", "1.1", graph=0)
        content = """<?xml version="1.0"?>
<office:document-content
  xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
  xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"
  xmlns:xhtml="http://www.w3.org/1999/xhtml"
  xmlns:dc="http://purl.org/dc/elements/1.1/">
 <office:body><office:text><text:p>A<text:bookmark-start
   text:name="x" xhtml:property="dc:examplex"/>BC</text:p>
 <text:p>DE</text:p></office:text></office:body>
</office:document-content>"""
        odt = make_odt({"content.xml": content})
        w = parse_rdfa(odt, BASE, cfg)
        lits = _literals(w, DC + "examplex")
        assert len(lits) == 1
        # text after the start, to end of member: 'BC' + ws + 'DE' + ws
        assert lits[0][1].split() == ["BC", "DE"]


import os
import pytest

REF_ODT = "/root/reference/t/09opendocument.odt"


@pytest.mark.skipif(not os.path.exists(REF_ODT),
                    reason="reference fixture not present")
def test_reference_fixture_t09_ask():
    """Run the reference's own 09opendocument.odt through the engine
    and assert the exact ASK of t/09opendocument.t."""
    with open(REF_ODT, "rb") as fh:
        data = fh.read()
    cfg = make_config("opendocument-zip", "1.1", graph=0)
    w = parse_rdfa(data, BASE, cfg)
    by_pred = {}
    for t in w.triples:
        if t.pred.startswith(DC):
            by_pred.setdefault(t.pred, []).append((t.subj, t.obj))
    subj = f"jar:{BASE}!/content.xml"
    assert (subj, "B") in by_pred[DC + "example1"]
    assert (subj, "EFG") in by_pred[DC + "example2"]
    assert (subj, "FGH") in by_pred[DC + "example3"]
    assert (subj, "GHI") in by_pred[DC + "example4"]


def test_odf_page_in_spark_extraction(spark):
    """An ODF package in the crawl (binary column) is sniffed by ZIP
    magic and extracted alongside HTML pages — S3 through the
    distributed surface, one job."""
    from rdfa_spark.extract import extract_triples
    rows = [
        ("http://ex.com/doc.odt", make_odt()),
        ("http://ex.com/page.html",
         b'<html xmlns:dc="http://purl.org/dc/elements/1.1/">'
         b'<body><p property="dc:title">plain</p></body></html>'),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = extract_triples(df).collect()
    odt = [(t.subj, t.obj, t.graph) for t in got
           if t.url.endswith(".odt") and t.pred == DC + "example1"]
    assert odt == [("jar:http://ex.com/doc.odt!/content.xml", "B",
                    "jar:http://ex.com/doc.odt!/content.xml")]
    html = [t.obj for t in got if t.url.endswith(".html")
            and t.pred == DC + "title"]
    assert html == ["plain"]
