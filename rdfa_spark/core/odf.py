"""OpenDocument ZIP source (S3): ODF package -> wrapped DOM.

Re-expresses the reference's OpenDocumentObjectModel
(lib/RDF/RDFa/Parser/OpenDocumentObjectModel.pm:52-105): an ODF file
is a ZIP of XML members; each member's parsed root is grafted under a
synthetic ``od:Document`` root inside an ``od:Data`` (XML members) or
``od:Meta`` (RDF/XML members) wrapper carrying

* ``xhtml:about``  — the member's ``jar:<base>!/<file>`` URL, so the
  RDFa walker's parent subject for each member is that URL;
* ``xml:base``     — same URL, so relative URIs resolve per member;
* ``od:graph``     — same URL, the named-graph attribute the
  HOST_OPENDOCUMENT_ZIP config keys on (graph_attr in Clark
  notation);
* ``od:file``      — the member path.

stdlib ``zipfile`` over an in-memory buffer replaces Archive::Zip —
the bytes arrive as a binary column, never a local file.
"""

from __future__ import annotations

import io
import re
import zipfile

from .dom import Document, Element, XHTML_NS, parse_xml

DOM_NS = ("http://purl.org/NET/cpan-uri/dist/RDF-RDFa-Parser/"
          "opendocument-dom-wrapper")

# fixed member order (OpenDocumentObjectModel.pm:64,73-74)
_DATA_MEMBERS = ("content.xml", "settings.xml", "styles.xml",
                 "meta.xml", "META-INF/manifest.xml")
_META_RDF_RE = re.compile(r"^/?meta/.+\.rdf$")


def parse_opendocument(data: bytes, baseurl: str) -> Document:
    """ODF package bytes -> wrapped Document (S3).

    Unreadable/malformed members are skipped, like the reference's
    ``return unless $content_dom`` (OpenDocumentObjectModel.pm:94).
    Raises ``zipfile.BadZipFile`` if the bytes are not a ZIP at all.
    """
    zf = zipfile.ZipFile(io.BytesIO(data))
    names = zf.namelist()
    root = Element("od:Document",
                   {"xmlns:xhtml": XHTML_NS, "xmlns:od": DOM_NS})

    def graft(member: str, cls: str) -> None:
        if member not in names:
            return
        try:
            content = zf.read(member)
            sub = parse_xml(content)
        except Exception:
            return
        content_base = f"jar:{baseurl}!/{member}"
        wrapper = Element(
            "od:" + cls,
            {"xhtml:about": content_base,
             "xml:base": content_base,
             "od:graph": content_base,
             "od:file": member},
            parent=root)
        sub.root.parent = wrapper
        wrapper.children.append(sub.root)
        root.children.append(wrapper)

    for member in _DATA_MEMBERS:
        graft(member, "Data")
    rdf_members = ["manifest.rdf"] + sorted(
        n for n in names if _META_RDF_RE.match(n))
    for member in rdf_members:
        graft(member, "Meta")
    return Document(root)
