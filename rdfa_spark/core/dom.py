"""Minimal stdlib DOM for RDFa extraction.

The reference parses markup with libxml2 (XML::LibXML) or an HTML5
tag-soup parser (reference: lib/RDF/RDFa/Parser.pm:98-119).  lxml is
not available in this environment, so we build a tiny DOM on top of
``xml.parsers.expat`` (XML path) and ``html.parser`` (tag-soup path).

Design notes
------------
* Namespace processing is done *by us*, not by the parser: tags and
  attributes keep their raw names (``rdf:RDF``, ``xml:lang``,
  ``xmlns:dc``) and namespace URIs are resolved lazily by walking the
  ancestor chain of ``xmlns``/``xmlns:*`` declarations.  This gives
  uniform behaviour for well-formed XML and tag-soup HTML.
* Text nodes are plain ``str`` children; comments/PIs are ``Comment``
  wrappers so XML-literal serialization can keep them.
* This module is Spark-free and lxml-free on purpose: the whole RDFa
  core is unit-testable without a JVM.
"""

from __future__ import annotations

import html.entities
import re
import xml.parsers.expat
from html.parser import HTMLParser

XML_NS = "http://www.w3.org/XML/1998/namespace"
XMLNS_NS = "http://www.w3.org/2000/xmlns/"
XHTML_NS = "http://www.w3.org/1999/xhtml"


class Comment:
    __slots__ = ("data",)

    def __init__(self, data: str):
        self.data = data


class ProcessingInstruction:
    __slots__ = ("target", "data")

    def __init__(self, target: str, data: str):
        self.target = target
        self.data = data


class Element:
    __slots__ = ("tag", "attrs", "children", "parent", "_nsmap_cache")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None,
                 parent: "Element | None" = None):
        self.tag = tag
        self.attrs: dict[str, str] = attrs or {}
        self.children: list = []
        self.parent = parent
        self._nsmap_cache = None

    # -- name parts -------------------------------------------------
    @property
    def prefix(self) -> str | None:
        if ":" in self.tag:
            return self.tag.split(":", 1)[0]
        return None

    @property
    def localname(self) -> str:
        if ":" in self.tag:
            return self.tag.split(":", 1)[1]
        return self.tag

    # -- namespaces -------------------------------------------------
    def nsmap(self) -> dict[str | None, str]:
        """In-scope xmlns declarations (prefix -> uri; None = default).
        Shares the parent's map unless this element declares one
        (copy-on-declare: most elements declare nothing)."""
        if self._nsmap_cache is not None:
            return self._nsmap_cache
        parent_map: dict[str | None, str] = (
            self.parent.nsmap() if self.parent is not None else {})
        merged = None
        for k, v in self.attrs.items():
            if k == "xmlns":
                if merged is None:
                    merged = dict(parent_map)
                merged[None] = v
            elif k.startswith("xmlns:"):
                if merged is None:
                    merged = dict(parent_map)
                merged[k[6:]] = v
        self._nsmap_cache = merged if merged is not None else parent_map
        return self._nsmap_cache

    @property
    def namespace_uri(self) -> str | None:
        pfx = self.prefix
        if pfx == "xml":
            return XML_NS
        return self.nsmap().get(pfx)

    # -- attribute access --------------------------------------------
    def get(self, name: str, default: str | None = None) -> str | None:
        return self.attrs.get(name, default)

    def has(self, name: str) -> bool:
        return name in self.attrs

    # -- traversal ----------------------------------------------------
    def child_elements(self):
        return [c for c in self.children if isinstance(c, Element)]

    def iter_elements(self):
        """All descendant elements (not self), document order."""
        for c in self.children:
            if isinstance(c, Element):
                yield c
                yield from c.iter_elements()

    def has_descendant_elements(self) -> bool:
        return any(True for _ in self.iter_elements())

    def itertext(self):
        """All descendant text in document order.

        Matches the reference's ``_element_to_string``
        (lib/RDF/RDFa/Parser.pm:2541-2559): only TEXT nodes count;
        comments and PIs do not contribute.
        """
        for c in self.children:
            if isinstance(c, str):
                yield c
            elif isinstance(c, Element):
                yield from c.itertext()

    def text_content(self) -> str:
        return "".join(self.itertext())

    def node_path(self) -> str:
        """Stable, deterministic path (used for element-subject memos
        and error provenance; analogue of libxml nodePath)."""
        parts = []
        node = self
        while node is not None:
            parent = node.parent
            if parent is None:
                parts.append("/" + node.tag)
            else:
                sibs = [c for c in parent.children
                        if isinstance(c, Element) and c.tag == node.tag]
                idx = sibs.index(node) + 1
                parts.append(f"/{node.tag}[{idx}]")
            node = parent
        return "".join(reversed(parts))


class Document:
    __slots__ = ("root", "parse_warnings")

    def __init__(self, root: Element,
                 parse_warnings: list[str] | None = None):
        self.root = root
        # Non-fatal parse recoveries (e.g. unknown entity dropped),
        # surfaced into the processor graph by the extraction layer.
        self.parse_warnings: list[str] = parse_warnings or []

    def iter_elements(self):
        if self.root is not None:
            yield self.root
            yield from self.root.iter_elements()


# ---------------------------------------------------------------------------
# XML parsing (expat, no namespace processing — we keep raw names)
# ---------------------------------------------------------------------------

# Strip DTD to avoid expat chasing external entities; the reference
# uses an XML catalogue for the same reason (Parser.pm:108-119).
_DOCTYPE_RE = re.compile(rb"<!DOCTYPE[^\[>]*(\[[^\]]*\])?[^>]*>", re.S)

# The full XHTML 1.0 named-entity set == the HTML4 set shipped in the
# stdlib (252 names).  libxml2 resolves these through its XML
# catalogue (Parser.pm:108-119); we pre-substitute them as numeric
# character references before expat sees the bytes, so entity-bearing
# but otherwise well-formed XHTML stays on the XML path (expat has no
# DTD and would abort on the first named entity otherwise).
# The five XML predefined entities must be left for expat itself:
# rewriting &lt; to '<' would corrupt markup.
_XML_PREDEFINED = frozenset(("amp", "lt", "gt", "quot", "apos"))
_ENTITY_REF_RE = re.compile(rb"&([a-zA-Z][a-zA-Z0-9]{0,31});")
# Regions where entity syntax is literal text and must NOT be
# rewritten: CDATA sections and comments.
_PROTECTED_RE = re.compile(rb"<!\[CDATA\[.*?\]\]>|<!--.*?-->", re.S)

_NAME2CHARREF = {
    name.encode("ascii"): b"&#%d;" % cp
    for name, cp in html.entities.name2codepoint.items()
    if name not in _XML_PREDEFINED
}


def _entity_repl(m):
    ref = _NAME2CHARREF.get(m.group(1))
    # Unknown names are left verbatim; expat reports them through the
    # SkippedEntityHandler (UseForeignDTD below) like libxml recover.
    return ref if ref is not None else m.group(0)


def _substitute_entities(markup: bytes) -> bytes:
    """Rewrite known XHTML named entities to numeric charrefs,
    skipping CDATA sections and comments."""
    if b"&" not in markup:
        return markup
    out = []
    pos = 0
    for m in _PROTECTED_RE.finditer(markup):
        out.append(_ENTITY_REF_RE.sub(_entity_repl, markup[pos:m.start()]))
        out.append(m.group(0))
        pos = m.end()
    out.append(_ENTITY_REF_RE.sub(_entity_repl, markup[pos:]))
    return b"".join(out)


class _XmlBuilder:
    def __init__(self):
        self.root: Element | None = None
        self.stack: list[Element] = []

    def start(self, name, attrs):
        el = Element(name, dict(attrs),
                     self.stack[-1] if self.stack else None)
        if self.stack:
            self.stack[-1].children.append(el)
        elif self.root is None:
            self.root = el
        self.stack.append(el)

    def end(self, name):
        self.stack.pop()

    def chars(self, data):
        if self.stack:
            kids = self.stack[-1].children
            if kids and isinstance(kids[-1], str):
                kids[-1] += data
            else:
                kids.append(data)

    def comment(self, data):
        if self.stack:
            self.stack[-1].children.append(Comment(data))

    def pi(self, target, data):
        if self.stack:
            self.stack[-1].children.append(
                ProcessingInstruction(target, data))


def parse_xml(markup: bytes | str) -> Document:
    """Parse well-formed (X)HTML/XML bytes into a Document.

    Raises ``xml.parsers.expat.ExpatError`` on malformed input;
    callers fall back to the tag-soup parser.
    """
    if isinstance(markup, str):
        markup = markup.encode("utf-8")
    # Replace DOCTYPE (we resolve XHTML entities ourselves, below).
    markup = _DOCTYPE_RE.sub(b"", markup)
    # Resolve the full XHTML named-entity set up front (&nbsp; ->
    # U+00A0 etc.), keeping entity-bearing XHTML on the XML path.
    markup = _substitute_entities(markup)

    b = _XmlBuilder()
    p = xml.parsers.expat.ParserCreate()  # no namespace separator
    p.buffer_text = True
    p.StartElementHandler = b.start
    p.EndElementHandler = b.end
    p.CharacterDataHandler = b.chars
    p.CommentHandler = b.comment
    p.ProcessingInstructionHandler = b.pi
    # Pretend an (unread) external DTD exists so a genuinely unknown
    # entity is a recoverable skip, not a fatal error — the libxml2
    # "recover" analogue: the entity contributes no text and we record
    # a warning for the processor graph.
    p.UseForeignDTD(True)
    p.SetParamEntityParsing(xml.parsers.expat.XML_PARAM_ENTITY_PARSING_NEVER)
    warnings: list[str] = []

    def skipped(name, is_param):
        warnings.append(f"unknown entity &{name}; dropped")

    p.SkippedEntityHandler = skipped
    p.Parse(markup, True)
    if b.root is None:
        raise xml.parsers.expat.ExpatError("no root element")
    return Document(b.root, warnings)


# ---------------------------------------------------------------------------
# Tag-soup HTML parsing (html.parser)
# ---------------------------------------------------------------------------

_VOID = frozenset("""area base br col embed hr img input link meta param
source track wbr""".split())

# Minimal HTML5-ish implied-end-tag handling: a new <p>-family element
# closes an open <p>; <li> closes <li>; table-section tags close peers.
_CLOSE_P = frozenset("""address article aside blockquote div dl fieldset
figcaption figure footer form h1 h2 h3 h4 h5 h6 header hr main nav ol p
pre section table ul""".split())
# On <tag>, close any open element in `closes` below the nearest
# `scope` boundary (HTML5 implied end tags: a new <li> closes an open
# <li> even across inline descendants, but not across a nested list).
_IMPLIED_END = {
    "li": ({"li"}, {"ul", "ol", "body"}),
    "option": ({"option"}, {"select", "body"}),
    "tr": ({"tr", "td", "th"}, {"table", "thead", "tbody", "tfoot",
                                "body"}),
    "td": ({"td", "th"}, {"tr", "table", "body"}),
    "th": ({"td", "th"}, {"tr", "table", "body"}),
    "dd": ({"dd", "dt"}, {"dl", "body"}),
    "dt": ({"dd", "dt"}, {"dl", "body"}),
    "thead": ({"thead", "tbody", "tfoot", "tr", "td", "th"},
              {"table", "body"}),
    "tbody": ({"thead", "tbody", "tfoot", "tr", "td", "th"},
              {"table", "body"}),
    "tfoot": ({"thead", "tbody", "tfoot", "tr", "td", "th"},
              {"table", "body"}),
}



def _attr_dict(attrs) -> dict:
    """First occurrence wins for duplicate attributes — the HTML5
    tree-construction rule (a real HTML5 parser ignores repeats), so
    tag-soup pages hash to the same triples the reference's
    HTML::HTML5::Parser would produce."""
    out: dict = {}
    for k, v in attrs:
        if k not in out:
            out[k] = v
    return out


# HTML5 "formatting" category (WHATWG 13.2.4.3): end tags for these
# run the adoption agency when mis-nested.
_FORMATTING = frozenset("""a b big code em font i nobr s small strike
strong tt u""".split())

# HTML5 "special" category, abridged to the tags that occur as the
# furthest block in real tag soup (block/structural elements; ordinary
# elements like span are NOT special and take the plain-pop fallback).
_SPECIAL = frozenset("""address applet area article aside base
basefont blockquote body br button caption center col colgroup dd
details dir div dl dt embed fieldset figcaption figure footer form
frame frameset h1 h2 h3 h4 h5 h6 head header hgroup hr html iframe
img input li link listing main marquee menu meta nav noembed noframes
noscript object ol p param plaintext pre script section select source
style summary table tbody td template textarea tfoot th thead title
tr track ul wbr""".split())

# Insertion contexts where raw text / arbitrary elements get
# foster-parented before the table (WHATWG "in table" mode).  Cells
# and captions host normal content and are NOT in this set.
_TABLE_CTX = frozenset({"table", "tbody", "thead", "tfoot", "tr"})
# Start tags legal inside the table context (everything else fosters).
_TABLE_OK = frozenset("""caption col colgroup table tbody td template
tfoot th thead tr script style form""".split())


class _SoupBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root: Element | None = None
        self.stack: list[Element] = []
        # formatting clones owed by the adoption agency, materialized
        # lazily when content actually arrives (the spec's
        # "reconstruct the active formatting elements": no content ->
        # no clone, so <b><i>x</b></i> leaves no empty <i>)
        self._pending_fmt: list[tuple[str, dict]] = []

    def parse_marked_section(self, i, report=1):
        # _markupbase raises AssertionError on an unknown (or
        # missing) marked-section keyword; the parse contract is
        # "always succeeds", so degrade to the bogus-comment path —
        # what the tokenizer does for every other unrecognized '<!'
        # construct.  The fast lexer mirrors this exactly.
        try:
            return super().parse_marked_section(i, report)
        except AssertionError:
            return self.parse_bogus_comment(i, report)

    def updatepos(self, i, j):
        """No-op position tracking: html.parser counts newlines per
        chunk only to serve getpos(), which this builder never calls
        — the scan is pure overhead on crawl-sized soup."""
        return j

    def _ensure_root(self):
        if self.root is None:
            self.root = Element("html", {})
            self.stack = [self.root]

    def _flush_pending(self):
        for tag, attrs in self._pending_fmt:
            self._insert(tag, attrs)
        self._pending_fmt = []

    # -- foster parenting (WHATWG 13.2.6.1) -------------------------
    def _foster_slot(self):
        """(parent, index) immediately before the innermost open
        table, or None when not in a fosterable table context."""
        if self.stack[-1].tag not in _TABLE_CTX:
            return None
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == "table":
                par = self.stack[i - 1]
                try:
                    return par, par.children.index(self.stack[i])
                except ValueError:      # detached (shouldn't happen)
                    return par, len(par.children)
        return None                     # tbody soup with no table

    def _imply_table_sections(self, tag):
        """<tr> directly in <table> gets an implied <tbody>; <td>/<th>
        outside a row gets an implied <tr> (WHATWG "in table" /
        "in table body" modes)."""
        if tag == "tr" and self.stack[-1].tag == "table":
            self._insert("tbody", {})
        elif tag in ("td", "th"):
            if self.stack[-1].tag == "table":
                self._insert("tbody", {})
            if self.stack[-1].tag in ("tbody", "thead", "tfoot"):
                self._insert("tr", {})

    def _insert(self, tag, attrs, push=True):
        parent = self.stack[-1]
        el = Element(tag, attrs, parent)
        parent.children.append(el)
        if push:
            self.stack.append(el)
        return el

    def handle_starttag(self, tag, attrs):
        if tag == "html":
            if self.root is None:
                self.root = Element("html", _attr_dict(attrs))
                self.stack = [self.root]
            else:
                for _k, _v in attrs:
                    self.root.attrs.setdefault(_k, _v)
            return
        self._ensure_root()
        self._flush_pending()
        # a <table> start while a table is open closes it first
        # (WHATWG "in table": implied </table>)
        if tag == "table" and self.stack[-1].tag in _TABLE_CTX:
            for i in range(len(self.stack) - 1, 0, -1):
                if self.stack[i].tag == "table":
                    del self.stack[i:]
                    break
        # implied end tags
        if tag in _CLOSE_P:
            for i in range(len(self.stack) - 1, 0, -1):
                if self.stack[i].tag == "p":
                    del self.stack[i:]
                    break
                if self.stack[i].tag not in ("a", "span", "b", "i", "em",
                                             "strong", "small", "u", "s"):
                    break
        implied = _IMPLIED_END.get(tag)
        if implied:
            closes, scope = implied
            for i in range(len(self.stack) - 1, 0, -1):
                t = self.stack[i].tag
                if t in scope:
                    break
                if t in closes:
                    del self.stack[i:]
                    break
        self._imply_table_sections(tag)
        # foster-parent a non-table element opened in table context
        slot = None
        if tag not in _TABLE_OK:
            slot = self._foster_slot()
        if slot is not None:
            par, idx = slot
            el = Element(tag, _attr_dict(attrs), par)
            par.children.insert(idx, el)
            if tag not in _VOID:
                # fostered element still becomes the current node
                self.stack.append(el)
            return
        parent = self.stack[-1]
        el = Element(tag, _attr_dict(attrs), parent)
        parent.children.append(el)
        if tag not in _VOID:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        if tag == "html":
            self.handle_starttag(tag, attrs)
            return
        self._ensure_root()
        self._flush_pending()
        slot = self._foster_slot() if tag not in _TABLE_OK else None
        if slot is not None:
            par, idx = slot
            par.children.insert(idx, Element(tag, _attr_dict(attrs),
                                             par))
            return
        parent = self.stack[-1]
        el = Element(tag, _attr_dict(attrs), parent)
        parent.children.append(el)

    # -- adoption agency (WHATWG 13.2.6.4.7, common cases) ----------
    def _adoption(self, tag) -> bool:
        """Mis-nested formatting end tag.  Two shapes are handled:

        * only formatting elements above the match — pop through it,
          then reopen clones of those formatting elements (the eager
          equivalent of "reconstruct the active formatting elements";
          an unused trailing clone stays empty, which is
          triple-invisible);
        * a special (block) element immediately above the match (the
          ``<b><p>x</b>y`` shape) — the block moves out to become the
          match's next sibling, a clone of the match wraps the
          block's children, and the block stays open.

        Returns False to fall back to the plain pop (ordinary
        elements like span above the match, or deeper mixed shapes).
        """
        fi = None
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                fi = i
                break
        if fi is None or fi == len(self.stack) - 1:
            return False                # absent or already current
        above = self.stack[fi + 1:]
        fmt_above = [e for e in above if e.tag in _FORMATTING]
        if len(fmt_above) == len(above):
            del self.stack[fi:]
            self._pending_fmt = [(g.tag, dict(g.attrs))
                                 for g in fmt_above]
            return True
        blk = above[0]
        if blk.tag not in _SPECIAL:
            return False
        F = self.stack[fi]
        rest_fmt = [e for e in above[1:] if e.tag in _FORMATTING]
        if len(rest_fmt) != len(above) - 1:
            return False                # two blocks deep: fall back
        # move the block out: next sibling of the formatting element
        if blk in F.children:
            F.children.remove(blk)
        par = F.parent if F.parent is not None else self.root
        try:
            at = par.children.index(F) + 1
        except ValueError:
            at = len(par.children)
        par.children.insert(at, blk)
        blk.parent = par
        # clone of the formatting element adopts the block's children
        clone = Element(F.tag, dict(F.attrs), blk)
        clone.children = blk.children
        for c in clone.children:
            if isinstance(c, Element):
                c.parent = clone
        blk.children = [clone]
        del self.stack[fi:]
        self.stack.append(blk)          # the block stays open
        self._pending_fmt = [(g.tag, dict(g.attrs))
                             for g in rest_fmt]
        return True

    def handle_endtag(self, tag):
        if tag in _VOID:
            return
        # an end tag consumes any owed clones: <b><i>x</b></i> must
        # not materialize an empty <i> (and scope closure drops them)
        self._pending_fmt = []
        if tag in _FORMATTING and self._adoption(tag):
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if not self.stack:
            if data.strip():
                self._ensure_root()
            else:
                return
        self._flush_pending()
        if data.strip():
            slot = self._foster_slot()
            if slot is not None:        # table text fosters
                par, idx = slot
                prev = par.children[idx - 1] if idx > 0 else None
                if isinstance(prev, str):
                    par.children[idx - 1] = prev + data
                else:
                    par.children.insert(idx, data)
                return
        kids = self.stack[-1].children
        if kids and isinstance(kids[-1], str):
            kids[-1] += data
        else:
            kids.append(data)

    def handle_comment(self, data):
        if self.stack:
            self.stack[-1].children.append(Comment(data))


def _finish_soup(b: _SoupBuilder) -> Document:
    if b.root is None:
        b.root = Element("html", {})
    # HTML5 parsers place elements in the XHTML namespace; mirror that
    # so the head/body and <time> rules see the expected namespace.
    if "xmlns" not in b.root.attrs:
        b.root.attrs["xmlns"] = XHTML_NS
    return Document(b.root)


def parse_html(markup: bytes | str) -> Document:
    """Tag-soup parse; always succeeds (HTML5-parser analogue,
    reference: Parser.pm:103-107).  Tokenized by the fast regex
    lexer (soup_lexer.py) — DOM-equal to the stdlib html.parser
    tokenizer, pinned by tests/test_soup_lexer_ab.py; set
    RDFA_SPARK_STDLIB_SOUP=1 to force the stdlib path."""
    import os

    if os.environ.get("RDFA_SPARK_STDLIB_SOUP"):
        return parse_html_stdlib(markup)
    if isinstance(markup, bytes):
        markup = markup.decode("utf-8", "replace")
    from .soup_lexer import feed_events

    b = _SoupBuilder()
    feed_events(b, markup)
    return _finish_soup(b)


def parse_html_stdlib(markup: bytes | str) -> Document:
    """The html.parser-tokenized path (A/B oracle for the lexer)."""
    if isinstance(markup, bytes):
        markup = markup.decode("utf-8", "replace")
    b = _SoupBuilder()
    b.feed(markup)
    b.close()
    return _finish_soup(b)


def parse_markup(markup: bytes | str, dom_parser: str = "xml") -> Document:
    """Dispatch on the config's dom_parser flag (Parser.pm:98-119),
    falling back to tag-soup when XML parsing fails (recover mode)."""
    if dom_parser == "html":
        return parse_html(markup)
    try:
        return parse_xml(markup)
    except Exception:
        return parse_html(markup)
