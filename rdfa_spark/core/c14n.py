"""Exclusive XML canonicalization (EC14N) for rdf:XMLLiteral values.

Analogue of the reference's ``_element_to_xml``
(lib/RDF/RDFa/Parser.pm:2561-2589): serialize the element's children
with exclusive C14N, injecting the inherited ``xml:lang`` onto child
elements that lack one (t/04xmlliteral.t:42 pins the exact output).

Implements the subset of Exclusive XML Canonicalization 1.0 needed
for RDFa literals: visibly-utilized namespace emission, lexicographic
namespace/attribute ordering, and C14N text/attribute escaping.
"""

from __future__ import annotations

from .dom import Comment, Element, ProcessingInstruction, XML_NS


def _esc_text(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
             .replace(">", "&gt;").replace("\r", "&#xD;"))


def _esc_attr(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
             .replace('"', "&quot;").replace("\t", "&#x9;")
             .replace("\n", "&#xA;").replace("\r", "&#xD;"))


def _attr_sort_key(el: Element, name: str):
    if ":" in name:
        pfx, local = name.split(":", 1)
        if pfx == "xml":
            ns = XML_NS
        else:
            ns = el.nsmap().get(pfx) or ""
        return (1, ns, local)
    return (0, "", name)


def _serialize(node, out: list[str], rendered_ns: dict[str | None, str],
               extra_lang: str | None, with_comments: bool = True):
    if isinstance(node, str):
        out.append(_esc_text(node))
        return
    if isinstance(node, Comment):
        if with_comments:
            out.append(f"<!--{node.data}-->")
        return
    if isinstance(node, ProcessingInstruction):
        out.append(f"<?{node.target} {node.data}?>")
        return
    if not isinstance(node, Element):
        return

    el: Element = node
    nsmap = el.nsmap()

    # Visibly utilized prefixes: element's own + its attributes'.
    utilized: set[str | None] = set()
    pfx = el.prefix
    if pfx is not None and pfx != "xml":
        utilized.add(pfx)
    elif pfx is None and nsmap.get(None):
        utilized.add(None)
    for a in el.attrs:
        if ":" in a:
            ap = a.split(":", 1)[0]
            if ap not in ("xml", "xmlns") and ap in nsmap:
                utilized.add(ap)

    new_rendered = dict(rendered_ns)
    ns_decls = []
    for p in sorted(utilized, key=lambda x: x or ""):
        uri = nsmap.get(p)
        if uri is None:
            continue
        if rendered_ns.get(p) == uri:
            continue
        new_rendered[p] = uri
        if p is None:
            ns_decls.append(f' xmlns="{_esc_attr(uri)}"')
        else:
            ns_decls.append(f' xmlns:{p}="{_esc_attr(uri)}"')

    attrs = {k: v for k, v in el.attrs.items()
             if k != "xmlns" and not k.startswith("xmlns:")}
    if extra_lang is not None and "xml:lang" not in attrs:
        attrs["xml:lang"] = extra_lang

    out.append("<" + el.tag)
    out.extend(ns_decls)
    for name in sorted(attrs, key=lambda n: _attr_sort_key(el, n)):
        out.append(f' {name}="{_esc_attr(attrs[name])}"')
    out.append(">")
    for child in el.children:
        # xml:lang injection applies only to the top-level children
        # (the reference sets the attribute on $kid only).
        _serialize(child, out, new_rendered, None, with_comments)
    out.append(f"</{el.tag}>")


def element_to_xml(el: Element, lang: str | None) -> str:
    """EC14N of *children* of ``el``, injecting inherited xml:lang on
    top-level child elements (Parser.pm:2561-2589)."""
    out: list[str] = []
    inject = lang if lang else None
    for child in el.children:
        if isinstance(child, Element):
            _serialize(child, out, {}, inject)
        else:
            _serialize(child, out, {}, None)
    return "".join(out)
