"""RFC-4646 language-tag well-formedness check.

Behavioural port of the reference's ``_valid_lang``
(lib/RDF/RDFa/Parser.pm:2644-2741): the same structure regex,
including grandfathered tags and lenient ``[-_]`` separators.
t/03lang.t requires invalid tags to be *ignored* (inherited language
kept), so this is extraction behaviour, not just validation.
"""

from __future__ import annotations

import re

_S = "[_-]"
_LANGUAGE = r"(?:[a-z]{2,8}|[a-z]{2,3}[_-][a-z]{3})"
_SCRIPT = r"[a-z]{4}"
_REGION = r"(?:[a-z]{2}|[0-9]{3})"
_VARIANT = r"(?:[a-z0-9]{5,8}|[0-9][a-z0-9]{3})"
_EXTENSION = r"(?:[a-wyz](?:[_-][a-z0-9]{2,8})+)"
_PRIVATE_USE = r"(?:x(?:[_-][a-z0-9]{1,8})+)"
_GRANDFATHERED = (
    r"(?:(en[_-]GB[_-]oed)"
    r"|(i[_-](?:ami|bnn|default|enochian|hak|klingon|lux|mingo|navajo|pwn"
    r"|tao|tay|tsu))"
    r"|(no[_-](?:bok|nyn))"
    r"|(sgn[_-](?:BE[_-](?:fr|nl)|CH[_-]de))"
    r"|(zh[_-]min[_-]nan))"
)
_VARIANT_LIST = f"{_VARIANT}(?:{_S}{_VARIANT})*"
_EXTENSION_LIST = f"{_EXTENSION}(?:{_S}{_EXTENSION})*"
_LANGTAG = (
    f"({_LANGUAGE})"
    f"(?:{_S}({_SCRIPT}))?"
    f"(?:{_S}({_REGION}))?"
    f"(?:{_S}({_VARIANT_LIST}))?"
    f"(?:{_S}({_EXTENSION_LIST}))?"
    f"(?:{_S}({_PRIVATE_USE}))?"
)

_VALID_LANG_RE = re.compile(
    f"^(?:(?:{_LANGTAG})|({_PRIVATE_USE})|({_GRANDFATHERED}))$",
    re.I | re.X,
)


def valid_lang(value: str | None) -> bool:
    if value is None:
        return False
    if value == "":
        return True
    return bool(_VALID_LANG_RE.match(value))
