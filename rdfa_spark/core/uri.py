"""URI resolution (reference: lib/RDF/RDFa/Parser.pm:336-366).

Perl's URI->new_abs is an RFC-3986 reference resolver; Python's
``urllib.parse.urljoin`` implements the same algorithm.  The one
reference quirk kept: a token matching ``^[a-z][a-z0-9+.-]*:`` is
returned verbatim (no normalization), everything else resolves
against the effective base.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

_ABS_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


def is_absolute(token: str) -> bool:
    return bool(_ABS_RE.match(token or ""))


def resolve(token: str | None, base: str,
            require_absolute: bool = False) -> str | None:
    token = token or ""
    if _ABS_RE.match(token):
        return token
    if require_absolute:
        return None
    if token == "":
        # empty reference -> base minus fragment (RFC 3986 §5.1)
        return base.split("#", 1)[0] if "#" in base else base
    return urljoin(base, token)
