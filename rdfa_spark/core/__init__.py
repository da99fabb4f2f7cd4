"""Pure-Python RDFa core (Spark-free, lxml-free).

Unit-testable without a JVM; executed inside Arrow-batched UDFs by
``rdfa_spark.extract``.
"""

from .config import (  # noqa: F401
    Config, make_config, tagsoup_config, host_from_media_type,
    HOST_ATOM, HOST_HTML4, HOST_HTML5, HOST_SVG, HOST_XHTML,
    HOST_XHTML5, HOST_XML, RDFA_10, RDFA_11,
)
from .walk import (  # noqa: F401
    ParseError, Triple, Walker, extract_text, parse_rdfa,
    RDF_FIRST, RDF_NIL, RDF_NS, RDF_REST, RDF_TYPE, RDF_XMLLIT,
)
