"""Triple-set P/R gate vs hand-derived golden triples, computed
set-wise modulo bnode bijection (BASELINE north_rule: P/R >= 0.95).

Goldens are derived from the reference's documented assertions
(t/01basic.t, t/04xmlliteral.t, RDFa 1.1 spec semantics); bnode
labels are matched by graph isomorphism, not by name."""

from itertools import permutations

from rdfa_spark.core import make_config, parse_rdfa

FOAF = "http://xmlns.com/foaf/0.1/"
DC11 = "http://purl.org/dc/elements/1.1/"
DCT = "http://purl.org/dc/terms/"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def _norm(triples):
    """-> set of (s,p,o,is_lit,dt,lang) with bnodes as placeholders +
    the list of bnode names in stable order."""
    out = []
    for t in triples:
        out.append((t[0], t[1], t[2], t[3], t[4], t[5]))
    return out


def _bnodes_of(trips):
    names = []
    for s, p, o, lit, dt, lang in trips:
        for x in (s, o if not lit else None):
            if x and x.startswith("_:") and x not in names:
                names.append(x)
    return names


def pr_modulo_bnodes(got, want, max_bnodes=8):
    """Precision/recall of got vs want under the best bnode bijection
    (exhaustive over want's bnodes; fine for fixture-sized graphs)."""
    got = set(got)
    want_b = _bnodes_of(want)
    got_b = _bnodes_of(got)
    best = (0.0, 0.0)
    if len(want_b) > max_bnodes or len(got_b) > max_bnodes:
        raise ValueError("fixture too bnode-heavy for exhaustive match")
    candidates = list(permutations(got_b, len(want_b))) or [()]
    for perm in candidates:
        m = dict(zip(want_b, perm))

        def sub(x):
            return m.get(x, x) if isinstance(x, str) else x

        mapped = {(sub(s), p, sub(o) if not lit else o, lit, dt, lang)
                  for s, p, o, lit, dt, lang in want}
        inter = len(got & mapped)
        p = inter / len(got) if got else 1.0
        r = inter / len(mapped) if mapped else 1.0
        if (p + r) > sum(best):
            best = (p, r)
    return best


def triples_of(walker):
    return [(t.subj, t.pred, t.obj, t.is_literal, t.datatype, t.lang)
            for t in walker.triples]


EIN = "http://example.com/einstein"

BASIC = """<html
\txmlns:dc="http://purl.org/dc/terms/"
\txmlns:foaf="http://xmlns.com/foaf/0.1/"
\txml:lang="en">
\t<head>
\t\t<title property="dc:title">This is the title</title>
\t</head>
\t<body xmlns:dc="http://purl.org/dc/elements/1.1/">
\t\t<div rel="foaf:primaryTopic" rev="foaf:page" xml:lang="de">
\t\t\t<h1 about="#topic" typeof="foaf:Person" property="foaf:name">Albert Einstein</h1>
\t\t</div>
\t\t<address rel="foaf:maker dc:creator" rev="foaf:made">
\t\t\t<a about="#maker" property="foaf:name" rel="foaf:homepage" href="joe">Joe Bloggs</a>
\t\t</address>
\t</body>
</html>"""

GOLDEN_BASIC = [
    (EIN, DCT + "title", "This is the title", True, None, "en"),
    (EIN, FOAF + "primaryTopic", EIN + "#topic", False, None, None),
    (EIN + "#topic", FOAF + "page", EIN, False, None, None),
    (EIN + "#topic", RDF + "type", FOAF + "Person", False, None, None),
    (EIN + "#topic", FOAF + "name", "Albert Einstein", True, None,
     "de"),
    (EIN, FOAF + "maker", EIN + "#maker", False, None, None),
    (EIN, DC11 + "creator", EIN + "#maker", False, None, None),
    (EIN + "#maker", FOAF + "made", EIN, False, None, None),
    (EIN + "#maker", FOAF + "name", "Joe Bloggs", True, None, "en"),
    (EIN + "#maker", FOAF + "homepage", "http://example.com/joe",
     False, None, None),
]

INLIST = """<html xmlns="http://www.w3.org/1999/xhtml"
  xmlns:ex="http://example.com/ns#">
  <body about="http://example.com/list">
    <span property="ex:item" inlist="">one</span>
    <span property="ex:item" inlist="">two</span>
  </body>
</html>"""

GOLDEN_INLIST = [
    ("http://example.com/list", "http://example.com/ns#item", "_:l1",
     False, None, None),
    ("_:l1", RDF + "first", "one", True, None, None),
    ("_:l1", RDF + "rest", "_:l2", False, None, None),
    ("_:l2", RDF + "first", "two", True, None, None),
    ("_:l2", RDF + "rest", RDF + "nil", False, None, None),
]

TYPEOF_BNODE = """<html xmlns="http://www.w3.org/1999/xhtml"
  xmlns:foaf="http://xmlns.com/foaf/0.1/">
  <body>
    <div typeof="foaf:Person"><span property="foaf:name">A</span></div>
  </body>
</html>"""

GOLDEN_TYPEOF = [
    ("_:p", RDF + "type", FOAF + "Person", False, None, None),
    ("_:p", FOAF + "name", "A", True, None, None),
]


def _gate(doc, base, golden, cfg=None):
    w = parse_rdfa(doc, base, cfg)
    p, r = pr_modulo_bnodes(triples_of(w), golden)
    assert p >= 0.95 and r >= 0.95, (p, r, w.triples)
    return p, r


class TestPrecisionRecallGate:
    def test_basic_exact(self):
        p, r = _gate(BASIC, EIN, GOLDEN_BASIC)
        assert p == 1.0 and r == 1.0

    def test_inlist_bnode_isomorphism(self):
        p, r = _gate(INLIST, "http://example.com/", GOLDEN_INLIST)
        assert p == 1.0 and r == 1.0

    def test_typeof_bnode(self):
        p, r = _gate(TYPEOF_BNODE, "http://example.com/",
                     GOLDEN_TYPEOF)
        assert p == 1.0 and r == 1.0

    def test_corpus_pr_overall(self):
        """Aggregate P/R over the fixture corpus (the gate the
        north_rule states), must be >= 0.95 overall."""
        cases = [(BASIC, EIN, GOLDEN_BASIC, None),
                 (INLIST, "http://example.com/", GOLDEN_INLIST, None),
                 (TYPEOF_BNODE, "http://example.com/", GOLDEN_TYPEOF,
                  None)]
        tp = fp = fn = 0
        for doc, base, golden, cfg in cases:
            w = parse_rdfa(doc, base, cfg)
            got = triples_of(w)
            p, r = pr_modulo_bnodes(got, golden)
            tp_i = round(p * len(got))
            tp += tp_i
            fp += len(got) - tp_i
            fn += len(golden) - round(r * len(golden))
        precision = tp / (tp + fp)
        recall = tp / (tp + fn)
        assert precision >= 0.95 and recall >= 0.95
