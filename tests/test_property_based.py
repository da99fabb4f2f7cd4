"""Property-based invariants (hypothesis).

Three classes of evidence the example-based suites can't give:

* algorithm cross-checks — two independent implementations
  (large/small-star CC vs min-label propagation; minhash estimate vs
  true Jaccard) must agree on arbitrary inputs;
* total-function robustness — the tag-soup parser and the RDFa walk
  must never raise on arbitrary broken markup (the crawl-scale
  no-crash invariant behind extract_triples' failure accumulator
  staying at zero for non-pathological bytes);
* URI resolution vs the stdlib reference resolver on arbitrary
  relative references.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# CC: star alternation == label propagation (driver-side mirror)
# ---------------------------------------------------------------------------


def _union_find(edges):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress fully, label by min member
    comp: dict = {}
    for n in list(parent):
        comp.setdefault(find(n), []).append(n)
    out = {}
    for root, members in comp.items():
        rep = min(members)
        for m in members:
            out[m] = rep
    return out


edge_lists = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=1, max_size=40)


class TestCCProperties:
    """Spark CC vs exact union-find on random graphs.  One shared
    SparkSession (conftest), small graphs, few examples — the point
    is arbitrary TOPOLOGY, not scale."""

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(edges=edge_lists)
    def test_star_cc_matches_union_find(self, spark, edges):
        """Both phases: the distributed star loop
        (local_finish_edges=0) and the default two-phase path (which
        takes the local finish on graphs this small) must equal the
        exact union-find."""
        from rdfa_spark.pipeline.cc import connected_components
        pairs = [(str(a), str(b)) for a, b in edges if a != b]
        if not pairs:
            return
        want = _union_find(pairs)
        df = spark.createDataFrame(pairs, ["src", "dst"])
        got_star = {r.node: r.component
                    for r in connected_components(
                        df, local_finish_edges=0).collect()}
        assert got_star == want
        got_local = {r.node: r.component
                     for r in connected_components(df).collect()}
        assert got_local == want

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(edges=edge_lists)
    def test_label_propagation_matches_star(self, spark, edges):
        from rdfa_spark.pipeline.cc import (
            connected_components, label_propagation_components)
        pairs = [(str(a), str(b)) for a, b in edges if a != b]
        if not pairs:
            return
        df = spark.createDataFrame(pairs, ["src", "dst"])
        star = {r.node: r.component
                for r in connected_components(df).collect()}
        lp = {r.node: r.component
              for r in label_propagation_components(df).collect()}
        assert star == lp


# ---------------------------------------------------------------------------
# Tag-soup / walk robustness: arbitrary bytes never raise
# ---------------------------------------------------------------------------

soup_fragments = st.lists(
    st.sampled_from([
        "<div>", "</div>", "<p about='#a'", ">", "<span property=",
        "'dc:title'>", "text & more", "<!-- c -->", "</p>", "<br>",
        "<a href='x'", "rel=next", "<<<", "&bogus;", "&amp;",
        "<b><i>", "</b>", "\x00", "<table><tr><td>", "attr=\"v",
        "<script>var x='<p>';</script>", "]]>", "<![CDATA[hi]]>",
        "<p ABOUT='#b' PROPERTY='dc:x'>", "￿", "=\"", "~~",
    ]),
    min_size=0, max_size=25)


class TestSoupRobustness:
    @settings(max_examples=120, deadline=None)
    @given(frags=soup_fragments)
    def test_walk_never_raises_on_soup(self, frags):
        from rdfa_spark.core import make_config, parse_rdfa
        markup = "".join(frags)
        w = parse_rdfa(markup, "http://example.com/doc",
                       make_config("html5", "1.1"))
        # triples are well-formed whenever produced
        for t in w.triples:
            assert t.subj and t.pred
        # text extraction is total too
        if w.doc.root is not None:
            assert isinstance(w.doc.root.text_content(), str)


# ---------------------------------------------------------------------------
# URI resolution vs the stdlib resolver
# ---------------------------------------------------------------------------

rel_refs = st.one_of(
    st.sampled_from(["", "#", ".", "..", "./a", "../a/b", "a/b/c", "/abs",
                     "//host/x", "?q=1", "#frag", "a?q#f", "a/./b",
                     "a/../../b", "http://other.example/p?q#f"]),
    st.text(alphabet="abcdefgh./?#", min_size=0, max_size=12),
)


class TestUriResolution:
    @settings(max_examples=200, deadline=None)
    @given(ref=rel_refs,
           base=st.sampled_from([
               "http://example.com/dir/doc",
               "http://example.com/dir/doc#frag",
               "https://example.com/",
               "http://example.com/a/b/?q=1",
               "ftp://example.com/dir/doc",
               # non-http(s) schemes where urljoin does NOT splice
               # fragments (guards the fragment fast-path gate):
               "httpz://x/p",
               "file:///tmp/dir/doc#f",
               "urn:isbn:0451450523",
           ]))
    def test_resolve_matches_urljoin(self, ref, base):
        from urllib.parse import urljoin

        from rdfa_spark.core.uri import resolve
        got = resolve(ref, base)
        if ref == "":
            # deliberate divergence: empty ref drops the base
            # fragment (RFC 3986 strict / RDFa about="" = current
            # document); urljoin keeps it (RFC 1808 behavior)
            want = (base.split("#", 1)[0] if "#" in base else base)
        else:
            want = urljoin(base, ref)
        assert got == want, (ref, base, got, want)


def test_cc_local_finish_mid_contraction(spark):
    """The threshold can trigger AFTER distributed rounds have
    partially contracted the graph: the local finish must be correct
    on any intermediate (connectivity-equivalent) edge set, not just
    on raw input."""
    from rdfa_spark.pipeline.cc import connected_components

    pairs = [(str(i).zfill(3), str(i + 1).zfill(3))
             for i in range(40) if (i + 1) % 20 != 0]
    want = _union_find(pairs)
    df = spark.createDataFrame(pairs, ["src", "dst"])
    got = {r.node: r.component
           for r in connected_components(
               df, local_finish_edges=15).collect()}
    assert got == want
