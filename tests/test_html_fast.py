"""Differential test: the fast regex tokenizer must produce an identical
block stream to the stdlib html.parser frontend over the full fixture
corpus and a set of adversarial HTML fragments."""

import pytest

from pdf_extractor_ray.functions.html_extract import tokenize_blocks

EDGE_CASES = [
    "<p>a &amp; b &#65; &lt;tag&gt;</p>",
    '<DIV CLASS="Page"><P>Upper tags</P></DIV>',
    "<p>bare < sign and <b>inline</b> markup</p>",
    '<script>var x = "<p>not a para</p>";</script><p>real content here</p>',
    "<style>p{color:red}</style><p>styled content text</p>",
    "<br/><p/>text<div class=unquoted-nav>nav text</div>",
    "<p title='it&amp;s'>quoted attr</p>",
    "<!-- comment <p>no</p> --><p>yes content</p>",
    "<table><tr><th>H</th></tr><tr><td>1</td></tr></table>",
    "<ul><li><a href='/x'>link one</a></li><li>plain item text</li></ul>",
    "",
    "just plain text with no markup at all",
    "<p>unclosed paragraph <div>then a div</div>",
    # Trailing '/' glued to an unquoted attribute value is part of the VALUE
    # (element stays open), not a self-closing marker — html.parser keeps
    # nav state alive here and the fast path must match (ADVICE r1).
    "<div class=nav data-x=foo/>menu text</div><p>real body content</p>",
    "<div class=nav/>menu link list</div><p>article text body</p>",
    "<div class='nav'/>closed by slash</div><p>kept content</p>",
    "<div class=nav />space before slash</div><p>kept too</p>",
    "<p foo=/>value is just a slash</p>",
]


class TestFastTokenizer:
    @pytest.mark.parametrize("html", EDGE_CASES)
    def test_edge_cases_match_stdlib(self, html):
        assert tokenize_blocks(html, "fast") == tokenize_blocks(html, "stdlib")

    def test_full_corpus_matches_stdlib(self, small_pages):
        mismatches = []
        for i in range(len(small_pages)):
            payload = small_pages["html"][i].as_py()
            if payload[:4] == b"%PDF":
                continue
            html = payload.decode()
            if tokenize_blocks(html, "fast") != tokenize_blocks(html, "stdlib"):
                mismatches.append(small_pages["url"][i].as_py())
        assert not mismatches, mismatches[:5]


from hypothesis import given, settings, strategies as st

# Raw character soup: the extractor must never crash on it (frontend
# AGREEMENT is only guaranteed for well-formed-ish HTML — html.parser's
# recovery behavior on pathological soup is intricate and bug-for-bug
# parity there is a non-goal; the engine's own semantics stay
# deterministic either way).
HTML_SOUP = st.text(alphabet="<>/ab c=\"'&;!-p#123\näצ=", max_size=200)

_WORDS = st.text(alphabet="abc אcd 123", min_size=0, max_size=30)
_ATTR = st.sampled_from(
    ['', ' class="page"', ' class="nav"', " id='sidebar'", ' data-x="a&amp;b"', " role=main"]
)
_TAG = st.sampled_from(["p", "div", "span", "li", "h2", "em", "section"])


@st.composite
def well_formed_html(draw, depth=0):
    n = draw(st.integers(0, 3 if depth < 2 else 0))
    parts = [draw(_WORDS)]
    for _ in range(n):
        tag = draw(_TAG)
        attr = draw(_ATTR)
        inner = draw(well_formed_html(depth=depth + 1))  # type: ignore[call-arg]
        parts.append(f"<{tag}{attr}>{inner}</{tag}>")
        parts.append(draw(_WORDS))
    return "".join(parts)


class TestFuzz:
    @settings(max_examples=200, deadline=None)
    @given(HTML_SOUP)
    def test_arbitrary_soup_no_crash(self, html):
        from pdf_extractor_ray.functions.html_extract import extract_html

        fast, _ = extract_html(html)
        assert isinstance(fast, str)
        # and deterministic
        assert extract_html(html)[0] == fast

    @settings(max_examples=150, deadline=None)
    @given(well_formed_html())
    def test_engines_agree_on_well_formed(self, html):
        assert tokenize_blocks(html, "fast") == tokenize_blocks(html, "stdlib")


class TestMarkdownStructure:
    def test_list_items_and_pre_blocks(self):
        from pdf_extractor_ray.functions.html_extract import extract_html

        html = (
            "<article><p>Intro paragraph with enough words here.</p>"
            "<ul><li>first item with words</li><li>second item with words</li></ul>"
            "<pre>def f(x):\n    return x * 2</pre>"
            "</article>"
        )
        text, _ = extract_html(html)
        assert "- first item with words" in text
        assert "- second item with words" in text
        assert "```\ndef f(x):\n    return x * 2\n```" in text

    def test_linkheavy_list_still_dropped(self):
        from pdf_extractor_ray.functions.html_extract import extract_html

        nav_list = "<ul>" + "".join(
            f'<li><a href="/{i}">navigation link {i}</a></li>' for i in range(6)
        ) + "</ul>"
        html = f"<article>{nav_list}<p>Real content paragraph with words.</p></article>"
        text, _ = extract_html(html)
        assert text == "Real content paragraph with words."

    def test_blockquote_rendering(self):
        from pdf_extractor_ray.functions.html_extract import extract_html

        html = (
            "<article><p>Intro paragraph with many words.</p>"
            "<blockquote>a quoted passage with enough words</blockquote></article>"
        )
        text, _ = extract_html(html)
        assert "> a quoted passage with enough words" in text


class TestSoft404:
    """ops/text.py soft404_batch: status gating, title-over-body
    precedence, binary html, null tolerance."""

    def test_rules(self, ray_session):
        import pyarrow as pa

        from pdf_extractor_ray.ops.text import soft404_batch

        rows = [
            (1, 200, "<title>404 - Not Found</title>x"),          # title
            (2, 200, "<title>ok</title>page was not found here"),  # body
            (3, 404, "<title>404 - Not Found</title>x"),          # real 404
            (4, 200, "<title>Document 404123</title>fine"),       # clean
            (5, 200, None),                                        # null
            (6, 200, "<title>it does not exist</title>"
                     "page you requested was not found"),          # both→1
        ]
        t = pa.Table.from_arrays(
            [pa.array([r[0] for r in rows], pa.int64()),
             pa.array([r[1] for r in rows], pa.int64()),
             pa.array([r[2] for r in rows], pa.string())],
            names=["doc_id", "status", "html"],
        )
        out = soft404_batch(t).to_pylist()
        got = {r["doc_id"]: (r["soft404"], r["reason"]) for r in out}
        assert got == {1: (1, 1), 2: (1, 2), 3: (0, 0), 4: (0, 0),
                       5: (0, 0), 6: (1, 1)}

    def test_binary_column(self, ray_session):
        import pyarrow as pa

        from pdf_extractor_ray.ops.text import soft404_batch

        t = pa.Table.from_arrays(
            [pa.array([9], pa.int64()), pa.array([200], pa.int64()),
             pa.array([b"<title>gone: no longer available</title>"],
                      pa.binary())],
            names=["doc_id", "status", "html"],
        )
        assert soft404_batch(t).to_pylist()[0]["soft404"] == 1
