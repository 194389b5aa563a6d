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

HTML_CHARS = st.text(
    alphabet="<>/ab c=\"'&;!-p#123\näצ", max_size=200
)


class TestFuzz:
    @settings(max_examples=200, deadline=None)
    @given(HTML_CHARS)
    def test_arbitrary_input_no_crash_and_engines_agree(self, html):
        from pdf_extractor_ray.functions.html_extract import extract_html

        fast, _ = extract_html(html)
        assert isinstance(fast, str)

    @settings(max_examples=100, deadline=None)
    @given(HTML_CHARS)
    def test_engines_agree_on_fuzz(self, html):
        assert tokenize_blocks(html, "fast") == tokenize_blocks(html, "stdlib")
