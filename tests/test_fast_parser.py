"""Fast regex tokenizer == stdlib html.parser, field-for-field.

The fast engine drives the same _BlockParser state machine; only the
tokenization differs.  Equality is asserted on the full ParseResult
(blocks, tables, figures, meta, lang, title, truncated) across a
corpus sample plus adversarial probes."""

import pytest

from document_extraction_service_spark import fixtures as fx
from document_extraction_service_spark.htmlparse import parse_html


@pytest.mark.parametrize("lo,hi", [(0, 400), (1000, 1200), (3000, 3100)])
def test_corpus_equivalence(lo, hi):
    for i in range(lo, hi):
        r = fx.gen_page(i)
        assert parse_html(r["html"], "fast") == parse_html(r["html"], "stdlib"), i


ADVERSARIAL = [
    b"",
    None,
    b"<html><p>a & b &amp; c &lt;tag&gt;</p>",
    b"<script>if (a<b && c>d) {x='<p>'}</script><p>real</p>",
    b"<style>p > a {color:red}</style><p>styled</p>",
    b"<p>unclosed <a href='x' <p>next</p>",
    b"<!-- <p>commented</p> --><p>live</p>",
    b"<P CLASS=loud>UPPER</P>",
    b"<td colspan=2>unquoted</td>",
    b"<p>ends <",
    b"<p>amp at end &",
    b"<title>T &amp; T</title><p>body text here okay</p>",
    b"<textarea><p>parsed as markup by stdlib</p></textarea><p>after</p>",
    b"\xff\xfe" + "utf16 <p>hi</p>".encode("utf-16-le"),
    bytes(range(256)),
    b"<table><tr><td>a<table><tr><td>inner</td></tr></table></td></tr></table>",
    b"<figure><img src=x.png><figcaption>Fig. 1 cap</figcaption></figure>",
    b"<meta name=author content=Jane><meta name='author' content='Bob'>",
    b"<script src=x.js>",  # unclosed raw-text element
    b"</\xef\xbf\xbdtd><td\xef\xbf\xbd>bogus tags</td>",
]


@pytest.mark.parametrize("idx", range(len(ADVERSARIAL)))
def test_adversarial_equivalence(idx):
    payload = ADVERSARIAL[idx]
    assert parse_html(payload, "fast") == parse_html(payload, "stdlib")
