"""Regex fast-path parser: must be byte-equivalent to the ElementTree
path on conforming documents and FALL BACK (never diverge) on anything
structurally surprising."""

import duckdb

from transkribusdu_spark.pipeline.parse import parse_doc, parse_doc_et, parse_doc_fast
from transkribusdu_spark.synth import render_doc


def _all_docs(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"select doc_id, text, lang from '{sf_dir}/documents.parquet' order by doc_id"
    ).fetchall()


def test_fast_path_equals_et_on_corpus(sf_dir):
    n_fast = 0
    for doc_id, text, lang in _all_docs(sf_dir):
        url, _, html = render_doc(doc_id, text, lang)
        fast = parse_doc_fast(url, html)
        et = parse_doc_et(url, html)
        assert fast is not None, f"fast path refused conforming doc {doc_id}"
        n_fast += 1
        assert fast == et, f"fast/ET divergence on doc {doc_id}"
    assert n_fast > 0


ADVERSARIAL = [
    # nested markup in Unicode -> ET flattens via itertext
    b'<PcGts><Page imageWidth="100" imageHeight="100"><TextRegion id="r" custom="structure {type:paragraph;}"><Coords points="0,0 10,10"/><TextLine id="l"><TextEquiv><Unicode>a<b/>c</Unicode></TextEquiv></TextLine></TextRegion></Page></PcGts>',
    # numeric entity
    b'<PcGts><Page imageWidth="100" imageHeight="100"><TextRegion id="r" custom="structure {type:paragraph;}"><Coords points="0,0 10,10"/><TextLine id="l"><TextEquiv><Unicode>a&#65;b</Unicode></TextEquiv></TextLine></TextRegion></Page></PcGts>',
    # spaces around attribute '='
    b'<PcGts><Page imageWidth = "100" imageHeight="100"><TextRegion id="r" custom="structure {type:paragraph;}"><Coords points="0,0 10,10"/><TextLine id="l"><TextEquiv><Unicode>x</Unicode></TextEquiv></TextLine></TextRegion></Page></PcGts>',
    # comment smuggling a close tag
    b'<PcGts><Page imageWidth="100" imageHeight="100"><TextRegion id="r" custom="structure {type:paragraph;}"><Coords points="0,0 10,10"/><!-- </Page> --><TextLine id="l"><TextEquiv><Unicode>x</Unicode></TextEquiv></TextLine></TextRegion></Page></PcGts>',
    # Unicode with attribute
    b'<PcGts><Page imageWidth="100" imageHeight="100"><TextRegion id="r" custom="structure {type:paragraph;}"><Coords points="0,0 10,10"/><TextLine id="l"><TextEquiv><Unicode lang="en">x</Unicode></TextEquiv></TextLine></TextRegion></Page></PcGts>',
    # TextEquiv nested oddly: Unicode not direct wrap
    b'<PcGts><Page imageWidth="100" imageHeight="100"><TextRegion id="r" custom="structure {type:paragraph;}"><Coords points="0,0 10,10"/><TextLine id="l"><TextEquiv><X/><Unicode>x</Unicode></TextEquiv></TextLine></TextRegion></Page></PcGts>',
    # single-quoted attributes
    b"<PcGts><Page imageWidth='100' imageHeight='100'><TextRegion id='r'><Coords points='0,0 10,10'/><TextLine id='l'><TextEquiv><Unicode>x</Unicode></TextEquiv></TextLine></TextRegion></Page></PcGts>",
]


def test_fast_path_falls_back_and_dispatch_stays_correct():
    url = "https://x.example.org/doc/000001"
    for html in ADVERSARIAL:
        fast = parse_doc_fast(url, html)
        assert fast is None, f"guard missed: {html[:80]!r}"
        # dispatch must still parse via ET and agree with direct ET
        assert parse_doc(url, html) == parse_doc_et(url, html)


def test_fast_path_handles_standard_entities():
    url = "https://x.example.org/doc/000002"
    html = (
        b'<PcGts><Page imageWidth="100" imageHeight="100">'
        b'<TextRegion id="r" custom="structure {type:paragraph;}">'
        b'<Coords points="0,0 10,10"/>'
        b"<TextLine id=\"l\"><TextEquiv><Unicode>a &amp; b &lt;tag&gt; &quot;q&quot;</Unicode></TextEquiv></TextLine>"
        b"</TextRegion></Page></PcGts>"
    )
    fast = parse_doc_fast(url, html)
    et = parse_doc_et(url, html)
    assert fast == et
    assert fast[0]["text"] == 'a & b <tag> "q"'
