"""HTML → clean-text extraction: expression cascade vs structural
parser, link-density boilerplate removal, hostile markup."""

from __future__ import annotations

from youtube_scraper_db_spark.llm import html as H

WELL_FORMED = (
    '<html><head><title>Title</title><style>p {color: red}</style>'
    '<script type="text/javascript">var x = 1 < 2;</script></head>'
    '<body><nav><a href="/">home</a> <a href="/x">about</a></nav>'
    "<p>real paragraph content here</p>"
    "<!-- hidden <p>junk</p> -->"
    "<div>second block with <a href=\"y\">a link</a> and more words</div>"
    "<p>x &amp; y &lt;z&gt;</p></body></html>"
)


def _expr_rows(spark, rows):
    df = spark.createDataFrame(rows, "id long, html string")
    return {
        r["id"]: r
        for r in H.html_text_extract(df, "id", "html").collect()
    }


def _struct_rows(spark, rows):
    df = spark.createDataFrame(rows, "id long, html string")
    return {
        r["id"]: r
        for r in H.html_extract_struct(df, "id", "html").collect()
    }


def test_expression_cascade_well_formed(spark):
    got = _expr_rows(spark, [(1, WELL_FORMED)])[1]
    lines = got["clean_text"].split("\n")
    assert "Title" in lines
    assert "real paragraph content here" in lines
    assert "second block with a link and more words" in lines
    assert "x & y <z>" in lines  # entities decoded
    # nav is pure links -> dropped by density; script/style/comment gone
    assert "home" not in got["clean_text"]
    assert "color" not in got["clean_text"]
    assert "junk" not in got["clean_text"]
    assert "var x" not in got["clean_text"]
    assert got["kept_blocks"] == got["n_blocks"] - 1  # nav dropped


def test_expression_matches_structural_on_well_formed(spark):
    rows = [
        (1, WELL_FORMED),
        (2, "<p>one</p><p>two</p>"),
        (3, "<UL><LI><A HREF='#'>l1</A></LI></UL><P>body text here</P>"),
        (4, ""),
    ]
    e = _expr_rows(spark, rows)
    s = _struct_rows(spark, rows)
    for i in (1, 2, 3, 4):
        assert e[i]["clean_text"] == s[i]["clean_text"], i
        assert e[i]["n_blocks"] == s[i]["n_blocks"], i
        assert e[i]["kept_blocks"] == s[i]["kept_blocks"], i


def test_structural_handles_hostile_markup(spark):
    rows = [
        # attribute value containing '>' — regex tag-strip would cut early
        (1, '<div data-x="a>b"><p>safe text words</p></div>'),
        # unclosed script: regex cascade would leak the body
        (2, "<body><script>leak(); // no close <p>fake</p>"),
        # nested links: density counts at any depth
        (3, "<div><a href='#'><span>deep link</span></a></div>"),
        # deeply nested + interleaved close order
        (4, "<div><p>outer <b>bold</b> tail</p></div>"),
    ]
    s = _struct_rows(spark, rows)
    assert s[1]["clean_text"] == "safe text words"
    assert s[2]["clean_text"] == ""  # unclosed script swallows to EOF
    assert s[3]["clean_text"] == ""  # pure-link block dropped
    assert s[4]["clean_text"] == "outer bold tail"


def test_link_density_threshold(spark):
    # text 'ref tiny' (8 chars) with 3 link chars: 2*3 <= 8 -> kept
    rows = [(1, "<div><a href='y'>ref</a> tiny</div>"),
            (2, "<div><a href='y'>reference</a> x</div>")]
    e = _expr_rows(spark, rows)
    assert e[1]["kept_blocks"] == 1
    assert e[2]["kept_blocks"] == 0  # 2*9 > len('reference x')
    s = _struct_rows(spark, rows)
    assert s[1]["kept_blocks"] == 1 and s[2]["kept_blocks"] == 0


def test_a_prefixed_tags_are_not_links(spark):
    """<abbr>/<aside> must not open a fake link span (LINK_RE \\b):
    before the fix this block was boilerplate-dropped."""
    rows = [(1, '<div><abbr>API</abbr> long informative sentence here '
                '<a href="#">x</a></div>')]
    e = _expr_rows(spark, rows)
    s = _struct_rows(spark, rows)
    assert e[1]["kept_blocks"] == 1
    assert "long informative sentence" in e[1]["clean_text"]
    assert e[1]["clean_text"] == s[1]["clean_text"]


def test_multi_link_block_paths_agree(spark):
    """Per-span link counting: inter-span separators are never counted,
    so the expression and structural paths reach the same keep
    decision (they diverged on this shape before the fix)."""
    rows = [(1, "<div><a>ab</a> <a>cd</a> wxy</div>"),
            (2, "<div><a>ab <b>cd</b></a> wx</div>")]
    e = _expr_rows(spark, rows)
    s = _struct_rows(spark, rows)
    for i in (1, 2):
        assert e[i]["kept_blocks"] == s[i]["kept_blocks"], i
        assert e[i]["clean_text"] == s[i]["clean_text"], i


def test_link_density_threshold_is_proportional(spark):
    """Non-1/k densities must act proportionally (int(1/x) silently
    turned 0.7 into 1.0 and 0.4 into 0.5 before the fix)."""
    # text 'linktext and four more words' (28 chars), link 8 chars
    html = "<div><a href='#'>linktext</a> and four more words</div>"
    df_rows = [(1, html)]
    from youtube_scraper_db_spark.llm import html as H2

    def kept(mld):
        df = spark.createDataFrame(df_rows, "id long, html string")
        return H2.html_text_extract(df, "id", "html", max_link_density=mld).first()[
            "kept_blocks"
        ]

    assert kept(0.5) == 1   # 800 <= 50*28=1400
    assert kept(0.2) == 0   # 800 > 20*28=560
    assert kept(0.29) == 1  # 800 <= 29*28=812 — not representable as 1/k
    assert kept(0.28) == 0  # 800 > 28*28=784
