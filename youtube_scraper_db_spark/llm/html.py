"""HTML → clean-text extraction for training-data pipelines: tag strip,
script/style/comment drop, block-text reassembly, link-density
boilerplate removal, entity decode.

The reference's S4 surface is a regex scrape of specific fields from one
page shape (ref scrape_my_channel.py:312-444); the LLM-pipeline form —
"turn scraped markup into training text" — needs a corpus-scale
operator. Two implementations with one semantics spine:

- **Expression path** (`html_clean_blocks` / the ``html_text_extract``
  registry gate): a pure Column regexp cascade — comments out,
  script/style/noscript blocks out (three separate patterns: RE2 has no
  backreferences, and staying inside the Java∩RE2 regex subset is what
  makes the DuckDB oracle replay every step literally), split on
  block-level tags, then per block strip tags → decode entities →
  collapse whitespace, measure link density from the tag-stripped
  ``<a>`` contents, and drop link-dominated blocks (2·link_chars >
  text_chars — navigation/footer boilerplate). Whole-stage codegen,
  map-only, zero Python: the 100 TB shape.
- **Structural path** (`html_extract_struct`): a stdlib
  ``html.parser``-based Arrow kernel for markup the flat regex cascade
  cannot model — unclosed script tags, tags inside attribute values,
  nested link depth. Same block semantics (block-level elements break
  text runs, script/style subtrees dropped, link chars counted at any
  ``<a>`` nesting depth). Pytest-pinned against the expression path on
  well-formed markup and against hand-written hostile fixtures beyond
  it.

Documented regex-cascade limits (by design, deterministic, shared with
the oracle): an attribute value containing ``>`` ends the tag early; an
unclosed ``<script>`` leaves its body as text. The structural kernel
handles both.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import WS_CLASS, WS_PLUS

#: Block-level elements: opening OR closing tag breaks a text block.
BLOCK_TAG_RE = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|tr|td|th|table|br|nav|section"
    r"|article|header|footer|blockquote|title)\b[^>]*>"
)

#: Elements whose CONTENT is dropped entirely (one pattern each — no
#: backreferences, so the same literal pattern runs on RE2/DuckDB).
DROP_CONTENT_TAGS = ("script", "style", "noscript")

#: (entity, replacement) in decode order — ``&amp;`` LAST so decoded
#: ampersands cannot re-trigger earlier rules.
ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

#: \b after the tag name: without it <abbr>/<address>/<audio>/<aside>
#: would open a fake link span running to the next literal </a> and
#: boilerplate-drop real content blocks.
LINK_RE = r"(?is)<a\b[^>]*>(.*?)</a>"


def _decode_entities(c: Column) -> Column:
    for ent, rep in ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return c


def _block_text(b: Column) -> Column:
    """Tag-strip → entity-decode → whitespace-collapse → trim."""
    stripped = F.regexp_replace(b, r"<[^>]+>", " ")
    # WS_CLASS (not \s): the oracle twin runs under RE2, whose \s lacks
    # \x0B — the explicit class keeps both engines byte-identical.
    return F.trim(F.regexp_replace(_decode_entities(stripped), WS_PLUS, " "))


def _link_chars(b: Column) -> Column:
    """Character count of link text in the block: the SUM over ``<a>…
    </a>`` spans of each span's (tag-stripped, collapsed) length —
    per-span, so inter-span separators are never counted and the
    structural parser (which measures each link span independently)
    computes the same number."""
    spans = F.regexp_extract_all(b, F.lit(LINK_RE), F.lit(1))
    return F.aggregate(
        spans, F.lit(0), lambda acc, s: acc + F.length(_block_text(s))
    )


def strip_boilerplate(html: Column) -> Column:
    """Comments and script/style/noscript blocks removed."""
    out = F.regexp_replace(html, r"(?s)<!--.*?-->", " ")
    for tag in DROP_CONTENT_TAGS:
        out = F.regexp_replace(out, rf"(?is)<{tag}[^>]*>.*?</{tag}{WS_CLASS}*>", " ")
    return out


def html_clean_blocks(
    html: Column, max_link_density: float = 0.5
) -> Column:
    """Struct(clean_text, n_blocks, kept_blocks): the full expression
    cascade. ``n_blocks`` counts blocks with any text; ``kept_blocks``
    those surviving the link-density filter (kept iff 2·link_chars ≤
    text_chars under the default 0.5); ``clean_text`` joins kept block
    texts with newlines."""
    blocks = F.split(strip_boilerplate(html), BLOCK_TAG_RE)
    recs = F.transform(
        blocks,
        lambda b: F.struct(
            _block_text(b).alias("t"), _link_chars(b).alias("l")
        ),
    )
    nonempty = F.filter(recs, lambda r: r["t"] != "")
    # threshold as an integer percent: 100·link ≤ pct·text is exact for
    # any density (int(1/x) silently distorted 0.7 → 1.0 and 0.4 → 0.5)
    pct = int(round(max_link_density * 100))
    kept = F.filter(
        nonempty,
        lambda r: r["l"] * F.lit(100) <= F.lit(pct) * F.length(r["t"]),
    )
    return F.struct(
        F.array_join(F.transform(kept, lambda r: r["t"]), "\n").alias(
            "clean_text"
        ),
        F.size(nonempty).cast("int").alias("n_blocks"),
        F.size(kept).cast("int").alias("kept_blocks"),
    )


def html_text_extract(
    docs: DataFrame,
    id_col: str,
    html_col: str,
    max_link_density: float = 0.5,
) -> DataFrame:
    """(id, clean_text, n_blocks, kept_blocks) — the map-only
    expression path over a corpus of HTML documents."""
    rec = html_clean_blocks(F.col(html_col), max_link_density)
    return docs.select(
        F.col(id_col).alias("id"),
        rec["clean_text"].alias("clean_text"),
        rec["n_blocks"].alias("n_blocks"),
        rec["kept_blocks"].alias("kept_blocks"),
    )


# ---------------------------------------------------------------------------
# Structural path: stdlib html.parser Arrow kernel.
# ---------------------------------------------------------------------------

_BLOCK_TAGS = {
    "p", "div", "li", "ul", "ol", "tr", "td", "th", "table", "br",
    "nav", "section", "article", "header", "footer", "blockquote",
    "title", "h1", "h2", "h3", "h4", "h5", "h6",
}


from html.parser import HTMLParser as _HTMLParser


class _BlockParser(_HTMLParser):
    """See _parse_blocks. Module-scope so the Arrow kernel pays the
    class construction once, not per document."""
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int]] = []
        self._buf: list[str] = []
        self._link = 0
        self._span: list[str] = []  # text of the OPEN <a> span
        self._a_depth = 0
        self._skip = 0

    def _close_span(self) -> None:
        # per-span collapsed length, matching the expression path's
        # per-span measurement (inter-chunk and inter-span
        # separators are never counted)
        self._link += len(" ".join("".join(self._span).split()))
        self._span = []

    def _flush(self) -> None:
        if self._span:
            self._close_span()  # block break inside a link
        text = " ".join("".join(self._buf).split())
        if text:
            self.blocks.append((text, self._link))
        self._buf, self._link = [], 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in ("script", "style", "noscript"):
            self._skip += 1
        elif tag == "a":
            self._a_depth += 1
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in ("script", "style", "noscript"):
            self._skip = max(0, self._skip - 1)
        elif tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
            if self._a_depth == 0:
                self._close_span()
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip:
            return
        self._buf.append(data)
        if self._a_depth:
            self._span.append(data)


def _parse_blocks(markup: str) -> list[tuple[str, int]]:
    """(block_text, link_chars) per non-empty block via a real HTML
    tokenizer: script/style/noscript subtrees dropped even when markup
    inside them would confuse a regex; link chars counted per <a> span
    at any nesting depth."""
    p = _BlockParser()
    p.feed(markup or "")
    p.close()
    p._flush()
    return p.blocks


def html_extract_struct(
    docs: DataFrame,
    id_col: str,
    html_col: str,
    max_link_density: float = 0.5,
) -> DataFrame:
    """(id, clean_text, n_blocks, kept_blocks) via the structural
    parser — Arrow-batched mapInPandas, map-only (no shuffle at any
    scale); use when markup is too hostile for the expression cascade."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("clean_text", T.StringType()),
            T.StructField("n_blocks", T.IntegerType()),
            T.StructField("kept_blocks", T.IntegerType()),
        ]
    )
    pct = int(round(max_link_density * 100))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, texts, nb, kb = [], [], [], []
            for i, markup in zip(pdf["id"], pdf["html"]):
                blocks = _parse_blocks(markup)
                kept = [t for t, l in blocks if l * 100 <= pct * len(t)]
                ids.append(i)
                texts.append("\n".join(kept))
                nb.append(len(blocks))
                kb.append(len(kept))
            yield pd.DataFrame(
                {"id": ids, "clean_text": texts, "n_blocks": nb, "kept_blocks": kb}
            )

    return docs.select(
        F.col(id_col).alias("id"), F.col(html_col).alias("html")
    ).mapInPandas(kernel, schema=out_schema)
