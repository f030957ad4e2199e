"""HTML -> training text extraction (stdlib html.parser, no regex games).

The canonical step between a WARC response body and a text corpus.
Regex tag-stripping (what quick pipelines do) mishandles scripts,
comments, entities and attribute text; this module parses properly:

- ``extract_document(html)`` — pure function: title, visible text with
  block-element line structure, per-block link-density, and counts.
  ``<script>/<style>/<template>/<noscript>`` subtrees are dropped,
  character/entity references decode (stdlib ``convert_charrefs``),
  block elements introduce line breaks, inline elements do not.
- Main-content selection: the public text-density family of heuristics
  (Arc90/boilerpipe lineage) in their simplest defensible form — a
  block is content if it has at least ``min_words`` words and at most
  ``max_link_density`` of its characters inside anchors. Navigation
  chrome (link lists, cookie banners) scores high link density or low
  word count and drops out.
- ``extract_text_frame(df, html_col)`` — the Arrow-batched seam: adds
  ``title, text, main_text, n_blocks, n_links, link_density`` columns.
  Partition-local, zero shuffle, same shape as the media decode seam.

Parse failures yield empty-text rows with ``parse_ok = false`` rather
than task failures (quarantine-not-crash). Scale notes (100 TB): one
pass per document, no driver involvement; HTMLParser is pure Python, so
this IS a Python-per-row kernel — acceptable here for the same reason
as media decode: there is no JVM builtin for it, and the seam is
Arrow-batched with bounded batch memory.
"""

from __future__ import annotations

from html.parser import HTMLParser

from pyspark.sql import DataFrame

_SKIP_SUBTREES = {"script", "style", "template", "noscript", "svg", "head"}
_BLOCK_ELEMENTS = {
    "p", "div", "section", "article", "header", "footer", "aside", "nav",
    "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol", "table", "tr",
    "br", "hr", "blockquote", "pre", "figure", "figcaption", "main",
}


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[list[str]] = [[]]  # each block: text fragments
        self.link_chars: list[int] = [0]
        self.title_parts: list[str] = []
        self.n_links = 0
        self._skip_depth = 0
        self._in_title = False
        self._anchor_depth = 0

    def _new_block(self) -> None:
        if self.blocks[-1]:
            self.blocks.append([])
            self.link_chars.append(0)

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_SUBTREES:
            if tag == "head":
                return  # title lives in head; only title text is kept
            self._skip_depth += 1
            return
        if tag == "title":
            self._in_title = True
        if tag == "a":
            self._anchor_depth += 1
            self.n_links += 1
        if tag in _BLOCK_ELEMENTS:
            self._new_block()

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREES and tag != "head":
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "title":
            self._in_title = False
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
        if tag in _BLOCK_ELEMENTS:
            self._new_block()

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._in_title:
            self.title_parts.append(data)
            return
        if data and not data.isspace():
            self.blocks[-1].append(data)
            if self._anchor_depth:
                self.link_chars[-1] += len(data.strip())


def extract_document(
    html: str, min_words: int = 10, max_link_density: float = 0.4
) -> dict:
    """Parse one HTML document into text + structure features."""
    parser = _TextExtractor()
    parser.feed(html or "")
    parser.close()

    blocks = []
    for frags, lchars in zip(parser.blocks, parser.link_chars):
        text = " ".join(" ".join(frags).split())
        if not text:
            continue
        density = lchars / max(1, len(text))
        blocks.append((text, density))

    text = "\n".join(b for b, _ in blocks)
    main = "\n".join(
        b
        for b, density in blocks
        if len(b.split()) >= min_words and density <= max_link_density
    )
    total_chars = sum(len(b) for b, _ in blocks)
    link_chars = sum(int(d * len(b)) for b, d in blocks)
    return {
        "title": " ".join("".join(parser.title_parts).split()),
        "text": text,
        "main_text": main,
        "n_blocks": len(blocks),
        "n_links": parser.n_links,
        "link_density": round(link_chars / max(1, total_chars), 4),
    }


def extract_text_frame(
    df: DataFrame,
    html_col: str,
    min_words: int = 10,
    max_link_density: float = 0.4,
) -> DataFrame:
    """Arrow-batched extraction seam: adds title/text/main_text/
    n_blocks/n_links/link_density/parse_ok to every row."""
    import python_kinesis_streaming_spark.llm.html_extract as _self
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(_self)
    extract = _self.extract_document
    col = html_col
    mw, mld = min_words, max_link_density

    def run(batches):
        for pdf in batches:
            rows = []
            for html in pdf[col]:
                if isinstance(html, (bytes, bytearray)):
                    html = bytes(html).decode("utf-8", "replace")
                try:
                    d = extract(html, mw, mld)
                    d["parse_ok"] = True
                except Exception as e:  # noqa: BLE001 — quarantine, don't fail
                    d = {
                        "title": "",
                        "text": "",
                        "main_text": "",
                        "n_blocks": 0,
                        "n_links": 0,
                        "link_density": 0.0,
                        "parse_ok": False,
                    }
                rows.append(d)
            out = pdf.copy()
            for key in (
                "title", "text", "main_text", "n_blocks", "n_links",
                "link_density", "parse_ok",
            ):
                out[key] = [r[key] for r in rows]
            yield out

    types = {f.name: f.dataType.simpleString() for f in df.schema}
    ofields = ", ".join(f"`{c}` {types[c]}" for c in df.columns)
    return df.mapInPandas(
        run,
        schema=(
            f"{ofields}, title string, text string, main_text string, "
            "n_blocks int, n_links int, link_density double, parse_ok boolean"
        ),
    )
