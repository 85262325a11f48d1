"""HTML DOM extraction source stage (S7; ref power-outages/scrapers/
aurora.js:15-74 uses cheerio CSS selection).

Spark has no native DOM operator, so this is the sanctioned
Python-side path: an Arrow-batched ``mapInPandas`` stage using the
stdlib ``html.parser`` (no external deps). Each page row fans out to
one row per matched element — the Spark analog of
``$('.outage-row').each(...)``.

Scale shape: pages are independent → embarrassingly parallel; the
output is narrow extracted fields, so the expensive raw HTML never
crosses a shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame


# HTML void elements never get a closing tag — counting them toward
# nesting depth would leave the collector stuck "inside" a match from
# the first <br>/<img> onward (real scraped pages are full of them)
_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _ClassTextCollector(HTMLParser):
    """Collect text content of elements whose class attribute contains
    the target class — the subset of CSS selection the reference
    scrapers actually use ('.outage-row td' style)."""

    def __init__(self, css_class: str):
        super().__init__()
        self.css_class = css_class
        self.depth = 0  # >0 while inside a matching element
        self.buf: list[str] = []
        self.matches: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _VOID_TAGS:
            return
        classes = dict(attrs).get("class", "") or ""
        if self.depth > 0:
            self.depth += 1
        elif self.css_class in classes.split():
            self.depth = 1
            self.buf = []

    def handle_startendtag(self, tag, attrs):
        # explicit self-closing ('<br/>') — balanced, never affects depth
        return

    def handle_endtag(self, tag):
        if tag in _VOID_TAGS:  # stray '</br>' from sloppy markup
            return
        if self.depth > 0:
            self.depth -= 1
            if self.depth == 0:
                self.matches.append(" ".join(" ".join(self.buf).split()))

    def handle_data(self, data):
        if self.depth > 0 and data.strip():
            self.buf.append(data.strip())


def extract_by_class(pages: DataFrame, css_class: str, *, id_col: str = "page_id", html_col: str = "html") -> DataFrame:
    """One output row per element with ``class="...css_class..."`` per
    page: (page_id, element_index, text)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"page_id": [], "element_index": [], "text": []}
            for pid, html in zip(pdf[id_col], pdf[html_col]):
                parser = _ClassTextCollector(css_class)
                try:
                    parser.feed(html or "")
                except Exception:
                    continue  # failure isolation: bad page ≠ dead batch
                for i, text in enumerate(parser.matches):
                    out["page_id"].append(pid)
                    out["element_index"].append(i)
                    out["text"].append(text)
            yield pd.DataFrame(out)

    return pages.mapInPandas(fn, schema="page_id bigint, element_index int, text string")
