"""Parse stage: ``pages.html`` -> one row per layout node.

Spark shape: a single ``mapInPandas`` over the pages table — document
parsing is embarrassingly parallel, so this stage is map-only (no
shuffle); Catalyst prunes unread page columns out of the scan.

Reference semantics reproduced (SURVEY.md §2.2 P1-P10):
- node iteration per configured XPath (``graph/NodeType_PageXml.py:126-200``)
- text = ``" ".join(nd.itertext())`` (``xml_formats/PageXml.py:282-291``)
  over each TextLine, lines joined by single space — byte-exact.
- polygon -> fitted axis-aligned rectangle = bounding box
  (``util/Polygon.py:38-43,104``)
- label parsed from the CSS-ish ``custom`` attribute
  (``xml_formats/PageXml.py:223-263``), default ``other``
- empty-graph filter (``graph/Graph.py:338-339``)
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from xml.etree import ElementTree as etree
from pyspark.sql import DataFrame

from ..schemas import NODES_SCHEMA

_CUSTOM_RE = re.compile(r"(\w[\w-]*)\s*\{([^}]*)\}")
_KV_RE = re.compile(r"([\w-]+)\s*:\s*([^;]*)\s*;?")


def parse_custom_attr(custom: str) -> dict[str, dict[str, str]]:
    """Parse ``custom="readingOrder {index:9;} structure {type:heading;}"``
    into nested dicts (reference ``PageXml.parseCustomAttr``,
    ``xml_formats/PageXml.py:223-263``)."""
    out: dict[str, dict[str, str]] = {}
    for name, body in _CUSTOM_RE.findall(custom or ""):
        out[name] = {k: v.strip() for k, v in _KV_RE.findall(body)}
    return out


def node_text(nd: etree.Element) -> str:
    """Exact reference join semantics: ``" ".join(nd.itertext())``
    (``xml_formats/PageXml.py:282-291``). The byte-identical surface."""
    return " ".join(nd.itertext())


def fit_rectangle(points: list[tuple[float, float]]) -> tuple[float, float, float, float]:
    """Polygon -> axis-aligned bounding rectangle
    (``util/Polygon.py:38-43,104``)."""
    xs = [p[0] for p in points]
    ys = [p[1] for p in points]
    return min(xs), min(ys), max(xs), max(ys)


def parse_points(s: str) -> list[tuple[float, float]]:
    return [(float(x), float(y)) for x, y in (pt.split(",") for pt in s.split())]


def parse_doc(url: str, html: bytes) -> list[dict]:
    """One document -> list of node dicts. Document-local by design."""
    root = etree.fromstring(html)
    pages = root.findall(".//Page")
    page_cnt = len(pages)
    rows: list[dict] = []
    try:
        doc_id = int(url.rsplit("/", 1)[1])
    except (ValueError, IndexError):
        doc_id = None
    for pnum, page in enumerate(pages, start=1):
        pw = float(page.get("imageWidth", "0"))
        ph = float(page.get("imageHeight", "0"))
        ridx = 0
        for region in page.findall(".//TextRegion"):
            coords = region.find("Coords")
            if coords is None:
                continue
            x1, y1, x2, y2 = fit_rectangle(parse_points(coords.get("points", "0,0")))
            custom = parse_custom_attr(region.get("custom", ""))
            label = custom.get("structure", {}).get("type") or region.get("type") or "other"
            lines = region.findall(".//TextLine")
            # TextLine text via itertext; region text joins line texts with
            # a single space (nested-text fallback semantics,
            # ``graph/NodeType_PageXml.py:311-337``).
            texts = [node_text(tl.find("TextEquiv/Unicode")) for tl in lines if tl.find("TextEquiv/Unicode") is not None]
            rows.append(
                {
                    "url": url,
                    "doc_id": doc_id,
                    "page_num": pnum,
                    "page_w": pw,
                    "page_h": ph,
                    "page_cnt": page_cnt,
                    "node_id": region.get("id"),
                    "kind": "TextRegion",
                    "x1": x1,
                    "y1": y1,
                    "x2": x2,
                    "y2": y2,
                    "text": " ".join(texts),
                    "orientation": 0,
                    "reading_index": ridx,
                    "label": label,
                }
            )
            ridx += 1
    return rows


def parse_pages(pages: DataFrame, on_error: str = "skip") -> DataFrame:
    """pages -> nodes. Map-only; one Arrow batch in, node rows out.

    ``on_error='skip'`` (default): a malformed document never kills the
    job — mandatory at web scale where input is always partly garbage;
    failures are auditable via :func:`parse_errors`. ``'raise'`` keeps
    strict mode for tests.
    """
    cols = ["url", "html"]
    strict = on_error == "raise"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = [f.name for f in NODES_SCHEMA.fields]
        for pdf in batches:
            out: list[dict] = []
            for url, html in zip(pdf["url"], pdf["html"]):
                try:
                    out.extend(parse_doc(url, bytes(html)))
                except Exception:
                    if strict:
                        raise
            yield pd.DataFrame(out, columns=names) if out else pd.DataFrame(columns=names)

    return pages.select(*cols).mapInPandas(run, schema=NODES_SCHEMA)


def parse_errors(pages: DataFrame) -> DataFrame:
    """Audit channel: one row per document that fails to parse
    (url, error). Same map-only shape as :func:`parse_pages`."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [T.StructField("url", T.StringType()), T.StructField("error", T.StringType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bad: list[dict] = []
            for url, html in zip(pdf["url"], pdf["html"]):
                try:
                    parse_doc(url, bytes(html))
                except Exception as e:
                    bad.append({"url": url, "error": f"{type(e).__name__}: {e}"})
            yield pd.DataFrame(bad, columns=["url", "error"])

    return pages.select("url", "html").mapInPandas(run, schema=schema)
