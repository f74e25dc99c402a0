"""Pinned reference-semantics oracle (test-local, pure Python, no Spark).

An independent, deliberately-simple reimplementation of the reference's
extraction path P1 -> P2 -> O2 -> C12 (SURVEY.md §3.2) used by pytest to
verify byte-identical extracted text per url. The reference tree at
/root/reference stays read-only and is never imported.

Semantics pinned here:
- node text: ``" ".join(itertext())`` per TextLine Unicode element, line
  texts joined by single space (``xml_formats/PageXml.py:282-291``,
  ``graph/NodeType_PageXml.py:311-337``)
- geometry from polygon bounding box (``util/Polygon.py:38-43,104``)
- reading order: (page_num, y1, x1, node_id) (``graph/Block.py:309-318``)
- document text: node texts joined by single space
  (``graph/Graph_DOM.py:166-195``)
"""

from __future__ import annotations

from xml.etree import ElementTree as etree

from .pipeline.parse import fit_rectangle, node_text, parse_custom_attr, parse_points
from .schemas import MAIN_CONTENT_LABELS


def oracle_extract(html: bytes, labels: tuple[str, ...] | None = MAIN_CONTENT_LABELS):
    """html -> (extracted_text, spans). spans = [(node_id, start, end, label)]."""
    root = etree.fromstring(html)
    items = []
    for pnum, page in enumerate(root.findall(".//Page"), start=1):
        for region in page.findall(".//TextRegion"):
            coords = region.find("Coords")
            if coords is None:
                continue
            x1, y1, _, _ = fit_rectangle(parse_points(coords.get("points", "0,0")))
            custom = parse_custom_attr(region.get("custom", ""))
            label = custom.get("structure", {}).get("type") or region.get("type") or "other"
            if labels is not None and label not in labels:
                continue
            texts = [
                node_text(tl.find("TextEquiv/Unicode"))
                for tl in region.findall(".//TextLine")
                if tl.find("TextEquiv/Unicode") is not None
            ]
            items.append(((pnum, y1, x1, region.get("id")), region.get("id"), " ".join(texts), label))
    items.sort(key=lambda t: t[0])
    spans = []
    pos = 0
    parts = []
    for _, node_id, text, label in items:
        spans.append((node_id, pos, pos + len(text), label))
        parts.append(text)
        pos += len(text) + 1
    return " ".join(parts), spans
