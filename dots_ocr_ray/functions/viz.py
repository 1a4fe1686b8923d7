"""Layout visualization — dev/debug utility, not in the data plane
(the reference's draw_layout_on_image analog,
dots_ocr/utils/layout_utils.py:31-119: colored bboxes + order_category
labels).  Here: a deterministic text rendering of a span list."""

from __future__ import annotations


def render_layout(spans: list[dict], max_text: int = 40) -> str:
    """One line per span: ``[order] category bbox  text-preview`` in
    reading order, mirroring the reference's `order_category` labels."""
    lines = []
    for i, s in enumerate(spans):
        bbox = s.get("bbox", [0, 0, 0, 0])
        text = (s.get("text") or "").replace("\n", "\\n")
        if len(text) > max_text:
            text = text[: max_text - 1] + "…"
        lines.append(f"[{i}] {s.get('category', '?'):<14} ({bbox[0]},{bbox[1]},{bbox[2]},{bbox[3]})  {text}")
    return "\n".join(lines)
