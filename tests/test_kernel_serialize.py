"""Unit tests for the serialization kernel (reference M9-M11 semantics)."""

from dots_ocr_ray.kernel.serialize import (
    clean_text,
    get_formula_in_markdown,
    has_latex_markdown,
    spans_to_markdown,
)


def test_clean_text_strip_and_unwrap():
    assert clean_text("  hello  ") == "hello"
    assert clean_text("`$x+1$`") == "$x+1$"
    assert clean_text("`$x`") == "`$x`"  # only the exact `$...$` wrap is unwrapped


def test_formula_already_wrapped():
    assert get_formula_in_markdown("$$x^2$$") == "$$\nx^2\n$$"
    # inner $ → returned as-is
    assert get_formula_in_markdown("$$a $ b$$") == "$$a $ b$$"


def test_formula_bracket_display():
    assert get_formula_in_markdown("\\[x+1\\]") == "$$\nx+1\n$$"


def test_formula_inline_untouched():
    assert get_formula_in_markdown("where $x$ is small") == "where $x$ is small"


def test_formula_plain_text_untouched():
    assert get_formula_in_markdown("no math here") == "no math here"


def test_formula_bare_latex_wrapped():
    out = get_formula_in_markdown("\\frac{a}{b}")
    assert out == "$$\n\\frac{a}{b}\n$$"


def test_formula_preamble_stripped():
    out = get_formula_in_markdown("\\usepackage{amsmath} \\alpha")
    assert "usepackage" not in out
    assert out.startswith("$$\n")


def test_has_latex_markdown():
    assert has_latex_markdown("$$x$$")
    assert has_latex_markdown("\\begin{eq}x\\end{eq}")
    assert not has_latex_markdown("plain words")


def test_join_order_and_hf_skip():
    spans = [
        {"category": "Page-header", "text": "HDR"},
        {"category": "Title", "text": "# T"},
        {"category": "Text", "text": " body "},
        {"category": "Formula", "text": "$$e=mc^2$$"},
        {"category": "Picture", "text": ""},
        {"category": "Page-footer", "text": "FTR"},
    ]
    md = spans_to_markdown(spans)
    # Picture contributes an EMPTY item (reference layoutjson2md keeps it
    # in the join) — byte-exact behavior.
    assert md == "HDR\n\n# T\n\nbody\n\n$$\ne=mc^2\n$$\n\n\n\nFTR"
    nohf = spans_to_markdown(spans, no_page_hf=True)
    assert nohf == "# T\n\nbody\n\n$$\ne=mc^2\n$$\n\n"
