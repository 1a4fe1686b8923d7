"""Pure deterministic extraction kernel — no Ray, no I/O.

Shared by the distributed pipeline (inside ``map_batches``) and the
single-process oracle; identical code on both sides is what makes the
byte-identical-extracted-text gate achievable (SURVEY.md §7.2 step 1).
"""

from dots_ocr_ray.kernel.extract import ExtractConfig, extract_page  # noqa: F401
from dots_ocr_ray.kernel.serialize import spans_to_markdown  # noqa: F401
