"""Golden-snapshot guard: the kernel's exact behavior on the seeded
64-page fixture corpus, pinned as corpus-level md5 hashes.

The byte-identity tests prove Ray == oracle, but both share the kernel
— a kernel behavior change would pass them silently.  These hashes make
any such change EXPLICIT: if you intentionally change extraction
semantics, update the constants in the same commit and say why.
"""

from dots_ocr_ray.fixtures import make_pages_table
from dots_ocr_ray.kernel.textops import md5_hex
from dots_ocr_ray.oracle import oracle_extract

GOLDEN_TEXT_MD5 = "a1b243d4fd7a9d972249cdef80154d42"
GOLDEN_NOHF_MD5 = "d4815a699132077ea0b0c95969901e30"
GOLDEN_SPANS_MD5 = "c061187e0ba4ccce98e78168026068c2"
GOLDEN_STATUS_MD5 = "0267fa98f5686a0f9b553b563aea3b0e"


def test_golden_corpus_hashes():
    res = oracle_extract(make_pages_table(64, seed=42))
    urls = sorted(res)
    assert md5_hex("\x00".join(res[u]["extracted_text"] for u in urls)) == GOLDEN_TEXT_MD5
    assert md5_hex("\x00".join(res[u]["extracted_text_nohf"] for u in urls)) == GOLDEN_NOHF_MD5
    spans_sig = "\x00".join(
        f"{s['category']}:{s['char_start']}:{s['char_end']}" for u in urls for s in res[u]["spans"]
    )
    assert md5_hex(spans_sig) == GOLDEN_SPANS_MD5
    assert md5_hex(",".join(res[u]["status"] for u in urls)) == GOLDEN_STATUS_MD5
