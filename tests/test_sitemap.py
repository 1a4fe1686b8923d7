"""Sitemap source (sources/sitemap.py): protocol parse, index
expansion, degradation, and the real-decode caption stand-in."""

import gzip

import pytest

from dots_ocr_ray.sources.sitemap import (
    make_sitemap_bytes,
    parse_lastmod,
    parse_sitemap,
    read_sitemap,
)

ENTRIES = [
    {"url": "https://a.test/1", "lastmod": "2025-03-04", "changefreq": "daily", "priority": "0.8"},
    {"url": "https://a.test/2", "lastmod": "2025-03-05T10:20:30Z", "priority": "1.0"},
    {"url": "https://a.test/3", "priority": "2.5"},  # out of range → NULL
    {"url": "https://a.test/4", "lastmod": "not-a-date"},
]


def test_parse_urlset_fields():
    kind, rows = parse_sitemap(make_sitemap_bytes(ENTRIES))
    assert kind == "urlset" and len(rows) == 4
    assert rows[0]["priority_milli"] == 800
    assert rows[0]["lastmod"].isoformat() == "2025-03-04T00:00:00"
    assert rows[1]["priority_milli"] == 1000
    assert rows[1]["lastmod"].isoformat() == "2025-03-05T10:20:30"
    assert rows[2]["priority_milli"] is None  # out-of-range rejected
    assert rows[3]["lastmod"] is None


def test_parse_lastmod_timezone_offset():
    assert parse_lastmod("2025-03-05T12:00:00+02:00").isoformat() == "2025-03-05T10:00:00"
    assert parse_lastmod("") is None
    assert parse_lastmod("garbage") is None


def test_malformed_xml_is_invalid_not_fatal():
    assert parse_sitemap(b"<urlset><url><loc>x</loc>")[0] == "invalid"
    assert parse_sitemap(b"not xml at all")[0] == "invalid"
    assert parse_sitemap(b"<other/>")[0] == "invalid"


def test_read_sitemap_index_expansion(ray_session, tmp_path):
    for s in range(2):
        subset = ENTRIES[s::2]
        (tmp_path / f"urls-{s}.xml.gz").write_bytes(
            make_sitemap_bytes(subset, compress=True)
        )
    (tmp_path / "idx.xml").write_bytes(
        make_sitemap_bytes(
            [{"loc": f"https://x.test/urls-{s}.xml.gz"} for s in range(2)], index=True
        )
    )
    rows = read_sitemap(str(tmp_path / "idx.xml")).take_all()
    assert sorted(r["url"] for r in rows) == sorted(e["url"] for e in ENTRIES)


def test_read_sitemap_broken_gzip_degrades(ray_session, tmp_path):
    good = tmp_path / "ok.xml"
    good.write_bytes(make_sitemap_bytes(ENTRIES[:2]))
    bad = tmp_path / "bad.xml.gz"
    bad.write_bytes(gzip.compress(make_sitemap_bytes(ENTRIES[2:]))[:20])
    rows = read_sitemap([str(good), str(bad)]).take_all()
    # the broken file contributes nothing; the good one parses fully
    assert sorted(r["url"] for r in rows) == ["https://a.test/1", "https://a.test/2"]


def test_caption_image_real_exact_fields():
    import numpy as np

    from dots_ocr_ray.kernel.png import encode_png
    from dots_ocr_ray.stages.media import caption_image_real

    img = np.arange(24 * 10, dtype=np.uint8).reshape(10, 24) % 256
    cap = caption_image_real(encode_png(img, filter_mode="rotate"))
    assert cap == f"[image 24x10 mean {int(img.sum()) // img.size}]"
    assert caption_image_real(b"junk") == "[image invalid]"
