"""Unicode script-mix counts: bucket boundaries, empty/null rows,
surrogate-free vectorized pass vs a per-char reference."""

from __future__ import annotations

import pyarrow as pa

import ray.data

from dots_ocr_ray.functions.scripts import SCRIPT_NAMES, script_counts


def _ref_counts(text: str) -> dict:
    out = {name: 0 for name in SCRIPT_NAMES}
    for ch in text:
        cp = ord(ch)
        if cp < 0x370:
            out["latin"] += 1
        elif cp < 0x400:
            out["greek"] += 1
        elif cp < 0x500:
            out["cyrillic"] += 1
        elif 0x4E00 <= cp < 0xA000:
            out["cjk"] += 1
        else:
            out["other"] += 1
    return out


def test_counts_match_reference(ray_session):
    texts = [
        "plain ascii 123!",
        "mixed привет and αβγ",
        "你好世界 with latin tail",
        "",
        "emoji \U0001f600 and hangul 안녕",  # both land in 'other'
        None,
    ]
    tbl = pa.table(
        {"doc_id": list(range(len(texts))), "text": pa.array(texts, pa.string())}
    )
    out = (
        script_counts(ray.data.from_arrow(tbl).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, t in enumerate(texts):
        ref = _ref_counts(t or "")
        for name in SCRIPT_NAMES:
            assert out[f"n_{name}"][i] == ref[name], (i, name)


def test_astral_codepoints_counted_once(ray_session):
    # utf-32 view must count one astral char as ONE codepoint
    tbl = pa.table({"doc_id": [0], "text": ["\U0001f600"]})
    out = script_counts(ray.data.from_arrow(tbl)).to_pandas()
    assert out["n_other"][0] == 1
    assert out[[f"n_{n}" for n in SCRIPT_NAMES]].sum(axis=1)[0] == 1
