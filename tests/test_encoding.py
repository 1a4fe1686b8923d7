"""Mojibake detection + repair: signature lexicon invariants,
round-trip correctness, batch operator semantics."""

from __future__ import annotations

import pyarrow as pa

import ray.data

from dots_ocr_ray.functions.encoding import (
    MOJIBAKE_SIGNATURES,
    repair_mojibake,
    repair_text,
)


def test_signatures_are_maximal_and_disjoint():
    for a in MOJIBAKE_SIGNATURES:
        for b in MOJIBAKE_SIGNATURES:
            if a != b:
                assert a not in b  # counts stay additive


def test_each_signature_repairs_to_one_char():
    for sig in MOJIBAKE_SIGNATURES:
        fixed = repair_text(sig)
        assert len(fixed) == 1 and fixed != sig


def test_repair_is_guarded_on_unrepairable_text():
    # codepoints outside cp1252 → encode fails → unchanged
    s = "already fine 你好"
    assert repair_text(s) == s


def test_operator_counts_and_lengths(ray_session):
    rows = {
        "doc_id": [1, 2, 3],
        "text": [
            "clean ascii text",
            "cafÃ© face",  # one mangled e-acute
            "aâ€™bâ€™c",  # two mangled quotes
        ],
    }
    out = (
        repair_mojibake(ray.data.from_arrow(pa.table(rows)))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_mojibake"].tolist() == [0, 1, 2]
    assert out["text_repaired"][0] == "clean ascii text"
    assert out["text_repaired"][1] == "café face"
    assert out["text_repaired"][2] == "a’b’c"
    assert (out["chars_before"] - out["chars_after"]).tolist() == [0, 1, 4]


def test_null_text_treated_as_empty(ray_session):
    tbl = pa.table({"doc_id": [1], "text": pa.array([None], pa.string())})
    out = repair_mojibake(ray.data.from_arrow(tbl)).to_pandas()
    assert out["n_mojibake"].tolist() == [0]
    assert out["chars_before"].tolist() == [0]


def test_nfkc_normalize(ray_session):
    from dots_ocr_ray.functions.encoding import nfkc_normalize

    tbl = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": pa.array(
                ["pure ascii", "full ＡＢ width", "ligature ﬁ here", None],
                pa.string(),
            ),
        }
    )
    out = (
        nfkc_normalize(ray.data.from_arrow(tbl).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["changed"].tolist() == [0, 1, 1, 0]
    assert out["text_nfkc"][1] == "full AB width"
    assert out["text_nfkc"][2] == "ligature fi here"
    assert (out["len_after"] - out["len_before"]).tolist() == [0, 0, 1, 0]


def test_repair_ok_flags_unrepairable_mix(ray_session):
    # mojibake signature + a genuine em dash: cp1252 encode fails,
    # row passes through unrepaired but FLAGGED
    tbl = pa.table({"doc_id": [1], "text": ["cafÃ© — dash"]})
    out = repair_mojibake(ray.data.from_arrow(tbl)).to_pandas()
    assert out["n_mojibake"][0] == 1
    assert out["repair_ok"][0] == 0
    assert out["text_repaired"][0] == out["text"][0] if "text" in out else True
