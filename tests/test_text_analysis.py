"""Tests for text-analysis pipelines over the documents table."""

import pytest

from dots_ocr_ray.pipelines.text_analysis import (
    fingerprint_duplicates,
    lang_id_confusion,
    quality_filter,
    token_count_by_lang,
)

SF_DIR = "/root/testdata/sf0.001"


def test_token_count_by_lang(ray_session):
    out = token_count_by_lang(SF_DIR).to_pandas()
    assert set(out.columns) == {"lang", "sum_tokens_ws", "sum_tokens_bpe"}
    assert (out.sum_tokens_ws > 0).all()
    # BPE-ish tokenizer splits at least as finely as whitespace
    assert (out.sum_tokens_bpe >= out.sum_tokens_ws).all()


def test_quality_filter(ray_session):
    out = quality_filter(SF_DIR).to_pandas()
    assert len(out) > 0
    assert (out.alpha_ratio >= 0.5).all()
    assert (out.n_tokens_ws >= 5).all()


def test_lang_id_confusion(ray_session):
    out = lang_id_confusion(SF_DIR).to_pandas()
    assert {"lang", "lang_pred", "n"} == set(out.columns)
    # corpus text is English word soup → predictions dominated by en/und
    assert set(out.lang_pred) <= {"en", "fr", "es", "de", "zh", "ru", "hi", "und"}
    assert out.n.sum() == 500  # every document counted exactly once


def test_fingerprint_duplicates(ray_session):
    out = fingerprint_duplicates(SF_DIR).to_pandas()
    # sf0.001 documents are all distinct → few/no shared fingerprints,
    # and the op must still return a well-formed (possibly empty) table
    assert set(out.columns) == {"fingerprint", "n_docs", "min_doc_id"}
    assert (out.n_docs >= 2).all() if len(out) else True
