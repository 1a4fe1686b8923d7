"""Jaro-Winkler: published-example parity and vocab-pair pipeline."""

from __future__ import annotations

from dots_ocr_ray.functions.strsim import jaro_winkler_micro


def test_jw_published_examples():
    assert jaro_winkler_micro("MARTHA", "MARHTA") == 961_111
    assert jaro_winkler_micro("DIXON", "DICKSONX") == 813_333
    assert jaro_winkler_micro("DWAYNE", "DUANE") == 840_000


def test_jw_edges():
    assert jaro_winkler_micro("abc", "abc") == 1_000_000
    assert jaro_winkler_micro("", "abc") == 0
    assert jaro_winkler_micro("abc", "") == 0
    assert jaro_winkler_micro("ab", "xy") == 0  # no matches
    # symmetry
    assert jaro_winkler_micro("kitten", "sitting") == jaro_winkler_micro("sitting", "kitten")


def test_jw_vocab_pairs_pipeline(ray_session):
    import pyarrow as pa
    import ray.data

    from dots_ocr_ray.pipelines.text_analysis import jw_vocab_pairs

    t = pa.table(
        {"text": pa.array(["martha marhta dixon", "dixon unrelated zz"], type=pa.string())}
    )
    out = jw_vocab_pairs(ray.data.from_arrow(t).repartition(2), threshold_micro=900_000)
    rows = out.to_pylist()
    assert rows == [{"w1": "marhta", "w2": "martha", "jw_micro": 961_111}]
    # partition invariance
    out2 = jw_vocab_pairs(ray.data.from_arrow(t).repartition(1), threshold_micro=900_000)
    assert out2.to_pylist() == rows


def test_boost_threshold_gate():
    # the prefix boost applies only when jaro > 0.7 (Winkler 1990);
    # a low-similarity pair with a common prefix scores plain Jaro
    a, b = "abcxxxxx", "abcyyzzq"  # shares 3-char prefix, low jaro
    got = jaro_winkler_micro(a, b)
    la = lb = 8
    m = 3
    jaro = (m / la + m / lb + m / m) / 3.0
    assert jaro <= 0.7
    assert got == int(1_000_000 * jaro)  # no boost applied
