"""Unit tests for scalar text ops (reference §2.8 library analogs)."""

from dots_ocr_ray.kernel.textops import (
    count_tokens_bpeish,
    count_tokens_whitespace,
    detect_lang,
    fingerprint,
    fold_newlines,
    md5_hex,
    quality_features,
    quality_keep,
    rolling_hashes,
)


def test_fold_newlines_reference_regex():
    # single \n → space; \n\n preserved (pdf_extractor.py:55-56)
    assert fold_newlines("a\nb") == "a b"
    assert fold_newlines("a\n\nb") == "a\n\nb"
    assert fold_newlines("  a\nb  ") == "a b"
    assert fold_newlines("a\n\n\nb") == "a\n\n\nb"


def test_md5_matches_hashlib():
    assert md5_hex("abc") == "900150983cd24fb0d6963f7d28e17f72"
    assert md5_hex(b"abc") == md5_hex("abc")


def test_token_counts():
    assert count_tokens_whitespace("one two  three") == 3
    assert count_tokens_bpeish("hello, world! 12345") == 6  # hello , world ! 123 45


def test_quality_features_and_keep():
    good = quality_features("The quick brown fox jumps over the lazy dog.")
    assert quality_keep(good)
    assert 0 < good["stopword_ratio"] < 1
    bad = quality_features("!!! ??? ###")
    assert not quality_keep(bad)


def test_detect_lang_scripts_and_markers():
    assert detect_lang("这是一个中文句子，包含很多汉字和内容。") == "zh"
    assert detect_lang("Это русский текст про разные вещи") == "ru"
    assert detect_lang("यह एक हिंदी वाक्य है जो लंबा है") == "hi"
    assert detect_lang("the cat and the dog is going to the park") == "en"
    assert detect_lang("der Hund und die Katze ist das Tier") == "de"
    assert detect_lang("") == "und"


def test_fingerprint_shift_invariant_window():
    a = "some long enough text that has stable windows inside it"
    # identical text → identical fingerprint
    assert fingerprint(a) == fingerprint(a)
    assert fingerprint("") == 0
    assert len(rolling_hashes("abcdefgh", window=4)) == 5
    # rolling hash windows of identical substrings match
    h1 = rolling_hashes("XXabcdefgh", window=4)
    h2 = rolling_hashes("YYabcdefgh", window=4)
    assert set(h1[2:]) == set(h2[2:])


def test_normalize_url():
    from dots_ocr_ray.kernel.textops import normalize_url

    assert (
        normalize_url("HTTP://Example.COM:80/a//b/?utm_source=x&id=3#frag")
        == "http://example.com/a/b?id=3"
    )
    assert normalize_url("https://Host.org:443/") == "https://host.org/"
    assert normalize_url("https://host.org:8443/p/") == "https://host.org:8443/p"
    assert normalize_url("http://u:p@host.net/x") == "http://host.net/x"
    assert normalize_url("  http://a.b/c?gclid=1&q=2  ") == "http://a.b/c?q=2"
    assert normalize_url("") == ""
    assert normalize_url("http://host:99999/x") == "http://host:99999/x"  # junk port untouched
    assert normalize_url("not a url") == "not a url"


def test_levenshtein_many_matches_reference_dp():
    from dots_ocr_ray.kernel.textops import levenshtein_many

    def ref(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    toks = ["", "a", "kitten", "sitting", "flaw", "lawn", "déjà", "deja",
            "abcdefghij", "abcdefghijk", "xyz", "kitten"]
    for probe in ("", "kitten", "law", "déjà", "x"):
        got = levenshtein_many(toks, probe)
        for t, d in zip(toks, got):
            assert d == ref(t, probe), (t, probe)
