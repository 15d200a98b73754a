"""Golden tests for the reference tokenizer semantics (M5/M6, SURVEY.md §2.2).

Covers every branch of reference indexer/Tokenizer.java:30-97: NFC, special
token extraction/placeholders, lowercase+strip, length bounds 2..50, the
26-word stop list, the len<=3 stemming cutoff, and placeholder survival.
"""

from nadry_search_engine_be_ray.functions.tokenizer import Tokenizer, tokenize


def test_empty_and_none():
    assert tokenize("") == []
    assert tokenize(None) == []


def test_reference_fixture_tokens():
    # indexer/testIndexer.java:54 expects {"file", "email:test@example.com",
    # "various"} for its fixture; reproduce the essential behavior
    toks = tokenize("Test File test@example.com various")
    assert "file" in toks
    assert "email:test@example.com" in toks
    assert "various" in toks
    # the email body is replaced by the placeholder, which survives stop-word
    # filtering (Tokenizer.java:47)
    assert "_email_" in toks


def test_word_pipeline_order_and_stemming():
    # words > 3 chars are stemmed, <= 3 chars are not (Tokenizer.java:56)
    assert tokenize("cats cat running") == ["cat", "cat", "run"]


def test_stop_words_removed_case_insensitive():
    assert tokenize("The cat WAS here") == ["cat", "here"]
    # all-stop-word input -> empty (drives SearchWrapper.java:128-130 branch)
    assert tokenize("the a an and of to this") == []


def test_length_bounds():
    toks = tokenize("x ab " + "q" * 50 + " " + "q" * 51)
    assert toks == ["ab", "q" * 50]


def test_special_tokens_appended_last_in_order():
    toks = tokenize("pi 3.14 mail a@b.com")
    # word tokens first, then specials in extraction order: all emails, all
    # urls, all numbers (Tokenizer.java:71-90, appended at :51)
    assert toks == ["pi", "_num_", "mail", "_email_",
                    "email:a@b.com", "num:3.14"]


def test_special_order_email_url_num():
    toks = tokenize("a@b.com www.example.com/page 42")
    assert toks == [
        "_email_", "_url_", "_num_",
        "email:a@b.com", "url:www.example.com/page", "num:42",
    ]


def test_url_not_matching_short_tld():
    # url regex needs a 2-6 letter TLD; https://x.y/z does not match
    toks = tokenize("see https://x.y/z now")
    assert not any(t.startswith("url:") for t in toks)


def test_numbers_inside_words_not_special():
    # \b\d+(\.\d+)?\b — digits embedded in identifiers aren't special tokens
    toks = tokenize("var42 7 3.14")
    assert "num:7" in toks and "num:3.14" in toks
    assert "num:42" not in toks
    assert "var42" in toks


def test_nfc_normalization():
    # decomposed e + combining acute must normalize to é (then stripped),
    # otherwise the 'e' would survive as part of the token
    composed = tokenize("café")
    decomposed = tokenize("café")
    assert composed == decomposed == ["caf"]


def test_underscores_survive():
    assert tokenize("my_var also_this") == ["my_var", "also_thi"]


def test_stem_cache_consistency():
    tk = Tokenizer()
    a = tk.tokenize("nations nations nations")
    assert a == ["nation", "nation", "nation"]
