"""Sentence segmentation parity with java.text.BreakIterator's UAX#29 rule
set (SearchWrapper.java:581-638): abbreviation-lowercase non-breaks (SB8),
decimal non-breaks, mandatory newline breaks (SB4), closer handling."""

from nadry_search_engine_be_ray.pipelines.api import (
    find_first_context_match,
    sentence_bounds,
)


def _sentences(text):
    b = sentence_bounds(text)
    return [text[b[i]:b[i + 1]].strip() for i in range(len(b) - 1)
            if text[b[i]:b[i + 1]].strip()]


def test_simple_sentences():
    assert _sentences("One fish. Two fish. Red fish!") == [
        "One fish.", "Two fish.", "Red fish!"]


def test_decimal_does_not_break():
    assert _sentences("It cost $3.50 total. Cheap!") == [
        "It cost $3.50 total.", "Cheap!"]


def test_lowercase_after_period_does_not_break():
    # SB8: "e.g. apples" stays in one sentence (BreakIterator behavior)
    assert _sentences("Fruit, e.g. apples, is good. Agreed.") == [
        "Fruit, e.g. apples, is good.", "Agreed."]


def test_uppercase_abbreviation_breaks_like_jdk():
    # the JDK has no abbreviation dictionary: "Dr. Smith" DOES break
    assert _sentences("See Dr. Smith today.") == ["See Dr.", "Smith today."]


def test_exclamation_always_breaks():
    assert _sentences("Wow! amazing stuff.") == ["Wow!", "amazing stuff."]


def test_newline_is_mandatory_break():
    assert _sentences("line one\nline two") == ["line one", "line two"]


def test_closing_quote_rides_with_sentence():
    assert _sentences('He said "stop." Then left.') == [
        'He said "stop."', "Then left."]


def test_snippet_uses_sentence_containing_token():
    content = "Alpha beta gamma. The target word appears here. Final bit."
    out = find_first_context_match(content, ["target"])
    assert out == "The target word appears here."


def test_snippet_centered_truncation():
    long_sentence = ("start " + "pad " * 80 + "needle " + "pad " * 80).strip() + "."
    out = find_first_context_match(long_sentence, ["needle"])
    assert "needle" in out
    assert len(out) <= 240 + 6  # MAX + both ellipses
    assert out.startswith("...") and out.endswith("...")


def test_snippet_fallback_first_sentence():
    content = "First sentence here. Second sentence there."
    out = find_first_context_match(content, ["absent"])
    assert out == "First sentence here."
