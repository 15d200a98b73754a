"""Golden tests for the M3/M4 URL normalizers (DocumentProcessor.java:181-210,
WebCrawler.java:245-273 semantics incl. documented quirks) and the
suggestions API facade (SearchController.java:142-197)."""

import pytest

from nadry_search_engine_be_ray.functions.urlnorm import (
    crawler_normalize,
    extract_links,
    filename_from_url,
    is_followable,
    normalize_url,
)
from nadry_search_engine_be_ray.pipelines.api import SuggestionStore

BASE = "https://example.com/dir/page.html"


class TestNormalizeUrlM3:
    def test_fragment_stripped(self):
        assert normalize_url("https://a.com/x#frag", BASE) == "https://a.com/x"

    def test_lowercased(self):
        assert normalize_url("https://A.com/PaTh", BASE) == "https://a.com/path"

    def test_relative_resolved_against_base(self):
        assert normalize_url("other.html", BASE) == "https://example.com/dir/other.html"

    def test_dot_segments_removed(self):
        assert normalize_url("https://a.com/x/../y/./z", BASE) == "https://a.com/y/z"

    def test_query_params_sorted_and_empties_dropped(self):
        assert (
            normalize_url("https://a.com/p?b=2&a=1&&c=3", BASE)
            == "https://a.com/p?a=1&b=2&c=3"
        )

    def test_space_and_pipe_encoded(self):
        assert normalize_url("https://a.com/x y|z", BASE) == "https://a.com/x%20y%7cz"

    def test_https_double_slash_preserved(self):
        assert normalize_url("https://a.com//x///y", BASE) == "https://a.com/x/y"

    def test_http_scheme_mangled_quirk(self):
        # faithful reference quirk: the slash-collapse lookbehind protects
        # only "https:", so http:// collapses and the followable filter
        # then drops the link (DocumentProcessor.java:171,196)
        n = normalize_url("http://a.com/x", BASE)
        assert n == "http:/a.com/x"
        assert not is_followable(n)

    def test_empty_and_none(self):
        assert normalize_url("", BASE) is None
        assert normalize_url("   ", BASE) is None
        assert normalize_url(None, BASE) is None

    def test_extract_links_filters_and_dedups(self):
        html = (
            '<a href="https://a.com/x#f">1</a>'
            '<a HREF="https://a.com/x">dup</a>'
            '<a href="http://b.com/y">http dropped</a>'
            '<a href="mailto:z@q.com">not http</a>'
            '<a href="sub/page.html">rel</a>'
        )
        assert extract_links(html, BASE) == [
            "https://a.com/x",
            "https://example.com/dir/sub/page.html",
        ]


class TestCrawlerNormalizeM4:
    def test_drops_query_and_fragment(self):
        assert (
            crawler_normalize("HTTPS://Ex.COM:8080/Path?q=1#f")
            == "https://ex.com:8080/Path"
        )

    def test_default_port_omitted(self):
        assert crawler_normalize("http://ex.com/a") == "http://ex.com/a"

    def test_malformed_raises(self):
        with pytest.raises(ValueError):
            crawler_normalize("not a url")

    def test_filename_from_url(self):
        assert (
            filename_from_url("https://www.example.com/some/page.html")
            == "www.example.com_some_page.html"
        )
        assert filename_from_url("https://example.com/") == "example.com__root"


class TestSuggestions:
    def test_substring_match_insertion_order_limit(self):
        s = SuggestionStore()
        for q in ["hash join", "hash map", "merge sort", "HASHing deep dive"]:
            assert s.save(q)
        assert s.suggest("hash", 5) == ["hash join", "hash map", "HASHing deep dive"]
        assert s.suggest("hash", 2) == ["hash join", "hash map"]
        assert s.suggest("HASH", 5)[0] == "hash join"  # case-insensitive
        assert s.suggest("", 5) == []
        assert s.suggest(None, 5) == []

    def test_save_rejects_empty(self):
        s = SuggestionStore()
        assert not s.save("")
        assert not s.save("   ")
        assert not s.save(None)

    def test_persistence_roundtrip(self, tmp_path):
        p = str(tmp_path / "sugg.parquet")
        s = SuggestionStore(p)
        s.save("alpha beta")
        s.save("beta gamma")
        s2 = SuggestionStore(p)
        assert s2.suggest("beta", 5) == ["alpha beta", "beta gamma"]
