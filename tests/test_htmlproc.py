"""HTML-mode field extraction (M1 proper) vs the reference
DocumentProcessor semantics (indexer/DocumentProcessor.java:32-149).

Fixtures are constructed to exercise the same features as the reference's
own test.html / sample1.html / sample2.html (title, meta description,
script/style exclusion, unwanted-selector removal, main+section selection
with deliberate double counting, link normalization, size/empty guards)."""

import os
import shutil

import pyarrow as pa
import ray.data

from nadry_search_engine_be_ray.stages import htmlproc

BASIC = """<!DOCTYPE html>
<html lang="en">
<head>
  <meta charset="UTF-8">
  <title>Basic Test Page</title>
</head>
<body>
  <h1>Greetings, Planet! ZETA</h1>
  <p>A plain paragraph with an anchor nearby.</p>
  <a href="https://www.example.com">Go There</a>
</body>
</html>"""

RICH = """<!DOCTYPE html>
<html><head>
  <title>Rich Fixture</title>
  <meta name="description" content="A rich fixture for extraction checks.">
  <style>body { color: red; }</style>
  <script>console.log("never index me");</script>
</head>
<body>
  <header><h1>Rich Header</h1></header>
  <div class="ads">BUY NOW spamword</div>
  <div class="comments">troll comment text</div>
  <main>
    <section><p>Main section paragraph.</p></section>
  </main>
  <footer>
    <p>Contact: <a href="mailto:info@example.com">info@example.com</a></p>
    <p>See <a href="/page two.html">internal</a> and
       <a href="HTTPS://Example.com/a//b#frag?b=2&a=1">external</a>.</p>
  </footer>
</body></html>"""


def test_title_description_content_links():
    doc = htmlproc.extract_document(RICH, "https://host.org/base/index.html")
    assert doc["status"] == "ok"
    assert doc["title"] == "Rich Fixture"
    assert doc["description"] == "A rich fixture for extraction checks."
    # script/style text never appears
    assert "never index me" not in doc["content"]
    assert "color: red" not in doc["content"]
    # unwanted selectors removed before content extraction
    assert "spamword" not in doc["content"]
    assert "troll" not in doc["content"]
    # main text present, and double-counted via the section list
    assert doc["content"].count("Main section paragraph.") >= 2
    # mailto dropped; https links normalized+lowercased; internal resolved
    assert all(not l.startswith("mailto:") for l in doc["links"])
    assert any("host.org" in l and "page" in l for l in doc["links"])


def test_basic_page_matches_reference_shape():
    doc = htmlproc.extract_document(BASIC, "https://example.com/test.html")
    assert doc["title"] == "Basic Test Page"
    assert doc["description"] == ""
    assert "Greetings, Planet! ZETA" in doc["content"]
    assert "A plain paragraph with an anchor nearby." in doc["content"]
    assert "Go There" in doc["content"]          # a[href] text
    # java.net.URI keeps bare authority-only URLs slashless; so do we (M3)
    assert doc["links"] == ["https://www.example.com"]
    # doc_id = sha256(url) hex (DocumentProcessor.generateDocId)
    import hashlib

    assert doc["doc_id"] == hashlib.sha256(
        b"https://example.com/test.html"
    ).hexdigest()


def test_fallback_to_body_and_guards():
    plain = "<html><head><title>T</title></head><body>just raw text</body></html>"
    doc = htmlproc.extract_document(plain, "https://x.y/")
    assert doc["content"] == "just raw text"     # no section matches -> body

    assert htmlproc.extract_document("", "u")["status"] == "skipped_empty"
    assert htmlproc.extract_document("   \n ", "u")["status"] == "skipped_empty"
    big = htmlproc.extract_document("<p>" + "x" * 100, "u", max_bytes=50)
    assert big["status"] == "skipped_too_large"


def test_process_html_batch_stage(ray_session):
    tbl = pa.table(
        {
            "url": pa.array(
                ["https://a.example/1", "https://a.example/2", "https://a.example/3"]
            ),
            "html": pa.array([BASIC, RICH, ""]),
        }
    )
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(htmlproc.process_html_batch, batch_format="pyarrow")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert list(out["status"]) == ["ok", "ok", "skipped_empty"]
    assert out["title"][0] == "Basic Test Page"


def test_html_mode_index_build(ray_session, tmp_path):
    """End-to-end: content_mode='html' build indexes extracted text — title
    terms land in the TITLE field, script text is absent, email specials
    surface (testIndexer.java's email:test@example.com check)."""
    import pyarrow.parquet as pq

    from nadry_search_engine_be_ray.config import BuildConfig
    from nadry_search_engine_be_ray.pipelines.build import build_index
    from nadry_search_engine_be_ray.state.segments import SegmentReader

    corpus = os.path.join(tmp_path, "corpus")
    os.makedirs(corpus)
    pq.write_table(
        pa.table(
            {
                "repo": pa.array(["site", "site"]),
                "path": pa.array(["page1.html", "page2.html"]),
                "commit": pa.array(["c1", "c1"]),
                "lang": pa.array(["html", "html"]),
                "content": pa.array([BASIC, RICH]),
            }
        ),
        os.path.join(corpus, "part.parquet"),
    )
    index_dir = os.path.join(tmp_path, "index")
    build_index(corpus, index_dir, BuildConfig(
        num_shards=2, salt_bits=0, content_mode="html"))
    r = SegmentReader(index_dir)
    terms = set(r.terms())
    assert "zeta" in terms                        # body h1 word
    assert "email:info@example.com" in terms      # special token
    assert "consol" not in terms and "log" not in terms  # script excluded
    assert "spamword" not in terms                # .ads removed
    # title tokens present (title field text "Basic Test Page")
    assert "basic" in terms and "page" in terms
    shutil.rmtree(index_dir, ignore_errors=True)
