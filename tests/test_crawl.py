"""Crawler control-flow parity over a planted simulated web: FIFO order
(K4), crawl cap (K5), robots gate (S4), frontier throttle, compact-signature
near-dup skip (M9)."""

import pyarrow as pa
import pytest

from nadry_search_engine_be_ray.pipelines.crawl import (
    RobotGate,
    SimulatedWeb,
    crawl,
)


def _page(title, body, links=()):
    anchors = "".join(f'<a href="{l}">go</a>' for l in links)
    return f"<html><head><title>{title}</title></head><body><p>{body}</p>{anchors}</body></html>"


@pytest.fixture
def small_web():
    pages = {
        "https://a.test/": _page("Root", "root page body",
                                 ["https://a.test/one", "https://a.test/two",
                                  "https://b.test/secret"]),
        "https://a.test/one": _page("One", "first child body",
                                    ["https://a.test/two"]),
        "https://a.test/two": _page("Two", "second child body", []),
        "https://b.test/secret": _page("Secret", "disallowed body", []),
        "https://a.test/dup": _page("Dup", "first child body", []),
    }
    robots = {"b.test": "User-agent: *\nDisallow: /secret\n"}
    return SimulatedWeb(pages, robots)


def test_fifo_order_and_robots(ray_session, small_web):
    out = crawl(["https://a.test/"], small_web).to_pandas()
    # BFS FIFO: root first, then its links in document order; robots blocks
    # b.test/secret
    assert list(out["url"]) == [
        "https://a.test/",
        "https://a.test/one",
        "https://a.test/two",
    ]
    assert list(out["order"]) == [0, 1, 2]


def test_crawl_cap(ray_session, small_web):
    out = crawl(["https://a.test/"], small_web, max_pages=2).to_pandas()
    assert len(out) == 2


def test_near_dup_skip(ray_session, small_web):
    # /dup has the same compact signature as /one -> stored only once
    out = crawl(
        ["https://a.test/one", "https://a.test/dup"], small_web
    ).to_pandas()
    assert list(out["url"]) == ["https://a.test/one", "https://a.test/two"]


def test_robot_gate_caches_and_defaults(small_web):
    gate = RobotGate(small_web)
    assert gate.allowed("https://a.test/anything")       # no robots -> allow
    assert not gate.allowed("https://b.test/secret")
    assert gate.allowed("https://b.test/public")
    assert len(gate._cache) == 2


def test_frontier_throttle(ray_session):
    # a hub page linking to 30 children; queue_cap=5 stops link extraction
    # after the frontier exceeds 5, so grandchildren never enqueue
    children = [f"https://h.test/c{i}" for i in range(30)]
    pages = {"https://h.test/": _page("Hub", "hub body text", children)}
    for i, c in enumerate(children):
        pages[c] = _page(f"C{i}", f"child body {i}",
                         [f"https://h.test/g{i}"])
        pages[f"https://h.test/g{i}"] = _page(f"G{i}", f"grand body {i}", [])
    web = SimulatedWeb(pages)
    out = crawl(["https://h.test/"], web, queue_cap=5, resume_at=1,
                batch_size=4).to_pandas()
    # hub + all children crawled, but no grandchildren (extraction paused
    # while the queue stayed above resume_at)
    urls = set(out["url"])
    assert "https://h.test/" in urls
    assert not any("/g" in u for u in urls)


def test_politeness_limiter(ray_session, small_web):
    import time

    t0 = time.time()
    out = crawl(["https://a.test/"], small_web, min_interval=0.05,
                batch_size=2).to_pandas()
    assert len(out) == 3
    assert time.time() - t0 >= 0.05  # at least one politeness wait applied
