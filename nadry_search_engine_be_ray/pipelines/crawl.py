"""Crawler subsystem (operators S1/S2/S4, K4/K5, M9 skip) over a
SIMULATED web — this container has no network, so the HTTP fetch is a
pluggable page store; everything else is the reference crawler's control
flow re-expressed for Ray:

* frontier enqueue/dequeue (S1/S2): strict FIFO work-list
  (``WebCrawler.java:60-118`` uses a shared BlockingQueue; thread timing
  made its order nondeterministic — we declare deterministic FIFO, the
  SURVEY §2.6 K4 policy)
* crawl cap (K5): stop after ``max_pages`` stored pages
  (``MAX_PAGES_NUMBER``, WebCrawler.java:30)
* frontier throttle: link extraction pauses when the queue reaches
  ``queue_cap`` (2x the page cap in the reference) and resumes below
  ``resume_at`` (WebCrawler.java:140-147)
* robots.txt gate (S4): stdlib ``urllib.robotparser`` over the store's
  ``scheme://host/robots.txt`` page, cached per host
  (RobotChecker.java:21-100's rule cache; its 5 s fetch timeout is a
  network concern the simulator doesn't have)
* per-host politeness: a Ray actor serializes access times per host — the
  shared-mutable-state case the Dataset API can't express (task brief:
  raw actors as last resort)
* page parse + link extraction: stages/htmlproc.extract_document, fanned
  out as Ray tasks per URL batch (the data-parallel part)
* near-dup skip (M9): compact-signature set, WebCrawler.java:224-243

Scale note: the driver-held frontier/visited sets mirror the reference's
in-memory structures and are the honest single-coordinator design at
6 000-page scale; a 10^9-page crawl would checkpoint the frontier as a
partitioned Dataset per round and shard the visited set by url hash
(documented, not needed for parity).
"""

from __future__ import annotations

import time
import urllib.robotparser
from collections import deque
from urllib.parse import urlsplit

import pyarrow as pa

from ..stages.dedup import compact_signature
from ..stages.htmlproc import extract_document

MAX_PAGES_DEFAULT = 6_000           # WebCrawler.java:30


class SimulatedWeb:
    """Pluggable page store standing in for HTTP fetch: url -> html.
    ``robots`` maps host -> robots.txt body."""

    def __init__(self, pages: dict[str, str], robots: dict[str, str] | None = None):
        self.pages = pages
        self.robots = robots or {}

    def fetch(self, url: str) -> str | None:
        return self.pages.get(url)


class RobotGate:
    """Per-host cached robots.txt decisions (RobotChecker.java:21-100)."""

    def __init__(self, web: SimulatedWeb, user_agent: str = "*"):
        self.web = web
        self.user_agent = user_agent
        self._cache: dict[str, urllib.robotparser.RobotFileParser] = {}

    def allowed(self, url: str) -> bool:
        host = urlsplit(url).netloc
        rp = self._cache.get(host)
        if rp is None:
            rp = urllib.robotparser.RobotFileParser()
            body = self.web.robots.get(host)
            if body is None:
                rp.parse([])          # no robots.txt -> allow all
                rp.allow_all = True
            else:
                rp.parse(body.splitlines())
            self._cache[host] = rp
        return rp.can_fetch(self.user_agent, url)


def make_host_limiter():
    """Per-host politeness actor: ``reserve(host, min_interval)`` returns
    the ABSOLUTE deadline (wall clock) before which the caller must not hit
    the host — successive reservations on one host are spaced at least
    ``min_interval`` seconds apart.  Absolute deadlines (not relative waits)
    so a delayed task start cannot compress inter-request spacing; wall
    clock (``time.time``) so deadlines stay comparable across worker
    processes/nodes (monotonic epochs differ per host).  One actor = one
    serialization point for the shared mutable per-host clock."""
    import ray

    @ray.remote
    class HostRateLimiter:
        def __init__(self):
            self.next_free: dict[str, float] = {}

        def reserve(self, host: str, min_interval: float) -> float:
            now = time.time()
            start = max(now, self.next_free.get(host, now))
            self.next_free[host] = start + min_interval
            return start

    return HostRateLimiter.remote()


def crawl(
    seeds: list[str],
    web: SimulatedWeb,
    max_pages: int = MAX_PAGES_DEFAULT,
    queue_cap: int | None = None,
    resume_at: int = 1_000,
    batch_size: int = 64,
    min_interval: float = 0.0,
    use_ray: bool = True,
) -> pa.Table:
    """BFS crawl; returns the crawled-page table
    (url, title, description, content, n_links, order).

    Each round dequeues up to ``batch_size`` FIFO urls, fans their
    fetch+parse out as Ray tasks (the page store rides the object store via
    ``ray.put`` once), then the driver applies the visited / robots /
    throttle / cap policies in deterministic order.
    """
    import ray

    queue_cap = queue_cap if queue_cap is not None else 2 * max_pages
    # hysteresis must keep pause-threshold above resume-threshold, else
    # extraction oscillates per stored page and alternating pages lose links
    resume_at = min(resume_at, max(1, queue_cap // 2))
    frontier: deque[str] = deque()
    seen_urls: set[str] = set()
    seen_sigs: set[str] = set()       # M9 compact-signature near-dup skip
    gate = RobotGate(web)
    limiter = make_host_limiter() if (use_ray and min_interval > 0) else None
    extracting_links = True

    for s in seeds:
        if s not in seen_urls:
            seen_urls.add(s)
            frontier.append(s)

    web_ref = ray.put(web) if use_ray else None

    @ray.remote
    def fetch_parse(urls: list[str], deadlines: list[float], web_obj) -> list[dict]:
        """One task per HOST: fetches that host's urls sequentially, each no
        earlier than its limiter-issued ABSOLUTE deadline (politeness is
        enforced INSIDE the task, so neither cross-host parallelism nor a
        delayed task start can violate per-host spacing)."""
        out = []
        for u, deadline in zip(urls, deadlines):
            delay = deadline - time.time()
            if delay > 0:
                time.sleep(delay)
            html = web_obj.fetch(u)
            doc = extract_document(html, u)
            doc["url"] = u
            out.append(doc)
        return out

    rows = []
    order = 0
    while frontier and len(rows) < max_pages:
        batch = []
        while frontier and len(batch) < batch_size:
            batch.append(frontier.popleft())
        allowed = [u for u in batch if gate.allowed(u)]
        # group by host: one fetch task per host, sequential inside
        by_host: dict[str, list[str]] = {}
        for u in allowed:
            by_host.setdefault(urlsplit(u).netloc, []).append(u)
        if use_ray:
            futures = []
            for host, urls in by_host.items():
                if limiter is not None:
                    deadlines = ray.get(
                        [
                            limiter.reserve.remote(host, min_interval)
                            for _ in urls
                        ]
                    )
                else:
                    deadlines = [0.0] * len(urls)
                futures.append(fetch_parse.remote(urls, deadlines, web_ref))
            docs_by_host = dict(zip(by_host.keys(), ray.get(futures)))
            # reassemble in FIFO batch order for deterministic storage order
            cursor = {h: 0 for h in by_host}
            docs = []
            for u in allowed:
                h = urlsplit(u).netloc
                docs.append(docs_by_host[h][cursor[h]])
                cursor[h] += 1
        else:
            docs = []
            for u in allowed:
                d = extract_document(web.fetch(u), u)
                d["url"] = u
                docs.append(d)

        for doc in docs:
            if len(rows) >= max_pages:
                break
            if doc["status"] != "ok":
                continue
            sig = compact_signature(doc["content"])
            if sig and sig in seen_sigs:
                continue              # near-dup page skipped (M9)
            seen_sigs.add(sig)
            rows.append(
                {
                    "url": doc["url"],
                    "title": doc["title"],
                    "description": doc["description"],
                    "content": doc["content"],
                    "n_links": len(doc["links"]),
                    "order": order,
                }
            )
            order += 1

            # frontier throttle (WebCrawler.java:140-147)
            if extracting_links and len(frontier) >= queue_cap:
                extracting_links = False
            elif not extracting_links and len(frontier) < resume_at:
                extracting_links = True
            if extracting_links:
                for link in doc["links"]:
                    if link not in seen_urls:
                        seen_urls.add(link)
                        frontier.append(link)

    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "title": pa.array([r["title"] for r in rows], pa.string()),
            "description": pa.array(
                [r["description"] for r in rows], pa.string()
            ),
            "content": pa.array([r["content"] for r in rows], pa.string()),
            "n_links": pa.array([r["n_links"] for r in rows], pa.int32()),
            "order": pa.array([r["order"] for r in rows], pa.int32()),
        }
    )
