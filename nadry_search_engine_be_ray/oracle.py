"""Single-process conformance oracle.

A direct Python transcription of the reference's computation, used ONLY by
the test suite as ground truth for the distributed engine (SURVEY.md §5):

* index build: indexer/IndexBuilder.java:126-145 per-field positions/weights,
  totalWords (IndexBuilder.java:72-75), merged per (term, doc) like the
  write-behind flush (InvertedIndex.java:183-214)
* term search: api/SearchWrapper.java:123-220 (candidate union, tf merge)
* phrase search: api/SearchWrapper.java:266-397 (field-local positional
  adjacency chain)
* ranking: via functions/scoring.py (shared with the engine)
* PageRank: nadry/ranker/PageRank.java:44-81 INCLUDING the as-implemented
  in/out-degree quirk (SURVEY.md §2.5 A10)

Deliberately simple, row-at-a-time, in-memory — the opposite of the Ray
engine — so agreement between the two is meaningful.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass, field

from .functions.scoring import Candidate, paginate, rank, sort_key
from .functions.tokenizer import Tokenizer
from .stages.fieldsplit import (
    FIELD_BODY,
    FIELD_DESCRIPTION,
    FIELD_TITLE,
    FIELD_WEIGHTS,
    split_fields,
)


@dataclass
class OraclePosting:
    doc_id: str
    url: str
    field_positions: dict[int, list[int]] = field(default_factory=dict)
    weight: float = 0.0

    def add_position(self, pos: int, field_type: int) -> None:
        # InvertedIndex.Posting.addPosition (InvertedIndex.java:229-232)
        self.field_positions.setdefault(field_type, []).append(pos)
        self.weight += FIELD_WEIGHTS[field_type]

    def frequency(self) -> int:
        return sum(len(p) for p in self.field_positions.values())


class OracleIndex:
    def __init__(self) -> None:
        self.tokenizer = Tokenizer()
        # term -> {doc_id -> OraclePosting}
        self.index: dict[str, dict[str, OraclePosting]] = {}
        # doc_id -> metadata
        self.documents: dict[str, dict] = {}

    # -- build ------------------------------------------------------------

    def add_document(
        self,
        repo: str,
        path: str,
        commit: str,
        content: str,
        links: list[str] | None = None,
    ) -> str:
        url = f"{repo}/{path}@{commit}"
        doc_id = hashlib.sha256(url.encode()).hexdigest()
        content_sha = hashlib.sha256((content or "").encode()).hexdigest()
        title, description, body = split_fields(path, content)

        total_words = 0
        total_words += self._index_field(title, doc_id, url, FIELD_TITLE)
        total_words += self._index_field(description, doc_id, url, FIELD_DESCRIPTION)
        total_words += self._index_field(body, doc_id, url, FIELD_BODY)

        self.documents[doc_id] = {
            "doc_id": doc_id,
            "url": url,
            "title": title,
            "description": description,
            "content": content,
            "content_sha256": content_sha,
            "links": links or [],
            "total_words": total_words,
            "popularity_score": 0.0,
        }
        return doc_id

    def _index_field(self, text: str, doc_id: str, url: str, field_type: int) -> int:
        # IndexBuilder.indexDocumentField (IndexBuilder.java:126-145)
        if not text:
            return 0
        tokens = self.tokenizer.tokenize(text)
        for pos, term in enumerate(tokens):
            postings = self.index.setdefault(term, {})
            posting = postings.get(doc_id)
            if posting is None:
                posting = postings[doc_id] = OraclePosting(doc_id, url)
            posting.add_position(pos, field_type)
        return len(tokens)

    def add_corpus(self, table) -> None:
        """Add a pyarrow corpus table with exact-dup dedup (keep min doc_id).

        Mirrors the engine's prep stage (D1/D2 analog, SURVEY.md §7.3):
        rows whose content sha256 was already seen under a smaller doc_id are
        dropped deterministically.
        """
        rows = table.to_pylist()
        by_sha: dict[str, list[dict]] = {}
        for r in rows:
            url = f"{r['repo']}/{r['path']}@{r['commit']}"
            r["_doc_id"] = hashlib.sha256(url.encode()).hexdigest()
            sha = hashlib.sha256((r["content"] or "").encode()).hexdigest()
            by_sha.setdefault(sha, []).append(r)
        for sha, group in by_sha.items():
            keep = min(group, key=lambda r: r["_doc_id"])
            self.add_document(keep["repo"], keep["path"], keep["commit"], keep["content"])

    # -- query ------------------------------------------------------------

    def get_postings(self, term: str) -> list[OraclePosting]:
        return list(self.index.get(term, {}).values())

    def search(self, query: str, page: int = 0, page_size: int = 10) -> dict:
        """SearchWrapper.searchWithMetadata (SearchWrapper.java:123-220)."""
        query_tokens = self.tokenizer.tokenize(query)
        if not query_tokens:
            return {"results": [], "total_results": 0, "total_pages": 0, "page": page}

        term_postings = {
            t: self.get_postings(t) for t in query_tokens if self.get_postings(t)
        }
        query_bag: dict[str, int] = {}
        for t in query_tokens:
            query_bag[t] = query_bag.get(t, 0) + 1

        doc_tf: dict[str, dict[str, int]] = {}
        doc_urls: dict[str, str] = {}
        for term, postings in term_postings.items():
            for p in postings:
                doc_urls.setdefault(p.doc_id, p.url)
                tfm = doc_tf.setdefault(p.doc_id, {})
                tfm[term] = tfm.get(term, 0) + p.frequency()

        return self._rank_and_page(query_bag, doc_tf, doc_urls, page, page_size)

    def phrase_search(self, phrase: str, page: int = 0, page_size: int = 10) -> dict:
        """SearchWrapper.phraseSearch (SearchWrapper.java:266-397)."""
        if page < 0:
            page = 0
        if page_size <= 0:
            page_size = 10
        tokens = self.tokenizer.tokenize(phrase)
        if not tokens:
            return {"results": [], "total_results": 0, "total_pages": 0, "page": page}
        if len(tokens) == 1:
            return self.search(tokens[0], page, page_size)

        first = self.get_postings(tokens[0])
        if not first:
            return {"results": [], "total_results": 0, "total_pages": 0, "page": page}

        # doc_id -> list[(url, field, position-of-last-matched-term)]
        matches: dict[str, list[tuple[str, int, int]]] = {}
        for p in first:
            for f, positions in p.field_positions.items():
                for pos in positions:
                    matches.setdefault(p.doc_id, []).append((p.url, f, pos))

        for term in tokens[1:]:
            postings = self.get_postings(term)
            if not postings:
                matches = {}
                break
            nxt: dict[str, list[tuple[str, int, int]]] = {}
            for p in postings:
                existing = matches.get(p.doc_id)
                if not existing:
                    continue
                for url, f, pos in existing:
                    fp = p.field_positions.get(f)
                    if fp and (pos + 1) in fp:
                        nxt.setdefault(p.doc_id, []).append((url, f, pos + 1))
            matches = nxt
            if not matches:
                break

        if not matches:
            return {"results": [], "total_results": 0, "total_pages": 0, "page": page}

        query_bag: dict[str, int] = {}
        for t in tokens:
            query_bag[t] = query_bag.get(t, 0) + 1
        doc_tf = {doc_id: {t: 1 for t in tokens} for doc_id in matches}
        doc_urls = {doc_id: matches[doc_id][0][0] for doc_id in matches}
        return self._rank_and_page(query_bag, doc_tf, doc_urls, page, page_size)

    def _rank_and_page(self, query_bag, doc_tf, doc_urls, page, page_size) -> dict:
        candidates = []
        for doc_id, tf in doc_tf.items():
            meta = self.documents.get(doc_id)
            candidates.append(
                Candidate(
                    doc_id=doc_id,
                    url=doc_urls[doc_id],
                    tf=tf,
                    total_words=meta["total_words"] if meta else 0,
                    popularity=meta["popularity_score"] if meta else 0.0,
                )
            )
        ranked = rank(query_bag, candidates)
        total = len(ranked)
        pages = math.ceil(total / page_size)
        rows = [
            {
                "doc_id": c.doc_id,
                "url": c.url,
                "score": c.score,
                "relevance": c.relevance,
                "popularity": c.popularity,
            }
            for c in ranked
        ]
        return {
            "results": paginate(rows, page, page_size),
            "total_results": total,
            "total_pages": pages,
            "page": page,
        }

    def additive_search(self, query: str, k: int = 10) -> list[tuple[str, float]]:
        """api/SearchEngine.search (SearchEngine.java:25-68): additive
        Σ posting.weight scoring, top-k."""
        tokens = self.tokenizer.tokenize(query)
        scores: dict[str, float] = {}
        for t in tokens:
            for p in self.get_postings(t):
                scores[p.doc_id] = scores.get(p.doc_id, 0.0) + p.weight
        out = sorted(scores.items(), key=lambda kv: sort_key(kv[1], kv[0]))
        return out[:k]

    # -- pagerank ---------------------------------------------------------

    def set_popularity(self, scores: dict[str, float]) -> None:
        # MongoDBIndexStore.updateDocumentScores semantics: match by url
        by_url = {d["url"]: d for d in self.documents.values()}
        for url, s in scores.items():
            if url in by_url:
                by_url[url]["popularity_score"] = s


def pagerank_reference(
    edges: list[tuple[str, str]],
    node_urls: set[str],
    damping: float = 0.85,
    tol: float = 1.0e-6,
    max_iter: int = 100,
) -> dict[str, float]:
    """PageRank.computePageRank transcription (PageRank.java:44-81).

    ``graph`` is keyed by TARGET with the list of incoming sources
    (PageRank.java:23-34); the as-implemented quirk divides by
    ``graph.get(inPage).size()`` — the IN-degree of inPage, not its
    out-degree (PageRank.java:67) — and skips inPages that have no in-links
    themselves (PageRank.java:63-66).  Deterministic declared order: nodes
    and incoming lists sorted lexicographically.
    """
    graph: dict[str, list[str]] = {}
    for src, dst in edges:
        # PageRank.java:27 semi-join: only targets in the crawled url set
        if dst not in node_urls:
            continue
        graph.setdefault(dst, []).append(src)
    for dst in graph:
        graph[dst] = sorted(graph[dst])

    n = len(graph)
    if n == 0:
        return {}
    ranks = {page: 1.0 / n for page in graph}

    for _ in range(max_iter):
        new_ranks: dict[str, float] = {}
        diff = 0.0
        for page in sorted(graph):
            rank_sum = 0.0
            for in_page in graph.get(page, []):
                if in_page not in graph:
                    continue  # "no one links to it" branch (PageRank.java:63-66)
                out_links = len(graph[in_page])  # quirk: IN-degree of in_page
                rank_sum += ranks[in_page] / out_links
            new_rank = (1 - damping) / n + damping * rank_sum
            new_ranks[page] = new_rank
            diff += abs(new_rank - ranks[page])
        ranks = new_ranks
        if diff < tol:
            break
    return ranks
