"""HTML-mode field extraction (operator M1 proper).

Replicates ``indexer/DocumentProcessor.java:32-81,124-149`` over raw HTML
strings with a stdlib ``html.parser`` DOM (no external deps in this
container):

* guards: skip empty/whitespace-only documents and documents whose UTF-8
  encoding exceeds 100 MB (``DocumentProcessor.java:47-53``)
* title   <- first <title> text (Jsoup ``doc.title()``)
* description <- first <meta name=description> content attribute
* links   <- a[href] resolved against the base url + the indexer URL
  normalizer (functions/urlnorm.py), extracted BEFORE unwanted-selector
  removal (``DocumentProcessor.java:63-65``)
* unwanted-selector removal: default ("script", ".ads", ".comments"),
  matching Jsoup semantics (tag name; .cls = class token)
* main content (``extractMainContent``, DocumentProcessor.java:124-149):
  text of the first main/article/div[class*=content]/div[id*=content]
  match, then the text of EVERY element matching the section list in
  document order (the reference deliberately double-counts nested text),
  falling back to body text when empty
* text() = whitespace-normalized descendant text, excluding script/style
  contents (Jsoup DataNode semantics)

Deviation (documented): the stdlib parser does not implement the full
HTML5 implied-end-tag algorithm, so pathologically malformed markup can
nest differently than Jsoup; well-formed pages (including the reference's
own fixtures) extract identically.

The batch stage emits one row per input document with a ``status`` column
(``ok`` / ``skipped_empty`` / ``skipped_too_large``) instead of raising —
the Ray-native version of the reference's per-document exception path.
"""

from __future__ import annotations

import hashlib
import re
from html.parser import HTMLParser

import pyarrow as pa

from ..functions.urlnorm import is_followable, normalize_url

MAX_HTML_BYTES = 100_000_000  # DocumentProcessor.java:50

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
_WS = re.compile(r"\s+")

_SECTION_TAGS = frozenset(
    (
        "article", "section", "header", "footer", "main",
        "h1", "h2", "h3", "h4", "h5", "h6",
        "p", "blockquote", "pre", "li", "dt", "dd",
        "strong", "em", "cite", "q", "time", "code", "span",
    )
)


class _Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # _Node | str


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs))
        self.stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(_Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore (lenient, like browsers/Jsoup)

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(html: str) -> _Node:
    tb = _TreeBuilder()
    tb.feed(html or "")
    tb.close()
    return tb.root


def _iter_nodes(node: _Node):
    """Document-order traversal of element nodes."""
    for c in node.children:
        if isinstance(c, _Node):
            yield c
            yield from _iter_nodes(c)


def _matches(node: _Node, sel: str) -> bool:
    """The selector subset the reference uses: 'tag', '.class',
    'tag[attr]', 'tag[attr*=sub]'."""
    if sel.startswith("."):
        cls = node.attrs.get("class") or ""
        return sel[1:] in cls.split()
    if "[" in sel:
        tag, _, cond = sel.partition("[")
        cond = cond.rstrip("]")
        if tag and node.tag != tag:
            return False
        if "*=" in cond:
            attr, _, sub = cond.partition("*=")
            val = node.attrs.get(attr)
            return val is not None and sub in val
        return node.attrs.get(cond) is not None
    return node.tag == sel


def _select(root: _Node, selectors: list[str]) -> list[_Node]:
    return [
        n for n in _iter_nodes(root) if any(_matches(n, s) for s in selectors)
    ]


def _select_first(root: _Node, selectors: list[str]) -> _Node | None:
    for n in _iter_nodes(root):
        if any(_matches(n, s) for s in selectors):
            return n
    return None


def _remove(root: _Node, selectors: list[str]) -> None:
    def prune(node: _Node):
        node.children = [
            c
            for c in node.children
            if not (isinstance(c, _Node) and any(_matches(c, s) for s in selectors))
        ]
        for c in node.children:
            if isinstance(c, _Node):
                prune(c)

    prune(root)


def node_text(node: _Node) -> str:
    """Jsoup Element.text(): normalized descendant text; script/style
    contents are DataNodes, not TextNodes — excluded."""
    parts: list[str] = []

    def walk(n: _Node):
        if n.tag in ("script", "style"):
            return
        for c in n.children:
            if isinstance(c, _Node):
                walk(c)
            else:
                parts.append(c)

    walk(node)
    return _WS.sub(" ", "".join(parts)).strip()


def extract_main_content(root: _Node) -> str:
    """DocumentProcessor.extractMainContent (java:124-149)."""
    out: list[str] = []
    main = _select_first(
        root, ["main", "article", "div[class*=content]", "div[id*=content]"]
    )
    if main is not None:
        out.append(node_text(main))
    # the section list from java:131-136 (a[href] is the only attr selector)
    for el in _iter_nodes(root):
        if el.tag in _SECTION_TAGS or (
            el.tag == "a" and el.attrs.get("href") is not None
        ):
            out.append(node_text(el))
    content = _WS.sub(" ", " ".join(out)).strip()
    if not content:
        body = _select_first(root, ["body"])
        content = node_text(body) if body is not None else ""
    return content


def extract_document(
    html: str | None,
    url: str,
    unwanted: tuple[str, ...] = ("script", ".ads", ".comments"),
    max_bytes: int = MAX_HTML_BYTES,
) -> dict:
    """One document through the reference pipeline; returns a dict with
    status + (doc_id, title, description, content, links)."""
    if html is None or not html.strip():
        return {"status": "skipped_empty", "doc_id": "", "title": "",
                "description": "", "content": "", "links": []}
    if len(html.encode("utf-8", errors="ignore")) > max_bytes:
        return {"status": "skipped_too_large", "doc_id": "", "title": "",
                "description": "", "content": "", "links": []}

    root = parse_html(html)
    title_node = _select_first(root, ["title"])
    # Jsoup doc.title() trims + collapses whitespace
    title = node_text(title_node) if title_node is not None else ""
    meta = None
    for n in _iter_nodes(root):
        if n.tag == "meta" and (n.attrs.get("name") or "").lower() == "description":
            meta = n
            break
    description = (meta.attrs.get("content") or "") if meta is not None else ""

    # links BEFORE unwanted removal (java:63-65)
    links: list[str] = []
    seen = set()
    for a in _iter_nodes(root):
        if a.tag == "a" and a.attrs.get("href") is not None:
            norm = normalize_url(a.attrs.get("href"), url)
            if is_followable(norm) and norm not in seen:
                seen.add(norm)
                links.append(norm)

    _remove(root, list(unwanted))
    content = extract_main_content(root)
    doc_id = hashlib.sha256(url.encode()).hexdigest()
    return {
        "status": "ok",
        "doc_id": doc_id,
        "title": title,
        "description": description,
        "content": content,
        "links": links,
    }


def split_fields_html(content: str) -> tuple[str, str, str]:
    """HTML-mode analog of fieldsplit.split_fields: (title, description,
    extracted body text) from a raw HTML string."""
    doc = extract_document(content, url="")
    return doc["title"], doc["description"], doc["content"]


def process_html_batch(batch: pa.Table, url_col: str = "url",
                       html_col: str = "html") -> pa.Table:
    """map_batches stage: (url, html) -> processed-document rows.  Pure and
    stateless; at scale this runs as plain tasks (no actor state needed —
    the parser allocates per call)."""
    urls = batch[url_col].to_pylist()
    htmls = batch[html_col].to_pylist()
    rows = [extract_document(h, u) for h, u in zip(htmls, urls)]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "status": pa.array([r["status"] for r in rows], pa.string()),
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
            "title": pa.array([r["title"] for r in rows], pa.string()),
            "description": pa.array(
                [r["description"] for r in rows], pa.string()
            ),
            "content": pa.array([r["content"] for r in rows], pa.string()),
            "links": pa.array([r["links"] for r in rows], pa.list_(pa.string())),
        }
    )
