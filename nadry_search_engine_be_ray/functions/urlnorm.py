"""URL normalizers — faithful re-implementations of the reference's TWO
inconsistent normalizers (SURVEY.md §2.2 M3/M4; §2.11 notes the conflict;
indexer-side M3 governs doc identity).

M3 (`indexer/DocumentProcessor.java:181-210`, ``normalize_url``):
  resolve against base -> dot-segment normalize -> strip #fragment ->
  lowercase -> collapse ``/+`` runs NOT immediately preceded by the literal
  ``https:`` -> sort query params (drop empties) -> validate.

  Faithful quirk: the slash-collapse lookbehind only protects ``https:``, so
  ``http://host`` becomes ``http:/host``; the caller's http(s)://-prefix
  filter (`DocumentProcessor.java:171`) then DROPS all plain-http links.
  Replicated exactly (and covered by golden tests) because it shapes the
  reference link graph that PageRank consumes.

M4 (`webCrawler/WebCrawler.java:245-273`, ``crawler_normalize``): parse,
  lowercase scheme+host, keep port+path, DROP query/fragment/userinfo.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit, urlunsplit

_SLASH_RUNS = re.compile(r"(?<!https:)/+")


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 — Java URI.normalize() applies this even to absolute
    URIs, Python urljoin only during relative resolution."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
        else:
            out.append(seg)
    norm = "/".join(out)
    if path.endswith(("/.", "/..")) and not norm.endswith("/"):
        norm += "/"
    if path.startswith("/") and not norm.startswith("/"):
        norm = "/" + norm
    return norm


def normalize_url(url: str | None, base_url: str) -> str | None:
    """Indexer-side normalizer (M3).  Returns None for empty/invalid input,
    mirroring the reference's null return on URISyntaxException."""
    if url is None or not url.strip():
        return None
    try:
        encoded = url.replace(" ", "%20").replace("|", "%7C")
        resolved = urljoin(base_url, encoded)  # RFC 3986 resolve
        sp0 = urlsplit(resolved)
        resolved = urlunsplit(sp0._replace(path=_remove_dot_segments(sp0.path)))
        if "#" in resolved:
            resolved = resolved[: resolved.index("#")]
        resolved = resolved.lower()
        resolved = _SLASH_RUNS.sub("/", resolved)
        if "?" in resolved:
            head, query = resolved.split("?", 1)
            parts = sorted(s for s in query.split("&") if s)
            resolved = head + ("?" + "&".join(parts) if parts else "")
        # reference validates via new URL(...).toURI(); urlsplit mirrors the
        # lenient acceptance (scheme required, host NOT required — which is
        # exactly why the mangled http:/ form survives to the prefix filter)
        sp = urlsplit(resolved)
        if not sp.scheme:
            return None
        return resolved
    except ValueError:
        return None


def is_followable(normalized: str | None) -> bool:
    """The extract-links acceptance check (`DocumentProcessor.java:171`):
    normalized link must start with http:// or https://."""
    return normalized is not None and (
        normalized.startswith("http://") or normalized.startswith("https://")
    )


_HREF = re.compile(r"""<a\s[^>]*?href\s*=\s*["']([^"']*)["']""", re.IGNORECASE)


def extract_links(html: str, base_url: str) -> list[str]:
    """M3 link extraction over raw HTML (regex stand-in for the Jsoup
    ``a[href]`` selection — this container has no HTML parser; the selector
    semantics are narrower than Jsoup's but identical on the test fixtures).
    Returns the sorted unique set of followable normalized links."""
    out = set()
    for m in _HREF.finditer(html or ""):
        n = normalize_url(m.group(1), base_url)
        if is_followable(n):
            out.add(n)
    return sorted(out)


def crawler_normalize(url: str) -> str:
    """Crawler-side normalizer (M4): scheme+host lowercased, port+path kept,
    query/fragment/userinfo dropped.  Raises ValueError on unparseable input
    (the reference re-throws URISyntaxException)."""
    sp = urlsplit(url)
    if not sp.scheme or sp.hostname is None:
        raise ValueError(f"malformed url: {url!r}")
    host = sp.hostname.lower()
    if sp.port is not None:
        host = f"{host}:{sp.port}"
    return urlunsplit((sp.scheme.lower(), host, sp.path, "", ""))


_INVALID_FILENAME = re.compile(r"[^a-zA-Z0-9._-]")


def filename_from_url(url: str) -> str:
    """`WebCrawler.generateFilenameFromUrlPath` (WebCrawler.java:276-296):
    host + "_" + path (root -> "_root", leading slash stripped), illegal
    chars replaced with underscores."""
    sp = urlsplit(url)
    path = sp.path
    if not path or path == "/":
        path = "_root"
    elif path.startswith("/"):
        path = path[1:]
    return _INVALID_FILENAME.sub("_", f"{sp.hostname}_{path}")
