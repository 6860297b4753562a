"""URL canonicalization (reference semantics: w3lib-style canonicalize_url
used by frontera/contrib/canonicalsolvers/basic.py:~1-50 and
frontera/utils/url.py:~1-150 — approximate cites, SURVEY.md §0).

Rules (applied in order):
  1. scheme and host lowercased; userinfo stripped from netloc
  2. default port removed (``:80`` for http, ``:443`` for https)
  3. empty path becomes ``/``
  4. query parameters sorted by (key, value); empty query drops the ``?``
  5. fragment stripped

Scale note: at Common-Crawl scale most URLs are *already canonical*, so the
batch entry point does a single vectorized regex match (pyarrow
``match_substring_regex``) to find rows needing no work and runs the Python
slow path only on the rest. This keeps the hot stage ~vectorized without a
per-row Python loop over the whole batch.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit, urlunsplit, parse_qsl, urlencode, quote, urljoin

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Already-canonical fast path: lowercase scheme, no userinfo, lowercase
# host without explicit port, non-empty path, no query, no fragment,
# no uppercase or percent-escapes anywhere.
_CANONICAL_RE = r"^https?://[a-z0-9.\-]+/[a-z0-9.\-/_~]*$"

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize(url: str) -> str:
    """Canonicalize a single URL (slow path)."""
    url = url.strip()
    try:
        scheme, netloc, path, query, _frag = urlsplit(url)
    except ValueError:
        return url
    scheme = scheme.lower()
    # strip userinfo
    if "@" in netloc:
        netloc = netloc.rsplit("@", 1)[1]
    host, sep, port = netloc.partition(":")
    host = host.lower().rstrip(".")
    if sep and port == _DEFAULT_PORTS.get(scheme, ""):
        netloc = host
    elif sep and port:
        netloc = f"{host}:{port}"
    else:
        netloc = host
    if not path:
        path = "/"
    if query:
        pairs = sorted(parse_qsl(query, keep_blank_values=True))
        query = urlencode(pairs)
    path = quote(path, safe="/%~._-!$&'()*+,;=:@")
    return urlunsplit((scheme, netloc, path, query, ""))


def canonicalize_array(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized canonicalization of an Arrow string array.

    Fast-path regex skips already-canonical URLs; only the remainder goes
    through the Python ``canonicalize``.
    """
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    ok = pc.fill_null(pc.match_substring_regex(urls, _CANONICAL_RE), True)
    ok_np = ok.to_numpy(zero_copy_only=False).astype(bool)
    if ok_np.all():
        return urls
    vals = urls.to_pylist()
    idx = np.nonzero(~ok_np)[0]
    for i in idx:
        v = vals[i]
        if v is not None:
            vals[i] = canonicalize(v)
    return pa.array(vals, type=pa.string())


_HOST_RE = re.compile(r"^[a-z][a-z0-9+.\-]*://(?:[^/@?#]*@)?([^/:?#]*)")


def extract_host(url: str) -> str:
    """Hostname of a canonical URL (fast split, no urllib)."""
    m = _HOST_RE.match(url)
    return m.group(1) if m else ""


def extract_host_array(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized host extraction via one regex capture kernel."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    # pyarrow extract_regex returns struct arrays; use replace to strip
    # scheme then cut at first of '/', ':', '?', '#'.
    s = pc.replace_substring_regex(urls, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?:[^/@?#]*@)?", "")
    s = pc.replace_substring_regex(s, r"[/:?#].*$", "")
    return pc.utf8_lower(s)


def resolve_link(base_url: str, href: str) -> str:
    """Resolve an extracted href against its page URL (spider-side semantics,
    reference: link extraction happens in the Scrapy spider; SURVEY.md §2.2 M6).
    """
    return urljoin(base_url, href)


def domain_info(host: str) -> dict:
    """Split host into name/sld/tld/subdomain like the reference's
    DomainMiddleware (frontera/contrib/middlewares/domain.py:~1-120, approx).
    Public-suffix-list-free heuristic: tld = last label, sld = last two labels.
    """
    labels = host.split(".")
    if len(labels) < 2:
        return {"name": host, "sld": host, "tld": "", "subdomain": ""}
    tld = labels[-1]
    sld = ".".join(labels[-2:])
    subdomain = ".".join(labels[:-2])
    return {"name": host, "sld": sld, "tld": tld, "subdomain": subdomain}
